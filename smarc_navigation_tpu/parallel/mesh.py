"""Device mesh + sharding helpers — the framework's collectives backend.

The reference's only "distributed" layer is ROS TCP pub/sub between node
processes (SURVEY.md §2.6); its TPU-native replacement is a single mesh
abstraction over XLA collectives: axes ``mission`` (data-parallel Monte-
Carlo fleets, rides ICI within a pod / DCN across pods) and ``particle``
(a single mission's particle bank sharded across chips; weight
normalization becomes an XLA all-reduce, resampling's inverse-CDF gather an
all-gather — both inserted automatically by GSPMD from the shardings below,
never hand-written).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MISSION_AXIS = "mission"
PARTICLE_AXIS = "particle"


def make_mesh(
    mission: Optional[int] = None,
    particle: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over the available devices: (mission, particle) grid.

    Defaults to all devices on the mission axis (the common fleet shape).
    """
    devices = jax.devices() if devices is None else list(devices)
    n = len(devices)
    if mission is None:
        mission = n // particle
    if mission * particle != n:
        raise ValueError(f"mesh {mission}x{particle} != {n} devices")
    arr = np.asarray(devices).reshape(mission, particle)
    return Mesh(arr, (MISSION_AXIS, PARTICLE_AXIS))


def mission_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-of-missions arrays: leading axis sharded over `mission`."""
    return NamedSharding(mesh, P(MISSION_AXIS, *([None] * (ndim - 1))))


def particle_sharding(mesh: Mesh, ndim: int, particle_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[particle_axis] = PARTICLE_AXIS
    return NamedSharding(mesh, P(*spec))


def mission_particle_sharding(
    mesh: Mesh, ndim: int, particle_axis: int = 1
) -> NamedSharding:
    """Fleet particle banks: leading mission axis + a particle axis
    (default axis 1; the PF's (B, 6, N) layout passes particle_axis=2)."""
    spec = [None] * ndim
    spec[0] = MISSION_AXIS
    spec[particle_axis] = PARTICLE_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_missions(tree, mesh: Mesh):
    """device_put every leaf with its leading axis over the mission axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, mission_sharding(mesh, x.ndim)), tree
    )


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
