"""Monte-Carlo mission fleets: batched filters over the device mesh.

Replaces the reference's serial batch driver (``pf_loop.py:10-46`` —
roslaunch in a shell loop, one mission at a time, overnight) with a vmapped
+ mesh-sharded fleet: every mission is an independent filter replay, the
mission batch shards over the ``mission`` mesh axis, and per-mission
particle banks shard over ``particle``. One jitted program steps the whole
fleet.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import EKFSlamConfig, PFConfig
from ..models import ekf_slam as slam
from ..models import particle_filter as pf
from ..ops.timeline import Timeline
from . import mesh as mesh_lib


class FleetState(NamedTuple):
    slam: slam.SlamState       # batched (B, ...)
    pf: pf.PFState             # batched (B, N, ...)


def init_fleet(
    batch: int,
    n_particles: int,
    slam_cfg: EKFSlamConfig,
    pf_params: pf.PFParams,
    pf_cfg: PFConfig,
    seed: int = 0,
) -> FleetState:
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    slam0 = slam.init_state(slam_cfg)
    slam_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), slam0
    )
    pf_b = jax.vmap(lambda k: pf.init_state(n_particles, pf_params, key=k))(keys)
    return FleetState(slam=slam_b, pf=pf_b)


def fleet_step(
    slam_cfg: EKFSlamConfig,
    slam_params: slam.SlamParams,
    pf_cfg: PFConfig,
    pf_params: pf.PFParams,
    state: FleetState,
    tick_batch,  # per-mission tick slices, leading axis B
):
    """One fused navigation tick for every mission in the fleet."""

    def one(sl, pfs, tick):
        sl2, sl_out = slam.step(slam_cfg, slam_params, sl, tick)
        pf2, pf_out = pf.step(pf_cfg, pf_params, pfs, tick)
        return sl2, pf2, {"slam": sl_out, "pf": pf_out}

    sl2, pf2, out = jax.vmap(one)(state.slam, state.pf, tick_batch)
    return FleetState(slam=sl2, pf=pf2), out


def run_fleet(
    timelines: Timeline,          # batched: every leaf has leading axis B
    slam_cfg: EKFSlamConfig,
    slam_params: slam.SlamParams,
    pf_cfg: PFConfig,
    pf_params: pf.PFParams,
    n_particles: int,
    device_mesh=None,
    seed: int = 0,
):
    """Replay the whole fleet: scan over time of the vmapped fused step.

    ``timelines`` leaves are (B, T, ...); missions shard over the mesh.
    """
    B = timelines.ticks.shape[0]
    state0 = init_fleet(B, n_particles, slam_cfg, pf_params, pf_cfg, seed)

    if device_mesh is not None:
        state0 = FleetState(
            slam=mesh_lib.shard_missions(state0.slam, device_mesh),
            pf=pf.PFState(
                # (B, 6, N): missions x state-rows x particles
                particles=jax.device_put(
                    state0.pf.particles,
                    mesh_lib.mission_particle_sharding(device_mesh, 3, particle_axis=2),
                ),
                key=jax.device_put(
                    state0.pf.key, mesh_lib.mission_sharding(device_mesh, 2)
                ),
                t_prev=jax.device_put(
                    state0.pf.t_prev, mesh_lib.mission_sharding(device_mesh, 1)
                ),
            ),
        )
        timelines = mesh_lib.shard_missions(timelines, device_mesh)

    # time-major for the scan: (B, T, ...) -> (T, B, ...)
    xs = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), timelines)

    def body(state, tick_batch):
        return fleet_step(slam_cfg, slam_params, pf_cfg, pf_params, state, tick_batch)

    final, out = jax.lax.scan(body, state0, xs)
    return final, out


def batch_timelines(timelines: list) -> Timeline:
    """Stack per-mission Timelines (same shapes) into one batched Timeline."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *timelines)


_slam_fleet_jit_cache: dict = {}


def _slam_fleet_jit(cfg: EKFSlamConfig):
    fn = _slam_fleet_jit_cache.get(cfg)
    if fn is None:
        fn = jax.jit(lambda t, p: slam.run_fleet(t, p, cfg))
        _slam_fleet_jit_cache[cfg] = fn
    return fn


def run_combined(
    tl_slam: Timeline,            # batched (B=1) SLAM timeline
    tl_pf: Timeline,              # single-mission PF timeline (concrete)
    slam_params: slam.SlamParams,
    slam_cfg: EKFSlamConfig,
    pf_params: pf.PFParams,
    pf_cfg: PFConfig,
    n_particles: int,
    key=None,
):
    """The BASELINE.json north-star workload: ONE full mission replayed
    through BOTH estimators on their production fast paths — the MCL bank
    through the host-segmented multi-tick Pallas kernel
    (``particle_filter.run`` with ``use_pallas=True``) and the EKF-SLAM
    filter through the in-lanes DA-kernel fleet path
    (``ekf_slam.run_fleet``). Returns one scalar forcing both outputs, for
    slope timing (bench.py section 3)."""
    final_pf, out_pf = pf.run(
        tl_pf, pf_params, pf_cfg, n_particles=n_particles, key=key,
        scheme="systematic", use_pallas=True,
    )
    final_s, _out_s = _slam_fleet_jit(slam_cfg)(tl_slam, slam_params)
    return (jnp.sum(out_pf["mean"])
            + jnp.sum(final_s.mu[:, 0:6])
            + jnp.sum(final_s.n_active))


def run_raycast_fleet(
    gt_tracks: jnp.ndarray,      # (B, T, 6) per-mission vehicle trajectories
    landmark_sets: jnp.ndarray,  # (B, L, 3) per-mission true rock fields
    lm_masks: jnp.ndarray,       # (B, L)
    slam_cfg: EKFSlamConfig,
    slam_params: slam.SlamParams,
    mbes_spec=None,
    device_mesh=None,
    use_da_kernel: bool | None = None,
):
    """Fully closed-loop Monte-Carlo fleet: per tick and per mission, render
    an MBES ping against the mission's rock field (``ops.raycast``), extract
    detections (``ops.sonar``), and run the SLAM update — everything inside
    one jitted scan, no host in the loop. This is the BASELINE.json
    "batched missions with simulated MBES ray-cast" configuration.

    Returns (final SlamStates (B,...), per-tick (mu (B,T,6), n_active (B,T))).
    """
    from ..ops import raycast

    spec = raycast.MBESSpec() if mbes_spec is None else mbes_spec

    if use_da_kernel is None:
        use_da_kernel = jax.default_backend() == "tpu"
    if device_mesh is not None or not use_da_kernel:
        # sharded/CPU path: per-mission scan (the in-lanes DA kernel is a
        # single-device TPU program; GSPMD shards the vmapped variant)
        def mission(gt_track, lms, lmm):
            def step_fn(state, pose):
                pts, mask = raycast.ping_detections(
                    pose, lms, lmm, spec, max_detections=slam_cfg.max_obs
                )
                pred = slam.predict(state, pose, slam_params)
                st, _ = slam.data_associate_update(
                    pred, pts, mask, slam_params, slam_cfg, slam.MBES
                )
                return st, (st.mu[0:6], st.n_active)

            return jax.lax.scan(step_fn, slam.init_state(slam_cfg), gt_track)

        if device_mesh is not None:
            gt_tracks = mesh_lib.shard_missions(gt_tracks, device_mesh)
            landmark_sets = mesh_lib.shard_missions(landmark_sets, device_mesh)
            lm_masks = mesh_lib.shard_missions(lm_masks, device_mesh)
        return jax.vmap(mission)(gt_tracks, landmark_sets, lm_masks)

    # single-device fleet: render + predict vmapped, DA through the
    # missions-in-lanes kernel (ops/slam_da_kernels — ~2.8x the vmapped step)
    B = gt_tracks.shape[0]
    L = slam_cfg.max_landmarks
    s0 = slam.init_state(slam_cfg)
    s0_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    # landmark block-diag band carry (see ekf_slam.run_fleet)
    band0_b = jnp.broadcast_to(slam.initial_band(s0.Sigma, L), (B, 24, L))

    def body(carry, pose_b):
        state_b, band = carry
        pts, mask = jax.vmap(
            lambda p, l, m: raycast.ping_detections(
                p, l, m, spec, max_detections=slam_cfg.max_obs)
        )(pose_b, landmark_sets, lm_masks)
        pred = jax.vmap(lambda s, p: slam.predict(s, p, slam_params))(
            state_b, pose_b)
        st, _m, band = slam.da_lanes_pass(pred, pts, mask, slam_params,
                                          slam_cfg, band=band)
        return (st, band), (st.mu[:, 0:6], st.n_active)

    (final, _band), (mu_t, nact_t) = jax.lax.scan(
        body, (s0_b, band0_b), jnp.moveaxis(gt_tracks, 0, 1))
    return final, (jnp.moveaxis(mu_t, 0, 1), jnp.moveaxis(nact_t, 0, 1))
