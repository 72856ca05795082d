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
    pf_scheme: str = "residual",
    pf_pmesh=None,
):
    """One fused navigation tick for every mission in the fleet.

    ``pf_scheme="systematic"`` lifts the PF GPS update out of the
    per-mission cond into one fleet-wide batched update
    (``pf.fleet_update_resample``) — semantically identical to the vmapped
    ``pf.step`` (vmap turns the update cond into a select that executes
    both branches anyway) but routable: with ``pf_pmesh`` the resample for
    all missions runs through the explicit-collectives distributed kernel
    over the mesh's particle axis instead of GSPMD gathers (round-3
    verdict #1, fleet leg)."""
    if pf_scheme != "systematic":
        if pf_pmesh is not None:
            raise ValueError(
                "particle-axis sharding (pf_pmesh) requires the systematic "
                "scheme — the distributed resample implements it")

        def one(sl, pfs, tick):
            sl2, sl_out = slam.step(slam_cfg, slam_params, sl, tick)
            pf2, pf_out = pf.step(pf_cfg, pf_params, pfs, tick, pf_scheme)
            return sl2, pf2, {"slam": sl_out, "pf": pf_out}

        sl2, pf2, out = jax.vmap(one)(state.slam, state.pf, tick_batch)
        return FleetState(slam=sl2, pf=pf2), out

    def slam_one(sl, tick):
        return slam.step(slam_cfg, slam_params, sl, tick)

    sl2, sl_out = jax.vmap(slam_one)(state.slam, tick_batch)

    def pred_one(s, tick):
        odom = tick.channels["odom"]
        dt = jnp.maximum(tick.ticks - s.t_prev, 0.0)
        return jax.lax.cond(
            odom.fresh,
            lambda ss: pf.predict(ss, odom.value, dt, pf_params)._replace(
                t_prev=tick.ticks),
            lambda ss: ss,
            s,
        )

    pred = jax.vmap(pred_one)(state.pf, tick_batch)
    gps = tick_batch.channels["gps"]
    diving = tick_batch.channels["diving"]
    do_upd = gps.fresh & (diving.value[:, 0] < 0.5)
    upd = pf.fleet_update_resample(pred, gps.value[:, 0:2], pf_params,
                                   pmesh=pf_pmesh)

    def sel(u, p):
        return jnp.where(do_upd.reshape((-1,) + (1,) * (u.ndim - 1)), u, p)

    pf2 = pf.PFState(particles=sel(upd.particles, pred.particles),
                     key=sel(upd.key, pred.key), t_prev=pred.t_prev)
    mean, cov = jax.vmap(pf.estimate)(pf2.particles)
    out = {"slam": sl_out,
           "pf": {"mean": mean, "cov": cov, "updated": do_upd}}
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
    pf_scheme: str | None = None,
):
    """Replay the whole fleet: scan over time of the vmapped fused step.

    ``timelines`` leaves are (B, T, ...); missions shard over the mesh.

    When ``device_mesh`` has a ``particle`` axis wider than 1, per-mission
    particle banks shard across it and the PF GPS update routes through the
    batched explicit-collectives distributed resample (forces the
    systematic scheme — see ``fleet_step``); otherwise ``pf_scheme``
    defaults to the reference's residual sampler (``auv_pf.py:169-198``).
    """
    B = timelines.ticks.shape[0]
    if pf_scheme is None:
        particle_sharded = (device_mesh is not None
                            and device_mesh.shape[mesh_lib.PARTICLE_AXIS] > 1)
        pf_scheme = "systematic" if particle_sharded else "residual"
    pf_pmesh = None
    if (device_mesh is not None
            and device_mesh.shape[mesh_lib.PARTICLE_AXIS] > 1):
        pf_pmesh = device_mesh
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
        return fleet_step(slam_cfg, slam_params, pf_cfg, pf_params, state,
                          tick_batch, pf_scheme=pf_scheme, pf_pmesh=pf_pmesh)

    final, out = jax.lax.scan(body, state0, xs)
    return final, out


def batch_timelines(timelines: list) -> Timeline:
    """Stack per-mission Timelines (same shapes) into one batched Timeline.

    Numpy-leaved timelines (the builders' output, ``ops/timeline.py`` r05
    note) are stacked on host and shipped with ONE ``jax.device_put`` per
    batched leaf — per-mission device leaves would pay O(B x channels)
    tunnel round trips. Device-leaved inputs keep the old jnp.stack path."""
    leaves = jax.tree_util.tree_leaves(timelines[0])
    if all(isinstance(x, np.ndarray) for x in leaves):
        batched = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *timelines)
        return jax.device_put(batched)
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
    filter through the event-compacted in-lanes kernel path
    (``ekf_slam.run_fleet_compact``: the kernel scan visits the ~50% of
    ticks that carry MBES events; predicts between events precompose
    outside the scan). Returns one scalar forcing both outputs, for slope
    timing (bench.py section 3)."""
    final_pf, out_pf = pf.run(
        tl_pf, pf_params, pf_cfg, n_particles=n_particles, key=key,
        scheme="systematic", use_pallas=True,
    )
    final_s, _out_s = slam.run_fleet_compact(tl_slam, slam_params, slam_cfg)
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
    if not use_da_kernel:
        # kernel-less path: per-mission scan (GSPMD shards the vmapped
        # variant over the mission axis when a mesh is given)
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

    if device_mesh is not None:
        # mission-axis shard_map around the WHOLE kernel fleet (round-3
        # verdict #4): missions are independent, so each shard runs the
        # same lanes-kernel scan on its local block — no collectives, no
        # fallback to the ~2.8x-slower vmapped path
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        M = device_mesh.shape[mesh_lib.MISSION_AXIS]
        if gt_tracks.shape[0] % M:
            raise ValueError(
                f"fleet size {gt_tracks.shape[0]} not divisible by "
                f"mission axis {M}")

        def local(gt, lms, lmm, prm):
            return run_raycast_fleet(
                gt, lms, lmm, slam_cfg, prm, mbes_spec=spec,
                use_da_kernel=True)

        fn = shard_map(
            local, mesh=device_mesh,
            in_specs=(P(mesh_lib.MISSION_AXIS),) * 3 + (P(),),
            out_specs=(P(mesh_lib.MISSION_AXIS), P(mesh_lib.MISSION_AXIS)),
            check_vma=False,
        )
        return fn(gt_tracks, landmark_sets, lm_masks, slam_params)

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
