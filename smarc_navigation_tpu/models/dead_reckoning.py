"""Dead-reckoning odometry providers.

Two families, mirroring the reference (SURVEY.md §2.2):

* ``sam_dr``  — the SAM vehicle dead-reckoning chain
  (``sam_dead_reckoning/scripts/dr_node.py:165-246``): integrate STIM gyro
  yaw (roll/pitch absolute from the orientation quaternion), integrate DVL
  body velocity gated by staleness + sanity bounds with a SAM motion-model
  fallback, substitute pressure depth directly.

* ``odom_provider`` — the LoLo odometry provider
  (``auv_odom_provider/src/odom_provider.cpp:240-324``): Bézier-extrapolate
  stale DVL over the last-5 window, smooth DVL axes with scalar KFs,
  rotate body displacement into the odom frame, accumulate increments.

Both are pure step functions folded over the mission timeline with
``lax.scan`` — one XLA program per mission, vmappable over fleets.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DRConfig, OdomProviderConfig, SAMConfig
from ..ops import bezier, oned_kf
from ..ops.timeline import Timeline, build_timeline
from ..utils.geometry import (
    rotmat_from_rpy,
    rpy_from_quat,
    wrap_angle,
)
from . import motion_model


# ===========================================================================
# SAM dead-reckoning (dr_node)
# ===========================================================================

class DRState(NamedTuple):
    pos: jnp.ndarray        # (3,) odom-frame position
    rpy: jnp.ndarray        # (3,) attitude (yaw integrated, roll/pitch absolute)
    lin_vel: jnp.ndarray    # (3,) latest body velocity used
    vel_rot: jnp.ndarray    # (3,) latest body rates
    t_stim_prev: jnp.ndarray  # scalar


def dr_init(dtype=jnp.float32) -> DRState:
    z3 = jnp.zeros(3, dtype)
    return DRState(pos=z3, rpy=z3, lin_vel=z3, vel_rot=z3,
                   t_stim_prev=jnp.asarray(0.0, dtype))


def dr_step(
    cfg: DRConfig,
    sam_cfg: SAMConfig,
    state: DRState,
    tick,
) -> Tuple[DRState, jnp.ndarray]:
    """One DR tick. ``tick`` is a per-tick Timeline slice with channels
    imu (quat4+gyro3), dvl (vel3), depth (z1), control (rpm,dr).

    Returns (new_state, odom_out (9,)) with odom = [pose6, body_vel3].
    """
    imu = tick.channels["imu"]
    dvl = tick.channels["dvl"]
    depth = tick.channels["depth"]
    ctl = tick.channels["control"]

    # --- attitude: integrate gyro yaw between IMU stamps, absolute roll/pitch
    # (dr_node.py:281-308)
    gyro = imu.value[4:7]
    dt_imu = jnp.maximum(imu.stamp - state.t_stim_prev, 0.0)
    rot = state.rpy + gyro * dt_imu
    abs_rpy = rpy_from_quat(imu.value[0:4])
    rot = jnp.stack([abs_rpy[0], abs_rpy[1], wrap_angle(rot[2])])
    new_rpy = jnp.where(imu.fresh, rot, state.rpy)
    t_stim = jnp.where(imu.fresh, imu.stamp, state.t_stim_prev)
    vel_rot = jnp.where(imu.fresh, gyro, state.vel_rot)

    # --- linear velocity: DVL if fresh+sane, else motion-model fallback
    # (dr_node.py:176-201)
    v = dvl.value
    dvl_ok = (
        (dvl.age < cfg.dvl_period)
        & (jnp.abs(v[1]) < cfg.dvl_vy_max)
        & (v[0] < cfg.dvl_vx_max)
        & (v[0] > cfg.dvl_vx_min)
    )
    rpm, d_angle = ctl.value[0], ctl.value[1]
    d_angle = jnp.clip(-d_angle, -cfg.thrust_vec_max_rad, cfg.thrust_vec_max_rad)
    mm_vel = motion_model.dr_fallback_velocity(
        jnp.stack([rpm, d_angle]), cfg.dr_period, sam_cfg
    )
    lin_vel = jnp.where(dvl_ok, v, mm_vel)
    # no DVL contact yet -> no linear integration at all (dvl_on gate)
    lin_vel = jnp.where(dvl.valid, lin_vel, jnp.zeros_like(lin_vel))

    # --- integrate x/y in odom frame; depth measured directly
    # (dr_node.py:204-208)
    step_odom = rotmat_from_rpy(new_rpy) @ (lin_vel * cfg.dr_period)
    pos = state.pos.at[0:2].add(step_odom[0:2])
    pos = pos.at[2].set(jnp.where(depth.valid, depth.value[0], state.pos[2]))

    new_state = DRState(pos=pos, rpy=new_rpy, lin_vel=lin_vel,
                        vel_rot=vel_rot, t_stim_prev=t_stim)
    out = jnp.concatenate([pos, new_rpy, lin_vel])
    return new_state, out


def run_sam_dr_vectorized(timeline: Timeline, cfg: DRConfig = DRConfig(),
                          sam_cfg: SAMConfig = SAMConfig()) -> jnp.ndarray:
    """Closed-form SAM DR replay — the scan recurrence is associative, so
    the whole mission vectorizes into ~25 XLA ops and two cumsums:

    * yaw_t = wrap(cumsum of gyro_z * dt between fresh IMU stamps) — wrap
      commutes with the sum modulo 2*pi, and only cos/sin (2*pi-invariant)
      and the wrapped output consume it;
    * roll/pitch/velocities/depth are queue-latest channel values;
    * pos_xy = cumsum of R(rpy_t) (v_t * dr_period).

    Identical results to ``run_sam_dr`` (pinned by test) at mission-length
    instead of per-tick cost; accepts a batched (B, T, ...) timeline too.
    """
    imu = timeline.channels["imu"]
    dvl = timeline.channels["dvl"]
    depth = timeline.channels["depth"]
    ctl = timeline.channels["control"]

    # attitude: absolute roll/pitch; yaw integrated over fresh-IMU intervals
    quat = imu.value[..., 0:4]
    abs_rpy = jnp.vectorize(rpy_from_quat, signature="(q)->(e)")(quat)
    # previous tick's queue-latest stamp == stamp of the last fresh IMU
    # before this tick; -inf (no message yet) clamps to the scan's t0=0
    prev_stamp = jnp.maximum(
        jnp.concatenate(
            [jnp.zeros_like(imu.stamp[..., :1]), imu.stamp[..., :-1]],
            axis=-1),
        0.0)
    dyaw = jnp.where(
        imu.fresh,
        imu.value[..., 6] * jnp.maximum(imu.stamp - prev_stamp, 0.0), 0.0)
    yaw = jnp.cumsum(dyaw, axis=-1)
    seen_imu = jnp.cumsum(imu.fresh, axis=-1) > 0
    rpy = jnp.stack(
        [jnp.where(seen_imu, abs_rpy[..., 0], 0.0),
         jnp.where(seen_imu, abs_rpy[..., 1], 0.0),
         jnp.where(seen_imu, yaw, 0.0)], axis=-1)

    # velocity: DVL gated by staleness + sanity, motion-model fallback
    v = dvl.value
    dvl_ok = (
        (dvl.age < cfg.dvl_period)
        & (jnp.abs(v[..., 1]) < cfg.dvl_vy_max)
        & (v[..., 0] < cfg.dvl_vx_max)
        & (v[..., 0] > cfg.dvl_vx_min)
    )
    d_angle = jnp.clip(-ctl.value[..., 1], -cfg.thrust_vec_max_rad,
                       cfg.thrust_vec_max_rad)
    mm_vel = motion_model.dr_fallback_velocity(
        jnp.stack([ctl.value[..., 0], d_angle], axis=-1), cfg.dr_period,
        sam_cfg)
    lin_vel = jnp.where(dvl_ok[..., None], v, mm_vel)
    lin_vel = jnp.where(dvl.valid[..., None], lin_vel, 0.0)

    # position: cumsum of odom-frame steps; depth substituted directly
    R = jnp.vectorize(rotmat_from_rpy, signature="(e)->(i,j)")(rpy)
    step = jnp.einsum("...ij,...j->...i", R, lin_vel * cfg.dr_period)
    pos_xy = jnp.cumsum(step[..., 0:2], axis=-2)
    pos_z = jnp.where(depth.valid, depth.value[..., 0], 0.0)

    rpy_out = rpy.at[..., 2].set(wrap_angle(rpy[..., 2]))
    return jnp.concatenate(
        [pos_xy, pos_z[..., None], rpy_out, lin_vel], axis=-1)


def run_sam_dr(timeline: Timeline, cfg: DRConfig = DRConfig(),
               sam_cfg: SAMConfig = SAMConfig()) -> jnp.ndarray:
    """Replay a whole mission: -> (T, 9) [pose6, body_vel3] per tick."""

    def body(state, tick):
        return dr_step(cfg, sam_cfg, state, tick)

    _, out = jax.lax.scan(body, dr_init(), timeline)
    return out


def sam_timeline(mission, cfg: DRConfig = DRConfig()) -> Timeline:
    """Build the SAM DR tick timeline from a simulated/recorded mission."""
    s = mission.streams
    return build_timeline(
        t0=0.0,
        t1=mission.spec.duration_s,
        freq_hz=1.0 / cfg.dr_period,
        channels={
            "imu": (s["imu"]["stamps"], s["imu"]["values"]),
            "dvl": (s["dvl"]["stamps"], s["dvl"]["values"]),
            "depth": (s["depth"]["stamps"], s["depth"]["values"]),
            "control": (s["control"]["stamps"], s["control"]["values"]),
        },
    )


# ===========================================================================
# LoLo odometry provider (odom_provider)
# ===========================================================================

class OdomState(NamedTuple):
    cumul: jnp.ndarray      # (6,) accumulated odom pose
    t_prev: jnp.ndarray     # scalar
    kf: oned_kf.OneDKFState  # (3,) per-DVL-axis smoother


def odom_init(cfg: OdomProviderConfig, init_pose=None, dtype=jnp.float32) -> OdomState:
    """``init_pose``: starting 6-DOF pose — the reference initializes from
    the ground-truth topic once its queues fill (``odom_provider.cpp:
    261-284``); replays pass the first GT/GPS-derived pose."""
    cumul = jnp.zeros(6, dtype) if init_pose is None else jnp.asarray(init_pose, dtype)
    return OdomState(
        cumul=cumul,
        t_prev=jnp.asarray(0.0, dtype),
        kf=oned_kf.init(cfg.kf_mu0, cfg.kf_sigma0, like=jnp.zeros(3, dtype)),
    )


def odom_step(
    cfg: OdomProviderConfig,
    r_base_dvl: jnp.ndarray,   # (3,3) DVL->base extrinsic rotation
    state: OdomState,
    tick,
) -> Tuple[OdomState, jnp.ndarray]:
    """One 30 Hz odometry tick (``odom_provider.cpp:240-324``)."""
    imu = tick.channels["imu"]          # quat in odom frame
    dvlw = tick.windows["dvl"]          # last-W window
    t_now = tick.ticks

    # staleness: if newest DVL older than gate, Bézier-extrapolate the window
    # (odom_provider.cpp:291-295 -> 126-165)
    newest_stamp = dvlw.stamp[-1]
    stale = (t_now - newest_stamp) > cfg.dvl_stale_s
    v_interp = bezier.bezier_interpolate(dvlw.value, dvlw.stamp, t_now)
    v_raw = jnp.where(stale, v_interp, dvlw.value[-1])

    # scalar-KF smooth each axis (odom_provider.cpp:311-313)
    kf_next = oned_kf.step(state.kf, v_raw, cfg.kf_r, cfg.kf_q)
    v = kf_next.mu

    # body displacement -> odom frame (odom_provider.cpp:167-206)
    dt = jnp.maximum(t_now - state.t_prev, 0.0)
    disp_base = r_base_dvl @ (v * dt)
    q_auv = imu.value[0:4]
    rpy_t = rpy_from_quat(q_auv)
    disp_odom = rotmat_from_rpy(rpy_t) @ disp_base
    drpy = wrap_angle(rpy_t - state.cumul[3:6])

    u_t = jnp.concatenate([disp_odom, drpy])
    cumul = state.cumul + u_t
    cumul = cumul.at[3:6].set(wrap_angle(cumul[3:6]))

    new_state = OdomState(cumul=cumul, t_prev=t_now, kf=kf_next)
    return new_state, cumul


def run_odom_provider(
    timeline: Timeline,
    cfg: OdomProviderConfig = OdomProviderConfig(),
    r_base_dvl: jnp.ndarray | None = None,
    init_pose=None,
) -> jnp.ndarray:
    """Replay: -> (T, 6) accumulated odom pose per tick."""
    if r_base_dvl is None:
        r_base_dvl = jnp.eye(3)

    def body(state, tick):
        return odom_step(cfg, r_base_dvl, state, tick)

    _, out = jax.lax.scan(body, odom_init(cfg, init_pose), timeline)
    return out


def odom_timeline(mission, cfg: OdomProviderConfig = OdomProviderConfig()) -> Timeline:
    s = mission.streams
    return build_timeline(
        t0=0.0,
        t1=mission.spec.duration_s,
        freq_hz=cfg.system_freq,
        channels={"imu": (s["imu"]["stamps"], s["imu"]["values"])},
        windows={"dvl": (s["dvl"]["stamps"], s["dvl"]["values"], cfg.dvl_window)},
    )
