"""Online EKF-SLAM with MBES / FLS landmark detections.

TPU-native rebuild of ``auv_ekf_slam`` (SURVEY.md §2.1, call stack §3.2).
The reference grows its state vector with every confirmed landmark
(``conservativeResize``, ``ekf_utils.cpp:25-44``); data-dependent shapes
don't exist under XLA, so the state is a fixed-size *padded* bank of
``max_landmarks`` 3-DOF slots with an ``active`` mask — landmark "addition"
is a masked slot activation, and all correspondence math runs batched over
every slot with inactive rows masked out of the assignment.

Semantics preserved from the reference:

* ``predictMotion`` (``ekf_slam_core.cpp:41-121``): consumes *absolute*
  odometry — position becomes an increment u_t against the accumulated odom
  position, attitude is taken absolutely (so the orientation rows of G are
  zero and orientation covariance resets to R each tick); Σ̂ = GΣGᵀ + FᵀRF
  computed in block form (only 6 rows/cols of G differ from identity —
  O(L) instead of the dense O(L²) matmul).

* ``batchDataAssociation`` (``ekf_slam_core.cpp:184-346``): every detection
  back-projects to a new-landmark candidate; a (slots+candidates) ×
  detections Mahalanobis cost table is built from per-slot 9×9 marginals
  (pose + landmark block, ``ekf_utils.cpp:18-23``), χ²-gated to the outlier
  cost 10000, candidate rows carry the fixed ``mh_dist`` diagonal; a global
  optimal assignment picks matches (exact Jonker-Volgenant Hungarian on
  device inside jit; optionally the host scipy path for cross-checks).

* ``sequentialUpdate`` (``ekf_slam_core.cpp:351-371``): matches are applied
  in measurement order; H, S⁻¹ and ν come from the batch stage (computed at
  the pre-update μ̂ — reference behavior) while the 9×9 marginal Σ is
  re-gathered fresh per update; only the pose/landmark blocks of Σ are
  written back.

* sensor models: MBES z = T_base_map·lm (3-D, ``correspondence_obj_mbes.cpp:
  26-44``); FLS pixel measurement z = (400/17)·(‖P_xz(T_fls_map·lm)‖,
  −(T_fls_map·lm)_y) with polar back-projection (``correspondence_obj_fls.cpp:
  25-58``). Jacobians are ``jacfwd`` of these models — identical to the
  reference's hand-expanded chain h₂·R_fls_base·h₁.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import EKFSlamConfig
from ..ops import assignment
from ..ops.timeline import Timeline, build_timeline
from ..utils.geometry import Transform, rotmat_from_rpy, wrap_angle
from ..utils.linalg import chi2_quantile, inv_small


class SlamParams(NamedTuple):
    R: jnp.ndarray            # (6,6) motion noise
    Q_mbes: jnp.ndarray       # (3,3)
    Q_fls: jnp.ndarray        # (2,2)
    lambda_mbes: jnp.ndarray  # χ²(δ,3) gate
    lambda_fls: jnp.ndarray   # χ²(δ,2) gate
    r_fls_base: jnp.ndarray   # (3,3) base->fls rotation
    t_fls_base: jnp.ndarray   # (3,) base->fls translation


class SlamState(NamedTuple):
    mu: jnp.ndarray           # (6 + 3L,)
    Sigma: jnp.ndarray        # (6+3L, 6+3L)
    active: jnp.ndarray       # (L,) bool
    n_active: jnp.ndarray     # int32
    mu_auv_odom: jnp.ndarray  # (3,) accumulated odom position


def make_params(
    cfg: EKFSlamConfig = EKFSlamConfig(),
    tf_base_fls: Transform | None = None,
    dtype=jnp.float32,
) -> SlamParams:
    if tf_base_fls is None:
        tf_base_fls = Transform.identity(dtype)
    tf_fls_base = tf_base_fls.inverse()
    return SlamParams(
        R=jnp.diag(jnp.asarray(cfg.r_diag, dtype)),
        Q_mbes=jnp.diag(jnp.asarray(cfg.q_mbes_diag, dtype)),
        Q_fls=jnp.diag(jnp.asarray(cfg.q_fls_diag, dtype)),
        lambda_mbes=jnp.asarray(chi2_quantile(cfg.delta_outlier_reject, 3), dtype),
        lambda_fls=jnp.asarray(chi2_quantile(cfg.delta_outlier_reject, 2), dtype),
        r_fls_base=jnp.asarray(tf_fls_base.rot, dtype),
        t_fls_base=jnp.asarray(tf_fls_base.trans, dtype),
    )


def init_state(
    cfg: EKFSlamConfig = EKFSlamConfig(),
    mu0=None,
    beacons: np.ndarray | None = None,
    dtype=jnp.float32,
) -> SlamState:
    """Initial state; ``beacons`` pre-activates known-map landmark slots with
    the beacon prior covariance (``ekf_slam.cpp:141-175``)."""
    L = cfg.max_landmarks
    D = 6 + 3 * L
    mu = jnp.zeros(D, dtype)
    if mu0 is not None:
        mu = mu.at[0:6].set(jnp.asarray(mu0, dtype))
    Sigma = jnp.zeros((D, D), dtype)
    Sigma = Sigma.at[0:6, 0:6].set(jnp.diag(jnp.asarray(cfg.sigma0_diag, dtype)))
    active = jnp.zeros(L, bool)
    n = 0
    if beacons is not None and len(beacons):
        n = min(len(beacons), L)
        mu = mu.at[6 : 6 + 3 * n].set(
            jnp.asarray(np.asarray(beacons)[:n].reshape(-1), dtype)
        )
        bc = jnp.asarray(cfg.beacon_cov, dtype)
        for k in range(n):
            Sigma = Sigma.at[6 + 3 * k : 9 + 3 * k, 6 + 3 * k : 9 + 3 * k].set(jnp.diag(bc))
        active = active.at[:n].set(True)
    return SlamState(
        mu=mu,
        Sigma=Sigma,
        active=active,
        n_active=jnp.asarray(n, jnp.int32),
        mu_auv_odom=jnp.zeros(3, dtype),
    )


# ---------------------------------------------------------------------------
# motion predict
# ---------------------------------------------------------------------------

def predict(state: SlamState, odom_pose: jnp.ndarray, params: SlamParams) -> SlamState:
    """Consume one absolute odometry pose (``ekf_slam_core.cpp:41-121``)."""
    u_t = odom_pose[0:3] - state.mu_auv_odom
    mu = state.mu.at[0:3].add(u_t)
    mu = mu.at[3:6].set(wrap_angle(odom_pose[3:6]))

    g = jax.jacfwd(lambda a: rotmat_from_rpy(a) @ u_t)(mu[3:6])  # (3,3)
    # G = I except: G[0:3,3:6] = g, G[3:6,3:6] = 0 (absolute attitude)
    A = jnp.zeros((6, 6), mu.dtype)
    A = A.at[0:3, 0:3].set(jnp.eye(3, dtype=mu.dtype))
    A = A.at[0:3, 3:6].set(g)

    S = state.Sigma
    S11 = A @ S[0:6, 0:6] @ A.T + params.R
    S1L = A @ S[0:6, 6:]
    Sigma = S.at[0:6, 0:6].set(S11)
    Sigma = Sigma.at[0:6, 6:].set(S1L)
    Sigma = Sigma.at[6:, 0:6].set(S1L.T)
    return SlamState(
        mu=mu,
        Sigma=Sigma,
        active=state.active,
        n_active=state.n_active,
        mu_auv_odom=state.mu_auv_odom + u_t,
    )


# ---------------------------------------------------------------------------
# sensor models
# ---------------------------------------------------------------------------

def h_mbes(pose6: jnp.ndarray, lm: jnp.ndarray, params: SlamParams) -> jnp.ndarray:
    """Landmark in base frame (3,)."""
    return rotmat_from_rpy(pose6[3:6]).T @ (lm - pose6[0:3])


def backproject_mbes(z: jnp.ndarray, pose6: jnp.ndarray, params: SlamParams) -> jnp.ndarray:
    return rotmat_from_rpy(pose6[3:6]) @ z[0:3] + pose6[0:3]


def h_fls(pose6: jnp.ndarray, lm: jnp.ndarray, params: SlamParams) -> jnp.ndarray:
    """Pixel-space FLS measurement (2,): scaling·(‖(x,z)‖, −y) of the
    landmark in the FLS frame."""
    scale = 400.0 / 17.0
    v = params.r_fls_base @ h_mbes(pose6, lm, params) + params.t_fls_base
    rho = jnp.sqrt(v[0] ** 2 + v[2] ** 2 + 1e-12)
    return scale * jnp.stack([rho, -v[1]])


def backproject_fls(z: jnp.ndarray, pose6: jnp.ndarray, params: SlamParams) -> jnp.ndarray:
    """Pixels -> polar -> metres in FLS plane -> map frame
    (``correspondence_obj_fls.cpp:44-58``)."""
    scale_inv = 17.0 / 400.0
    x, y = z[0], -z[1]
    theta = jnp.arctan2(y, x)
    rho = scale_inv * jnp.sqrt(x * x + y * y)
    p_fls = jnp.stack([rho * jnp.cos(theta), rho * jnp.sin(theta), jnp.zeros_like(rho)])
    p_base = params.r_fls_base.T @ (p_fls - params.t_fls_base)
    return rotmat_from_rpy(pose6[3:6]) @ p_base + pose6[0:3]


# ---------------------------------------------------------------------------
# data association + sequential update (one sensor pass)
# ---------------------------------------------------------------------------

def _gather_idx9(slot: jnp.ndarray) -> jnp.ndarray:
    """State indices of the (pose, landmark slot) 9-marginal."""
    return jnp.concatenate([jnp.arange(6), 6 + 3 * slot + jnp.arange(3)])


def _gather9(Sigma: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    idx = _gather_idx9(slot)
    return Sigma[idx[:, None], idx[None, :]]


@dataclasses.dataclass(frozen=True)
class SensorSpec:
    """Static per-sensor dispatch (MBES / FLS)."""

    h: Callable          # (pose6, lm, params) -> (dim,)
    backproject: Callable
    dim: int
    q: Callable          # params -> (dim,dim)
    lam: Callable        # params -> scalar
    new_lm_cov: Tuple[float, ...]
    mh_dist: Callable    # cfg -> float


MBES = SensorSpec(
    h=h_mbes,
    backproject=backproject_mbes,
    dim=3,
    q=lambda p: p.Q_mbes,
    lam=lambda p: p.lambda_mbes,
    new_lm_cov=(100.0, 100.0, 100.0),
    mh_dist=lambda c: c.mhl_dist_mbes,
)

FLS = SensorSpec(
    h=h_fls,
    backproject=backproject_fls,
    dim=2,
    q=lambda p: p.Q_fls,
    lam=lambda p: p.lambda_fls,
    new_lm_cov=(400.0, 200.0, 1000.0),
    mh_dist=lambda c: c.mhl_dist_fls,
)


def da_stage(
    state: SlamState,
    z: jnp.ndarray,        # (M, 3) detections (FLS uses [:, :2])
    z_mask: jnp.ndarray,   # (M,)
    params: SlamParams,
    cfg: EKFSlamConfig,
    sensor: SensorSpec,
):
    """Pre-solver half of the DA pass: batch correspondence + candidates +
    the (L+M, M) cost table. Split out so a fleet can solve all missions'
    assignments in one in-lanes kernel (``ops.slam_da_kernels``)."""
    L = cfg.max_landmarks
    dim = sensor.dim
    mu, Sigma = state.mu, state.Sigma
    pose = mu[0:6]
    lm_all = mu[6:].reshape(L, 3)
    z_d = z[:, :dim]
    Q = sensor.q(params)
    lam = sensor.lam(params)
    f32 = mu.dtype

    # --- batch correspondence against every slot (h, H at pre-update μ̂) ----
    def corr(lm):
        zh = sensor.h(pose, lm, params)
        Hp = jax.jacfwd(lambda p6: sensor.h(p6, lm, params))(pose)   # (dim,6)
        Hl = jax.jacfwd(lambda l3: sensor.h(pose, l3, params))(lm)   # (dim,3)
        return zh, jnp.concatenate([Hp, Hl], axis=1)                  # (dim,9)

    z_hat, H = jax.vmap(corr)(lm_all)                                  # (L,dim),(L,dim,9)
    Spp = Sigma[0:6, 0:6]
    Spl = Sigma[0:6, 6:].reshape(6, L, 3).transpose(1, 0, 2)           # (L,6,3)
    Sll = jnp.einsum("iaib->iab", Sigma[6:, 6:].reshape(L, 3, L, 3))   # (L,3,3)
    Hp_, Hl_ = H[:, :, 0:6], H[:, :, 6:9]
    S = (
        jnp.einsum("ldi,ij,lej->lde", Hp_, Spp, Hp_)
        + jnp.einsum("ldi,lik,lek->lde", Hp_, Spl, Hl_)
        + jnp.einsum("ldk,lik,lei->lde", Hl_, Spl, Hp_)
        + jnp.einsum("ldi,lik,lek->lde", Hl_, Sll, Hl_)
        + Q
    )
    S_inv = inv_small(S)
    nu = z_d[None, :, :] - z_hat[:, None, :]                           # (L,M,dim)
    d_m = jnp.einsum("lmi,lij,lmj->lm", nu, S_inv, nu)                 # (L,M)

    cand = jax.vmap(lambda zi: sensor.backproject(zi, pose, params))(z)  # (M,3)

    def cand_corr(c, zi):
        zh = sensor.h(pose, c, params)
        Hp = jax.jacfwd(lambda p6: sensor.h(p6, c, params))(pose)
        Hl = jax.jacfwd(lambda l3: sensor.h(pose, l3, params))(c)
        Hc = jnp.concatenate([Hp, Hl], axis=1)
        Sig9c = jnp.zeros((9, 9), f32)
        Sig9c = Sig9c.at[0:6, 0:6].set(Sigma[0:6, 0:6])
        Sig9c = Sig9c.at[6:9, 6:9].set(jnp.diag(jnp.asarray(sensor.new_lm_cov, f32)))
        Sc = Hc @ Sig9c @ Hc.T + Q
        return Hc, inv_small(Sc), zi[:dim] - zh

    H_cand, S_inv_cand, nu_cand = jax.vmap(cand_corr)(cand, z)         # (M,...)

    M = z.shape[0]
    gate = (d_m < lam) & state.active[:, None] & z_mask[None, :]
    cost_known = jnp.where(gate, d_m, cfg.outlier_cost)                # (L,M)
    eye = jnp.eye(M, dtype=bool)
    cost_cand = jnp.where(eye, jnp.asarray(sensor.mh_dist(cfg), f32), cfg.outlier_cost)
    cost = jnp.concatenate([cost_known, cost_cand], axis=0)            # (L+M,M)

    staged = (H, S_inv, nu, cand, H_cand, S_inv_cand, nu_cand)
    return cost, staged


def data_associate_update(
    state: SlamState,
    z: jnp.ndarray,        # (M, 3) detections (FLS uses [:, :2])
    z_mask: jnp.ndarray,   # (M,)
    params: SlamParams,
    cfg: EKFSlamConfig,
    sensor: SensorSpec,
    solver: str = "device",
    update_mode: str = "auto",
) -> Tuple[SlamState, jnp.ndarray]:
    """One batch-DA + sequential-update pass. Returns (state, col_to_row).

    ``update_mode``:
      * ``"full"`` (default) — correct EKF-SLAM update: the Kalman gain spans
        the whole padded state, so pose↔landmark cross-covariances stay
        consistent and Σ stays PSD under dense detection bursts. This is
        also the TPU-friendly form (one (D,dim) gain matmul).
      * ``"marginal"`` — reference fidelity: only the 9×9 (pose, matched
        landmark) marginal is written back (``ekf_slam_core.cpp:351-371``),
        leaving other cross-covariances stale. Structurally inconsistent —
        Σ can go indefinite under aggressive tunings (observed: dense
        8-detection bursts with small Q); usable with the reference's own
        gentle tuning (Q_mbes=200, mhl_dist=0.12).
    """
    L = cfg.max_landmarks
    cost, staged = da_stage(state, z, z_mask, params, cfg, sensor)
    if solver == "device":
        col_to_row = assignment.hungarian(cost)
    else:
        col_to_row = assignment.hungarian_host(cost)
    return da_commit(state, col_to_row, staged, z, z_mask, params, cfg,
                     sensor, update_mode)


def da_commit(
    state: SlamState,
    col_to_row: jnp.ndarray,
    staged,
    z: jnp.ndarray,
    z_mask: jnp.ndarray,
    params: SlamParams,
    cfg: EKFSlamConfig,
    sensor: SensorSpec,
    update_mode: str = "auto",
) -> Tuple[SlamState, jnp.ndarray]:
    """Post-solver half of the DA pass: landmark adds + sequential update."""
    L = cfg.max_landmarks
    dim = sensor.dim
    if update_mode == "auto":
        # whole-loop Pallas kernel on TPU; dense jax path elsewhere
        update_mode = "pallas" if jax.default_backend() == "tpu" else "full"
    mu, Sigma = state.mu, state.Sigma
    M = z.shape[0]
    f32 = mu.dtype
    (H, S_inv, nu, cand, H_cand, S_inv_cand, nu_cand) = staged

    # --- sequential update in measurement order -----------------------------
    nu_known_per_obs = jnp.swapaxes(nu, 0, 1)                          # (M,L,dim)

    def upd2(carry, xs):
        mu, Sigma, active, n_active = carry
        r, valid, c_i, Hc_i, Sic_i, nuc_i, nu_row = xs
        is_new = r >= L
        r_clip = jnp.clip(r, 0, L - 1)
        can_add = is_new & (n_active < L)
        do = valid & (can_add | ~is_new)
        slot = jnp.where(is_new, n_active, r_clip)
        lm_ix = 6 + 3 * slot
        idx3 = lm_ix + jnp.arange(3)
        Dfull = Sigma.shape[0]

        add = do & is_new
        mu_add = jax.lax.dynamic_update_slice(mu, c_i.astype(f32), (lm_ix,))
        mu = jax.lax.select(add, mu_add, mu)
        Sigma_add = jax.lax.dynamic_update_slice(
            Sigma, jnp.zeros((3, Dfull), f32), (lm_ix, 0)
        )
        Sigma_add = jax.lax.dynamic_update_slice(
            Sigma_add, jnp.zeros((Dfull, 3), f32), (0, lm_ix)
        )
        Sigma_add = jax.lax.dynamic_update_slice(
            Sigma_add, jnp.diag(jnp.asarray(sensor.new_lm_cov, f32)), (lm_ix, lm_ix)
        )
        Sigma = jax.lax.select(add, Sigma_add, Sigma)
        active = jnp.where(add, active.at[slot].set(True), active)
        n_active = jnp.where(add, n_active + 1, n_active)

        H_i = jnp.where(is_new, Hc_i, H[r_clip])
        Sinv_i = jnp.where(is_new, Sic_i, S_inv[r_clip])
        nu_i = jnp.where(is_new, nuc_i, nu_row[r_clip])

        idx9 = _gather_idx9(slot)
        Sig9 = Sigma[idx9[:, None], idx9[None, :]]
        K = Sig9 @ H_i.T @ Sinv_i                                  # (9,dim)
        delta = K @ nu_i                                           # (9,)
        mu_new = mu.at[0:6].add(delta[0:6])
        mu_new = mu_new.at[3:6].set(wrap_angle(mu_new[3:6]))
        mu_new = jax.lax.dynamic_update_slice(
            mu_new,
            jax.lax.dynamic_slice(mu_new, (lm_ix,), (3,)) + delta[6:9],
            (lm_ix,),
        )
        Sig9_new = (jnp.eye(9, dtype=f32) - K @ H_i) @ Sig9
        Sigma_new = Sigma.at[idx9[:, None], idx9[None, :]].set(Sig9_new)

        mu = jax.lax.select(do, mu_new, mu)
        Sigma = jax.lax.select(do, Sigma_new, Sigma)
        return (mu, Sigma, active, n_active), jnp.where(do, slot, -1)

    def upd_lowrank(carry, xs):
        """Full-covariance sequential update with the Σ feedback carried as
        low-rank correction factors instead of the dense matrix.

        At update j the gain only needs the CURRENT Σ's nine (pose, slot)
        rows (Σ symmetric). With Σ_j = Σ_base − Σ_{k<j} U_kᵀ V_k
        (U_k = K_kᵀ, V_k = H_k Σ_j[idx9,:], both (dim, D)) those rows are a
        (M·dim)-rank correction of Σ0's rows — the scan carries ~40 KB
        instead of rewriting the dense (D, D) Σ eight times per tick.
        Everything is kept in (small, D) layout: trailing dims of 3/9 would
        lane-pad 9→128 on TPU and cost 14× the memory traffic. Landmark
        activations are recorded as (slot, diag) pairs: inactive slots'
        rows/columns are zero by invariant, so activation is an additive
        diagonal block. Algebraically identical to the in-place sequence
        (one final symmetrize instead of per-update)."""
        mu, Ut, Vt, act_slots, act_cov_on, active, n_active, j = carry
        r, valid, c_i, Hc_i, Sic_i, nuc_i, nu_row = xs
        is_new = r >= L
        r_clip = jnp.clip(r, 0, L - 1)
        can_add = is_new & (n_active < L)
        do = valid & (can_add | ~is_new)
        slot = jnp.where(is_new, n_active, r_clip)
        lm_ix = 6 + 3 * slot
        Dfull = mu.shape[0]

        add = do & is_new
        mu_add = jax.lax.dynamic_update_slice(mu, c_i.astype(f32), (lm_ix,))
        mu = jax.lax.select(add, mu_add, mu)
        act_slots = jnp.where(add, act_slots.at[j].set(slot), act_slots)
        act_cov_on = jnp.where(add, act_cov_on.at[j].set(True), act_cov_on)
        active = jnp.where(add, active.at[slot].set(True), active)
        n_active = jnp.where(add, n_active + 1, n_active)

        H_i = jnp.where(is_new, Hc_i, H[r_clip])           # (dim,9)
        Sinv_i = jnp.where(is_new, Sic_i, S_inv[r_clip])   # (dim,dim)
        nu_i = jnp.where(is_new, nuc_i, nu_row[r_clip])    # (dim,)

        # current Σ's (pose, slot) ROWS: base + activation − corrections
        rows = jnp.concatenate(
            [Sigma0_pose_rows, jax.lax.dynamic_slice(Sigma, (lm_ix, 0), (3, Dfull))],
            axis=0,
        )                                                  # (9,D)
        was_act = jnp.any(act_cov_on & (act_slots == slot))
        diag_blk = jnp.diag(jnp.asarray(sensor.new_lm_cov, f32)) * was_act
        rows = jax.lax.dynamic_update_slice(
            rows,
            jax.lax.dynamic_slice(rows, (6, lm_ix), (3, 3)) + diag_blk,
            (6, lm_ix),
        )
        # corrections: rows(idx9) of Σ_k U_kᵀV_k = (U_k cols idx9)ᵀ V_k
        U9 = jnp.concatenate(
            [Ut[:, :, 0:6], jax.lax.dynamic_slice(Ut, (0, 0, lm_ix), (M, dim, 3))],
            axis=2,
        )                                                  # (M,dim,9)
        rows = rows - jnp.einsum("kir,kid->rd", U9, Vt)

        Kt = (Sinv_i @ H_i) @ rows                         # (dim,D) = Kᵀ
        delta = nu_i @ Kt                                  # (D,)
        mu_new = mu + delta
        mu_new = mu_new.at[3:6].set(wrap_angle(mu_new[3:6]))
        mu = jax.lax.select(do, mu_new, mu)

        Vt_i = H_i @ rows                                  # (dim,D)
        Ut = jnp.where(do, Ut.at[j].set(Kt), Ut)
        Vt = jnp.where(do, Vt.at[j].set(Vt_i), Vt)
        return (mu, Ut, Vt, act_slots, act_cov_on, active, n_active, j + 1), jnp.where(
            do, slot, -1
        )

    def upd_dense(carry, xs):
        """Full-covariance update carrying the dense Σ (cheaper than the
        low-rank form below ~48 landmark slots, where Σ row rewrites are
        small compared with the fixed per-op cost of the correction chain)."""
        mu, Sigma, active, n_active = carry
        r, valid, c_i, Hc_i, Sic_i, nuc_i, nu_row = xs
        is_new = r >= L
        r_clip = jnp.clip(r, 0, L - 1)
        can_add = is_new & (n_active < L)
        do = valid & (can_add | ~is_new)
        slot = jnp.where(is_new, n_active, r_clip)
        lm_ix = 6 + 3 * slot
        Dfull = Sigma.shape[0]

        add = do & is_new
        mu_add = jax.lax.dynamic_update_slice(mu, c_i.astype(f32), (lm_ix,))
        mu = jax.lax.select(add, mu_add, mu)
        Sigma_add = jax.lax.dynamic_update_slice(
            Sigma, jnp.diag(jnp.asarray(sensor.new_lm_cov, f32)), (lm_ix, lm_ix)
        )  # inactive rows/cols are zero by invariant; diag set == add
        Sigma = jax.lax.select(add, Sigma_add, Sigma)
        active = jnp.where(add, active.at[slot].set(True), active)
        n_active = jnp.where(add, n_active + 1, n_active)

        H_i = jnp.where(is_new, Hc_i, H[r_clip])
        Sinv_i = jnp.where(is_new, Sic_i, S_inv[r_clip])
        nu_i = jnp.where(is_new, nuc_i, nu_row[r_clip])

        rows = jnp.concatenate(
            [Sigma[0:6, :], jax.lax.dynamic_slice(Sigma, (lm_ix, 0), (3, Dfull))],
            axis=0,
        )                                                          # (9,D)
        Kt = (Sinv_i @ H_i) @ rows                                 # (dim,D)
        delta = nu_i @ Kt
        mu_new = mu + delta
        mu_new = mu_new.at[3:6].set(wrap_angle(mu_new[3:6]))
        Vt_i = H_i @ rows                                          # (dim,D)
        Sigma_new = Sigma - Kt.T @ Vt_i
        Sigma_new = 0.5 * (Sigma_new + Sigma_new.T)

        mu = jax.lax.select(do, mu_new, mu)
        Sigma = jax.lax.select(do, Sigma_new, Sigma)
        return (mu, Sigma, active, n_active), jnp.where(do, slot, -1)

    if update_mode == "pallas":
        # whole-update-loop TPU kernel (ops.slam_kernels): slots/activations
        # precomputed vectorized-exactly (capacity denials are monotone:
        # once the bank is full it stays full, so the running-count check
        # reduces to an exclusive cumsum)
        from ..ops import slam_kernels

        is_new = col_to_row >= L
        r_clip = jnp.clip(col_to_row, 0, L - 1)
        adds = z_mask & is_new
        cum_excl = jnp.cumsum(adds) - adds.astype(jnp.int32)
        can_add = adds & (state.n_active + cum_excl < L)
        do = z_mask & (can_add | ~is_new)
        new_slot = state.n_active + jnp.cumsum(can_add) - can_add.astype(jnp.int32)
        slot = jnp.where(is_new, new_slot, r_clip)
        lm_ix = 6 + 3 * slot

        # candidate positions pre-written (their Σ rows are zero until the
        # in-kernel activation, so earlier updates cannot touch them)
        tgt = jnp.where(can_add[:, None], lm_ix[:, None] + jnp.arange(3), mu.shape[0])
        mu = mu.at[tgt.reshape(-1)].set(
            cand.astype(f32).reshape(-1), mode="drop"
        )
        active = state.active.at[jnp.where(can_add, slot, L)].set(True, mode="drop")
        n_active = state.n_active + jnp.sum(can_add)

        obs_ar = jnp.arange(M)
        H_sel = jnp.where(is_new[:, None, None], H_cand, H[r_clip])
        Sinv_sel = jnp.where(is_new[:, None, None], S_inv_cand, S_inv[r_clip])
        nu_sel = jnp.where(is_new[:, None], nu_cand, nu[r_clip, obs_ar])
        SinvH = jnp.einsum("mij,mjk->mik", Sinv_sel, H_sel)

        Sigma, mu = slam_kernels.sequential_update(
            Sigma, mu, H_sel, SinvH, nu_sel, lm_ix, do, can_add,
            jnp.asarray(sensor.new_lm_cov, f32),
        )
        matched = jnp.where(do, slot, -1)
        new_state = SlamState(
            mu=mu, Sigma=Sigma, active=active, n_active=n_active,
            mu_auv_odom=state.mu_auv_odom,
        )
        return new_state, matched

    xs = (col_to_row, z_mask, cand, H_cand, S_inv_cand, nu_cand, nu_known_per_obs)
    if update_mode == "marginal":
        carry0 = (mu, Sigma, state.active, state.n_active)
        (mu, Sigma, active, n_active), matched = jax.lax.scan(upd2, carry0, xs)
    elif L <= 48:
        carry0 = (mu, Sigma, state.active, state.n_active)
        (mu, Sigma, active, n_active), matched = jax.lax.scan(upd_dense, carry0, xs)
    else:
        D = mu.shape[0]
        Sigma0_pose_rows = Sigma[0:6, :]
        carry0 = (
            mu,
            jnp.zeros((M, dim, D), f32),
            jnp.zeros((M, dim, D), f32),
            jnp.full(M, -1, jnp.int32),
            jnp.zeros(M, bool),
            state.active,
            state.n_active,
            jnp.asarray(0, jnp.int32),
        )
        (mu, Ut, Vt, act_slots, act_cov_on, active, n_active, _), matched = jax.lax.scan(
            upd_lowrank, carry0, xs
        )
        # reconstruct Σ once: activations (additive diag blocks on zero
        # rows/cols) then the rank-(M·dim) correction, then symmetrize
        def apply_act(k, Sg):
            lm_ix = 6 + 3 * jnp.clip(act_slots[k], 0, L - 1)
            blk = jax.lax.dynamic_slice(Sg, (lm_ix, lm_ix), (3, 3)) + jnp.diag(
                jnp.asarray(sensor.new_lm_cov, f32)
            ) * act_cov_on[k]
            return jax.lax.dynamic_update_slice(Sg, blk, (lm_ix, lm_ix))

        Sigma = jax.lax.fori_loop(0, M, apply_act, Sigma)
        Sigma = Sigma - jnp.einsum("kid,kie->de", Ut, Vt)
        Sigma = 0.5 * (Sigma + Sigma.T)

    new_state = SlamState(
        mu=mu, Sigma=Sigma, active=active, n_active=n_active,
        mu_auv_odom=state.mu_auv_odom,
    )
    return new_state, matched


# ---------------------------------------------------------------------------
# full tick + replay
# ---------------------------------------------------------------------------

def step(
    cfg: EKFSlamConfig,
    params: SlamParams,
    state: SlamState,
    tick,
    solver: str = "device",
    update_mode: str = "auto",
):
    """One SLAM tick (``ekf_slam.cpp:296-350``): consume latest odometry,
    then run a DA pass per sensor whose burst is non-empty."""
    odom = tick.channels["odom"]
    # accept either a 6-dim pose track or the 13-dim nav_msgs-style layout
    # [pos3, quat4, linvel3, angvel3] (static shape dispatch)
    if odom.value.shape[-1] >= 13:
        from ..utils.geometry import rpy_from_quat

        odom_pose = jnp.concatenate(
            [odom.value[0:3], rpy_from_quat(odom.value[3:7])]
        )
    else:
        odom_pose = odom.value[0:6]
    pred = predict(state, odom_pose, params)

    def run_pass(st, ev, sensor):
        def do_pass(s):
            s2, m = data_associate_update(
                s, ev.value, ev.mask, params, cfg, sensor, solver, update_mode
            )
            return s2, m

        def skip(s):
            return s, jnp.full(ev.mask.shape, -1, jnp.int32)

        return jax.lax.cond(jnp.any(ev.mask), do_pass, skip, st)

    st = pred
    matched_mbes = matched_fls = None
    if "mbes" in tick.events:
        st, matched_mbes = run_pass(st, tick.events["mbes"], MBES)
    if "fls" in tick.events:
        st, matched_fls = run_pass(st, tick.events["fls"], FLS)

    # gate: without odometry the reference rebroadcasts the last pose
    st = jax.tree_util.tree_map(
        lambda new, old: jnp.where(odom.valid, new, old), st, state
    )
    out = {
        "mu": st.mu[0:6],
        "sigma_diag6": jnp.diagonal(st.Sigma[0:6, 0:6]),
        "n_active": st.n_active,
    }
    if matched_mbes is not None:
        out["matched_mbes"] = matched_mbes
    if matched_fls is not None:
        out["matched_fls"] = matched_fls
    return st, out


def run(
    timeline: Timeline,
    params: SlamParams,
    cfg: EKFSlamConfig = EKFSlamConfig(),
    state0: SlamState | None = None,
    solver: str = "device",
    update_mode: str = "auto",
):
    s0 = init_state(cfg) if state0 is None else state0

    def body(state, tick):
        return step(cfg, params, state, tick, solver, update_mode)

    return jax.lax.scan(body, s0, timeline)


def initial_band(Sigma0: jnp.ndarray, L: int) -> jnp.ndarray:
    """(24, L) landmark block-diag band of an initial covariance — the
    carry seed for the fleet update kernel's in-kernel band maintenance
    (row a*8+d holds Σ[6+3l+a, 6+3l+a+d]; rows with a+d > 2 are never
    consumed, their clamped reads only keep indices in range). NOT always
    zero: beacon-prior states carry diag(20,10,10) landmark blocks
    (``ekf_slam.cpp:168-173``)."""
    D = Sigma0.shape[0]
    la = 6 + 3 * jnp.arange(L)
    band = jnp.zeros((24, L), Sigma0.dtype)
    for a in range(3):
        for d in range(3):
            band = band.at[a * 8 + d].set(
                Sigma0[la + a, jnp.minimum(la + a + d, D - 1)])
    return band


def da_lanes_pass(state_b: SlamState, z_b, mask_b, params: SlamParams,
                  cfg: EKFSlamConfig, sensor: SensorSpec = None,
                  a8=None, valid=None, band=None):
    """Fleet DA pass (MBES or FLS): in-lanes DA kernel + fleet update
    kernel. state_b is a batched SlamState; z_b (B, M, 3), mask_b (B, M).

    With ``a8``/``valid`` given (see ``_fleet_predict``), state_b.Sigma is
    the RAW (pre-predict) covariance and both kernels apply the motion
    predict to what they read — Σ is never written by an XLA op.

    With ``band`` (B, 24, L) given, the DA kernel's Σ landmark block-diag
    slab is built from the carried band instead of gathered from the full
    Σ, and the update kernel maintains the band; the return gains a third
    element (the updated band)."""
    from ..ops import slam_da_kernels

    sensor = MBES if sensor is None else sensor
    B = state_b.mu.shape[0]
    L = cfg.max_landmarks
    if sensor.dim == 2:
        kind, r_sb, t_sb = "fls", params.r_fls_base, params.t_fls_base
    else:
        kind, r_sb, t_sb = "mbes", None, None
    A = a8[:, 0:6, 0:6] if a8 is not None else None
    r_full = a8[:, 0:6, 8:14] if a8 is not None else None
    ctr, H_sel, SinvH, nu_sel, cand, do, add, slot = slam_da_kernels.da_lanes(
        state_b.mu[:, 0:6], state_b.n_active, state_b.active,
        state_b.mu[:, 6:].reshape(B, L, 3), state_b.Sigma,
        z_b[:, :, 0:3], mask_b,
        jnp.diagonal(sensor.q(params)), sensor.lam(params),
        cfg.outlier_cost, sensor.mh_dist(cfg), jnp.asarray(sensor.new_lm_cov),
        sensor=kind, r_sb=r_sb, t_sb=t_sb,
        A=A, valid=valid, r_full=r_full, band=band,
    )
    from ..ops import slam_kernels

    f32 = state_b.mu.dtype
    lm_ix = 6 + 3 * slot                                        # (B, M)
    # slim bookkeeping (active mask + count), then ONE fleet update kernel
    # call — vmapping the per-mission kernel serializes one dependency
    # chain per grid step; the fleet kernel interleaves MB missions per
    # step, and new-landmark μ-init rides the kernel's δμ matvec (cand)
    active = jax.vmap(lambda a, ad, sl: a.at[jnp.where(ad, sl, L)].set(
        True, mode="drop"))(state_b.active, add, slot)
    n_active = state_b.n_active + jnp.sum(add, axis=1)
    upd = slam_kernels.sequential_update_fleet(
        state_b.Sigma, state_b.mu, H_sel, SinvH, nu_sel, lm_ix, do, add,
        jnp.asarray(sensor.new_lm_cov, f32), cand, a8, band)
    Sigma, mu_b = upd[0], upd[1]
    matched = jnp.where(do, slot, -1)
    new_state = SlamState(mu=mu_b, Sigma=Sigma, active=active,
                          n_active=n_active, mu_auv_odom=state_b.mu_auv_odom)
    if band is not None:
        return new_state, matched, upd[2]
    return new_state, matched


def _fleet_predict(state_b: SlamState, odom_pose: jnp.ndarray,
                   valid: jnp.ndarray, params: SlamParams,
                   sigma_in_xla: bool = False):
    """Batched ``predict`` with the odom-validity gate folded into the
    inputs: valid=False gives a bit-exact no-op (u_t=0 -> g=0, A forced to
    the exact identity so A Σ Aᵀ reproduces Σ bitwise, R gated to zero,
    attitude kept).

    Returns ``(state, a8)``. By default Σ is left UNTOUCHED and the
    identity-gated motion Jacobian is returned as the packed a8 (B,8,16)
    block (cols 0:8 = blockdiag(A6, I2), cols 8:16 = the full 6×6 R̃·valid
    noise block) for the DA/update kernels to apply in VMEM — XLA-side
    full-Σ slab writes measured 400+ us/tick of whole-Σ copies on the
    fleet carry (docs/ROOFLINE.md), and even small (B,8,16)
    dynamic-update-slices cost ~13-26 us each, so a8 is built with one pad
    + one where. With ``sigma_in_xla=True`` (no event pass this tick to
    carry the transform), Σ is predicted here and a8 comes back None."""
    dt = state_b.mu.dtype
    v1 = valid.astype(dt)[:, None]
    u_t = (odom_pose[:, 0:3] - state_b.mu_auv_odom) * v1
    att = jnp.where(valid[:, None], wrap_angle(odom_pose[:, 3:6]),
                    state_b.mu[:, 3:6])
    mu = state_b.mu.at[:, 0:3].add(u_t)
    mu = mu.at[:, 3:6].set(att)

    g = jax.vmap(lambda a, u: jax.jacfwd(
        lambda x: rotmat_from_rpy(x) @ u)(a))(att, u_t)          # (B,3,3)
    # constants (folded at compile): C1 = identity pattern + full R block
    # at cols 8:14, C2 = the exact 8-identity for invalid-odom lanes
    c1 = jnp.zeros((8, 16), dt)
    c1 = c1.at[jnp.arange(3), jnp.arange(3)].set(1.0)
    c1 = c1.at[jnp.arange(6, 8), jnp.arange(6, 8)].set(1.0)
    c1 = c1.at[0:6, 8:14].set(params.R.astype(dt))
    c2 = jnp.zeros((8, 16), dt).at[jnp.arange(8), jnp.arange(8)].set(1.0)
    a8 = jnp.where(valid[:, None, None],
                   jnp.pad(g, ((0, 0), (0, 5), (3, 10))) + c1, c2)

    Sigma = state_b.Sigma
    if sigma_in_xla:
        S = state_b.Sigma
        A = a8[:, 0:6, 0:6]
        S11 = (jnp.einsum("bij,bjk,blk->bil", A, S[:, 0:6, 0:6], A)
               + params.R * v1[:, :, None])
        S1L = jnp.einsum("bij,bjk->bik", A, S[:, 0:6, 6:])
        Sigma = S.at[:, 0:6, 0:6].set(S11)
        Sigma = Sigma.at[:, 0:6, 6:].set(S1L)
        Sigma = Sigma.at[:, 6:, 0:6].set(jnp.swapaxes(S1L, 1, 2))
        a8 = None
    return SlamState(
        mu=mu, Sigma=Sigma, active=state_b.active,
        n_active=state_b.n_active,
        mu_auv_odom=state_b.mu_auv_odom + u_t,
    ), a8


def run_fleet(
    batched_timeline: Timeline,
    params: SlamParams,
    cfg: EKFSlamConfig = EKFSlamConfig(),
    update_mode: str = "auto",
    device_mesh=None,
):
    """Fleet replay with the assignment solved for ALL missions in one
    in-lanes Mosaic JV kernel (``ops.slam_da_kernels.hungarian_lanes``).

    The vmapped per-mission JV while_loop costs ~1.1 ms of the ~3.3 ms
    fleet tick (per-op dispatch overhead — docs/ROOFLINE.md); splitting the
    DA pass around the solver lets the fleet batch it. Semantics are
    identical to ``jax.vmap(run)``: the staging and commit halves are the
    same functions, and the lanes JV computes the same optimum (pinned by
    tests against scipy and the dense path). Both MBES and FLS passes run
    through the whole-DA lanes kernel (``da_lanes`` with the matching
    sensor factory).

    ``device_mesh``: missions shard over the mesh's ``mission`` axis with
    one ``shard_map`` around the WHOLE kernel scan — every shard runs the
    same single-device lanes kernels on its local missions (independent
    filters, zero collectives), so multi-chip fleets keep kernel speed
    instead of falling back to the vmapped GSPMD path (round-3 verdict
    #4). Per-mission outputs are bitwise the unsharded fleet's (asserted
    by the dryrun)."""
    if device_mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import MISSION_AXIS

        M = device_mesh.shape[MISSION_AXIS]
        B = batched_timeline.ticks.shape[0]
        if B % M:
            raise ValueError(f"fleet size {B} not divisible by mission axis {M}")

        def local(tl, prm):
            final, out = run_fleet(tl, prm, cfg, update_mode)
            # batch-major outputs so one P(MISSION_AXIS) prefix spec covers
            # every leaf (the scan stacks time-major)
            return final, jax.tree_util.tree_map(
                lambda x: jnp.moveaxis(x, 0, 1), out)

        fn = shard_map(
            local, mesh=device_mesh,
            in_specs=(P(MISSION_AXIS), P()),
            out_specs=(P(MISSION_AXIS), P(MISSION_AXIS)),
            check_vma=False,
        )
        final, out_bm = fn(batched_timeline, params)
        return final, jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 0, 1), out_bm)

    if update_mode == "marginal":
        # r05: reference-semantics marginal writeback has its own kernel
        # fleet (pose rows + band carry, no (D,D) state anywhere) — the
        # vmapped dense path remains reachable as "marginal_dense"
        return run_fleet_marginal(batched_timeline, params, cfg)
    if update_mode == "marginal_dense":
        update_mode = "marginal"
    if update_mode not in ("auto", "full"):
        # non-default covariance writeback (marginal_dense/lowrank/pallas):
        # the fleet update kernel implements exactly the "full" sequence,
        # so honor the request through the vmapped per-mission path instead
        # of silently substituting full-update semantics
        final, out = jax.vmap(
            lambda tl: run(tl, params, cfg, update_mode=update_mode)
        )(batched_timeline)
        return final, jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 0, 1), out)

    tl_t = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, 1), batched_timeline)
    B = batched_timeline.ticks.shape[0]
    L = cfg.max_landmarks
    s0 = init_state(cfg)
    s0_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    # landmark block-diag band carry (see slam_kernels.sequential_update_
    # fleet): built once from Σ0 here, then maintained in-kernel — the DA
    # stage never gathers the block diagonal from the full Σ again
    band0_b = jnp.broadcast_to(initial_band(s0.Sigma, L), (B, 24, L))

    def body(carry, tick_b):
        state_b, band = carry
        odom = tick_b.channels["odom"]
        if odom.value.shape[-1] >= 13:
            from ..utils.geometry import rpy_from_quat

            odom_pose = jnp.concatenate(
                [odom.value[:, 0:3], jax.vmap(rpy_from_quat)(odom.value[:, 3:7])],
                axis=1)
        else:
            odom_pose = odom.value[:, 0:6]
        # input-side rebroadcast gate: an invalid-odom mission's tick is a
        # bit-exact no-op (zero increment, identity A, gated noise, masked
        # measurements) — no full-Σ where and no lax.cond state copies.
        # The predict's Σ transform rides the FIRST event pass's kernels
        # (A below); Σ is never written by an XLA op on this path.
        have_events = ("mbes" in tick_b.events) or ("fls" in tick_b.events)
        st, a8 = _fleet_predict(state_b, odom_pose, odom.valid, params,
                                sigma_in_xla=not have_events)

        out = {}
        if "mbes" in tick_b.events:
            ev = tick_b.events["mbes"]
            st, matched, band = da_lanes_pass(
                st, ev.value, ev.mask & odom.valid[:, None], params, cfg,
                a8=a8, valid=odom.valid, band=band)
            a8 = None
            out["matched_mbes"] = matched
        if "fls" in tick_b.events:
            evf = tick_b.events["fls"]
            st, matched_f, band = da_lanes_pass(
                st, evf.value, evf.mask & odom.valid[:, None], params, cfg,
                FLS, a8=a8, valid=odom.valid if a8 is not None else None,
                band=band)
            a8 = None
            out["matched_fls"] = matched_f

        out["mu"] = st.mu[:, 0:6]
        out["n_active"] = st.n_active
        return (st, band), out

    (final, _band), out = jax.lax.scan(body, (s0_b, band0_b), tl_t)
    return final, out


# ---------------------------------------------------------------------------
# marginal-writeback kernel fleet (r05): reference covariance semantics
# ---------------------------------------------------------------------------

class MarginalFleetState(NamedTuple):
    """Fleet carry of the marginal-semantics path: under the reference's
    own update (``ekf_slam_core.cpp:351-371``) cross-landmark covariance
    blocks stay exactly zero forever, so pose rows + the landmark
    block-diag band ARE the complete covariance."""
    mu: jnp.ndarray           # (B, D)
    rows: jnp.ndarray         # (B, 8, D) Σ[0:6, :] (rows 6:8 zero)
    band: jnp.ndarray         # (B, 24, L)
    active: jnp.ndarray       # (B, L) bool
    n_active: jnp.ndarray     # (B,) int32
    mu_auv_odom: jnp.ndarray  # (B, 3)


def sigma_from_rows_band(rows: jnp.ndarray, band: jnp.ndarray,
                         L: int) -> jnp.ndarray:
    """Reconstruct the full (B, D, D) covariance of a marginal-mode fleet:
    pose rows + transposed pose columns + landmark block-diag; every
    cross-landmark block is zero by the marginal-semantics invariant."""
    B, _, D = rows.shape
    pr = rows[:, 0:6, :]
    Sig = jnp.zeros((B, D, D), rows.dtype)
    Sig = Sig.at[:, :, 0:6].set(jnp.swapaxes(pr, 1, 2))
    Sig = Sig.at[:, 0:6, :].set(pr)
    la = 6 + 3 * jnp.arange(L)
    for a in range(3):
        for d in range(3):
            if a + d >= 3:
                continue
            Sig = Sig.at[:, la + a, la + a + d].set(band[:, a * 8 + d, :])
            if d:
                Sig = Sig.at[:, la + a + d, la + a].set(band[:, a * 8 + d, :])
    return Sig


def _fleet_predict_marginal(ms: MarginalFleetState, odom_pose, valid,
                            params: SlamParams, rows_in_xla: bool):
    """``_fleet_predict`` for the marginal carry: μ/odom bookkeeping is
    identical; the covariance transform touches only the pose rows
    (Σ'[0:6, 6:] = A Σ[0:6, 6:], Σ'66 = A Σ66 Aᵀ + R̃ — landmark blocks are
    untouched by the motion predict, ``ekf_slam_core.cpp:110-118``).
    With ``rows_in_xla=False`` the transform rides the DA/update kernels
    via the returned a8 block and rows come back untouched."""
    dt = ms.mu.dtype
    v1 = valid.astype(dt)[:, None]
    u_t = (odom_pose[:, 0:3] - ms.mu_auv_odom) * v1
    att = jnp.where(valid[:, None], wrap_angle(odom_pose[:, 3:6]),
                    ms.mu[:, 3:6])
    mu = ms.mu.at[:, 0:3].add(u_t)
    mu = mu.at[:, 3:6].set(att)

    g = jax.vmap(lambda a, u: jax.jacfwd(
        lambda x: rotmat_from_rpy(x) @ u)(a))(att, u_t)          # (B,3,3)
    c1 = jnp.zeros((8, 16), dt)
    c1 = c1.at[jnp.arange(3), jnp.arange(3)].set(1.0)
    c1 = c1.at[jnp.arange(6, 8), jnp.arange(6, 8)].set(1.0)
    c1 = c1.at[0:6, 8:14].set(params.R.astype(dt))
    c2 = jnp.zeros((8, 16), dt).at[jnp.arange(8), jnp.arange(8)].set(1.0)
    a8 = jnp.where(valid[:, None, None],
                   jnp.pad(g, ((0, 0), (0, 5), (3, 10))) + c1, c2)

    rows = ms.rows
    if rows_in_xla:
        A8 = a8[:, :, 0:8]                                       # (B,8,8)
        r88 = a8[:, :, 8:16]
        P1 = jnp.einsum("bij,bjd->bid", A8, rows)
        t2 = jnp.einsum("bij,bjk,blk->bil", A8, rows[:, :, 0:8], A8) + r88
        rows = _rows_block_fix(P1, t2)
        a8 = None
    return ms._replace(mu=mu, rows=rows,
                       mu_auv_odom=ms.mu_auv_odom + u_t), a8


def _rows_block_fix(P1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """Place the (B,8,8) predicted pose block into lanes 0:6 of the
    left-multiplied rows (lanes >= 6 keep A·Σ[0:6, 6:])."""
    D = P1.shape[2]
    lane = jnp.arange(D)[None, None, :]
    t2p = jnp.pad(t2, ((0, 0), (0, 0), (0, D - 8)))
    return jnp.where(lane < 6, t2p, P1)


def da_lanes_pass_marginal(ms: MarginalFleetState, z_b, mask_b,
                           params: SlamParams, cfg: EKFSlamConfig,
                           sensor: SensorSpec = None, a8=None, valid=None):
    """Fleet DA pass on the marginal carry: the DA kernel reads its
    spp/spl slabs from the pose rows and sll from the band (its own inputs
    all along); the update is the marginal kernel
    (``slam_kernels.sequential_update_marginal_fleet``)."""
    from ..ops import slam_da_kernels, slam_kernels

    sensor = MBES if sensor is None else sensor
    B = ms.mu.shape[0]
    L = cfg.max_landmarks
    if sensor.dim == 2:
        kind, r_sb, t_sb = "fls", params.r_fls_base, params.t_fls_base
    else:
        kind, r_sb, t_sb = "mbes", None, None
    A = a8[:, 0:6, 0:6] if a8 is not None else None
    r_full = a8[:, 0:6, 8:14] if a8 is not None else None
    ctr, H_sel, SinvH, nu_sel, cand, do, add, slot = slam_da_kernels.da_lanes(
        ms.mu[:, 0:6], ms.n_active, ms.active,
        ms.mu[:, 6:].reshape(B, L, 3), None,
        z_b[:, :, 0:3], mask_b,
        jnp.diagonal(sensor.q(params)), sensor.lam(params),
        cfg.outlier_cost, sensor.mh_dist(cfg), jnp.asarray(sensor.new_lm_cov),
        sensor=kind, r_sb=r_sb, t_sb=t_sb,
        A=A, valid=valid, r_full=r_full, band=ms.band, pose_rows=ms.rows,
    )
    lm_ix = 6 + 3 * slot
    active = jax.vmap(lambda a, ad, sl: a.at[jnp.where(ad, sl, L)].set(
        True, mode="drop"))(ms.active, add, slot)
    n_active = ms.n_active + jnp.sum(add, axis=1)
    f32 = ms.mu.dtype
    rows_n, mu_b, band_n = slam_kernels.sequential_update_marginal_fleet(
        ms.rows, ms.mu, H_sel, SinvH, nu_sel, lm_ix, do, add,
        jnp.asarray(sensor.new_lm_cov, f32), cand, ms.band, a8)
    matched = jnp.where(do, slot, -1)
    return ms._replace(mu=mu_b, rows=rows_n, band=band_n, active=active,
                       n_active=n_active), matched


def run_fleet_marginal(
    batched_timeline: Timeline,
    params: SlamParams,
    cfg: EKFSlamConfig = EKFSlamConfig(),
):
    """Fleet replay under the reference's MARGINAL covariance semantics
    (``run_fleet`` counterpart of ``run(update_mode="marginal")``): the
    carry is pose rows + band — nothing (D, D)-shaped exists anywhere in
    the scan, which removes the Σ-stream wall that dominates the
    full-update kernel at L=256 (D=774: ~2.4 MB/mission/tick of Σ DMA).
    Returns (final SlamState with the covariance RECONSTRUCTED once at the
    end, out dict) — association decisions are pinned against the dense
    marginal path by tests/test_slam_marginal.py."""
    tl_t = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, 1), batched_timeline)
    B = batched_timeline.ticks.shape[0]
    L = cfg.max_landmarks
    s0 = init_state(cfg)
    D = s0.mu.shape[0]
    rows0 = jnp.zeros((8, D), s0.Sigma.dtype).at[0:6, :].set(s0.Sigma[0:6, :])
    ms0 = MarginalFleetState(
        mu=jnp.broadcast_to(s0.mu, (B, D)),
        rows=jnp.broadcast_to(rows0, (B, 8, D)),
        band=jnp.broadcast_to(initial_band(s0.Sigma, L), (B, 24, L)),
        active=jnp.broadcast_to(s0.active, (B, L)),
        n_active=jnp.broadcast_to(s0.n_active, (B,)),
        mu_auv_odom=jnp.broadcast_to(s0.mu_auv_odom, (B, 3)),
    )

    def body(ms, tick_b):
        odom = tick_b.channels["odom"]
        if odom.value.shape[-1] >= 13:
            from ..utils.geometry import rpy_from_quat

            odom_pose = jnp.concatenate(
                [odom.value[:, 0:3],
                 jax.vmap(rpy_from_quat)(odom.value[:, 3:7])], axis=1)
        else:
            odom_pose = odom.value[:, 0:6]
        have_events = ("mbes" in tick_b.events) or ("fls" in tick_b.events)
        ms, a8 = _fleet_predict_marginal(ms, odom_pose, odom.valid, params,
                                         rows_in_xla=not have_events)

        out = {}
        if "mbes" in tick_b.events:
            ev = tick_b.events["mbes"]
            ms, matched = da_lanes_pass_marginal(
                ms, ev.value, ev.mask & odom.valid[:, None], params, cfg,
                a8=a8, valid=odom.valid)
            a8 = None
            out["matched_mbes"] = matched
        if "fls" in tick_b.events:
            evf = tick_b.events["fls"]
            ms, matched_f = da_lanes_pass_marginal(
                ms, evf.value, evf.mask & odom.valid[:, None], params, cfg,
                FLS, a8=a8,
                valid=odom.valid if a8 is not None else None)
            a8 = None
            out["matched_fls"] = matched_f

        out["mu"] = ms.mu[:, 0:6]
        out["n_active"] = ms.n_active
        return ms, out

    final_ms, out = jax.lax.scan(body, ms0, tl_t)
    final = SlamState(
        mu=final_ms.mu,
        Sigma=sigma_from_rows_band(final_ms.rows, final_ms.band, L),
        active=final_ms.active, n_active=final_ms.n_active,
        mu_auv_odom=final_ms.mu_auv_odom)
    return final, out


def _rfc_core(tl, params, e_idx, seg_of, ev_any, cfg, names):
    """Jitted core of ``run_fleet_compact`` (E, T static per timeline shape)."""
    from ..utils.geometry import rpy_from_quat

    od = tl.channels["odom"]
    B, T = od.valid.shape
    dt = jnp.float32
    pos = od.value[..., 0:3].astype(dt)
    if od.value.shape[-1] >= 13:
        att = wrap_angle(
            jax.vmap(jax.vmap(rpy_from_quat))(od.value[..., 3:7])).astype(dt)
    else:
        att = wrap_angle(od.value[..., 3:6]).astype(dt)
    # per-tick odometric increments (all ticks valid — caller precondition)
    u = pos - jnp.concatenate([jnp.zeros((B, 1, 3), dt), pos[:, :-1]], axis=1)
    U_cum = jnp.cumsum(u, axis=1)

    g = jax.vmap(jax.vmap(
        lambda a, uu: jax.jacfwd(lambda x: rotmat_from_rpy(x) @ uu)(a)))(att, u)
    A = jnp.zeros((B, T, 6, 6), dt)
    A = A.at[..., 0:3, 0:3].set(jnp.eye(3, dtype=dt))
    A = A.at[..., 0:3, 3:6].set(g)
    R = jnp.broadcast_to(params.R.astype(dt), (B, T, 6, 6))

    # segmented composition under the affine-covariance monoid:
    # (A2,R2)∘(A1,R1) = (A2 A1, A2 R1 A2ᵀ + R2); a set reset flag on the
    # LATER element starts a fresh segment (segment boundaries sit just
    # after each event tick), so prefix[t] = composition since last event
    def comb(x, y):
        Ax, Rx, rx = x
        Ay, Ry, ry = y
        Ac = jnp.einsum("...ij,...jk->...ik", Ay, Ax)
        Rc = jnp.einsum("...ij,...jk,...lk->...il", Ay, Rx, Ay) + Ry
        m = ry[..., None, None]
        return jnp.where(m, Ay, Ac), jnp.where(m, Ry, Rc), rx | ry

    reset = jnp.concatenate(
        [jnp.ones((1,), bool), ev_any[:-1]])           # (T,)
    rst = jnp.broadcast_to(reset[None, :], (B, T))
    A_seg, R_seg, _ = jax.lax.associative_scan(comb, (A, R, rst), axis=1)

    E = e_idx.shape[0]
    Ae = jnp.take(A_seg, e_idx, axis=1)                 # (B, E, 6, 6)
    Re = jnp.take(R_seg, e_idx, axis=1)
    Ue = jnp.take(U_cum, e_idx, axis=1)                 # (B, E, 3)
    u_seg = Ue - jnp.concatenate(
        [jnp.zeros((B, 1, 3), dt), Ue[:, :-1]], axis=1)
    att_e = jnp.take(att, e_idx, axis=1)

    a8e = jnp.zeros((B, E, 8, 16), dt)
    a8e = a8e.at[..., 0:6, 0:6].set(Ae)
    a8e = a8e.at[..., 6, 6].set(1.0)
    a8e = a8e.at[..., 7, 7].set(1.0)
    a8e = a8e.at[..., 0:6, 8:14].set(Re)

    L = cfg.max_landmarks
    s0 = init_state(cfg)
    s0_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    band0_b = jnp.broadcast_to(initial_band(s0.Sigma, L), (B, 24, L))

    xs = [jnp.moveaxis(a8e, 0, 1), jnp.moveaxis(u_seg, 0, 1),
          jnp.moveaxis(att_e, 0, 1)]
    for n in names:
        ev = tl.events[n]
        xs.append(jnp.moveaxis(jnp.take(ev.value, e_idx, axis=1), 0, 1))
        xs.append(jnp.moveaxis(jnp.take(ev.mask, e_idx, axis=1), 0, 1))
    xs = tuple(xs)

    def body(carry, x):
        st, band = carry
        a8_t, u_t, att_t = x[0], x[1], x[2]
        mu = st.mu.at[:, 0:3].add(u_t)
        mu = mu.at[:, 3:6].set(att_t)
        st = SlamState(mu=mu, Sigma=st.Sigma, active=st.active,
                       n_active=st.n_active,
                       mu_auv_odom=st.mu_auv_odom + u_t)
        a8 = a8_t
        out = {}
        k = 3
        for n in names:
            z, m = x[k], x[k + 1]
            k += 2
            st, matched, band = da_lanes_pass(
                st, z, m, params, cfg, MBES if n == "mbes" else FLS,
                a8=a8, valid=None, band=band)
            a8 = None
            out["matched_" + n] = matched
        out["mu"] = st.mu[:, 0:6]
        out["n_active"] = st.n_active
        return (st, band), out

    (final, _band), oev = jax.lax.scan(body, (s0_b, band0_b), xs)

    # per-tick outputs: event slices + odometric deltas between events
    mu_e = oev["mu"]                                    # (E, B, 6)
    pos_ext = jnp.concatenate(
        [jnp.broadcast_to(s0.mu[0:3], (1, B, 3)), mu_e[:, :, 0:3]], axis=0)
    base_U = jnp.concatenate(
        [jnp.zeros((1, B, 3), dt), jnp.moveaxis(Ue, 0, 1)], axis=0)
    U_t = jnp.moveaxis(U_cum, 0, 1)                     # (T, B, 3)
    mu_pos_t = pos_ext[seg_of] + (U_t - base_U[seg_of])
    att_ext = jnp.concatenate(
        [jnp.broadcast_to(s0.mu[3:6], (1, B, 3)), mu_e[:, :, 3:6]], axis=0)
    att_out = jnp.where(ev_any[:, None, None], att_ext[seg_of],
                        jnp.moveaxis(att, 0, 1))
    out = {"mu": jnp.concatenate([mu_pos_t, att_out], axis=-1)}
    na_ext = jnp.concatenate(
        [jnp.broadcast_to(s0.n_active, (1, B)), oev["n_active"]], axis=0)
    out["n_active"] = na_ext[seg_of]
    for n in names:
        me = oev["matched_" + n]                        # (E, B, M)
        out["matched_" + n] = jnp.full(
            (T,) + me.shape[1:], -1, me.dtype).at[e_idx].set(me)
    return final, out


_rfc_jit_cache: dict = {}


def run_fleet_compact(
    batched_timeline: Timeline,
    params: SlamParams,
    cfg: EKFSlamConfig = EKFSlamConfig(),
):
    """Event-compacted fleet replay: the kernel scan visits EVENT ticks only.

    With valid odometry at every tick, the motion predict between events is
    state-INDEPENDENT (attitude is absolute from odometry, the position
    increment is odometric — ``ekf_slam_core.cpp:41-121``), so the per-tick
    (A_t, R_t) compose OUTSIDE the scan (segmented ``associative_scan``;
    ~log₂T fixed-size passes) and each event tick consumes ONE composed a8
    with a full 6×6 R̃. Per-tick outputs are reconstructed exactly from the
    event outputs plus cumulative odometry, so the output contract matches
    ``run_fleet``.

    Semantics match ``run_fleet`` up to f32 re-association (odometry-
    increment sums and composed covariance products round differently);
    association decisions are pinned equal on golden tracks
    (tests/test_slam_compact.py). Requires a CONCRETE timeline and
    all-valid odometry — otherwise this falls back to ``run_fleet``
    (invalid-odom ticks rebroadcast the post-UPDATE attitude into the next
    predict, which is state-dependent and cannot be precomposed).

    The win is sparse-event replays (the combined north-star mission has
    ~50% MBES occupancy at B=1); a fleet of distinct missions has ~100%
    union event occupancy across the batch and gains nothing."""
    tl = batched_timeline
    if isinstance(tl.ticks, jax.core.Tracer):
        raise ValueError("run_fleet_compact needs a concrete timeline")
    od = tl.channels["odom"]
    if not bool(np.asarray(od.valid).all()):
        return run_fleet(tl, params, cfg)
    T = int(np.asarray(tl.ticks).shape[1])
    names = tuple(n for n in ("mbes", "fls") if n in tl.events)
    ev_any = np.zeros(T, bool)
    for n in names:
        ev_any |= np.asarray(tl.events[n].mask).any(axis=(0, 2))
    ev_any[T - 1] = True   # final virtual event carries the tail predicts
    e_idx = np.nonzero(ev_any)[0].astype(np.int32)
    seg_of = np.searchsorted(
        e_idx, np.arange(T), side="right").astype(np.int32)

    key = (cfg, names)
    fn = _rfc_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda t, p, e, s, a: _rfc_core(t, p, e, s, a, cfg, names))
        _rfc_jit_cache[key] = fn
    return fn(tl, params, jnp.asarray(e_idx), jnp.asarray(seg_of),
              jnp.asarray(ev_any))


def map_to_odom_correction(mu_pose: jnp.ndarray, odom_pose: jnp.ndarray) -> Transform:
    """tf map->odom correction (``bcMapOdomTF``, ``ekf_slam.cpp:263-294``):
    composes the filter's map->base estimate with the inverse of the raw
    odom->base odometry."""
    t_map_base = Transform.from_pose(mu_pose)
    t_odom_base = Transform.from_pose(odom_pose)
    return t_map_base.compose(t_odom_base.inverse())


def slam_timeline(
    mission,
    odom_track: np.ndarray,
    odom_ticks: np.ndarray,
    cfg: EKFSlamConfig = EKFSlamConfig(),
) -> Timeline:
    """SLAM timeline: odometry channel (from a DR provider run) + MBES events."""
    det = mission.streams["mbes_detections"]
    return build_timeline(
        t0=0.0,
        t1=mission.spec.duration_s,
        freq_hz=cfg.system_freq,
        channels={"odom": (odom_ticks, odom_track)},
        events={"mbes": (det["stamps"], det["values"], det["burst"], cfg.max_obs)},
    )


def landmarks_map(state: SlamState, cfg: EKFSlamConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Current landmark estimates: (L,3) positions + active mask (the RViz
    marker output of the reference, ``ekf_slam.cpp:201-233``)."""
    return state.mu[6:].reshape(cfg.max_landmarks, 3), state.active
