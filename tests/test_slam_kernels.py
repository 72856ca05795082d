"""Whole-update-loop Pallas SLAM kernel (ops/slam_kernels.py) — the default
TPU path (``ekf_slam.data_associate_update``: update_mode="auto" -> "pallas"
on TPU). Validated here in TPU-interpret mode on CPU against the dense jax
path, so a Mosaic/logic regression fails CI even though CI runs on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.models import ekf_slam as slam


def _random_state(cfg, n_act, seed=0):
    """SlamState honoring the padding invariant: inactive slots' Σ rows and
    columns are exactly zero."""
    rng = np.random.default_rng(seed)
    L = cfg.max_landmarks
    D = 6 + 3 * L
    Da = 6 + 3 * n_act
    mu = np.zeros(D, np.float32)
    mu[0:3] = rng.normal(0, 2.0, 3)
    mu[3:6] = rng.uniform(-0.3, 0.3, 3)
    lms = rng.uniform([-10, -10, -12], [10, 10, -8], (n_act, 3))
    mu[6 : 6 + 3 * n_act] = lms.reshape(-1)
    A = rng.normal(0, 0.1, (Da, Da))
    Sig_a = A @ A.T + np.eye(Da) * 0.05
    Sigma = np.zeros((D, D), np.float32)
    Sigma[:Da, :Da] = Sig_a
    active = np.zeros(L, bool)
    active[:n_act] = True
    return slam.SlamState(
        mu=jnp.asarray(mu),
        Sigma=jnp.asarray(Sigma),
        active=jnp.asarray(active),
        n_active=jnp.asarray(n_act, jnp.int32),
        mu_auv_odom=jnp.zeros(6, jnp.float32),
    ), lms


def _detections(state, lms, cfg, params, n_known, n_new, n_pad, seed=1):
    """Detections: n_known re-observations of existing landmarks (in the
    base frame), n_new far-away points (become candidates), n_pad masked."""
    rng = np.random.default_rng(seed)
    pose = np.asarray(state.mu[0:6])
    zs = []
    for i in range(n_known):
        z = np.asarray(slam.MBES.h(state.mu[0:6], jnp.asarray(lms[i % len(lms)]), params))
        zs.append(z + rng.normal(0, 0.02, 3))
    for i in range(n_new):
        new_lm = rng.uniform([20, 20, -12], [30, 30, -8], 3)
        zs.append(np.asarray(slam.MBES.h(state.mu[0:6], jnp.asarray(new_lm), params)))
    for _ in range(n_pad):
        zs.append(np.zeros(3))
    z = jnp.asarray(np.stack(zs), jnp.float32)
    mask = jnp.asarray([True] * (n_known + n_new) + [False] * n_pad)
    return z, mask


def _cfg(L=16, M=8):
    return dataclasses.replace(
        EKFSlamConfig(),
        max_landmarks=L,
        max_obs=M,
        mhl_dist_mbes=2.0,
        q_mbes_diag=(0.1, 0.1, 0.1),
        r_diag=(1e-3,) * 6,
    )


def _run_both(state, z, mask, params, cfg):
    new_full, matched_full = slam.data_associate_update(
        state, z, mask, params, cfg, slam.MBES, update_mode="full"
    )
    with pltpu.force_tpu_interpret_mode():
        new_pal, matched_pal = slam.data_associate_update(
            state, z, mask, params, cfg, slam.MBES, update_mode="pallas"
        )
    return (new_full, matched_full), (new_pal, matched_pal)


def _assert_states_close(a, b, atol=2e-4):
    np.testing.assert_allclose(np.asarray(a.mu), np.asarray(b.mu), atol=atol)
    np.testing.assert_allclose(
        np.asarray(a.Sigma), np.asarray(b.Sigma), atol=atol
    )
    np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))
    assert int(a.n_active) == int(b.n_active)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_update_matches_dense_mixed_batch(seed):
    """Re-observations + new-landmark adds + masked slots, randomized."""
    cfg = _cfg()
    params = slam.make_params(cfg)
    state, lms = _random_state(cfg, n_act=5, seed=seed)
    z, mask = _detections(state, lms, cfg, params, n_known=3, n_new=2,
                          n_pad=3, seed=seed + 10)
    (f, mf), (p, mp) = _run_both(state, z, mask, params, cfg)
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(mp))
    _assert_states_close(f, p)
    # the update really did something
    assert not np.allclose(np.asarray(f.mu[0:6]), np.asarray(state.mu[0:6]))
    assert int(f.n_active) > 5


def test_pallas_update_capacity_denial():
    """Bank almost full: some adds must be denied identically in both paths
    (the kernel precomputes denial via an exclusive cumsum; the dense path
    discovers it sequentially)."""
    cfg = _cfg(L=6, M=8)
    params = slam.make_params(cfg)
    state, lms = _random_state(cfg, n_act=5, seed=3)
    z, mask = _detections(state, lms, cfg, params, n_known=2, n_new=4,
                          n_pad=2, seed=11)
    (f, mf), (p, mp) = _run_both(state, z, mask, params, cfg)
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(mp))
    _assert_states_close(f, p)
    assert int(f.n_active) == 6  # capped at L


def test_pallas_update_all_masked_is_noop():
    cfg = _cfg(L=8, M=4)
    params = slam.make_params(cfg)
    state, lms = _random_state(cfg, n_act=3, seed=5)
    z = jnp.zeros((4, 3), jnp.float32)
    mask = jnp.zeros(4, bool)
    with pltpu.force_tpu_interpret_mode():
        new, matched = slam.data_associate_update(
            state, z, mask, params, cfg, slam.MBES, update_mode="pallas"
        )
    np.testing.assert_allclose(np.asarray(new.mu), np.asarray(state.mu), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new.Sigma), np.asarray(state.Sigma), atol=1e-6
    )
    assert np.all(np.asarray(matched) == -1)


def test_pallas_kernel_direct_sequence():
    """Direct kernel-level equivalence on randomized (Σ, H, ν, do/add)
    sequences — no DA in the loop, pure update-loop math."""
    from smarc_navigation_tpu.ops import slam_kernels

    rng = np.random.default_rng(7)
    L, M, dim = 8, 6, 3
    D = 6 + 3 * L
    A = rng.normal(0, 0.2, (D, D))
    Sigma = (A @ A.T + np.eye(D)).astype(np.float32)
    mu = rng.normal(0, 1, D).astype(np.float32)
    # small gains keep the (not-Kalman-consistent) random sequence
    # well-conditioned so f32 op-order differences stay near machine eps
    H = rng.normal(0, 0.1, (M, dim, 9)).astype(np.float32)
    Sinv = np.stack(
        [np.eye(dim) * rng.uniform(0.1, 0.4) for _ in range(M)]
    ).astype(np.float32)
    SinvH = np.einsum("mij,mjk->mik", Sinv, H).astype(np.float32)
    nu = rng.normal(0, 0.3, (M, dim)).astype(np.float32)
    slots = rng.integers(0, L, M)
    lm_ix = (6 + 3 * slots).astype(np.int32)
    do = np.array([True, True, False, True, True, True])
    add = np.array([False, True, False, False, True, False]) & do
    new_cov = np.array([2.0, 1.5, 1.0], np.float32)

    # numpy reference: the dense full-covariance sequence (in f32, like
    # the kernel)
    S_ref, mu_ref = Sigma.astype(np.float32), mu.astype(np.float32)
    for j in range(M):
        if add[j]:
            S_ref[lm_ix[j] : lm_ix[j] + 3, lm_ix[j] : lm_ix[j] + 3] += np.diag(new_cov)
        if not do[j]:
            continue
        idx = np.r_[0:6, lm_ix[j] : lm_ix[j] + 3]
        rows = S_ref[idx, :]
        Kt = SinvH[j] @ rows
        mu_ref = mu_ref + nu[j] @ Kt
        mu_ref[3:6] = np.mod(mu_ref[3:6] + np.pi, 2 * np.pi) - np.pi
        S_ref = S_ref - Kt.T @ (H[j] @ rows)
    S_ref = 0.5 * (S_ref + S_ref.T)

    with pltpu.force_tpu_interpret_mode():
        S_k, mu_k = slam_kernels.sequential_update(
            jnp.asarray(Sigma), jnp.asarray(mu), jnp.asarray(H),
            jnp.asarray(SinvH), jnp.asarray(nu), jnp.asarray(lm_ix),
            jnp.asarray(do), jnp.asarray(add), jnp.asarray(new_cov),
        )
    np.testing.assert_allclose(np.asarray(mu_k), mu_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(S_k), S_ref, atol=2e-3)


def test_fleet_kernel_band_carry_tracks_sigma_blockdiag():
    """The (24, L) landmark block-diag band carried by the fleet kernel must
    track the returned Σ's landmark block diagonal (same random sequence as
    the direct test, fleet-batched, two chained calls so the carry itself is
    exercised)."""
    from smarc_navigation_tpu.ops import slam_kernels

    rng = np.random.default_rng(11)
    B, L, M, dim = 4, 8, 4, 3
    D = 6 + 3 * L

    def rand_state():
        A = rng.normal(0, 0.2, (B, D, D))
        Sigma = (np.einsum("bij,bkj->bik", A, A)
                 + np.eye(D)[None]).astype(np.float32)
        return Sigma, rng.normal(0, 1, (B, D)).astype(np.float32)

    Sigma, mu = rand_state()
    la = 6 + 3 * np.arange(L)
    band = np.zeros((B, 24, L), np.float32)
    for a in range(3):
        for d in range(3):
            cols = np.minimum(la + a + d, D - 1)
            band[:, a * 8 + d, :] = Sigma[:, la + a, cols]
    band = jnp.asarray(band)
    Sigma, mu = jnp.asarray(Sigma), jnp.asarray(mu)

    for step in range(2):
        H = rng.normal(0, 0.1, (B, M, dim, 9)).astype(np.float32)
        Sinv = rng.uniform(0.1, 0.4, (B, M))[:, :, None, None] * np.eye(dim)
        SinvH = np.einsum("bmij,bmjk->bmik", Sinv, H).astype(np.float32)
        nu = rng.normal(0, 0.3, (B, M, dim)).astype(np.float32)
        lm_ix = (6 + 3 * rng.integers(0, L, (B, M))).astype(np.int32)
        do = rng.random((B, M)) < 0.8
        add = (rng.random((B, M)) < 0.4) & do
        cand = rng.normal(0, 5.0, (B, M, 3)).astype(np.float32)
        new_cov = np.array([2.0, 1.5, 1.0], np.float32)
        with pltpu.force_tpu_interpret_mode():
            Sigma, mu, band = slam_kernels.sequential_update_fleet(
                Sigma, mu, jnp.asarray(H), jnp.asarray(SinvH),
                jnp.asarray(nu), jnp.asarray(lm_ix), jnp.asarray(do),
                jnp.asarray(add), jnp.asarray(new_cov), jnp.asarray(cand),
                band=band)
        Sn = np.asarray(Sigma)
        bn = np.asarray(band)
        for a in range(3):
            for c in range(3):
                want = Sn[:, la + a, la + c]                     # (B, L)
                got = bn[:, min(a, c) * 8 + abs(c - a), :]
                np.testing.assert_allclose(
                    got, want, atol=5e-5,
                    err_msg=f"step {step} block entry ({a},{c})")


def test_fleet_kernel_tiled_epilogue_large_state():
    """The row-tiled prologue/epilogue variant (``tiled_ep=True``, D >= 512
    shapes — the (D,D)-temporary-free building block for a row-streamed
    MB>=2 kernel): same update math as the dense epilogue against the
    numpy f32 sequence, and the output must be EXACTLY symmetric (the
    tiled downdate is symmetric by construction — A1[i,j] == A2[j,i]
    bitwise)."""
    from smarc_navigation_tpu.ops import slam_kernels

    rng = np.random.default_rng(13)
    B, L, M, dim = 2, 170, 4, 3
    D = 6 + 3 * L
    assert D >= 512

    A = rng.normal(0, 0.05, (B, D, D))
    Sigma0 = (np.einsum("bij,bkj->bik", A, A)
              + np.eye(D)[None]).astype(np.float32)
    mu0 = rng.normal(0, 1, (B, D)).astype(np.float32)
    H = rng.normal(0, 0.1, (B, M, dim, 9)).astype(np.float32)
    Sinv = rng.uniform(0.1, 0.4, (B, M))[:, :, None, None] * np.eye(dim)
    SinvH = np.einsum("bmij,bmjk->bmik", Sinv, H).astype(np.float32)
    nu = rng.normal(0, 0.3, (B, M, dim)).astype(np.float32)
    slots = rng.integers(0, L, (B, M))
    lm_ix = (6 + 3 * slots).astype(np.int32)
    do = rng.random((B, M)) < 0.8
    add = (rng.random((B, M)) < 0.4) & do
    new_cov = np.array([2.0, 1.5, 1.0], np.float32)

    with pltpu.force_tpu_interpret_mode():
        S_k, mu_k = slam_kernels.sequential_update_fleet(
            jnp.asarray(Sigma0), jnp.asarray(mu0), jnp.asarray(H),
            jnp.asarray(SinvH), jnp.asarray(nu), jnp.asarray(lm_ix),
            jnp.asarray(do), jnp.asarray(add), jnp.asarray(new_cov),
            tiled_ep=True,
        )
    S_k, mu_k = np.asarray(S_k), np.asarray(mu_k)

    for b in range(B):
        S_ref, mu_ref = Sigma0[b].copy(), mu0[b].copy()
        for j in range(M):
            if add[b, j]:
                s0 = lm_ix[b, j]
                S_ref[s0:s0 + 3, s0:s0 + 3] += np.diag(new_cov)
            if not do[b, j]:
                continue
            idx = np.r_[0:6, lm_ix[b, j]:lm_ix[b, j] + 3]
            rows = S_ref[idx, :]
            Kt = SinvH[b, j] @ rows
            mu_ref = mu_ref + nu[b, j] @ Kt
            mu_ref[3:6] = np.mod(mu_ref[3:6] + np.pi, 2 * np.pi) - np.pi
            S_ref = S_ref - Kt.T @ (H[b, j] @ rows)
        S_ref = 0.5 * (S_ref + S_ref.T)
        np.testing.assert_allclose(mu_k[b], mu_ref, atol=2e-4)
        np.testing.assert_allclose(S_k[b], S_ref, atol=2e-3)
    np.testing.assert_array_equal(S_k, np.swapaxes(S_k, 1, 2),
                                  err_msg="tiled epilogue output asymmetric")


def test_fleet_kernel_streamed_two_phase_large_state():
    """The two-call streamed variant (phase 1 emits U/V factors + μ; phase
    2 streams the symmetric downdate in 128-row tiles) — OPT-IN only,
    measured slower than the dense epilogue at D=774 (docs/ROOFLINE.md
    r04) and kept as a tested building block.
    Must match the dense-epilogue kernel bitwise on μ and to
    f32 tolerance on Σ (identical factor algebra; the downdate tiles
    re-associate nothing — each output element is one contraction), and
    the output must be exactly symmetric."""
    from smarc_navigation_tpu.ops import slam_kernels

    rng = np.random.default_rng(29)
    B, L, M, dim = 2, 170, 4, 3
    D = 6 + 3 * L
    assert D >= 512

    A = rng.normal(0, 0.05, (B, D, D))
    Sigma0 = (np.einsum("bij,bkj->bik", A, A)
              + np.eye(D)[None]).astype(np.float32)
    mu0 = rng.normal(0, 1, (B, D)).astype(np.float32)
    H = rng.normal(0, 0.1, (B, M, dim, 9)).astype(np.float32)
    Sinv = rng.uniform(0.1, 0.4, (B, M))[:, :, None, None] * np.eye(dim)
    SinvH = np.einsum("bmij,bmjk->bmik", Sinv, H).astype(np.float32)
    nu = rng.normal(0, 0.3, (B, M, dim)).astype(np.float32)
    slots = rng.integers(0, L, (B, M))
    lm_ix = (6 + 3 * slots).astype(np.int32)
    do = rng.random((B, M)) < 0.8
    add = (rng.random((B, M)) < 0.4) & do
    new_cov = np.array([2.0, 1.5, 1.0], np.float32)

    args = (jnp.asarray(Sigma0), jnp.asarray(mu0), jnp.asarray(H),
            jnp.asarray(SinvH), jnp.asarray(nu), jnp.asarray(lm_ix),
            jnp.asarray(do), jnp.asarray(add), jnp.asarray(new_cov))
    with pltpu.force_tpu_interpret_mode():
        S_s, mu_s = slam_kernels.sequential_update_fleet(
            *args, streamed=True)
        S_d, mu_d = slam_kernels.sequential_update_fleet(
            *args, streamed=False)
    S_s, mu_s = np.asarray(S_s), np.asarray(mu_s)

    np.testing.assert_array_equal(mu_s, np.asarray(mu_d))
    np.testing.assert_allclose(S_s, np.asarray(S_d), atol=1e-5)
    np.testing.assert_array_equal(S_s, np.swapaxes(S_s, 1, 2),
                                  err_msg="streamed downdate asymmetric")
