"""Fused Pallas PF kernel: validated in interpreter mode on CPU (the real
TPU path is exercised by bench.py / the verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarc_navigation_tpu.models import particle_filter as pf

# Pallas TPU kernels run on CPU only via interpreter mode; monkeypatch
# pallas_call through the interpret flag for these tests.
from jax.experimental import pallas as pl

from smarc_navigation_tpu.ops import pf_kernels


@pytest.fixture(autouse=True)
def interpret_pallas():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_fused_no_noise_matches_jax_path():
    n = 1024
    key = jax.random.PRNGKey(0)
    parts = jax.random.normal(key, (6, n)) * 0.1
    odom = jnp.zeros(13).at[6].set(1.0).at[7].set(0.8).at[12].set(0.05).at[2].set(-3.0)
    out, mean, cov = pf_kernels.fused_predict_moments(
        parts, odom, 0.1, jnp.zeros(6), 1, chunk=512
    )
    ref = pf.motion_model_batch(parts, odom, 0.1, jnp.zeros((6, n)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    m_ref, c_ref = pf.estimate(ref)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cov[:2, :2]), np.asarray(c_ref[:2, :2]), atol=1e-4
    )


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="TPU-interpret mode emulates pltpu.prng_random_bits with degenerate "
    "bits; noise statistics are validated on real TPU (see bench/verify runs: "
    "cov diag = prior var + motion var as expected)",
)
def test_fused_noise_statistics():
    n = 4096
    parts = jnp.zeros((6, n))
    odom = jnp.zeros(13).at[6].set(1.0)
    sd = jnp.asarray([0.5, 0.25, 0, 0, 0, 0.1])
    out, mean, cov = pf_kernels.fused_predict_moments(parts, odom, 0.05, sd, 7, chunk=512)
    x, y, yaw = np.asarray(out[0]), np.asarray(out[1]), np.asarray(out[5])
    assert abs(x.std() - 0.5) < 0.05
    assert abs(y.std() - 0.25) < 0.03
    assert abs(yaw.std() - 0.1) < 0.02
    assert abs(x.mean()) < 0.05 and abs(yaw.mean()) < 0.01
    # different seeds -> different draws; same seed -> identical
    out2, _, _ = pf_kernels.fused_predict_moments(parts, odom, 0.05, sd, 7, chunk=512)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3, _, _ = pf_kernels.fused_predict_moments(parts, odom, 0.05, sd, 8, chunk=512)
    assert np.abs(np.asarray(out3[0]) - x).max() > 1e-3


def test_fused_rejects_bad_chunk():
    parts = jnp.zeros((6, 1000))
    odom = jnp.zeros(13).at[6].set(1.0)
    with pytest.raises(ValueError, match="divisible"):
        pf_kernels.fused_predict_moments(parts, odom, 0.1, jnp.zeros(6), 1, chunk=512)


def test_systematic_resample_gather_matches_resampling_ancestors():
    """The fused monotone-window resample kernel must produce exactly
    parts[:, ancestors] for the ancestors of ops.resampling.systematic_resample
    under the same key (both derive counts as clip(ceil(N*cdf - u)))."""
    from smarc_navigation_tpu.ops import resampling

    n = 2048
    key0, key1, key2 = jax.random.split(jax.random.PRNGKey(3), 3)
    parts = jax.random.normal(key0, (6, n))
    w = jax.random.uniform(key1, (n,)) ** 4  # skewed weights
    w = w / jnp.sum(w)

    anc = resampling.systematic_resample(key2, w)
    ref = parts[:, anc]
    out = pf_kernels.systematic_resample_gather(parts, w, key2, block=512)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_systematic_resample_gather_degenerate_weights():
    """All weight on one particle -> every output slot is that particle.

    The ancestor window of the one-hot fast path cannot cover this (the
    span guard routes it to the exact searchsorted fallback)."""
    n = 2048
    parts = jnp.arange(6 * n, dtype=jnp.float32).reshape(6, n)
    w = jnp.zeros(n).at[777].set(1.0)
    out = pf_kernels.systematic_resample_gather(
        parts, w, jax.random.PRNGKey(0), block=512
    )
    np.testing.assert_array_equal(
        np.asarray(out), np.broadcast_to(np.asarray(parts[:, 777])[:, None], (6, n))
    )


def test_systematic_resample_gather_zero_run_weights():
    """Long zero-count runs blow the ancestor-index span past any fixed
    window (the round-1 kernel returned corrupted banks here); the guard
    must detect it and fall back to the exact path."""
    from smarc_navigation_tpu.ops import resampling

    n = 4096
    key = jax.random.PRNGKey(11)
    parts = jax.random.normal(jax.random.PRNGKey(1), (6, n))
    # weight mass only at the two ends -> mid-bank ancestors jump ~n slots
    w = jnp.zeros(n).at[:64].set(1.0).at[-64:].set(1.0)
    w = w / jnp.sum(w)
    anc = resampling.systematic_resample(key, w)
    out = pf_kernels.systematic_resample_gather(parts, w, key, block=512)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(parts[:, anc]))


def test_systematic_resample_monotone_counts_at_scale():
    """jnp.cumsum on TPU/CPU is a parallel scan whose f32 rounding can step
    backwards at segment boundaries; the count vector must be repaired to
    monotone (cummax) or windowed one-hot expansion silently corrupts.
    Exercise a large skewed bank through the ancestor path."""
    from smarc_navigation_tpu.ops import resampling

    n = 1 << 16
    key = jax.random.PRNGKey(3)
    w = jax.random.uniform(jax.random.PRNGKey(4), (n,)) ** 2
    w = w / jnp.sum(w)
    anc = np.asarray(resampling.systematic_resample(key, w))
    assert (np.diff(anc) >= 0).all()  # ancestors monotone
    # multiset sizes: every slot filled, ancestors within range
    assert anc.min() >= 0 and anc.max() < n


def test_systematic_resample_gather_merged_batch_window_exact():
    """The production path at scale: default block (256) with n large
    enough that 16 output blocks share one merged ancestor window per grid
    step (batch=16). Values must still be exactly parts[:, ancestors] —
    the per-block sub-window slicing and the offset-folded count row must
    not change the one-hot selection."""
    from smarc_navigation_tpu.ops import resampling

    n = 8192
    key0, key1, key2 = jax.random.split(jax.random.PRNGKey(9), 3)
    parts = jax.random.normal(key0, (6, n))
    w = jax.random.uniform(key1, (n,)) ** 3  # skewed
    w = w / jnp.sum(w)
    anc = resampling.systematic_resample(key2, w)
    out = pf_kernels.systematic_resample_gather(parts, w, key2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(parts[:, anc]))


def test_systematic_resample_gather_whole_bank_window():
    """n == block: the whole-bank-window fast path (W = n) must be taken
    (it was dead behind the generic span guard until round 3) and stay
    value-exact, including under skew that would overflow a partial
    window."""
    from smarc_navigation_tpu.ops import resampling

    n = 256
    key0, key1, key2 = jax.random.split(jax.random.PRNGKey(21), 3)
    parts = jax.random.normal(key0, (6, n))
    w = jax.random.uniform(key1, (n,)) ** 6  # heavy skew
    w = w / jnp.sum(w)
    anc = resampling.systematic_resample(key2, w)
    out = pf_kernels.systematic_resample_gather(parts, w, key2, block=n)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(parts[:, anc]))


def test_systematic_resample_gather_fused_jitter_moments():
    """jitter_sd given: the kernel fuses jitter + moment sums into the
    output write. With sd = 0 the bank must equal the plain gather exactly
    and the sums must match a host recomputation (poly sin/cos vs libm)."""
    n = 16384
    key0, key1, key2 = jax.random.split(jax.random.PRNGKey(5), 3)
    parts = jax.random.normal(key0, (6, n))
    w = jax.random.uniform(key1, (n,)) ** 3
    w = w / jnp.sum(w)
    plain = pf_kernels.systematic_resample_gather(parts, w, key2)
    out, sums = pf_kernels.systematic_resample_gather(
        parts, w, key2, jitter_sd=jnp.zeros(3), seed=jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))
    ref_sums = pf_kernels.moment_sums(out)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums),
                               rtol=2e-5, atol=2e-4)
