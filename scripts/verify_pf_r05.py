"""Round-5 verify flow: drive the PF public boundary end-to-end on the
real TPU after the r05 fast-path changes (exact fallback via
scatter+cummax, wider W tier, single-tree-sum normalize).

Flows:
  1. pf.run fast path (use_pallas=True) at 2^20 on a GPS-update mission —
     prints final mean position + wall time.
  2. fast vs dense systematic path at 2^17: ancestors identical =>
     pre-jitter means must agree closely (jitter streams differ by design).
  3. exact-fallback exercise: systematic_resample_gather under degenerate
     weights (all mass in one block => spans blow past every W tier) must
     route to the scatter+cummax fallback and return exact ancestors.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_pf_r05.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import PFConfig
    from smarc_navigation_tpu.io import sim
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.ops import pf_kernels, resampling

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # ---- flow 1: full mission replay at 2^20, fast path ------------------
    m = sim.simulate(sim.MissionSpec(duration_s=60.0, seed=3,
                                     gps_surface_z=-100.0))
    tl = pf.pf_timeline(m, freq_hz=10.0)
    n = 1 << 20
    cfg = PFConfig(particle_count=n)
    params = pf.make_params(cfg)

    run = jax.jit(lambda t: pf.run(t, params, cfg, n_particles=n,
                                   scheme="systematic", use_pallas=True))
    out = run(tl)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(tl)
    mean = np.asarray(out[1]["mean"])
    t1 = time.perf_counter()
    ticks = int(tl.ticks.shape[0])
    assert np.isfinite(mean).all(), "non-finite PF means"
    print(f"flow1 pf.run fast 2^20: {ticks} ticks, final mean "
          f"[{mean[-1, 0]:.2f}, {mean[-1, 1]:.2f}, {mean[-1, 2]:.2f}], "
          f"{(t1 - t0) * 1e3:.0f} ms wall (tunnel-bound)")

    # ---- flow 2: fast vs dense agreement at 2^17 --------------------------
    n2 = 1 << 17
    cfg2 = PFConfig(particle_count=n2)
    par2 = pf.make_params(cfg2)
    run_fast = jax.jit(lambda t: pf.run(t, par2, cfg2, n_particles=n2,
                                        scheme="systematic",
                                        use_pallas=True))
    run_dense = jax.jit(lambda t: pf.run(t, par2, cfg2, n_particles=n2,
                                         scheme="systematic",
                                         use_pallas=False))
    mf = np.asarray(run_fast(tl)[1]["mean"])
    md = np.asarray(run_dense(tl)[1]["mean"])
    dpos = np.abs(mf[:, :2] - md[:, :2]).max()
    print(f"flow2 fast-vs-dense 2^17: max |d mean_xy| = {dpos:.4f} m "
          f"(jitter streams differ by design; ancestors pinned by tests)")
    assert dpos < 0.5, f"fast/dense divergence too large: {dpos}"

    # ---- flow 3: degenerate weights -> exact fallback ---------------------
    key = jax.random.PRNGKey(7)
    parts = jax.random.normal(key, (6, n2), jnp.float32)
    w = jnp.zeros((n2,), jnp.float32).at[5].set(1.0)  # all mass, one slot
    got = pf_kernels.systematic_resample_gather(parts, w,
                                                jax.random.PRNGKey(3))
    ref = parts[:, jnp.full((n2,), 5, jnp.int32)]
    err = float(jnp.abs(got - ref).max())
    print(f"flow3 degenerate-weight fallback: max err vs exact "
          f"broadcast = {err:.1e}")
    assert err == 0.0, "exact fallback produced wrong ancestors"

    # ---- flow 4: normalize diet is still a distribution -------------------
    logw = jax.random.normal(jax.random.PRNGKey(9), (n2,), jnp.float32) * 5
    wn = resampling.normalize_weights_det(logw)
    s = float(jnp.sum(wn))
    print(f"flow4 normalize_weights_det: sum = {s:.7f}, min = "
          f"{float(jnp.min(wn)):.1e}")
    assert abs(s - 1.0) < 1e-4 and float(jnp.min(wn)) > 0.0

    print("VERIFY_OK")


if __name__ == "__main__":
    main()
