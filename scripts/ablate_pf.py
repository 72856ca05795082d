"""PF 1M breakdown on TPU: full vs resample stubbed vs update stubbed."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.configs import PFConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import particle_filter as pf
from smarc_navigation_tpu.ops import pf_kernels

print("# device:", jax.devices()[0], file=sys.stderr, flush=True)

N = 1_048_576
cfg = PFConfig(particle_count=N)
params = pf.make_params(cfg)


def pf_tl(duration):
    m = sim.simulate(sim.MissionSpec(duration_s=duration, seed=3,
                                     gps_surface_z=-100.0))
    return pf.pf_timeline(m, freq_hz=10.0)


def _force(x):
    return float(np.asarray(x))


def timed(fn, *args, reps=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


tl_s, tl_b = pf_tl(15.0), pf_tl(60.0)
T_s, T_b = int(tl_s.ticks.shape[0]), int(tl_b.ticks.shape[0])

real_res = pf_kernels.systematic_resample_gather
real_upd = pf._update_resample_fast if hasattr(pf, "_update_resample_fast") else None


def stub_res(parts, w, key, block=512):
    return parts + 1e-30 * jnp.sum(w)


for tag in ("full", "no-resample"):
    jax.clear_caches()
    pf_kernels.systematic_resample_gather = (
        stub_res if tag == "no-resample" else real_res)
    real_pcm = pf_kernels.predict_call_multi
    if tag == "no-predict":
        def stub_pcm(parts, p16, sds, nxy=True, nyaw=True, _r=real_pcm):
            _, sums = _r(parts[:, 0:1024], p16, sds, nxy=nxy, nyaw=nyaw)
            K = p16.shape[0]
            z = jnp.zeros((K, pf_kernels.N_SUMS, 128), jnp.float32)
            return parts + 1e-30 * jnp.sum(p16), z + sums * 1e-30
        pf_kernels.predict_call_multi = stub_pcm
    else:
        pf_kernels.predict_call_multi = real_pcm
    run = lambda t: jnp.sum(pf.run(  # noqa: E731
        t, params, cfg, n_particles=N, scheme="systematic",
        use_pallas=True)[1]["mean"])
    per = max(timed(run, tl_b) - timed(run, tl_s), 1e-9) / (T_b - T_s)
    print(f"{tag}: {per*1e6:.0f} us/tick ({0.1/per:,.0f}x real-time)",
          flush=True)
