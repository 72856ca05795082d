"""Isolated resample-kernel slope at 2^20 for several block sizes."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.ops import pf_kernels

print("# device:", jax.devices()[0], file=sys.stderr, flush=True)
N = 1 << 20
rng = np.random.default_rng(0)
parts = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
w = rng.exponential(1.0, N).astype(np.float32)
w = jnp.asarray(w / w.sum())


def chain(block, T):
    @jax.jit
    def run(p):
        keys = jax.random.split(jax.random.PRNGKey(0), T)
        def body(c, k):
            out = pf_kernels.systematic_resample_gather(c, w, k, block=block)
            return out, None
        c, _ = jax.lax.scan(body, p, keys)
        return jnp.sum(c[0, 0:8])
    return run


def _force(x):
    return float(np.asarray(x))


def timed(fn, *a, reps=3):
    _force(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


for block in (128, 256, 512, 1024):
    try:
        t1 = timed(chain(block, 4), parts)
        t2 = timed(chain(block, 24), parts)
        per = max(t2 - t1, 1e-9) / 20
        print(f"block={block}: {per*1e6:.0f} us/resample", flush=True)
    except Exception as e:
        print(f"block={block}: FAILED {type(e).__name__}: {e}", flush=True)
