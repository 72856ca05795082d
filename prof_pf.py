"""Profile the 1M-particle PF tick on the real TPU: where does 1.1 ms/tick go?

Variants:
  A. current pf.run(use_pallas=True) scan          (the bench number)
  B. scan body = fused kernel only, params precomputed (T,12), raw sums out
  C. scan body = one elementwise bank op (HBM floor for a 48MB pass)
  D. scan body = 24 scalar ops, bank untouched (per-op overhead probe)
"""
import dataclasses, sys, time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.configs import PFConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import particle_filter as pf
from smarc_navigation_tpu.ops import pf_kernels

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

N = 1 << 20
duration = 60.0
cfg = PFConfig(particle_count=N)
params = pf.make_params(cfg)
m = sim.simulate(sim.MissionSpec(duration_s=duration, seed=3, gps_surface_z=-100.0))
tl = pf.pf_timeline(m, freq_hz=10.0)
T = int(tl.ticks.shape[0])
print(f"# T={T} ticks, N={N}", file=sys.stderr)


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---- A: current path ------------------------------------------------------
runA = jax.jit(lambda t: pf.run(t, params, cfg, n_particles=N,
                                scheme="systematic", use_pallas=True)[1]["mean"])
dtA = bench(runA, tl)
print(f"A current pf.run        : {dtA:.3f}s  {dtA/T*1e6:7.1f} us/tick  rt={duration/dtA:,.0f}x", file=sys.stderr)

# ---- B: kernel-only scan --------------------------------------------------
from smarc_navigation_tpu.utils.geometry import rpy_from_quat

odom_vals = tl.channels["odom"].value    # (T,13)
odom_fresh = tl.channels["odom"].fresh   # (T,)
ticks = tl.ticks
dt_t = jnp.diff(ticks, prepend=ticks[0])
rpy_t = jax.vmap(rpy_from_quat)(odom_vals[:, 3:7])
sd = jnp.sqrt(params.motion_cov)
scale_t = jnp.where(odom_fresh, 1.0, 0.0)
par12 = jnp.stack([
    odom_vals[:, 7] * dt_t * scale_t, odom_vals[:, 8] * dt_t * scale_t,
    odom_vals[:, 9] * dt_t * scale_t, odom_vals[:, 12] * dt_t * scale_t,
    rpy_t[:, 0], rpy_t[:, 1], odom_vals[:, 2],
    jnp.broadcast_to(sd[0], ticks.shape), jnp.broadcast_to(sd[1], ticks.shape),
    jnp.broadcast_to(sd[5], ticks.shape),
    jnp.arange(T, dtype=jnp.float32) * 97.0, scale_t,
], axis=1).astype(jnp.float32)


def kernel_only(parts0, par12):
    def body(parts, p):
        out, sums = pf_kernels._predict_raw(parts, p)
        return out, sums
    return jax.lax.scan(body, parts0, par12)


# expose a raw variant if missing: fall back to calling the public one
if not hasattr(pf_kernels, "_predict_raw"):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def _predict_raw(parts, par12row):
        chunk = 64 * 1024
        n = parts.shape[1]
        grid = n // chunk
        out, sums = pl.pallas_call(
            pf_kernels._kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((6, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((6, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((pf_kernels.N_SUMS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((6, n), jnp.float32),
                jax.ShapeDtypeStruct((pf_kernels.N_SUMS, 128), jnp.float32),
            ],
        )(par12row[None, :], parts)
        return out, sums
    pf_kernels._predict_raw = _predict_raw

parts0 = pf.init_state(N, params).particles
runB = jax.jit(kernel_only)
dtB = bench(runB, parts0, par12)
print(f"B kernel-only scan      : {dtB:.3f}s  {dtB/T*1e6:7.1f} us/tick  rt={duration/dtB:,.0f}x", file=sys.stderr)

# ---- C: one elementwise pass ---------------------------------------------
def one_pass(parts0, xs):
    def body(parts, x):
        return parts * 1.000001 + x, x
    return jax.lax.scan(body, parts0, xs)

runC = jax.jit(one_pass)
dtC = bench(runC, parts0, jnp.zeros((T,), jnp.float32))
print(f"C 1-elementwise-op scan : {dtC:.3f}s  {dtC/T*1e6:7.1f} us/tick", file=sys.stderr)

# ---- D: scalar-op scan -----------------------------------------------------
def scalar_ops(c0, xs):
    def body(c, x):
        for _ in range(24):
            c = c * 1.0000001 + x
        return c, c
    return jax.lax.scan(body, c0, xs)

runD = jax.jit(scalar_ops)
dtD = bench(runD, jnp.asarray(1.0), jnp.zeros((T,), jnp.float32))
print(f"D 24-scalar-op scan     : {dtD:.3f}s  {dtD/T*1e6:7.1f} us/tick", file=sys.stderr)
