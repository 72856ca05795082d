"""Dissect the fused PF predict kernel: DMA vs PRNG/Box-Muller vs trig vs moments."""
import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.ops import pf_kernels

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

N = 1 << 20
T = 601
CHUNK = 64 * 1024
_TWO_PI = 6.283185307179586


def make_variant(mode):
    def _k(params_ref, parts_ref, out_ref, sums_ref):
        pid = pl.program_id(0)
        x = parts_ref[0, :]
        y = parts_ref[1, :]
        yaw = parts_ref[5, :]
        n = x.shape[0]
        nx = ny = nyaw = jnp.zeros_like(x)
        if mode >= 2:  # PRNG + Box-Muller
            pltpu.prng_seed(params_ref[0, 10].astype(jnp.int32) + pid)
            u = pf_kernels._uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits((4, n)), jnp.uint32))
            r1 = jnp.sqrt(-2.0 * jnp.log(u[0]))
            r2 = jnp.sqrt(-2.0 * jnp.log(u[2]))
            nx = r1 * jnp.cos(_TWO_PI * u[1]) * params_ref[0, 7]
            ny = r1 * jnp.sin(_TWO_PI * u[1]) * params_ref[0, 8]
            nyaw = r2 * jnp.cos(_TWO_PI * u[3]) * params_ref[0, 9]
        if mode >= 1:  # motion trig
            vdt_x, vdt_y, vdt_z = params_ref[0, 0], params_ref[0, 1], params_ref[0, 2]
            roll, pitch = params_ref[0, 4], params_ref[0, 5]
            yaw_n = yaw + params_ref[0, 3] + nyaw
            yaw_n = jnp.mod(yaw_n + jnp.pi, _TWO_PI) - jnp.pi
            cr, sr = jnp.cos(roll), jnp.sin(roll)
            cp, sp = jnp.cos(pitch), jnp.sin(pitch)
            cy, sy = jnp.cos(yaw_n), jnp.sin(yaw_n)
            step_x = (cy*cp)*vdt_x + (cy*sp*sr - sy*cr)*vdt_y + (cy*sp*cr + sy*sr)*vdt_z
            step_y = (sy*cp)*vdt_x + (sy*sp*sr + cy*cr)*vdt_y + (sy*sp*cr - cy*sr)*vdt_z
            x_n = x + step_x + nx
            y_n = y + step_y + ny
        else:
            x_n, y_n, yaw_n = x, y, yaw
            cy, sy = x, y
        out_ref[0, :] = x_n
        out_ref[1, :] = y_n
        out_ref[2, :] = jnp.full_like(x_n, params_ref[0, 6])
        out_ref[3, :] = jnp.full_like(x_n, params_ref[0, 4])
        out_ref[4, :] = jnp.full_like(x_n, params_ref[0, 5])
        out_ref[5, :] = yaw_n

        @pl.when(pid == 0)
        def _():
            sums_ref[:, :] = jnp.zeros_like(sums_ref)

        if mode >= 3:  # moments
            def lanes(v):
                return jnp.sum(v.reshape(-1, 128), axis=0)
            sums_ref[0, :] += lanes(x_n)
            sums_ref[1, :] += lanes(y_n)
            sums_ref[2, :] += lanes(x_n * x_n)
            sums_ref[3, :] += lanes(y_n * y_n)
            sums_ref[4, :] += lanes(x_n * y_n)
            sums_ref[5, :] += lanes(sy)
            sums_ref[6, :] += lanes(cy)
            sums_ref[7, :] += jnp.full((128,), n / 128.0, jnp.float32)
    return _k


def runner(mode):
    kern = make_variant(mode)

    @jax.jit
    def one(parts, p12):
        grid = N // CHUNK
        out, sums = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((6, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((6, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((6, N), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
        )(p12[None, :], parts)
        return out, sums

    @jax.jit
    def loop(parts0, p12s):
        def body(parts, p):
            o, s = one(parts, p)
            return o, s[0, 0]
        return jax.lax.scan(body, parts0, p12s)
    return loop


parts0 = jax.random.normal(jax.random.PRNGKey(0), (6, N), jnp.float32)
p12s = jnp.tile(jnp.asarray(
    [0.1, 0.0, 0.0, 0.01, 0.0, 0.0, -5.0, 0.1, 0.1, 0.05, 7.0, 1.0],
    jnp.float32), (T, 1))

names = {0: "K0 copy-only        ", 1: "K1 +motion trig     ",
         2: "K2 +PRNG/BoxMuller  ", 3: "K3 full (=current)  "}
for mode in [0, 1, 2, 3]:
    loop = runner(mode)
    out = loop(parts0, p12s)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(parts0, p12s)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{names[mode]}: {dt:.3f}s  {dt/T*1e6:7.1f} us/tick", file=sys.stderr)
