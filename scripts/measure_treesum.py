"""Measure weight-normalization variants at N=2^20 on the real chip.

Round-5 regression triage: commit 70f5c4b switched ``tree_sum`` to
LSB-first strided pairing (x[0::2]+x[1::2]) and routed the Pallas fast
path's GPS update through it — BENCH showed the update leg exploding
185 -> 3432 us/tick (amortized). Each stride-2 slice of a big 1-D vector
is a lane/sublane relayout on TPU; 20 levels x 4 tree sums per update is
the regression. Candidates keep the two properties that motivated the
change (order pinned by the program DAG; decomposable over contiguous
power-of-two particle shards) while using contiguous / matmul ops:

  lsb     current LSB-first strided fold (the regression)
  half    r04 fold-in-half (NOT shard-decomposable — first pair crosses)
  h2d     reshape (N/2048, 2048): contiguous fold-in-half within rows,
          LSB-first across the (N/2048,) row sums
  dot     row sums via (R,2048)@ones matvec, total via (R,)@ones —
          per-row K-accumulation order is hardware-pinned per K
  lse     r04 fast-path logsumexp normalize (baseline, NOT pinned)

Each variant measures the FULL normalize (2 pinned sums + elementwise
tail) inside a lax.scan body, slope between K=8 and K=40 iterations.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_treesum.py
"""

import sys
import time

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    N = 1 << 20
    B = 2048
    R = N // B

    def ts_lsb(x):
        p = x.shape[0]
        while p > 1:
            p //= 2
            x = x[0::2] + x[1::2]
        return x[0]

    def ts_half(x):
        p = x.shape[0]
        while p > 1:
            p //= 2
            x = x[:p] + x[p:]
        return x[0]

    def ts_h2d(x):
        x = x.reshape(R, B)
        c = B
        while c > 1:
            c //= 2
            x = x[:, :c] + x[:, c:]
        x = x[:, 0]
        p = R
        while p > 1:
            p //= 2
            x = x[0::2] + x[1::2]
        return x[0]

    ones_b = jnp.ones((B,), jnp.float32)
    ones_r = jnp.ones((R,), jnp.float32)

    def ts_dot(x):
        rows = x.reshape(R, B) @ ones_b
        return rows @ ones_r

    def mk_norm(ts):
        def norm(logw):
            m = jnp.max(logw)
            e = jnp.exp(logw - m)
            w = e / ts(e)
            w = w + 1e-30
            return w / ts(w)
        return norm

    def norm_lse(logw):
        w = jnp.exp(logw - jax.scipy.special.logsumexp(logw))
        w = w + 1e-30
        return w / jnp.sum(w)

    variants = {
        "lsb": mk_norm(ts_lsb),
        "half": mk_norm(ts_half),
        "h2d": mk_norm(ts_h2d),
        "dot": mk_norm(ts_dot),
        "lse": norm_lse,
    }

    key = jax.random.PRNGKey(0)
    logw0 = -0.5 * jax.random.uniform(key, (N,), jnp.float32) * 40.0

    for name, norm in variants.items():
        def body(x, _):
            w = norm(x)
            return x + w, jnp.sum(w[:8])

        def run(x, k):
            y, o = jax.lax.scan(lambda c, _: body(c, None), x,
                                None, length=k)
            return jnp.sum(o) + y[0]

        r8 = jax.jit(lambda x: run(x, 8))
        r40 = jax.jit(lambda x: run(x, 40))
        t8 = timed(r8, logw0)
        t40 = timed(r40, logw0)
        per = (t40 - t8) / 32.0
        print(f"{name:5s}: {per*1e6:9.1f} us/normalize "
              f"(K8 {t8*1e3:.2f} ms, K40 {t40*1e3:.2f} ms)",
              file=sys.stderr)

    # --- decomposability spot-checks (bitwise, on this chip) ---------------
    x = jnp.exp(logw0)

    # dot: per-row K-accumulation must not depend on the row COUNT
    rows_full = jax.jit(lambda v: v.reshape(R, B) @ ones_b)(x)
    rows_half = [
        jax.jit(lambda v: v.reshape(R // 2, B) @ ones_b)(h)
        for h in (x[: N // 2], x[N // 2:])
    ]
    rows_cat = jnp.concatenate(rows_half)
    print(f"# dot rows full==2-shard concat: "
          f"{bool(jnp.all(rows_full == rows_cat))}", file=sys.stderr)
    rows_q = jnp.concatenate(
        [jax.jit(lambda v: v.reshape(R // 8, B) @ ones_b)(x[i * (N // 8):(i + 1) * (N // 8)])
         for i in range(8)])
    print(f"# dot rows full==8-shard concat: "
          f"{bool(jnp.all(rows_full == rows_q))}", file=sys.stderr)

    # h2d: shard-local fold then LSB over row sums == global
    def h2d_rows(v, r):
        y = v.reshape(r, B)
        c = B
        while c > 1:
            c //= 2
            y = y[:, :c] + y[:, c:]
        return y[:, 0]

    g = jax.jit(lambda v: h2d_rows(v, R))(x)
    s = jnp.concatenate(
        [jax.jit(lambda v: h2d_rows(v, R // 8))(x[i * (N // 8):(i + 1) * (N // 8)])
         for i in range(8)])
    print(f"# h2d rows full==8-shard concat: {bool(jnp.all(g == s))}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
