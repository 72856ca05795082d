"""Generate the on-chip PRNG statistics artifact (prng_stats_tpu.json).

The PF predict kernel draws its motion noise from the TPU hardware PRNG
(``pltpu.prng_random_bits``) pushed through Box-Muller with the in-kernel
fast-math primitives (``_fast_ln``, ``_sin2pi``) at the real (32, n/8)
sublane-block layout. The generic Pallas interpreter's PRNG is degenerate,
so these statistics can only be validated on hardware: this script runs the
production kernel on the real chip with zeroed dynamics (out = pure noise),
accumulates moments and a chi-square goodness-of-fit against N(0,1), and
writes the committed JSON artifact that ``tests/test_prng_stats.py``
re-validates on every CI run.

Run on the TPU host:  python data/make_prng_stats.py
"""

import json
import math
import os

import numpy as np


def main(path=None):
    import jax
    import jax.numpy as jnp

    import smarc_navigation_tpu  # noqa: F401 (precision pin)
    from smarc_navigation_tpu.ops import pf_kernels

    path = path or os.path.join(os.path.dirname(__file__), "prng_stats_tpu.json")
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"hardware PRNG stats need the TPU ({dev})"

    n = 1 << 20
    ticks = 16                      # 16 seeds x 2^20 = 16.8M samples/stream
    # zero dynamics, unit x/y noise, 0.1 yaw noise (wrap-safe), subst=0
    par16 = jnp.zeros(16, jnp.float32)
    par16 = par16.at[7].set(1.0).at[8].set(1.0).at[9].set(0.1)
    par16 = par16.at[11].set(1.0)   # do_noise
    parts0 = jnp.zeros((6, n), jnp.float32)

    run = jax.jit(lambda s: pf_kernels.predict_call(parts0, par16, s)[0])

    streams = {"x": [], "y": [], "yaw": [],
               "jit_x": [], "jit_y": [], "jit_yaw": []}
    for t in range(ticks):
        out = np.asarray(run(jnp.asarray(7_000_000 + t * 1013, jnp.int32)))
        streams["x"].append(out[0])
        streams["y"].append(out[1])
        streams["yaw"].append(out[5] / 0.1)

    # the segmented production path's multi-tick kernel: yaw noise from BOTH
    # Box-Muller outputs (8 PRNG rows lane-split into n/2 radii + n/2
    # angles), at the reference default config (nxy=False, yaw noise only)
    par16m = jnp.zeros((1, 16), jnp.float32).at[0, 9].set(0.1).at[0, 11].set(1.0)
    runm = jax.jit(lambda s: pf_kernels.predict_call_multi(
        parts0, par16m, s[None], nxy=False, nyaw=True)[0])
    streams["multi_yaw_twin"] = []
    for t in range(ticks):
        out = np.asarray(runm(jnp.asarray(11_000_000 + t * 1013, jnp.int32)))
        streams["multi_yaw_twin"].append(out[5] / 0.1)

    # the fused resample-jitter stream at ITS production layout
    # ((32, batch*block/8) blocks, one seed per grid step): uniform weights
    # over a zero bank make the gather the identity, so the output rows are
    # pure jitter noise
    w_uni = jnp.full((n,), 1.0 / n, jnp.float32)
    sd3 = jnp.asarray([1.0, 1.0, 0.1], jnp.float32)
    runj = jax.jit(lambda s: pf_kernels.systematic_resample_gather(
        parts0, w_uni, jax.random.PRNGKey(0), jitter_sd=sd3, seed=s)[0])
    for t in range(ticks):
        out = np.asarray(runj(jnp.asarray(3_000_000 + t * 1013, jnp.int32)))
        streams["jit_x"].append(out[0])
        streams["jit_y"].append(out[1])
        streams["jit_yaw"].append(out[5] / 0.1)

    edges = np.array([-np.inf, -3, -2.5, -2, -1.5, -1, -0.5, 0,
                      0.5, 1, 1.5, 2, 2.5, 3, np.inf])
    # normal bin probabilities
    from math import erf

    cdf = np.array([0.5 * (1 + erf(e / math.sqrt(2)))
                    if np.isfinite(e) else (0.0 if e < 0 else 1.0)
                    for e in edges])
    probs = np.diff(cdf)

    report = {"device": str(dev), "samples_per_stream": int(n * ticks),
              "ticks": ticks, "streams": {}}
    for name, chunks in streams.items():
        s = np.concatenate(chunks).astype(np.float64)
        mean = s.mean()
        var = s.var()
        skew = ((s - mean) ** 3).mean() / var ** 1.5
        kurt = ((s - mean) ** 4).mean() / var ** 2
        hist, _ = np.histogram(s, edges)
        expected = probs * len(s)
        chi2 = float(((hist - expected) ** 2 / expected).sum())
        report["streams"][name] = {
            "mean": round(float(mean), 6),
            "var": round(float(var), 6),
            "skew": round(float(skew), 6),
            "kurtosis": round(float(kurt), 6),
            "chi2_14bin": round(chi2, 2),
        }
    # cross-correlations: Box-Muller pair (x,y share r1) and x vs yaw
    x = np.concatenate(streams["x"]).astype(np.float64)
    y = np.concatenate(streams["y"]).astype(np.float64)
    w = np.concatenate(streams["yaw"]).astype(np.float64)
    report["corr_xy"] = round(float(np.corrcoef(x, y)[0, 1]), 6)
    report["corr_xyaw"] = round(float(np.corrcoef(x, w)[0, 1]), 6)
    # cross-tick independence: corr of consecutive tick buffers (x stream)
    a, b = streams["x"][0].astype(np.float64), streams["x"][1].astype(np.float64)
    report["corr_consecutive_ticks"] = round(float(np.corrcoef(a, b)[0, 1]), 6)

    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
