"""Validate the committed on-chip PRNG statistics artifact.

The PF kernel's noise comes from the TPU hardware PRNG through fast-math
Box-Muller (``ops/pf_kernels.py``); the interpreter PRNG is degenerate, so
the distributional evidence lives in ``data/prng_stats_tpu.json``,
generated on the real chip by ``data/make_prng_stats.py``. This test pins
the artifact's numbers to N(0,1) acceptance bounds so a bad regeneration
(or a kernel change that skews the stream) fails CI.
"""

import json
import os

# chi2(13 dof) upper quantiles: 0.999 -> 34.5
_CHI2_13_999 = 34.5


def _load():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "data", "prng_stats_tpu.json")
    assert os.path.exists(path), "run data/make_prng_stats.py on the TPU"
    with open(path) as f:
        return json.load(f)


def test_prng_artifact_moments():
    rep = _load()
    n = rep["samples_per_stream"]
    assert n >= 1 << 24
    # se(mean) = 1/sqrt(n); allow 5 sigma. var/skew/kurt bounds likewise
    # loose 5-sigma-ish envelopes for n ~ 16.8M
    tol_mean = 5.0 / n ** 0.5
    for name, s in rep["streams"].items():
        assert abs(s["mean"]) < tol_mean, (name, s)
        assert abs(s["var"] - 1.0) < 0.005, (name, s)
        assert abs(s["skew"]) < 0.005, (name, s)
        assert abs(s["kurtosis"] - 3.0) < 0.02, (name, s)


def test_prng_artifact_chi2_and_correlations():
    rep = _load()
    for name, s in rep["streams"].items():
        assert s["chi2_14bin"] < _CHI2_13_999, (name, s)
    assert abs(rep["corr_xy"]) < 0.005
    assert abs(rep["corr_xyaw"]) < 0.005
    assert abs(rep["corr_consecutive_ticks"]) < 0.005


def test_prng_artifact_matches_current_kernel_layout():
    """The artifact must describe the CURRENT kernel: the generation layout
    constants it depends on are pinned here so a layout change forces a
    regeneration."""
    from smarc_navigation_tpu.ops import pf_kernels
    import inspect

    src = inspect.getsource(pf_kernels._kernel)
    # (32, n/8) block generation + quarter-wave sincos + fast ln
    assert "prng_random_bits((32, n8))" in src
    assert "_sin2pi" in src and "_fast_ln" in src
