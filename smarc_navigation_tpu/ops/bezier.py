"""Bernstein/Bézier extrapolation over a stamped sensor window.

The reference covers DVL dropouts by extrapolating the last W readings with
Bernstein-polynomial weights (``odom_provider.cpp:126-165``,
``ekf_localization.cpp:328-358``): with window stamps s_0..s_n (oldest..
newest) and query time t, the parameter is x = (t - s_n)/(s_n - s_0) and the
reading taken with coefficient C(n,l)·(1-x)^{n-l}·x^l is the (n-l)-th newest.

Here it is one fixed-shape dot product — jit/vmap-friendly, mask-safe when
the window is not yet full.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def bernstein_weights(stamps: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Per-window-slot weights, oldest..newest order.

    stamps: (..., W) ascending; t: (...,) query time -> (..., W) weights.
    """
    W = stamps.shape[-1]
    n = W - 1
    span = stamps[..., -1] - stamps[..., 0]
    safe_span = jnp.where(jnp.abs(span) < 1e-9, 1.0, span)
    x = (t - stamps[..., -1]) / safe_span
    ls = jnp.arange(W, dtype=stamps.dtype)
    binom = jnp.asarray([math.comb(n, int(l)) for l in range(W)], dtype=stamps.dtype)
    # coefficient for index l weights reading (n-l) [0-indexed from newest]
    coef = binom * (1.0 - x[..., None]) ** (n - ls) * x[..., None] ** ls
    # map to oldest..newest storage: value index (n-l) from newest == l from oldest
    weights = coef[..., ::-1]
    # degenerate window (all same stamp): fall back to latest reading
    latest = jnp.zeros(W, dtype=stamps.dtype).at[-1].set(1.0)
    return jnp.where((jnp.abs(span) < 1e-9)[..., None], latest, weights)


def bezier_interpolate(
    values: jnp.ndarray,   # (..., W, D) oldest..newest
    stamps: jnp.ndarray,   # (..., W)
    t: jnp.ndarray,        # (...,)
) -> jnp.ndarray:
    """Extrapolated reading at time t: Σ_l w_l · v_l  -> (..., D)."""
    w = bernstein_weights(stamps, t)
    return jnp.einsum("...w,...wd->...d", w, values)
