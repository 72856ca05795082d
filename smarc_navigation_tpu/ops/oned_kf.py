"""Scalar constant-state Kalman smoother.

Behavioral equivalent of the reference's OneDKF
(``auv_ekf_localization/src/noise_oneD_kf.cpp:17-37``), used to de-noise DVL
velocity axes in the LoLo odometry provider
(``auv_odom_provider/src/odom_provider.cpp:94-96,311-313``).

Per step:  σ̂ = σ + r;  k = σ̂ / (σ̂ + q);  μ += k (z - μ);  σ = (1-k) σ̂

Exposed both as a single-step update (for use inside filter scan bodies) and
as a whole-sequence scan. All ops are elementwise, so the same code smooths
one axis or a (fleet × particles × axes) tensor of them.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class OneDKFState(NamedTuple):
    mu: jnp.ndarray
    sigma: jnp.ndarray


def init(mu0=0.0, sigma0=1.0, like: jnp.ndarray | None = None) -> OneDKFState:
    if like is not None:
        return OneDKFState(jnp.full_like(like, mu0), jnp.full_like(like, sigma0))
    return OneDKFState(jnp.asarray(mu0, jnp.float32), jnp.asarray(sigma0, jnp.float32))


def step(state: OneDKFState, z: jnp.ndarray, r: float, q: float) -> OneDKFState:
    sigma_hat = state.sigma + r
    k = sigma_hat / (sigma_hat + q)
    mu = state.mu + k * (z - state.mu)
    sigma = (1.0 - k) * sigma_hat
    return OneDKFState(mu=mu, sigma=sigma)


def masked_step(
    state: OneDKFState, z: jnp.ndarray, r: float, q: float, valid: jnp.ndarray
) -> OneDKFState:
    """Update only where ``valid`` (dropout handling); elsewhere hold state."""
    nxt = step(state, z, r, q)
    keep = lambda new, old: jnp.where(valid, new, old)
    return OneDKFState(mu=keep(nxt.mu, state.mu), sigma=keep(nxt.sigma, state.sigma))


def smooth(
    zs: jnp.ndarray, mu0=0.0, sigma0=1.0, r=10.0, q=20.0
) -> Tuple[OneDKFState, jnp.ndarray]:
    """Filter a whole sequence: zs (T, ...) -> (final state, filtered (T, ...))."""
    s0 = init(mu0, sigma0, like=zs[0])

    def body(s, z):
        s = step(s, z, r, q)
        return s, s.mu

    return jax.lax.scan(body, s0, zs)
