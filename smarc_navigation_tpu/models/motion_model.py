"""SAM thrust-dynamics motion model.

Behavioral equivalent of the reference's simplified SAM equations of motion
(``sam_dead_reckoning/scripts/sam_mm.py:10-120``): body-plane acceleration
from thruster rpm and horizontal thrust-vector angle,

    nudot = M⁻¹ · τ(rpm, dr),   τ = (K_T·rpm·cos(dr), -K_T·rpm·sin(dr), 0)

with the rigid-body mass matrix M built from (m, I_zz, x_g, y_g). M is a
constant, so its inverse is folded at trace time; the model reduces to one
constant 3×3 matmul — trivially vmappable over fleets of vehicles.

Also provides the numeric state Jacobian helper (reference ``jacF``,
``sam_mm.py:128-145``) as an exact ``jax.jacfwd``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import SAMConfig


def mass_matrix(cfg: SAMConfig = SAMConfig()) -> np.ndarray:
    m, xg, yg = cfg.mass, cfg.x_g, cfg.y_g
    return np.array(
        [
            [m, 0.0, -m * yg],
            [0.0, m, m * xg],
            [-m * yg, m * xg, cfg.izz],
        ]
    )


def thrust_tau(control: jnp.ndarray, cfg: SAMConfig = SAMConfig()) -> jnp.ndarray:
    """control (..., 2) = (rpm, dr) -> body-plane generalized force (..., 3)."""
    rpm = control[..., 0] * cfg.rpm_scale
    dr = control[..., 1] * cfg.d_scale
    f_t = cfg.kt * rpm
    return jnp.stack([f_t * jnp.cos(dr), -f_t * jnp.sin(dr), jnp.zeros_like(f_t)], axis=-1)


def acceleration(control: jnp.ndarray, cfg: SAMConfig = SAMConfig()) -> jnp.ndarray:
    """control (..., 2) -> (u̇, v̇, ṙ) body accelerations (..., 3).

    Equivalent of ``SAM.motion(control)`` (``sam_mm.py:117-120``).
    """
    inv_m = jnp.asarray(np.linalg.inv(mass_matrix(cfg)), dtype=jnp.float32)
    return jnp.einsum("ij,...j->...i", inv_m, thrust_tau(control, cfg))


def dr_fallback_velocity(control: jnp.ndarray, dr_period: float,
                         cfg: SAMConfig = SAMConfig()) -> jnp.ndarray:
    """Motion-model fallback linear velocity used when DVL drops out.

    Matches ``dr_node.py:191-201``: take planar accelerations, flip the y
    component, zero the angular term, multiply by the DR period.
    """
    acc = acceleration(control, cfg)
    acc = jnp.stack([acc[..., 0], -acc[..., 1], jnp.zeros_like(acc[..., 0])], axis=-1)
    return acc * dr_period


def state_jacobian(eom_fn, state: jnp.ndarray, control: jnp.ndarray, dt: float) -> jnp.ndarray:
    """I + dt · ∂f/∂x — exact where the reference used central differences
    (``sam_mm.py:128-145``)."""
    J = jax.jacfwd(lambda s: eom_fn(s, control))(state)
    return jnp.eye(state.shape[-1], dtype=state.dtype) + dt * J
