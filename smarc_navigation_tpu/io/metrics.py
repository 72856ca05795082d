"""Trajectory / filter-consistency metrics.

Covers the metric definitions the reference declares but never publishes
numbers for (SURVEY.md §6): per-axis error vs ground truth
(``rosbag_handler.py:22-35``), path length and final-position error
(``visual_tools.py:60-76``) — plus the NEES/NIS consistency statistics a
filter stack should have had all along.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.geometry import wrap_angle
from ..utils.linalg import spd_solve


def position_errors(est_pos: jnp.ndarray, gt_pos: jnp.ndarray) -> jnp.ndarray:
    """(T,3),(T,3) -> (T,) Euclidean position error."""
    return jnp.linalg.norm(est_pos - gt_pos, axis=-1)


def rmse(est: jnp.ndarray, gt: jnp.ndarray, angular: bool = False) -> jnp.ndarray:
    d = est - gt
    if angular:
        d = wrap_angle(d)
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))


def per_axis_error(est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(T, D) signed per-axis error track (rosbag_handler.py style)."""
    return est - gt


def path_length(pos: jnp.ndarray) -> jnp.ndarray:
    """(T,3) -> scalar travelled distance (visual_tools.py:60-69)."""
    return jnp.sum(jnp.linalg.norm(jnp.diff(pos, axis=0), axis=-1))


def final_error(est_pos: jnp.ndarray, gt_pos: jnp.ndarray) -> jnp.ndarray:
    """Final-position error (visual_tools.py:70-76)."""
    return jnp.linalg.norm(est_pos[-1] - gt_pos[-1])


def nees(err: jnp.ndarray, Sigma: jnp.ndarray) -> jnp.ndarray:
    """Normalized estimation error squared, per step.

    err (T, n) state error (angles pre-wrapped), Sigma (T, n, n) -> (T,).
    Consistent filter: mean ≈ n.
    """
    return jnp.sum(err * spd_solve(Sigma, err), axis=-1)


def nis(nu: jnp.ndarray, S: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Normalized innovation squared per measurement; mask selects real ones."""
    v = jnp.sum(nu * spd_solve(S, nu), axis=-1)
    if mask is not None:
        v = jnp.where(mask, v, 0.0)
    return v


def summarize(est_pose: jnp.ndarray, gt_pose: jnp.ndarray) -> dict:
    """Standard mission report: est/gt (T, 6) -> scalar metrics dict."""
    return {
        "rmse_pos": float(rmse(est_pose[:, :3], gt_pose[:, :3])),
        "rmse_att": float(rmse(est_pose[:, 3:6], gt_pose[:, 3:6], angular=True)),
        "final_error": float(final_error(est_pose[:, :3], gt_pose[:, :3])),
        "path_length_est": float(path_length(est_pose[:, :3])),
        "path_length_gt": float(path_length(gt_pose[:, :3])),
        "mean_error": float(jnp.mean(position_errors(est_pose[:, :3], gt_pose[:, :3]))),
        "max_error": float(jnp.max(position_errors(est_pose[:, :3], gt_pose[:, :3]))),
    }
