"""Observability: scalar state channels, error dashboards, run reports.

Covers the reference's L5 outputs (SURVEY.md §2.5):
* ``flatten_odometry`` — the odom/tf listener nodes that fan a pose track
  out into 13 named scalar topics for controllers/NodeRED dashboards
  (``tf_convenience_topics/src/odom_listener.cpp:46-109``,
  ``tf_listener.cpp:68-128``).
* ``error_dashboard`` — the matplotlib error plots + final stats of
  ``auv_particle_filter/scripts/visual_tools.py:60-146`` and the offline
  per-axis error plots of ``rosbags/rosbag_handler.py:7-49``.
* ``run_report`` — machine-readable per-mission summary (metrics + filter
  health) the reference never had.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import numpy as np

from . import metrics


def flatten_odometry(track: np.ndarray, twist: Optional[np.ndarray] = None,
                     altitude: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
    """(T, 6) pose track [+ (T, 6) twist] -> named scalar series.

    Mirrors the 13 Float64 topics of odom_listener.cpp: roll, pitch, yaw,
    x, y, z(depth), u, v, w, p, q, r, altitude.
    """
    track = np.asarray(track)
    out = {
        "x": track[:, 0], "y": track[:, 1], "depth": track[:, 2],
        "roll": track[:, 3], "pitch": track[:, 4], "yaw": track[:, 5],
    }
    if twist is not None:
        twist = np.asarray(twist)
        for i, name in enumerate(["u", "v", "w", "p", "q", "r"]):
            out[name] = twist[:, i]
    if altitude is not None:
        out["altitude"] = np.asarray(altitude)
    return out


def error_dashboard(
    t: np.ndarray,
    tracks: Dict[str, np.ndarray],   # name -> (T, >=3) pose tracks
    gt: np.ndarray,                  # (T, >=3)
    path: Optional[str] = None,
):
    """Per-source error plots + path-length/final-error stats
    (visual_tools.py semantics). Writes a PNG if ``path`` given; always
    returns the stats dict."""
    stats = {}
    for name, tr in tracks.items():
        tr = np.asarray(tr)
        err = np.linalg.norm(tr[:, :2] - gt[:, :2], axis=-1)
        stats[name] = {
            "path_length": float(np.sum(np.linalg.norm(np.diff(tr[:, :3], axis=0), axis=-1))),
            "final_error": float(err[-1]),
            "mean_error": float(err.mean()),
        }
    if path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(9, 7), sharex=True)
        for name, tr in tracks.items():
            tr = np.asarray(tr)
            axes[0].plot(tr[:, 0], tr[:, 1], label=name)
            axes[1].plot(t, np.linalg.norm(tr[:, :2] - gt[:, :2], axis=-1), label=name)
        axes[0].plot(gt[:, 0], gt[:, 1], "k--", label="ground truth")
        axes[0].set_xlabel("x [m]"), axes[0].set_ylabel("y [m]"), axes[0].legend()
        axes[1].set_xlabel("t [s]"), axes[1].set_ylabel("xy error [m]"), axes[1].legend()
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return stats


def run_report(est_pose: np.ndarray, gt_pose: np.ndarray,
               extra: Optional[dict] = None, path: Optional[str] = None) -> dict:
    import jax.numpy as jnp

    rep = metrics.summarize(jnp.asarray(est_pose), jnp.asarray(gt_pose))
    if extra:
        rep.update(extra)
    if path:
        with open(path, "w") as f:
            json.dump(rep, f, indent=2)
    return rep
