"""Generate the committed sample mission log (sample_mission.npz).

A 90 s LoLo-style survey from the package simulator, written in the
recorded-log schema of ``io/logs.py`` — the file a user would get from
converting a rosbag with ``io.bag_convert`` (stream payloads follow
``rosbag_handler.py:7-49``'s topics). Committed so the repo carries a
replayable end-to-end artifact; regenerate with:

    python data/make_sample_log.py
"""

import os

import numpy as np

from smarc_navigation_tpu.io import logs, sim
from smarc_navigation_tpu.models import particle_filter  # noqa: F401
from smarc_navigation_tpu.utils.geometry import quat_from_rpy


def main(path=None):
    import jax.numpy as jnp

    path = path or os.path.join(os.path.dirname(__file__), "sample_mission.npz")
    m = sim.simulate(sim.MissionSpec(
        duration_s=90.0, num_landmarks=18, mbes_std=0.05,
        landmark_area_m=60.0, mbes_range_m=30.0, gps_std=0.3, seed=42))
    streams = logs.mission_to_log(m)
    streams["mbes"] = streams.pop("mbes_detections")
    # odom stream (13-dim nav_msgs/Odometry payload) at 10 Hz from GT +
    # body rates, standing in for the DR provider's recorded output
    ticks = np.arange(0.0, m.spec.duration_s, 0.1)
    gt = m.gt_at(ticks)
    quat = np.asarray(quat_from_rpy(jnp.asarray(gt[:, 3:6])))
    k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
    odom13 = np.concatenate([gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], axis=1)
    streams["odom"] = {"stamps": ticks, "values": odom13}
    logs.save_log(path, streams, meta={
        "vehicle": "lolo", "source": "data/make_sample_log.py",
        "schema": "io/logs.py", "seed": 42, "duration_s": 90.0,
    })
    print(f"wrote {path} ({os.path.getsize(path)/1024:.0f} KiB, "
          f"streams: {sorted(streams)})")


if __name__ == "__main__":
    main()
