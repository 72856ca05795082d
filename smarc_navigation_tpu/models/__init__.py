from . import (  # noqa: F401
    dead_reckoning,
    ekf_15state,
    ekf_localization,
    ekf_slam,
    motion_model,
    particle_filter,
    sensors,
)
