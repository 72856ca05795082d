from . import dead_reckoning, motion_model  # noqa: F401
