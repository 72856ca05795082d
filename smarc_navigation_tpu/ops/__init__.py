from . import assignment, bezier, oned_kf, raycast, resampling, sonar, timeline  # noqa: F401
