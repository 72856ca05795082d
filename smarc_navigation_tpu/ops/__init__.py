from . import bezier, oned_kf, timeline  # noqa: F401
