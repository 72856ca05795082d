from . import metrics, sim  # noqa: F401
