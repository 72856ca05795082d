from . import fleet, mesh  # noqa: F401
