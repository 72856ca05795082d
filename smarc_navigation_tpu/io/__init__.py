from . import map_server, metrics, observability, replay, sim  # noqa: F401
