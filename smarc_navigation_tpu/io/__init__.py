from . import map_server, metrics, observability, replay, sim, uw_gps  # noqa: F401
