from . import geometry, geodesy, linalg  # noqa: F401
