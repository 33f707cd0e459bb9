from . import geometry, lie, similarity  # noqa: F401
