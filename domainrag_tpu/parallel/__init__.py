from . import mesh, sharding, collectives  # noqa: F401
