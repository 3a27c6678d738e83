from . import flow_match  # noqa: F401
