from . import caption, metrics  # noqa: F401
