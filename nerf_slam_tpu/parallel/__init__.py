from . import mapping, tracking  # noqa: F401
