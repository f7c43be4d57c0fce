from . import corr  # noqa: F401
