from . import schur, ba  # noqa: F401
