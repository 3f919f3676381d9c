from . import keys  # noqa: F401
