from . import grid, pipeline, zsort  # noqa: F401
