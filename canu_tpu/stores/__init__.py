from .readset import ReadSet  # noqa: F401
