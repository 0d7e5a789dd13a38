from . import gbq  # noqa: F401
