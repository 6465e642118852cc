from . import spans  # noqa: F401
