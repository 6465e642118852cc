from . import catalog, cookies, synthetic_web  # noqa: F401
