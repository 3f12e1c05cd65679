from . import livecc  # noqa: F401
