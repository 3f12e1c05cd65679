from . import engine, protocol, segments  # noqa: F401
