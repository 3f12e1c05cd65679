from . import language, model, rope, vision  # noqa: F401
