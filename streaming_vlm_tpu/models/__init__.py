from . import qwen25_vl  # noqa: F401
