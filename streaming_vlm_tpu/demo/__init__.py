from .app import LiveCaptionServer, stream_segments  # noqa: F401
