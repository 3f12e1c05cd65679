from . import efficiency, infstream, judge, livesports, mcq, ovobench  # noqa: F401
