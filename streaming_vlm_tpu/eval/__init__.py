from . import efficiency, gpt_competitor, infstream, judge, livesports, mcq, ovobench, soak, vqa  # noqa: F401
