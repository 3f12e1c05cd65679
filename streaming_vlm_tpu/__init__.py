"""streaming-vlm-tpu: TPU-native framework for real-time infinite video understanding.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of StreamingVLM
(reference at /root/reference): Qwen2.5-VL models, a bounded streaming KV
cache with attention sinks + sliding windows + contiguous RoPE re-indexing,
a streaming serving loop, SFT training, and the reference's eval harnesses.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
