import os
import sys

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Parity tests compare f32 logits against torch; JAX's default matmul
# precision on some backends accumulates in bf16, which swamps the tolerance.
jax.config.update("jax_default_matmul_precision", "highest")
