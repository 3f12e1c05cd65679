import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by
# bench.py. The axon sitecustomize forces jax_platforms='axon,cpu' after
# import, so env vars are not enough — override the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity tests compare f32 logits against torch; JAX's default matmul
# precision on some backends accumulates in bf16, which swamps the tolerance.
jax.config.update("jax_default_matmul_precision", "highest")
