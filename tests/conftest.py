import os
import resource
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA:CPU compiles large GSPMD programs (8-partition 7B-geometry tests) with
# deep LLVM recursion on the calling thread; the default 8 MB soft stack
# limit segfaulted the suite mid-compile twice (2026-08-18, faulthandler
# trace inside backend_compile_and_load). The hard limit is unlimited here —
# raise the soft limit to 512 MB before any jax/XLA initialisation.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_target = 512 * 2**20 if _hard == resource.RLIM_INFINITY else min(512 * 2**20, _hard)
if _soft != resource.RLIM_INFINITY and _soft < _target:
    resource.setrlimit(resource.RLIMIT_STACK, (_target, _hard))

import jax

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by
# bench.py. The axon sitecustomize forces jax_platforms='axon,cpu' after
# import, so env vars are not enough — override the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_code_volume():
    """Drop jit caches after every test module. The suite compiles hundreds
    of XLA:CPU executables in one process; past a cumulative volume the
    LLVM JIT segfaults inside a later compile (reproduced 3x on 2026-08-18,
    always in backend_compile_and_load once the 8-partition 7B-geometry
    GSPMD tests preceded test_train). Cross-module cache hits are rare
    (modules use distinct configs), so this costs little and bounds the
    live compiled-code volume."""
    yield
    jax.clear_caches()

# Parity tests compare f32 logits against torch; JAX's default matmul
# precision on some backends accumulates in bf16, which swamps the tolerance.
jax.config.update("jax_default_matmul_precision", "highest")
