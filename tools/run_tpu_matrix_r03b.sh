#!/bin/bash
# Serial TPU measurement matrix for the late-r3 int8-KV work (run when the
# axon tunnel is healthy; each step is independently retryable).
# Usage: bash tools/run_tpu_matrix_r03b.sh [step...]   (default: all)
set -u
cd "$(dirname "$0")/.."
steps=${@:-ab7b8 ms7b8 ab3b}

probe() {
  timeout 120 python -c "
import numpy as np, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float(np.asarray(x@x)[0,0]) == 256.0" >/dev/null 2>&1
}

for s in $steps; do
  until probe; do echo "$(date) tunnel down; retry in 180s"; sleep 180; done
  case $s in
    ab3b)
      # paired ABBA: does the int8 arena cost anything single-stream at 3B?
      echo "=== [ab3b] bench --ab SVT_KV_QUANT=int8 (3B single-stream)"
      timeout 4000 python bench.py --ab SVT_KV_QUANT=int8 --chunks 30 \
        > BENCH_AB_KVQUANT_r03.json 2> /tmp/ab_kvq.log \
        && cat BENCH_AB_KVQUANT_r03.json || tail -5 /tmp/ab_kvq.log
      ;;
    ms7b8)
      # the headline attempt: 8 int8 lanes of 7B on one chip
      echo "=== [ms7b8] 7B x8 streams, int8 KV lanes"
      SVT_KV_QUANT=int8 timeout 4000 python bench.py --model 7b --streams 8 \
        --chunks 26 > /tmp/bench_7b_ms8_int8.json 2> /tmp/bench_7b_ms8_int8.log \
        && cat /tmp/bench_7b_ms8_int8.json || tail -8 /tmp/bench_7b_ms8_int8.log
      ;;
    ab7b8)
      : # placeholder kept for ordering compat
      ;;
    ms3b10)
      echo "=== [ms3b10] 3B x10 streams, int8 KV lanes (max-aggregate probe)"
      SVT_KV_QUANT=int8 timeout 4000 python bench.py --model 3b --streams 10 \
        --chunks 26 > /tmp/bench_3b_ms10_int8.json 2> /tmp/bench_3b_ms10_int8.log \
        && cat /tmp/bench_3b_ms10_int8.json || tail -8 /tmp/bench_3b_ms10_int8.log
      ;;
  esac
done
