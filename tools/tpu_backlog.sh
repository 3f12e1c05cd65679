#!/bin/bash
# Unattended TPU-backlog runner: wait for the axon tunnel to recover, then
# run the measurements that were blocked by the 2026-08-17/18 outage,
# strictly serially (two processes sharing the tunnel starve each other).
#
# Usage: nohup bash tools/tpu_backlog.sh >> /tmp/tpu_backlog.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

# stop the standalone probe loop if one is running (we probe ourselves)
if [ -f /tmp/tunnel_probe.pid ]; then
  kill "$(cat /tmp/tunnel_probe.pid)" 2>/dev/null || true
  rm -f /tmp/tunnel_probe.pid
fi

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((512, 512), jnp.bfloat16)
assert np.asarray((x @ x)[:1, :1])[0, 0] == 512
EOF
}

echo "[$(date -u +%F' '%T)] waiting for tunnel..."
until probe; do
  echo "[$(date -u +%F' '%T)] tunnel still down"
  sleep 300
done
echo "[$(date -u +%F' '%T)] TUNNEL UP — running backlog"

# 1. int8 KV arena A/B (ABBA, drift-cancelling). ~4 bench subprocesses.
echo "[$(date -u +%F' '%T)] bench --ab SVT_KV_QUANT=int8"
timeout 10800 python bench.py --ab SVT_KV_QUANT=int8 \
  > BENCH_AB_KVQUANT_r03.json 2> /tmp/bench_ab_kvquant.err
echo "[$(date -u +%F' '%T)] ab kvquant rc=$? -> BENCH_AB_KVQUANT_r03.json"
cat BENCH_AB_KVQUANT_r03.json || true

# 2. 7B x 8 streams, int8 KV (the lane-count win int8 KV buys at 7B;
#    bf16 arenas cap at B=5 on 16 GB).
echo "[$(date -u +%F' '%T)] 7b --streams 8 int8-kv"
SVT_KV_QUANT=int8 timeout 10800 python bench.py --model 7b --streams 8 \
  > BENCH_7B_MS8_INT8_r03.json 2> /tmp/bench_7b_ms8.err
echo "[$(date -u +%F' '%T)] 7b ms8 rc=$? -> BENCH_7B_MS8_INT8_r03.json"
cat BENCH_7B_MS8_INT8_r03.json || true

echo "[$(date -u +%F' '%T)] backlog done"
