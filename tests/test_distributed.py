"""REAL multi-process jax.distributed coverage (2 processes x 4 CPU devices):
initialize() wiring, the ('dcn','data','model') multislice mesh, cross-process
sharded arrays, and a gradient step whose all-reduce rides the inter-process
(Gloo-on-CPU, DCN-on-pods) axis. This is the layer that replaces the
reference's torchrun/NCCL bootstrap (scripts/sft_stage_1.sh:44-45)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    from streaming_vlm_tpu.parallel.distributed import (
        batch_spec, initialize, make_multislice_mesh,
    )
    initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_multislice_mesh(num_slices=2, model_parallel=2)
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    # each process owns one dcn row (its 4 local devices)
    local = {d for d in mesh.devices[pid].ravel()}
    assert local == set(jax.local_devices())

    # global batch [8, 4] sharded over (dcn, data); each process feeds its half
    bsh = NamedSharding(mesh, batch_spec(mesh))
    assert bsh.spec == P(("dcn", "data"))
    xs_local = np.arange(pid * 16, pid * 16 + 16, dtype=np.float32).reshape(4, 4)
    xs = jax.make_array_from_process_local_data(bsh, xs_local)

    # replicated params; grad all-reduce crosses processes over the dcn axis
    w = jax.device_put(jnp.ones((4,), jnp.float32),
                       NamedSharding(mesh, P(None)))

    @jax.jit
    def loss_and_grad(w, x):
        def loss(w):
            return jnp.mean((x @ w) ** 2)
        return jax.value_and_grad(loss)(w)

    l, g = loss_and_grad(w, xs)
    # identical global result on every process
    print(f"RESULT {pid} {float(l):.6f} {float(g[0]):.6f}", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_training_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd()] + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, l, g = line.split()
                results[int(pid)] = (float(l), float(g))
    assert set(results) == {0, 1}, outs
    # every process sees the same GLOBAL loss/grad (the all-reduce crossed
    # the process boundary): mean over the full global batch
    import numpy as np

    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    w = np.ones(4, np.float32)
    expect_l = float(np.mean((x @ w) ** 2))
    g_exact = 2.0 * (x.T @ (x @ w)) / 8.0
    for pid in (0, 1):
        np.testing.assert_allclose(results[pid][0], expect_l, rtol=1e-5)
        np.testing.assert_allclose(results[pid][1], g_exact[0], rtol=1e-5)
    assert results[0] == results[1]
