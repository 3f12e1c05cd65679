"""Where does the ~30-50 ms chunk vision encode go? In-graph ablations of the
ViT at the bench grid (1, 32, 64) = 2048 patches, amortized over a fori_loop.

PYTHONPATH=.:/root/.axon_site python tools/profile_vision.py
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os

    from streaming_vlm_tpu.config import qwen25_vl_3b
    from streaming_vlm_tpu.models.qwen25_vl import model, vision

    cfg = qwen25_vl_3b()
    grid = (1, 32, 64)
    v = cfg.vision
    S = int(np.prod(grid))
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2

    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if os.environ.get("SVT_QUANT", "int8") == "int8":
        from streaming_vlm_tpu.ops.quant import quantize_model_params

        params = quantize_model_params(params, donate=True)
    params = jax.tree.map(jax.block_until_ready, params)

    patches = jax.random.normal(jax.random.PRNGKey(1), (S, patch_dim), jnp.bfloat16)

    def make(vcfg):
        geo = vision.vision_geometry(
            (grid,), vcfg.window_size, vcfg.spatial_merge_size, vcfg.patch_size,
            vcfg.use_windows,
        )
        ang = jnp.asarray(vision.vision_rope_angles(geo["pos_ids"], vcfg.head_dim, vcfg.rope_theta))
        kw = dict(
            rope_angles=ang,
            patch_perm=jnp.asarray(geo["patch_perm"]),
            reverse_unit_perm=jnp.asarray(geo["reverse"]),
            win_seg=jnp.asarray(geo["win_seg"]),
            full_seg=jnp.asarray(geo["full_seg"]),
            uniform_window=int(geo.get("uniform_window", 0)),
        )

        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(vp, x, reps):
            def body(h, _):
                o = vision.vision_forward(vcfg, vp, x + h[0, 0].astype(x.dtype) * 0, **kw)
                return h + o[:4, :4].astype(jnp.float32), None
            h, _ = jax.lax.scan(body, jnp.zeros((4, 4), jnp.float32), None, length=reps)
            return h

        return run

    def timeit(name, fn, *args):
        for reps in (1, 6):
            np.asarray(fn(*args, reps))
        t1, t6 = [], []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(fn(*args, 1)); t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(fn(*args, 6)); t6.append(time.perf_counter() - t0)
        per = (min(t6) - min(t1)) / 5.0
        print(f"{name:32s} {per*1e3:8.2f} ms/encode", flush=True)

    print(f"grid={grid} S={S} depth={v.depth} full_blocks={v.fullatt_block_indexes}")
    timeit("full ViT (as in bench)", make(v), params["vision"], patches)
    v_nofull = dataclasses.replace(v, fullatt_block_indexes=())
    timeit("all-windowed (no full blocks)", make(v_nofull), params["vision"], patches)
    v_nowin = dataclasses.replace(v, use_windows=False, fullatt_block_indexes=tuple(range(v.depth)))
    timeit("all-full (no windowing)", make(v_nowin), params["vision"], patches)


if __name__ == "__main__":
    main()
