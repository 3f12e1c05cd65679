"""Run the four efficiency configs (a-d) on the real TPU over a synthesized
video and write EFFICIENCY_TPU.json — the paper's headline comparison
(reference eval/efficiency/efficiency_test.py): (d) streaming stays flat
while (a) full attention grows and (c) recompute pays the window re-prefill
every chunk.

Usage: python scripts/efficiency_tpu.py [--duration 120] [--modes abcd]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--duration", type=float, default=120.0)
    p.add_argument("--modes", default="abcd")
    p.add_argument("--out", default="EFFICIENCY_TPU.json")
    p.add_argument("--quantize", default="int8", choices=["int8", "none"])
    p.add_argument("--kv-capacity", type=int, default=None,
                   help="explicit arena capacity override: kv_capacity_for "
                        "sizes for 560 tok/chunk worst case; real grids can "
                        "be far smaller, and config (a) at long horizons "
                        "must not allocate a 30 GB bf16 arena")
    p.add_argument("--buckets", default=None,
                   help="comma-separated prefill buckets override (fault "
                        "playbook: a different bucket is a different "
                        "executable when the tunnel fault pins itself)")
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import qwen25_vl_3b
    from streaming_vlm_tpu.eval.efficiency import run_efficiency
    from streaming_vlm_tpu.models.qwen25_vl import model
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
    from streaming_vlm_tpu.video import ingest

    cfg = qwen25_vl_3b()
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if args.quantize == "int8":
        from streaming_vlm_tpu.ops.quant import quantize_model_params

        params = quantize_model_params(params, donate=True)
    params = jax.tree.map(jax.block_until_ready, params)

    n_frames = int((args.duration + 4) * 10)
    # bench operating-point geometry: 896x448 -> grid (1,32,64) = 512 vision
    # tokens/chunk (~533 with text), the reference's own chunk size class
    vid = f"/tmp/efficiency_clip_896x448_{n_frames}.mp4"
    ingest.build_native()
    if not os.path.exists(vid):
        ingest.write_test_video(vid, w=896, h=448, n_frames=n_frames, fps=10)

    summaries = {}
    for mode in args.modes:
        print(f"=== config ({mode}) ===", file=sys.stderr, flush=True)
        overrides = {}
        if args.buckets:
            overrides["prefill_buckets"] = tuple(
                int(x) for x in args.buckets.split(",")
            )
        if args.kv_capacity:
            overrides["kv_capacity"] = args.kv_capacity
        overrides = overrides or None
        rep = run_efficiency(
            cfg=cfg,
            params=params,
            tokenizer=FakeTokenizer(cfg.tokens),
            video_path=vid,
            baseline_mode=mode,
            duration=args.duration,
            output_dir="/tmp/efficiency_out",
            dtype=jnp.bfloat16,
            stream_overrides=overrides,
        )
        per = rep["per_chunk"]
        times = [c["gen_time_sec"] for c in per]
        # skip warmup/compile chunks for the steady metrics
        steady = times[4:]
        summaries[mode] = {
            **rep["summary"],
            "steady_p50_sec": float(np.median(steady)) if steady else None,
            "first_quarter_p50_sec": float(
                np.median(steady[: max(len(steady) // 4, 1)])
            ),
            "last_quarter_p50_sec": float(
                np.median(steady[-max(len(steady) // 4, 1) :])
            ),
            "n_chunks": len(per),
        }
        print(json.dumps({mode: summaries[mode]}), file=sys.stderr, flush=True)

    with open(args.out, "w") as f:
        json.dump(
            {
                "hardware": "v5e-1 (axon tunnel)",
                "model": "qwen2_5_vl_3b random weights, "
                + ("int8 W8A8" if args.quantize == "int8" else "bf16"),
                "duration_sec": args.duration,
                "configs": summaries,
            },
            f,
            indent=1,
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
