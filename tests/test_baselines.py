"""LiveCC baseline + VQA adapter smoke tests (tiny model, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.baselines.livecc import LiveCCConfig, LiveCCInfer
from streaming_vlm_tpu.eval.vqa import VQAChat
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
FTOK = FakeTokenizer(TOK)


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def test_livecc_interleaved_rounds(params):
    lc = LiveCCConfig(
        fps=2.0, initial_fps_frames=2, streaming_fps_frames=2,
        max_new_tokens=4, eos_base_threshold=0.0, eos_threshold_step=0.05,
        kv_capacity=1024,
    )
    infer = LiveCCInfer(CFG, params, FTOK, lc, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    grid = (1, 4, 4)
    h = grid[1] * CFG.vision.patch_size
    w = grid[2] * CFG.vision.patch_size
    kv = []
    for _ in range(3):
        frames = rng.integers(0, 255, size=(2, h, w, 3), dtype=np.uint8)
        gen = infer.commentate(frames, grid)
        assert 1 <= len(gen) <= 5
        kv.append(infer.engine.cached)
    assert infer.round == 3
    assert kv[0] < kv[1] < kv[2]  # LiveCC never evicts


def test_vqa_adapter_mcq(params, tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "img.png")
    arr = (np.random.default_rng(0).integers(0, 255, size=(56, 84, 3))).astype(np.uint8)
    Image.fromarray(arr).save(img_path)

    def decode(ids):
        return " ".join(str(i) for i in ids)

    chat = VQAChat(
        CFG, params, FTOK, decode,
        max_new_tokens=1, min_pixels=28 * 28, max_pixels=16 * 28 * 28,
    )
    out = chat.generate(
        [
            {"type": "image", "value": img_path},
            {"type": "text", "value": "Which option is correct?\nA. x\nB. y\nAnswer:"},
        ]
    )
    assert isinstance(out, str) and len(out) >= 1


def test_vlmevalkit_mcq_tsv_end_to_end(params, tmp_path):
    """A VLMEvalKit-format MCQ TSV (base64 images, A-D options, hint) runs
    end-to-end through VQAChat via the kit's prompt protocol."""
    import base64
    import csv
    import io

    from PIL import Image

    from streaming_vlm_tpu.eval.vqa import extract_option, run_mcq_tsv

    rng = np.random.default_rng(0)

    def b64_image(seed):
        arr = rng.integers(0, 255, size=(56, 84, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    tsv = str(tmp_path / "mcq.tsv")
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["index", "image", "question", "hint", "A", "B", "C", "D", "answer"])
        w.writerow([0, b64_image(0), "What is shown?", "", "cat", "dog", "car", "sky", "A"])
        w.writerow([1, b64_image(1), "Pick one.", "a hint", "x", "y", "z", "", "B"])

    def decode(ids):
        return "A" if ids else ""  # deterministic fake decode -> option A

    chat = VQAChat(
        CFG, params, FTOK, decode,
        max_new_tokens=1, min_pixels=28 * 28, max_pixels=16 * 28 * 28,
    )
    out = str(tmp_path / "preds.jsonl")
    res = run_mcq_tsv(chat, tsv, out)
    assert res["total"] == 2
    import json as _json

    recs = [_json.loads(l) for l in open(out)]
    assert len(recs) == 2 and all(r["choice"] in ("A", None) for r in recs)

    # option extraction protocol
    assert extract_option("B. dog", ["A", "B"]) == "B"
    assert extract_option("b", ["A", "B"]) == "B"
    assert extract_option("unrelated", ["A", "B"]) is None
