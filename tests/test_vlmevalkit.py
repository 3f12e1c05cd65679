"""Drive a REAL VLMEvalKit checkout end-to-end: the kit builds the dataset
(ImageMCQDataset over a local TSV) and every prompt; our VQAChat answers.
Skipped when no kit checkout is available (the reference repo ships one)."""

import base64
import io
import os

import numpy as np
import pytest

KIT_PATH = os.environ.get(
    "SVT_VLMEVAL_PATH", "/root/reference/eval/VLMEvalKit"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(KIT_PATH, "vlmeval")),
    reason=f"no VLMEvalKit checkout at {KIT_PATH}",
)


def _png_b64(color):
    from PIL import Image

    img = Image.new("RGB", (56, 56), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture()
def tiny_chat():
    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import qwen25_vl_tiny
    from streaming_vlm_tpu.eval.vqa import VQAChat
    from streaming_vlm_tpu.models.qwen25_vl import model
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer

    cfg = qwen25_vl_tiny()
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tok = FakeTokenizer(cfg.tokens)

    def decode(ids):
        return " ".join(str(i) for i in ids)

    return VQAChat(
        cfg, params, tok, decode,
        max_new_tokens=1, min_pixels=28 * 28, max_pixels=16 * 28 * 28,
    )


def test_kit_mcq_end_to_end(tiny_chat, tmp_path):
    import csv

    from streaming_vlm_tpu.eval.vlmeval_compat import load_vlmeval, run_kit_mcq

    # local custom dataset in the kit's LMUData TSV format
    lmu = tmp_path / "LMUData"
    lmu.mkdir()
    os.environ["LMUData"] = str(lmu)
    rows = [
        {
            "index": "0",
            "question": "What color is the square?",
            "A": "red",
            "B": "green",
            "C": "blue",
            "D": "yellow",
            "answer": "A",
            "image": _png_b64((255, 0, 0)),
        },
        {
            "index": "1",
            "question": "What color is the square?",
            "A": "red",
            "B": "green",
            "C": "blue",
            "D": "yellow",
            "answer": "C",
            "image": _png_b64((0, 0, 255)),
        },
    ]
    with open(lmu / "TinySquares.tsv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        w.writeheader()
        w.writerows(rows)

    kit = load_vlmeval(KIT_PATH)
    assert "VLMEvalKit" in kit.__file__

    out = tmp_path / "preds.jsonl"
    res = run_kit_mcq(
        tiny_chat, "TinySquares", kit_path=KIT_PATH, out_path=str(out)
    )
    # random tiny weights -> accuracy is arbitrary; the CONTRACT is that the
    # kit loaded the TSV, dumped images, built 2 prompts, and our adapter
    # produced a prediction for each
    assert res["total"] == 2
    assert out.exists() and len(out.read_text().strip().splitlines()) == 2


def test_kit_prompt_parity_with_builtin_runner(tiny_chat, tmp_path):
    """The kit's build_prompt and our vendored-free build_mcq_message agree on
    the final text prompt (instruction wording drift would silently change
    results between the two paths)."""
    import csv

    from streaming_vlm_tpu.eval.vlmeval_compat import load_vlmeval
    from streaming_vlm_tpu.eval.vqa import build_mcq_message

    lmu = tmp_path / "LMUData"
    lmu.mkdir()
    os.environ["LMUData"] = str(lmu)
    row = {
        "index": "0",
        "question": "Pick B.",
        "A": "no",
        "B": "yes",
        "answer": "B",
        "image": _png_b64((0, 255, 0)),
    }
    with open(lmu / "TinyParity.tsv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row), delimiter="\t")
        w.writeheader()
        w.writerow(row)

    load_vlmeval(KIT_PATH)
    from vlmeval.dataset.image_mcq import ImageMCQDataset

    ds = ImageMCQDataset(dataset="TinyParity")
    kit_msgs = ds.build_prompt(ds.data.iloc[0])
    kit_text = "".join(m["value"] for m in kit_msgs if m["type"] == "text")

    img_dir = tmp_path / "imgs_ours"
    img_dir.mkdir()
    ours = build_mcq_message(row, str(img_dir))
    our_text = "".join(m["value"] for m in ours if m["type"] == "text")
    assert kit_text == our_text
