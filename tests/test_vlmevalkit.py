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


def test_videomme_template_parity_with_kit():
    """Our VideoMME prompt constants must match the kit's class attributes
    (the kit's VideoMME cannot be instantiated offline — its TSV is MD5-pinned
    to the HF download, videomme.py:32,62-74 — so the runner replicates its
    build_prompt; this pins the replication to the kit's source)."""
    from streaming_vlm_tpu.eval.vlmeval_compat import load_vlmeval
    from streaming_vlm_tpu.eval.vqa import (
        VIDEOMME_FRAMES_TMPL_NOSUB,
        VIDEOMME_SYS,
    )

    load_vlmeval(KIT_PATH)
    from vlmeval.dataset.videomme import VideoMME

    assert VideoMME.SYS == VIDEOMME_SYS
    assert VideoMME.FRAMES_TMPL_NOSUB == VIDEOMME_FRAMES_TMPL_NOSUB
    # the video_llm message shape: SYS text, the video, template, question
    import inspect

    src = inspect.getsource(VideoMME.build_prompt)
    # the source spells the newline as a \n escape
    assert "Question: {}\\nAnswer: " in src  # our runner's question format


def test_videomme_end_to_end_synthesized_clip(tiny_chat, tmp_path):
    """A VideoMME-format dataset over a synthesized mp4 runs end-to-end
    through the VIDEO message path: native ingest samples frames at the
    configured fps, the model sees video_pad tokens + video grids, and a
    prediction is produced per item (VERDICT r2 missing #1)."""
    import csv

    from streaming_vlm_tpu.eval.vqa import run_videomme_tsv
    from streaming_vlm_tpu.video.ingest import write_test_video

    vdir = tmp_path / "video"
    vdir.mkdir()
    write_test_video(str(vdir / "clip0.mp4"), w=64, h=48, n_frames=30, fps=10)
    write_test_video(str(vdir / "clip1.mp4"), w=64, h=48, n_frames=20, fps=10)

    rows = [
        {
            "index": "0",
            "video": "clip0",
            "question": "What moves across the frame?",
            "candidates": "['A. a square', 'B. a circle', 'C. text', 'D. nothing']",
            "answer": "A",
        },
        {
            "index": "1",
            "video": "clip1",
            "question": "What color dominates?",
            "candidates": "['A. red', 'B. green', 'C. blue', 'D. black']",
            "answer": "C",
        },
    ]
    tsv = tmp_path / "VideoMME_tiny.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        w.writeheader()
        w.writerows(rows)

    tiny_chat.fps = 1.0  # Video-MME_1fps operating point
    out = tmp_path / "preds.jsonl"
    res = run_videomme_tsv(
        tiny_chat, str(tsv), str(out), data_root=str(tmp_path)
    )
    assert res["total"] == 2
    assert len(out.read_text().strip().splitlines()) == 2


def test_vqachat_video_nframe_sampling(tiny_chat, tmp_path):
    """nframe mode (MVBench_64frame style): evenly-spaced frames, padded to
    the temporal patch factor, with second_per_grid_ts from the sampled
    interval."""
    from streaming_vlm_tpu.video.ingest import write_test_video

    path = str(tmp_path / "clip.mp4")
    write_test_video(path, w=64, h=48, n_frames=25, fps=10)

    tiny_chat.fps = None
    tiny_chat.nframe = 6
    patches, grid, spgt = tiny_chat._load_video(path)
    assert grid[0] == 3  # 6 frames / temporal_patch_size 2
    # sampled interval ~ duration/6 -> spgt = tps / sampled_fps
    assert 0.2 < spgt < 2.0
    pred = tiny_chat.generate(
        [
            {"type": "video", "value": path},
            {"type": "text", "value": "Question: anything?\nAnswer: "},
        ],
        dataset="MVBench",
    )
    assert isinstance(pred, str)


def test_vqachat_cached_decode_matches_full_reforward(tiny_chat, tmp_path):
    """The KV-cached generation path must emit exactly the same greedy
    tokens as a full re-forward per token (the pre-r3 quadratic path)."""
    import jax.numpy as jnp

    from streaming_vlm_tpu.models.qwen25_vl import model as m
    from streaming_vlm_tpu.video.ingest import patchify_frames

    tiny_chat.max_new_tokens = 8
    img = tmp_path / "sq.png"
    from PIL import Image

    Image.new("RGB", (56, 56), (200, 40, 40)).save(img)
    msgs = [
        {"type": "image", "value": str(img)},
        {"type": "text", "value": "Describe the image in a few words."},
    ]
    pred_cached = tiny_chat.generate(msgs)

    # oracle: the old quadratic loop over forward_full
    cfg = tiny_chat.cfg
    tok = cfg.tokens
    frames = tiny_chat._load_image(str(img))
    patches, grid = patchify_frames(
        frames, patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    n = patches.shape[0] // cfg.vision.spatial_merge_unit
    body = (
        f"<|vision_start|>{'<|image_pad|>' * n}<|vision_end|>"
        "Describe the image in a few words."
    )
    prompt = (
        f"<|im_start|>system\n{tiny_chat.system_prompt}<|im_end|>\n"
        f"<|im_start|>user\n{body}<|im_end|>\n<|im_start|>assistant\n"
    )
    ids = np.asarray(tiny_chat.encode(prompt), np.int32)
    out = []
    for _ in range(8):
        logits = np.asarray(
            m.forward_full(
                cfg, tiny_chat.params, ids,
                pixel_patches=jnp.asarray(patches),
                image_grid_thw=np.array([list(grid)]),
            )
        )[-1]
        nxt = int(np.argmax(logits))
        if nxt == tok.im_end:
            break
        out.append(nxt)
        ids = np.concatenate([ids, [nxt]]).astype(np.int32)
    assert pred_cached == tiny_chat.decode(out)
