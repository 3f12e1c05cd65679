"""SFT trainer: streaming-aligned training loop with grad accumulation,
checkpoint/auto-resume, and jsonl metrics.

Reference recipe (train.py, scripts/sft_stage_1.sh): 8-way data parallel,
per-device batch 1, grad-accum 64, bf16, lr 1e-5, frozen ViT, save_steps 20,
save_total_limit 10, auto-resume by scanning run dirs for the latest
checkpoint containing trainer_state.json (train.py:24-63). Here: one jitted
train step over (optionally mesh-sharded) params; ZeRO-3 becomes FSDP
sharding rules in parallel/mesh.py; metrics go to metrics.jsonl (the
W&B-equivalent observability stream).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig
from ..data.dataset import StreamExample
from ..models.qwen25_vl import language, model
from ..utils.buckets import bucket_for
from .step import make_optimizer, sft_loss


@dataclasses.dataclass
class TrainConfig:
    output_dir: str = "runs/sft"
    learning_rate: float = 1e-5
    warmup_steps: int = 10
    max_steps: int = 1000
    grad_accum: int = 64
    grad_clip: float = 1.0
    weight_decay: float = 0.0
    save_steps: int = 20
    save_total_limit: int = 10
    log_every: int = 1
    seed: int = 42
    seq_buckets: tuple = (512, 1024, 2048, 4096, 8192)
    vis_buckets: tuple = (256, 512, 1024, 2048, 4096)
    # activation checkpointing on the decoder layer scan: "full" matches the
    # reference's gradient_checkpointing recipe (sft_stage_1.sh:45); "none"
    # is faster when memory allows, "dots" in between
    remat: str = "full"
    # examples decoded ahead on a background thread while the device steps
    # (the reference hides its CPU-heavy __getitem__ behind 32 dataloader
    # workers, sft_stage_1.sh:45 dataloader_num_workers; here one worker
    # suffices because only the video decode is host-bound). 0 = synchronous.
    prefetch: int = 2
    # how the loss distributes over the Trainer's mesh (docs/PARALLELISM.md):
    # "gspmd" = DP/FSDP/TP via the sharding rules (params pre-sharded with
    # shard_params, collectives inferred); "pp" = GPipe over a 'stage' axis
    # (parallel/pipeline.py); "sp" = ring attention over a 'seq' axis
    # (parallel/ring.py). "pp"/"sp" require mesh=; grads are exactly the
    # "gspmd" step's (tests/test_pipeline.py, tests/test_ring.py)
    parallel_mode: str = "gspmd"


def find_resume_checkpoint(output_dir: str) -> Optional[str]:
    """Latest checkpoint-* dir containing trainer_state.json (reference
    train.py:24-63)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.exists(os.path.join(output_dir, name, "trainer_state.json")):
            step = int(m.group(1))
            if step > best_step:
                best, best_step = os.path.join(output_dir, name), step
    return best


_bucket = bucket_for  # one bucket-search (utils/buckets.py), two configs


class Trainer:
    def __init__(
        self,
        cfg: ModelConfig,
        params: Dict[str, Any],
        train_cfg: TrainConfig,
        *,
        mesh=None,
    ):
        self.cfg = cfg
        self.tc = train_cfg
        self.params = params
        base_opt = make_optimizer(
            learning_rate=train_cfg.learning_rate,
            weight_decay=train_cfg.weight_decay,
            grad_clip=train_cfg.grad_clip,
            warmup_steps=train_cfg.warmup_steps,
            total_steps=train_cfg.max_steps,
        )
        self.optimizer = optax.MultiSteps(base_opt, train_cfg.grad_accum)
        self.opt_state = self.optimizer.init(params["text"])
        # self.step counts MICRO-batches; max_steps / save_steps / the LR
        # schedule are framed in OPTIMIZER steps (one per grad_accum
        # micro-batches), matching the reference recipe where HF Trainer
        # counts optimizer steps (sft_stage_1.sh: grad-accum 64, save_steps 20)
        self.step = 0
        self.mesh = mesh
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 1))
        self._vision_params = params["vision"]
        self._dtype = jax.tree_util.tree_leaves(params["text"])[0].dtype
        os.makedirs(train_cfg.output_dir, exist_ok=True)
        self._metrics_f = open(
            os.path.join(train_cfg.output_dir, "metrics.jsonl"), "a"
        )
        # optional W&B mirror of the metrics stream (reference report_to=wandb,
        # sft_stage_1.sh:22-26); gated on install + WANDB_PROJECT
        self._wandb = None
        if os.environ.get("WANDB_PROJECT"):
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=os.environ["WANDB_PROJECT"], resume="allow")
            except Exception:
                self._wandb = None

    # ------------------------------------------------------------------ step
    def _train_step(self, text_params, opt_state, vision_params, batch):
        def loss_fn(tp):
            p = {"text": tp, "vision": vision_params}
            if self.tc.parallel_mode == "pp":
                from ..parallel.pipeline import sft_loss_pp

                assert self.mesh is not None, "parallel_mode='pp' needs mesh="
                return sft_loss_pp(
                    self.cfg, p, batch, self.mesh, remat=self.tc.remat
                )
            if self.tc.parallel_mode == "sp":
                from ..parallel.ring import sft_loss_sp

                assert self.mesh is not None, "parallel_mode='sp' needs mesh="
                return sft_loss_sp(
                    self.cfg, p, batch, self.mesh, remat=self.tc.remat
                )
            loss, count = sft_loss(self.cfg, p, batch, remat=self.tc.remat)
            return loss, count

        (loss, count), grads = jax.value_and_grad(loss_fn, has_aux=True)(text_params)
        updates, opt_state = self.optimizer.update(grads, opt_state, text_params)
        text_params = optax.apply_updates(text_params, updates)
        metrics = {
            "loss": loss,
            "labeled_tokens": count,
            "grad_norm": optax.global_norm(grads),
        }
        return text_params, opt_state, metrics

    def _prepare_batch(self, ex: StreamExample) -> Dict[str, jnp.ndarray]:
        """Pad to buckets; run the frozen ViT per turn; merge vision embeds."""
        T = len(ex.input_ids)
        t_pad = _bucket(T, self.tc.seq_buckets)
        ids = np.full(t_pad, self.cfg.tokens.pad, np.int32)
        ids[:T] = ex.input_ids
        labels = np.full(t_pad, -100, np.int32)
        labels[:T] = ex.labels
        pos = np.zeros((3, t_pad), np.float32)
        pos[:, :T] = ex.positions

        # frozen ViT (no grads): encode each turn's frames
        vis_parts = []
        for frames, grid in zip(ex.frames, ex.grids):
            vis_parts.append(
                model.encode_video_frames(
                    self.cfg,
                    {"vision": self._vision_params},
                    frames,
                    grid,
                    dtype=self._dtype,
                )
            )
        batch = {
            "input_ids": jnp.asarray(ids)[None],
            "labels": jnp.asarray(labels)[None],
            "positions": jnp.asarray(pos)[None],
        }
        if vis_parts:
            vis = jnp.concatenate(vis_parts, axis=0)
            nv = vis.shape[0]
            nv_pad = _bucket(nv, self.tc.vis_buckets)
            vis = jnp.pad(vis, ((0, nv_pad - nv), (0, 0)))
            slots = np.full(nv_pad, t_pad, np.int32)  # out-of-range -> dropped
            slots[:nv] = ex.vision_slots
            batch["vis_embeds"] = vis[None]
            batch["vis_slots"] = jnp.asarray(slots)[None]
        return batch

    # ------------------------------------------------------------------ loop
    def train(self, dataset, *, resume: bool = True, max_steps: Optional[int] = None):
        if resume:
            ckpt = find_resume_checkpoint(self.tc.output_dir)
            if ckpt:
                self.load_checkpoint(ckpt)
        max_steps = max_steps or self.tc.max_steps
        self._vision_params = self.params["vision"]
        self._dtype = jax.tree_util.tree_leaves(self.params["text"])[0].dtype

        rng = np.random.default_rng(self.tc.seed)
        order = rng.permutation(len(dataset))
        di = self.step % max(len(dataset), 1)

        text_params = self.params["text"]
        opt_state = self.opt_state
        ga = max(self.tc.grad_accum, 1)

        # data pipeline: ONE background worker decodes example di+prefetch
        # while the device runs step di (order-preserving, so runs are
        # bitwise-identical to prefetch=0); dataset-level retry/resample
        # still happens inside __getitem__ on the worker
        import collections
        from concurrent.futures import ThreadPoolExecutor

        pf = max(int(self.tc.prefetch), 0)
        pool = ThreadPoolExecutor(max_workers=1) if pf else None

        def fetch(j: int):
            return dataset[int(order[j % len(order)])]

        pending = collections.deque(
            pool.submit(fetch, di + k) for k in range(pf)
        ) if pf else None
        try:
            while self.step // ga < max_steps:
                if pf:
                    ex = pending.popleft().result()
                    pending.append(pool.submit(fetch, di + pf))
                else:
                    ex = fetch(di)
                di += 1
                batch = self._prepare_batch(ex)
                t0 = time.perf_counter()
                text_params, opt_state, metrics = self._jit_step(
                    text_params, opt_state, self._vision_params, batch
                )
                self.step += 1
                opt_boundary = self.step % ga == 0
                if self.step % self.tc.log_every == 0:
                    # float() is the only device sync in the loop — at
                    # log_every > 1 the host runs ahead and the dispatch of
                    # step i+1 overlaps step i's device time
                    rec = {
                        "step": self.step,
                        "opt_step": self.step // ga,
                        "loss": float(metrics["loss"]),
                        "labeled_tokens": int(metrics["labeled_tokens"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "step_time": time.perf_counter() - t0,
                    }
                    self._metrics_f.write(json.dumps(rec) + "\n")
                    self._metrics_f.flush()
                    if self._wandb:
                        self._wandb.log(rec, step=self.step)
                # save every save_steps OPTIMIZER steps (at accumulation
                # boundaries only, so resumed runs never replay partial
                # updates)
                if opt_boundary and (self.step // ga) % self.tc.save_steps == 0:
                    self.params = {
                        "text": text_params, "vision": self._vision_params,
                    }
                    self.opt_state = opt_state
                    self.save_checkpoint()
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
        self.params = {"text": text_params, "vision": self._vision_params}
        self.opt_state = opt_state
        return self.params

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self):
        from flax import serialization

        path = os.path.join(self.tc.output_dir, f"checkpoint-{self.step}")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(self.params)))
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(self.opt_state)))
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump({"step": self.step}, f)
        # prune old checkpoints (save_total_limit, reference sft_stage_1.sh:45)
        ckpts = sorted(
            (
                (int(m.group(1)), name)
                for name in os.listdir(self.tc.output_dir)
                if (m := re.fullmatch(r"checkpoint-(\d+)", name))
            ),
        )
        while len(ckpts) > self.tc.save_total_limit:
            _, name = ckpts.pop(0)
            import shutil

            shutil.rmtree(os.path.join(self.tc.output_dir, name))

    def load_checkpoint(self, path: str):
        from flax import serialization

        with open(os.path.join(path, "trainer_state.json")) as f:
            self.step = json.load(f)["step"]
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            self.params = serialization.from_bytes(self.params, f.read())
        with open(os.path.join(path, "opt_state.msgpack"), "rb") as f:
            self.opt_state = serialization.from_bytes(self.opt_state, f.read())
