"""Import the ACTUAL reference implementation (/root/reference/src) for
differential testing (VERDICT r3 item #1).

The reference targets torch + transformers 4.51 + flash-attn + decord on CUDA;
this image has torch (CPU) + transformers 4.57.6 and neither flash-attn nor
decord. Every deviation needed to run it here is a *shim* listed below —
nothing in the reference's own logic is edited:

S1. Module stubs for `qwen_vl_utils` / `livecc_utils` / `torchvision`
    (video IO + pixel-budget constants; reference video_process_patch.py:11-15).
    The stub FPS = 2.0 matches the reference default, which makes
    `second_per_grid_t = 2/FPS = 1.0` (reference qwen2_5/pos_emb.py:104).
S2. Names the reference imports from
    `transformers.models.qwen2_5_vl.modeling_qwen2_5_vl` that 4.57 no longer
    re-exports are injected from their current homes
    (`_flash_attention_forward`, `StaticCache`, `SlidingWindowCache`,
    `AttentionMaskConverter`, `make_flex_block_causal_mask`, `BlockMask`);
    `apply_rotary_pos_emb_flashatt` / `flash_attn_varlen_func` are
    raise-if-called stubs (CUDA-only kernels, unused under S4).
S3. `CompatStreamingCache` subclasses the reference's `StreamingCache`
    (generate/streaming_cache.py:6) restoring the pre-4.56 DynamicCache
    attribute surface it assumes (`key_cache`/`value_cache`/`_seen_tokens`,
    tuple iteration) and tolerating the 5-arg `update(...)` call made by the
    reference's own eager attention path (language_forward.py:103).
S4. On CPU the flash attention kernel does not exist, so decoder layers are
    bound to the reference's OWN `streaming_text_eager_attn_forward`
    (language_forward.py:69) instead of the flash variant — the same fallback
    the reference itself takes with `output_attentions=True`
    (language_forward.py:160-175) — and the ViT keeps stock HF sdpa forwards
    (the reference's ViT patch only re-plumbs flash-attn varlen; it has no
    streaming semantics).
S7. The reference's qwen2 (non-2.5) attention has NO eager variant — its
    only path calls `_flash_attention_forward`
    (qwen2/language_forward.py:66-160). `cpu_flash_attention_forward` is a
    numerics-faithful CPU stand-in (f32-softmax masked matmul applying the
    4D additive mask when given one, else bottom-right-aligned causal — the
    semantics flash-attn has with a KV cache); it is injected into the
    reference qwen2 module's global only (`install_qwen2_cpu_flash`), so the
    qwen2_5 tests keep their eager binding untouched.
S8. The reference's qwen2 patcher never binds `_update_causal_mask`
    (qwen2_5/patch_model.py:27 does; qwen2/patch_model.py does not) — it
    relies on the transformers-4.51 method that 4.57's masking refactor
    removed. `bind_qwen2_causal_mask` restores it using the REFERENCE'S OWN
    `_update_causal_mask` from qwen2_5/language_forward.py:308 (byte-for-
    byte the 4.51-era logic it expected to find), with S6's never-ignore
    applying as for qwen2_5.
"""

from __future__ import annotations

import sys
import types

REF_SRC = "/root/reference/src"

_installed = False


def _stub_module(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real spec so importlib.util.find_spec probes (transformers
        # import_utils) don't choke on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _unavailable(name):
    def fn(*a, **k):
        raise RuntimeError(f"{name} is CUDA-only and must not be reached on CPU")

    fn.__name__ = name
    return fn


def install_reference():
    """Install stubs + shims and put /root/reference/src on sys.path.

    Idempotent; safe to call from every test."""
    global _installed
    if _installed:
        return
    import torch  # noqa: F401  (fail fast if torch is absent)

    # import transformers BEFORE installing module stubs so its own
    # package-availability probes see the true environment
    import transformers.models.qwen2_5_vl.modeling_qwen2_5_vl as m25
    import transformers.models.qwen2_vl.modeling_qwen2_vl as m2
    from transformers.cache_utils import SlidingWindowCache, StaticCache
    from transformers.integrations.flex_attention import make_flex_block_causal_mask
    from transformers.modeling_attn_mask_utils import AttentionMaskConverter
    from transformers.modeling_flash_attention_utils import _flash_attention_forward

    # ---- S1: third-party module stubs --------------------------------------
    qvu = _stub_module("qwen_vl_utils")
    vp = _stub_module(
        "qwen_vl_utils.vision_process",
        FPS=2.0,
        FRAME_FACTOR=2,
        VIDEO_MIN_PIXELS=128 * 28 * 28,
        VIDEO_MAX_PIXELS=768 * 28 * 28,
        VIDEO_TOTAL_PIXELS=24576 * 28 * 28,
        smart_nframes=_unavailable("smart_nframes"),
        process_vision_info=_unavailable("process_vision_info"),
    )
    qvu.vision_process = vp
    for name in ("FPS", "FRAME_FACTOR"):
        setattr(qvu, name, getattr(vp, name))

    lcc = _stub_module(
        "livecc_utils",
        _read_video_decord_plus=_unavailable("_read_video_decord_plus"),
        _spatial_resize_video=_unavailable("_spatial_resize_video"),
        get_smart_resized_video_reader=_unavailable("get_smart_resized_video_reader"),
        get_smart_resized_clip=_unavailable("get_smart_resized_clip"),
    )
    lcc.video_process_patch = _stub_module(
        "livecc_utils.video_process_patch",
        _read_video_decord_plus=lcc._read_video_decord_plus,
        _spatial_resize_video=lcc._spatial_resize_video,
    )

    tv = _stub_module("torchvision")
    tv.transforms = _stub_module("torchvision.transforms")
    tv.transforms.functional = _stub_module(
        "torchvision.transforms.functional", pil_to_tensor=_unavailable("pil_to_tensor")
    )

    # ---- S2: re-export names 4.57 dropped from the qwen modeling files -----
    class BlockMask:  # annotation-only in the reference
        pass

    # S6: the reference's _update_causal_mask (language_forward.py:344-357)
    # applies HF's sdpa-only `_ignore_causal_mask_sdpa` shortcut to EVERY
    # non-flash path; its eager attention (a plain masked matmul) then runs
    # with attention_mask=None, i.e. non-causally. On the reference's own rig
    # the eager path only runs with output_attentions=True where the shortcut
    # is disabled, so the 4D mask is always built there. Since these names
    # were dropped from the 4.57 modeling modules, only the reference reads
    # this injected attribute — make the shortcut never fire.
    class _NeverIgnoreAMC(AttentionMaskConverter):
        @staticmethod
        def _ignore_causal_mask_sdpa(*a, **k):
            return False

    AttentionMaskConverter = _NeverIgnoreAMC

    for mod in (m25, m2):
        for name, val in (
            ("_flash_attention_forward", _flash_attention_forward),
            ("StaticCache", StaticCache),
            ("SlidingWindowCache", SlidingWindowCache),
            ("AttentionMaskConverter", AttentionMaskConverter),
            ("make_flex_block_causal_mask", make_flex_block_causal_mask),
            ("BlockMask", BlockMask),
            ("apply_rotary_pos_emb_flashatt", _unavailable("apply_rotary_pos_emb_flashatt")),
            ("flash_attn_varlen_func", _unavailable("flash_attn_varlen_func")),
        ):
            if not hasattr(mod, name):
                setattr(mod, name, val)

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    _installed = True


def cpu_flash_attention_forward(
    query_states,
    key_states,
    value_states,
    attention_mask,
    query_length,
    dropout=0.0,
    sliding_window=None,
    is_causal=True,
    use_top_left_mask=False,
    **kwargs,
):
    """S7: CPU emulation of flash-attn with the reference qwen2 path's
    calling convention — q/k/v arrive [b, T, H, hd] (seq-first), GQA heads
    already repeated. Returns [b, q_len, H, hd]."""
    import math

    import torch

    q = query_states.transpose(1, 2)  # [b, H, q, hd]
    k = key_states.transpose(1, 2)
    v = value_states.transpose(1, 2)
    L = k.shape[2]
    scores = (q.float() @ k.float().transpose(-1, -2)) / math.sqrt(q.shape[-1])
    if attention_mask is not None and attention_mask.dim() == 4:
        # eager-style additive mask: already encodes causality + padding
        scores = scores + attention_mask[:, :, :, :L].float()
    elif is_causal and query_length > 1:
        # flash semantics with a cache: bottom-right-aligned causal
        col = torch.arange(L)
        row = torch.arange(query_length)
        keep = col[None, :] <= (row[:, None] + (L - query_length))
        scores = scores.masked_fill(~keep, torch.finfo(scores.dtype).min)
    p = torch.softmax(scores, dim=-1).to(v.dtype)
    out = p @ v  # [b, H, q, hd]
    return out.transpose(1, 2)


def install_qwen2_cpu_flash():
    """Point the reference qwen2 module's `_flash_attention_forward` global
    at the CPU emulation (module-local; S7)."""
    install_reference()
    import streaming_vlm.inference.qwen2.language_forward as qlf

    qlf._flash_attention_forward = cpu_flash_attention_forward


def install_qwen25_cpu_flash():
    """Same S7 injection for the qwen2_5 module — used by the append-mode
    differential, where the reference's own mask slicing
    (model_forward.py:130-132) is only consistent with its FLASH text path
    (_update_causal_mask returns None for flash; the eager fallback would
    build a 4D mask from the sliced 2D mask and crash / mis-mask)."""
    install_reference()
    import streaming_vlm.inference.qwen2_5.language_forward as qlf25

    qlf25._flash_attention_forward = cpu_flash_attention_forward


def bind_qwen2_causal_mask(model):
    """S8: restore the 4.51-era `_update_causal_mask` on the qwen2 language
    model using the reference's own copy of it."""
    from types import MethodType

    from streaming_vlm.inference.qwen2_5.language_forward import (
        _update_causal_mask,
    )

    lm = model.model.language_model
    if not hasattr(lm, "_update_causal_mask"):
        lm._update_causal_mask = MethodType(_update_causal_mask, lm)
    return model


class _CompatCacheMixin:
    """Old (<=4.55) DynamicCache attribute surface — see S3."""

    def _compat_init(self):
        self.key_cache = []
        self.value_cache = []
        self._seen_tokens = 0
        self.position_ids_cache = []

    # the reference's eager attention passes position_ids as a 5th positional
    # (language_forward.py:103: update(k, v, layer_idx, position_ids, kwargs));
    # its flash path passes 4 args (update(k, v, layer_idx, cache_kwargs)).
    def update(self, key_states, value_states, layer_idx, a=None, b=None):
        cache_kwargs = a if b is None and (a is None or isinstance(a, dict)) else b
        return self._ref_update(key_states, value_states, layer_idx, cache_kwargs)

    def get_seq_length(self, layer_idx: int = 0) -> int:
        if len(self.key_cache) <= layer_idx:
            return 0
        k = self.key_cache[layer_idx]
        return 0 if k is None or k.numel() == 0 else k.shape[-2]

    def get_max_cache_shape(self):
        return None

    @property
    def is_compileable(self):
        return False

    def __len__(self):
        return len(self.key_cache)

    def __iter__(self):
        for i in range(len(self.key_cache)):
            yield (self.key_cache[i], self.value_cache[i])

    def __getitem__(self, idx):
        return (self.key_cache[idx], self.value_cache[idx])


def patch_generation_compat(model):
    """S5: restore GenerationMixin helpers the reference's generate fork calls
    that transformers 4.57 renamed/removed. Each is either a no-op for a
    feature the streaming path never uses (assistant models, auto-compile,
    prefill chunking) or a thin alias to the 4.57 equivalent."""
    import types as _t

    if not hasattr(model, "_supports_cache_class"):
        model._supports_cache_class = True
    if not hasattr(model, "_validate_assistant"):
        model._validate_assistant = _t.MethodType(lambda self, *a, **k: None, model)
    if not hasattr(model, "_valid_auto_compile_criteria"):
        model._valid_auto_compile_criteria = _t.MethodType(
            lambda self, *a, **k: False, model
        )
    if getattr(model.generation_config, "prefill_chunk_size", None) is None:
        model.generation_config.prefill_chunk_size = None

    # 4.57 dropped the trailing `device` parameter
    import inspect

    orig_pcfg = model._prepare_cache_for_generation
    if "device" not in inspect.signature(orig_pcfg).parameters:

        def _pcfg(self, generation_config, model_kwargs, assistant_model, batch_size, max_cache_length, device=None):
            return orig_pcfg(generation_config, model_kwargs, assistant_model, batch_size, max_cache_length)

        model._prepare_cache_for_generation = _t.MethodType(_pcfg, model)

    # 4.57 get_video_features/get_image_features return per-video tuples;
    # the reference (4.51-era) expects one concatenated tensor
    import torch as _torch

    inner = model.model
    for name in ("get_video_features", "get_image_features"):
        orig_feat = getattr(inner, name, None)
        if orig_feat is not None:

            def _wrap(orig_feat):
                def fn(*a, **k):
                    out = orig_feat(*a, **k)
                    return _torch.cat(out, dim=0) if isinstance(out, (tuple, list)) else out

                return fn

            setattr(inner, name, _wrap(orig_feat))

    # 4.57's masking refactor removed the static 4D-causal-mask helper the
    # reference's _update_causal_mask calls (language_forward.py:371); restore
    # the standard pre-4.54 implementation
    lm = inner.language_model if hasattr(inner, "language_model") else inner
    if not hasattr(lm, "_prepare_4d_causal_attention_mask_with_cache_position"):

        def _prep4d(
            attention_mask,
            sequence_length,
            target_length,
            dtype,
            cache_position,
            batch_size,
            **kwargs,
        ):
            if attention_mask is not None and attention_mask.dim() == 4:
                return attention_mask
            device = cache_position.device
            min_dtype = _torch.finfo(dtype).min
            causal_mask = _torch.full(
                (sequence_length, target_length), fill_value=min_dtype, dtype=dtype, device=device
            )
            if sequence_length != 1:
                causal_mask = _torch.triu(causal_mask, diagonal=1)
            causal_mask *= _torch.arange(target_length, device=device) > cache_position.reshape(-1, 1)
            causal_mask = causal_mask[None, None, :, :].expand(batch_size, 1, -1, -1)
            if attention_mask is not None:
                causal_mask = causal_mask.clone()
                mask_length = attention_mask.shape[-1]
                padding_mask = causal_mask[:, :, :, :mask_length] + attention_mask[:, None, None, :]
                padding_mask = padding_mask == 0
                causal_mask[:, :, :, :mask_length] = causal_mask[:, :, :, :mask_length].masked_fill(
                    padding_mask, min_dtype
                )
            return causal_mask

        lm._prepare_4d_causal_attention_mask_with_cache_position = _prep4d

    # 4.57's _get_stopping_criteria no longer swallows **kwargs
    orig_gsc = model._get_stopping_criteria
    gsc_params = set(inspect.signature(orig_gsc).parameters)
    if not any(
        p.kind == inspect.Parameter.VAR_KEYWORD
        for p in inspect.signature(orig_gsc).parameters.values()
    ):

        def _gsc(self, **kwargs):
            return orig_gsc(**{k: v for k, v in kwargs.items() if k in gsc_params})

        model._get_stopping_criteria = _t.MethodType(_gsc, model)
    return model


def make_compat_streaming_cache_cls():
    """Build CompatStreamingCache on top of the REFERENCE's StreamingCache
    (its `update` / `update_position_ids` logic runs unmodified)."""
    install_reference()
    from streaming_vlm.inference.generate.streaming_cache import StreamingCache

    class CompatStreamingCache(_CompatCacheMixin, StreamingCache):
        def __init__(self, _distributed_cache_data=None):
            # deliberately skip DynamicCache.__init__ (4.57 `.layers` machinery)
            self._compat_init()

        _ref_update = StreamingCache.update

    return CompatStreamingCache
