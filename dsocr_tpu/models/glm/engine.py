"""GLM-OCR engine.

Mirrors infer-glm/src/model.rs: GLM smart-resize + CLIP-stat
normalization + merge-window patchify with temporal duplication →
GLM vision → hard-coded chat scaffold prompt
([gMASK]<sop>user\\n … assistant\\n) → token-type 3-axis positions →
greedy-only decode with multi-EOS.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import DecodeOutcome, DecodeParameters, ModelKind, VisionSettings
from ...core.benchmark import Timer
from ...core.text import normalize_text
from ...image.resample import resize_bicubic
from ...runtime import GenerateParams, Generator, clamp_new_tokens
from ...runtime.kv_cache import bump_length, reset
from .config import (
    GlmConfig,
    TOKEN_ASSISTANT,
    TOKEN_GMASK,
    TOKEN_NEWLINE,
    TOKEN_SOP,
    TOKEN_USER,
)
from .decoder import (
    compute_glm_position_ids,
    glm_forward,
    init_glm_text_params,
    new_cache,
)
from .vision import (
    bucket_tokens,
    build_rotary_np,
    glm_vision_forward,
    glm_vision_forward_packed,
    init_glm_vision_params,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def glm_smart_resize(
    height: int, width: int, factor: int, temporal: int,
    min_pixels: int, max_pixels: int,
) -> Tuple[int, int]:
    """GLM variant of smart_resize (ref vision.rs:259-300): round-half
    initial snap, temporal frames weight the pixel budget."""
    h, w = max(height, 1), max(width, 1)
    if h < factor or w < factor:
        scale = max(factor / h, factor / w)
        h, w = int(h * scale), int(w * scale)
    aspect = max(h, w) / min(h, w)
    if aspect > 200.0:
        raise ValueError(f"aspect ratio must be <= 200, got {aspect}")

    def round_mult(v):
        return max(int(round(v / factor)) * factor, factor)

    h_bar, w_bar = round_mult(h), round_mult(w)
    t_bar = max(int(round(temporal / temporal)) * temporal, temporal)
    if t_bar * h_bar * w_bar > max_pixels:
        beta = ((temporal * h * w) / max_pixels) ** 0.5
        h_bar = max(factor, (int(h / beta) // factor) * factor)
        w_bar = max(factor, (int(w / beta) // factor) * factor)
    elif t_bar * h_bar * w_bar < min_pixels:
        beta = (min_pixels / (temporal * h * w)) ** 0.5
        h_bar = -(-int(np.ceil(h * beta)) // factor) * factor
        w_bar = -(-int(np.ceil(w * beta)) // factor) * factor
    return max(h_bar, factor), max(w_bar, factor)


def glm_norm_table(cfg: GlmConfig) -> np.ndarray:
    """[3, 256] f32 per-channel normalization lookup: entry [c, v] is
    exactly ``((v/255 as f64 → f32) - mean[c]) / std[c]`` — the same
    per-value ops the reference normalization applies, so table lookup
    (host OR device) is bit-exact vs normalizing the full image."""
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    v = (np.arange(256, dtype=np.float64) / 255.0).astype(np.float32)
    return (v[None, :] - mean[:, None]) / std[:, None]


def preprocess_glm_image_raw(
    image: np.ndarray, cfg: GlmConfig
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """RGB uint8 → ([N, 3, ps, ps] uint8 patches in merge-window order
    BEFORE normalization/temporal duplication, grid (1, gh, gw)).

    The u8 form is what serving ships over the host↔device link: the
    f32 patch tensor with temporal duplication is 8x the bytes (e.g.
    ~122 MB vs ~15 MB for a native-res page) on a ~40 MB/s tunnel —
    normalization (bit-exact LUT) + duplication run on device."""
    v = cfg.vision
    ps, merge, tps = v.patch_size, v.spatial_merge_size, v.temporal_patch_size
    factor = ps * merge
    h, w = image.shape[:2]
    rh, rw = glm_smart_resize(h, w, factor, tps, cfg.min_pixels, cfg.max_pixels)
    if (rh, rw) != (h, w):
        image = resize_bicubic(image, rw, rh)
    gh, gw = rh // ps, rw // ps
    # [rh, rw, C] → merge-window patch order, per patch [C, ps, ps]
    x = image.reshape(gh // merge, merge, ps, gw // merge, merge, ps, 3)
    x = x.transpose(0, 3, 1, 4, 6, 2, 5)  # [GH, GW, mh, mw, C, ps, ps]
    return x.reshape(gh * gw, 3, ps, ps), (1, gh, gw)


def glm_normalize_host(u8_patches: np.ndarray, cfg: GlmConfig) -> np.ndarray:
    """[N, 3, ps, ps] u8 → [N, C·tps·ps·ps] f32 (reference layout): LUT
    normalize + temporal duplication, for the eager/reference path."""
    tps = cfg.vision.temporal_patch_size
    table = glm_norm_table(cfg)
    n = u8_patches.shape[0]
    vals = table[
        np.arange(3)[None, :, None], u8_patches.reshape(n, 3, -1)
    ]  # [N, 3, ps*ps]
    vals = np.repeat(vals[:, :, None], tps, axis=2)  # [N, 3, tps, ps*ps]
    return vals.reshape(n, -1)


def preprocess_glm_image(image: np.ndarray, cfg: GlmConfig) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """RGB uint8 → ([N, C·tps·ps·ps] f32 patches in merge-window order
    with the frame duplicated across temporal, grid (1, gh, gw))."""
    u8, grid = preprocess_glm_image_raw(image, cfg)
    return glm_normalize_host(u8, cfg), grid


class GlmOcrEngine:
    def __init__(
        self,
        cfg: GlmConfig,
        params: Optional[Dict] = None,
        dtype=jnp.bfloat16,
        max_seq_len: int = 16384,
        seed: int = 0,
        kv_quant: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.dtype_ = dtype
        # dp slot serving (same design as paddle/dots): params
        # replicate, slot KV rows shard over dp.
        self.mesh = mesh
        self.max_seq_len = max_seq_len
        import os as _os

        self._flash_prefill = _os.environ.get("DSOCR_FLASH_PREFILL", "1") != "0"
        from ...runtime.slots import resolve_kv_quant

        self.kv_quant = resolve_kv_quant(kv_quant)
        if params is None:
            kv, kd = jax.random.split(jax.random.PRNGKey(seed))
            params = {
                "vision": init_glm_vision_params(cfg.vision, kv),
                "decoder": init_glm_text_params(cfg.text, kd, dtype),
            }
        if mesh is not None:
            from ...parallel import replicated

            rep = replicated(mesh)
            params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), params
            )
        self.params = params
        self._generator_cache = {}
        self._prefill_jit = jax.jit(self._prefill_impl, static_argnames=("seq_len",))

    def kind(self) -> ModelKind:
        return ModelKind.GLM_OCR

    def device(self) -> str:
        return jax.devices()[0].platform

    def dtype(self) -> str:
        return jnp.dtype(self.dtype_).name

    def weights_path(self):
        return None

    # -- vision ---------------------------------------------------------------

    def _vision_forward(self, u8_patches: np.ndarray, grids) -> jnp.ndarray:
        """Pooled GLM tower over packed u8 patches [N, 3, ps, ps].

        Default: the jitted padded-bucket path (glm_vision_forward_packed
        — ONE dispatch per page instead of an eager op-by-op walk paying
        ~20 ms tunnel latency per op, the r4 GLM serve wall), fed RAW
        uint8 patches: normalization is a bit-exact on-device LUT and the
        temporal duplication happens on device, so ~8x fewer bytes cross
        the ~40 MB/s link than the f32 patch tensor.
        DSOCR_GLM_U8_UPLOAD=0 ships normalized f32 instead;
        DSOCR_GLM_VISION_JIT=0 reverts to the eager reference path."""
        import os

        cfg = self.cfg
        if os.environ.get("DSOCR_GLM_VISION_JIT", "1") == "0":
            packed = jnp.asarray(
                glm_normalize_host(u8_patches, cfg), self.dtype_
            )
            return glm_vision_forward(
                self.params["vision"], cfg.vision, packed, grids
            )
        merge2 = cfg.vision.spatial_merge_size ** 2
        n = u8_patches.shape[0]
        n_pad = bucket_tokens(n, merge2)
        pad = n_pad - n
        cos, sin = build_rotary_np(grids, cfg.vision)
        seg_parts = []
        fid = 0
        for t, h, w in grids:
            for _ in range(t):
                seg_parts.append(np.full(h * w, fid, np.int32))
                fid += 1
        if pad:
            cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), np.float32)])
            sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), np.float32)])
            seg_parts.append(np.full(pad, -1, np.int32))
        seg = np.concatenate(seg_parts)
        u8_upload = os.environ.get("DSOCR_GLM_U8_UPLOAD", "1") != "0"
        if u8_upload:
            patches = u8_patches
            if pad:
                patches = np.concatenate(
                    [patches, np.zeros((pad,) + patches.shape[1:], np.uint8)]
                )
            if not hasattr(self, "_vision_jit_u8"):
                tps = cfg.vision.temporal_patch_size

                def fn(params, u8, table, cos, sin, seg):
                    nn = u8.shape[0]
                    idx = u8.reshape(nn, 3, -1).astype(jnp.int32) + (
                        jnp.arange(3, dtype=jnp.int32) * 256
                    )[None, :, None]
                    vals = table.reshape(-1)[idx]  # [N, 3, ps²] f32, exact
                    x = jnp.broadcast_to(
                        vals[:, :, None, :], (nn, 3, tps, vals.shape[-1])
                    ).reshape(nn, -1).astype(self.dtype_)
                    return glm_vision_forward_packed(
                        params, x, cos, sin, seg, cfg=cfg.vision
                    )

                self._vision_jit_u8 = jax.jit(fn)
                self._norm_table = jnp.asarray(glm_norm_table(cfg))
            out = self._vision_jit_u8(
                self.params["vision"],
                jnp.asarray(patches),
                self._norm_table,
                jnp.asarray(cos),
                jnp.asarray(sin),
                jnp.asarray(seg),
            )
            return out[: n // merge2]
        patches = glm_normalize_host(u8_patches, cfg)
        if pad:
            patches = np.concatenate(
                [patches, np.zeros((pad, patches.shape[1]), np.float32)]
            )
        if not hasattr(self, "_vision_jit"):
            import functools

            self._vision_jit = jax.jit(
                functools.partial(glm_vision_forward_packed, cfg=cfg.vision)
            )
        out = self._vision_jit(
            self.params["vision"],
            jnp.asarray(patches, self.dtype_),
            jnp.asarray(cos),
            jnp.asarray(sin),
            jnp.asarray(seg),
        )
        return out[: n // merge2]

    # -- prompt (ref model.rs:119-163) -------------------------------------------

    def build_prompt_tokens(
        self, tokenizer, prompt: str, grids: Sequence[Tuple[int, int, int]]
    ) -> Tuple[List[int], List[int]]:
        cfg = self.cfg
        merge = cfg.vision.spatial_merge_size
        slots = prompt.count("<image>")
        if slots != len(grids):
            raise ValueError(
                f"prompt includes {slots} <image> placeholders but "
                f"{len(grids)} images were provided"
            )
        tokens = [TOKEN_GMASK, TOKEN_SOP, TOKEN_USER, TOKEN_NEWLINE]
        mask = [0, 0, 0, 0]
        for idx, segment in enumerate(prompt.split("<image>")):
            if segment:
                ids = tokenizer.encode(segment)
                tokens.extend(ids)
                mask.extend([0] * len(ids))
            if idx < len(grids):
                t, h, w = grids[idx]
                count = t * h * w // (merge * merge)
                tokens.append(cfg.image_start_token_id)
                mask.append(0)
                tokens.extend([cfg.image_token_id] * count)
                mask.extend([1] * count)
                tokens.append(cfg.image_end_token_id)
                mask.append(0)
        tokens.extend([TOKEN_ASSISTANT, TOKEN_NEWLINE])
        mask.extend([0, 0])
        return tokens, mask

    # -- decode --------------------------------------------------------------------

    def _prefill_impl(self, params, embeds, position_ids, cache, true_len, seq_len: int):
        logits, cache = glm_forward(
            params["decoder"], self.cfg.text, embeds, position_ids, cache,
            last_index=(true_len - 1)[None],
            flash_prefill=self._flash_prefill,
        )
        return logits, bump_length(cache, true_len)

    def _step_fn(self, params, token_ids, cache, pos_state):
        embeds = params["decoder"]["embed_tokens"][token_ids][:, None, :].astype(
            self.dtype_
        )
        pos = jnp.broadcast_to(pos_state[None, :, None], (3, token_ids.shape[0], 1))
        logits, cache = glm_forward(
            params["decoder"], self.cfg.text, embeds, pos, cache
        )
        return logits, bump_length(cache, 1), pos_state + 1

    # -- continuous-batching (slot) surface ------------------------------------

    def validate_slot_params(self, params: DecodeParameters) -> None:
        if params.do_sample or params.temperature != 0.0:
            raise ValueError("GLM backend requires greedy decoding (do_sample=false)")

    def slot_step_fn(self, model_params, token_ids, cache, pos):
        """Per-row-positions decode step for runtime.slots.SlotRunner;
        pos[r] is row r's scalar M-RoPE base (all 3 axes), advanced by
        1/step — matching _step_fn's pos_state + 1."""
        from ...runtime.kv_cache import KVCache
        from ...runtime.slots import SlotCache

        embeds = model_params["decoder"]["embed_tokens"][token_ids][
            :, None, :
        ].astype(self.dtype_)
        mpos = jnp.broadcast_to(pos[None, :, None], (3, token_ids.shape[0], 1))
        kv = KVCache(
            k=cache.k, v=cache.v, length=jnp.int32(0),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        logits, kv = glm_forward(
            model_params["decoder"], self.cfg.text, embeds, mpos, kv,
            row_lengths=cache.lengths,
        )
        return logits, SlotCache(
            kv.k, kv.v, cache.lengths, kv.k_scale, kv.v_scale
        )

    def new_slot_cache(self, n_slots: int, max_len: int):
        from ...runtime.slots import SlotCache, alloc_slot_scales

        kv_dtype = jnp.int8 if self.kv_quant == "int8" else self.dtype_
        base = new_cache(self.cfg.text, n_slots, max_len, kv_dtype)
        k_scale = v_scale = None
        if self.kv_quant == "int8":
            k_scale, v_scale = alloc_slot_scales(
                self.cfg.text.num_hidden_layers, n_slots,
                self.cfg.text.num_key_value_heads, max_len,
            )
        k, v = base.k, base.v
        if self.mesh is not None:
            from ...parallel import slot_cache_sharding, slot_scale_sharding

            kvh = self.cfg.text.num_key_value_heads
            k = jax.device_put(k, slot_cache_sharding(self.mesh, kvh, n_slots))
            v = jax.device_put(v, slot_cache_sharding(self.mesh, kvh, n_slots))
            if k_scale is not None:
                ss = slot_scale_sharding(self.mesh, kvh, n_slots)
                k_scale = jax.device_put(k_scale, ss)
                v_scale = jax.device_put(v_scale, ss)
        return SlotCache(
            k=k, v=v, lengths=jnp.zeros((n_slots,), jnp.int32),
            k_scale=k_scale, v_scale=v_scale,
        )

    def make_slot_runner(self, ngram_max: int = 24):
        from ...runtime.slots import SlotRunner

        return SlotRunner(
            self.slot_step_fn,
            eos_ids=tuple(self.cfg.text.eos_token_ids),
            emit_eos=False,
            ngram_max=ngram_max,
        )

    def prefill_for_slots(self, tokenizer, requests):
        """Batched prefill for the scheduler's prefill worker: every
        queued request's images run through ONE GLM vision pass (the
        grids list already packs multiple images), then each request
        prefills its own row. requests = [(prompt, images, vision), ...]
        (GLM vision budgets come from the model config, so requests
        never split by VisionSettings)."""
        cfg = self.cfg
        all_patches = []
        per_req_grids: List[List[Tuple[int, int, int]]] = []
        for _, images, _ in requests:
            grids = []
            for image in images:
                patches, grid = preprocess_glm_image_raw(np.asarray(image), cfg)
                all_patches.append(patches)
                grids.append(grid)
            per_req_grids.append(grids)
        embeddings = None
        if all_patches:
            # Pool images into vision calls bounded by a patch budget:
            # one native-res page is ~26k patches, and the eager block
            # MLP (f32, intermediate 10944) spikes ~70 KB/patch of
            # transient HBM — pooling two pages into one packed call
            # OOM'd a 16 GB chip (r4 perf matrix). Groups stay in
            # request order so the embedding cursor math is unchanged.
            import os

            budget = int(os.environ.get("DSOCR_GLM_VISION_POOL", "32768"))
            flat_grids = [g for gs in per_req_grids for g in gs]
            groups: List[Tuple[int, int]] = []  # (start_img, end_img)
            start_img = 0
            acc = 0
            for i, p in enumerate(all_patches):
                rows = p.shape[0]
                if acc and acc + rows > budget:
                    groups.append((start_img, i))
                    start_img, acc = i, 0
                acc += rows
            groups.append((start_img, len(all_patches)))
            parts = []
            for lo, hi in groups:
                parts.append(
                    self._vision_forward(
                        np.concatenate(all_patches[lo:hi]), flat_grids[lo:hi]
                    )
                )
            embeddings = (
                parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            )
        merge_area = cfg.vision.spatial_merge_size ** 2
        rows_in = []
        cursor = 0
        for (prompt, _, _), grids in zip(requests, per_req_grids):
            count = sum(t * h * w // merge_area for t, h, w in grids)
            emb = embeddings[cursor : cursor + count] if embeddings is not None else None
            cursor += count
            rows_in.append((prompt, grids, emb))
        # same-s_pad rows share ONE right-padded batched prefill
        built = []
        for prompt, grids, emb in rows_in:
            tokens, image_mask = self.build_prompt_tokens(tokenizer, prompt, grids)
            built.append((tokens, image_mask, grids, emb))
        buckets: Dict = {}
        for i, (tokens, _, _, _) in enumerate(built):
            buckets.setdefault(_round_up(len(tokens), 128), []).append(i)
        out: List = [None] * len(built)
        for idxs in buckets.values():
            packets = self._prefill_rows([built[i] for i in idxs])
            for i, pkt in zip(idxs, packets):
                out[i] = pkt
        return out

    def _prefill_rows_impl(
        self, params, tokens, pos_ids, img_embeds, row_idx, tok_idx, cache,
        true_lens, seq_len: int, has_images: bool = True,
    ):
        """Right-padded multi-row prefill (one batched decoder pass +
        one dispatch per same-s_pad admission wave). pos_ids [3, B, S]
        carry each row's 3-axis M-RoPE grid."""
        embeds = params["decoder"]["embed_tokens"][tokens].astype(self.dtype_)
        if has_images:
            embeds = embeds.at[row_idx, tok_idx].set(
                img_embeds.astype(self.dtype_)
            )
        logits, cache = glm_forward(
            params["decoder"], self.cfg.text, embeds, pos_ids, cache,
            last_index=true_lens - 1, flash_prefill=self._flash_prefill,
        )
        return logits, cache

    def _prefill_rows(self, rows):
        """rows: [(tokens, image_mask, grids, emb)] sharing one s_pad
        bucket. Returns one join packet per row."""
        cfg = self.cfg
        if len(rows) == 1:
            tokens, image_mask, grids, emb = rows[0]
            return [self._prefill_row_built(tokens, image_mask, grids, emb)]
        s_pad = _round_up(len(rows[0][0]), 128)
        B_real = len(rows)
        B = max(1, 1 << (B_real - 1).bit_length())
        rows = rows + [rows[-1]] * (B - B_real)
        tokens_padded = np.zeros((B, s_pad), np.int32)
        pos_padded = np.ones((3, B, s_pad), np.int32)
        next_bases = []
        row_idx_parts, tok_idx_parts, embed_parts = [], [], []
        for r, (tokens, image_mask, grids, emb) in enumerate(rows):
            tokens_padded[r, : len(tokens)] = tokens
            pos_ids, next_base = compute_glm_position_ids(
                cfg.image_token_id,
                cfg.video_start_token_id,
                cfg.video_end_token_id,
                np.asarray(tokens, np.int64),
                grids,
                cfg.vision.spatial_merge_size,
            )
            pos_padded[:, r, : len(tokens)] = pos_ids
            next_bases.append(next_base)
            if emb is not None:
                pos = np.nonzero(np.asarray(image_mask, bool))[0]
                row_idx_parts.append(np.full(pos.shape, r, np.int32))
                tok_idx_parts.append(pos.astype(np.int32))
                embed_parts.append(emb)
        if embed_parts:
            img_embeds = jnp.concatenate(embed_parts, axis=0)
            row_idx = jnp.asarray(np.concatenate(row_idx_parts))
            tok_idx = jnp.asarray(np.concatenate(tok_idx_parts))
        else:
            img_embeds = jnp.zeros((1, cfg.text.hidden_size), self.dtype_)
            row_idx = jnp.zeros((1,), jnp.int32)
            tok_idx = jnp.zeros((1,), jnp.int32)
        true_lens = jnp.asarray([len(t) for t, _, _, _ in rows], jnp.int32)
        cache = reset(new_cache(cfg.text, B, s_pad, self.dtype_))
        if not hasattr(self, "_prefill_rows_jit"):
            self._prefill_rows_jit = jax.jit(
                self._prefill_rows_impl,
                static_argnames=("seq_len", "has_images"),
            )
        logits, cache = self._prefill_rows_jit(
            self.params, jnp.asarray(tokens_padded), jnp.asarray(pos_padded),
            img_embeds, row_idx, tok_idx, cache, true_lens, seq_len=s_pad,
            has_images=bool(embed_parts),
        )
        out = []
        for i in range(B_real):
            tokens = rows[i][0]
            out.append(
                dict(
                    prompt_ids=tokens,
                    row_k=jax.lax.slice_in_dim(cache.k, i, i + 1, axis=1),
                    row_v=jax.lax.slice_in_dim(cache.v, i, i + 1, axis=1),
                    logits=logits[i],  # device — see slots.select_first_tokens
                    pos0=next_bases[i],
                )
            )
        return out

    def prefill_for_slot(self, tokenizer, prompt, images, vision):
        """Vision + scaffold prompt + single-row prefill for
        SlotRunner.join. pos0 = the 3-axis position base after the
        prompt (compute_glm_position_ids next_base)."""
        cfg = self.cfg
        grids: List[Tuple[int, int, int]] = []
        patch_arrays = []
        for image in images:
            patches, grid = preprocess_glm_image_raw(np.asarray(image), cfg)
            patch_arrays.append(patches)
            grids.append(grid)
        embeddings = None
        if patch_arrays:
            embeddings = self._vision_forward(
                np.concatenate(patch_arrays), grids
            )
        return self._prefill_row(tokenizer, prompt, grids, embeddings)

    def _prefill_row(self, tokenizer, prompt, grids, embeddings):
        tokens, image_mask = self.build_prompt_tokens(tokenizer, prompt, grids)
        return self._prefill_row_built(tokens, image_mask, grids, embeddings)

    def _prefill_row_built(self, tokens, image_mask, grids, embeddings):
        cfg = self.cfg
        prompt_len = len(tokens)
        pos_ids, next_base = compute_glm_position_ids(
            cfg.image_token_id,
            cfg.video_start_token_id,
            cfg.video_end_token_id,
            np.asarray(tokens, np.int64),
            grids,
            cfg.vision.spatial_merge_size,
        )
        s_pad = _round_up(prompt_len, 128)
        tokens_padded = np.zeros(s_pad, np.int32)
        tokens_padded[:prompt_len] = tokens
        pos_padded = np.ones((3, s_pad), np.int32)
        pos_padded[:, :prompt_len] = pos_ids
        embeds = self.params["decoder"]["embed_tokens"][
            jnp.asarray(tokens_padded)
        ].astype(self.dtype_)
        if embeddings is not None:
            mask_padded = np.zeros(s_pad, bool)
            mask_padded[:prompt_len] = np.asarray(image_mask, bool)
            idx = np.nonzero(mask_padded)[0]
            embeds = embeds.at[jnp.asarray(idx)].set(embeddings.astype(self.dtype_))
        cache = reset(new_cache(cfg.text, 1, s_pad, self.dtype_))
        logits, cache = self._prefill_jit(
            self.params,
            embeds[None],
            jnp.asarray(pos_padded)[:, None, :],
            cache,
            jnp.int32(prompt_len),
            seq_len=s_pad,
        )
        return dict(
            prompt_ids=tokens,
            row_k=cache.k,
            row_v=cache.v,
            logits=logits[0],  # device — see slots.select_first_tokens
            pos0=next_base,
        )

    def decode(
        self,
        tokenizer,
        prompt: str,
        images: Sequence[np.ndarray],
        vision: VisionSettings,
        params: DecodeParameters,
        stream=None,
    ) -> DecodeOutcome:
        if params.do_sample or params.temperature != 0.0:
            raise ValueError("GLM backend requires greedy decoding (do_sample=false)")
        cfg = self.cfg

        vtimer = Timer("vision.compute_embeddings")
        grids: List[Tuple[int, int, int]] = []
        patch_arrays = []
        for image in images:
            patches, grid = preprocess_glm_image_raw(np.asarray(image), cfg)
            patch_arrays.append(patches)
            grids.append(grid)
        embeddings = None
        if patch_arrays:
            embeddings = self._vision_forward(
                np.concatenate(patch_arrays), grids
            )
        vtimer.finish(images=len(images))

        tokens, image_mask = self.build_prompt_tokens(tokenizer, prompt, grids)
        prompt_len = len(tokens)
        pos_ids, next_base = compute_glm_position_ids(
            cfg.image_token_id,
            cfg.video_start_token_id,
            cfg.video_end_token_id,
            np.asarray(tokens, np.int64),
            grids,
            cfg.vision.spatial_merge_size,
        )

        s_pad = _round_up(prompt_len, 128)
        tokens_padded = np.zeros(s_pad, np.int32)
        tokens_padded[:prompt_len] = tokens
        pos_padded = np.ones((3, s_pad), np.int32)
        pos_padded[:, :prompt_len] = pos_ids

        embeds = self.params["decoder"]["embed_tokens"][
            jnp.asarray(tokens_padded)
        ].astype(self.dtype_)
        if embeddings is not None:
            mask_padded = np.zeros(s_pad, bool)
            mask_padded[:prompt_len] = np.asarray(image_mask, bool)
            idx = np.nonzero(mask_padded)[0]
            embeds = embeds.at[jnp.asarray(idx)].set(embeddings.astype(self.dtype_))
        embeds = embeds[None]

        max_new = clamp_new_tokens(s_pad, params.max_new_tokens, self.max_seq_len)
        max_len = min(self.max_seq_len, _round_up(s_pad + max_new + 8, 128))
        cache = reset(new_cache(cfg.text, 1, max_len, self.dtype_))

        pf = Timer("decode.prefill")
        prefill_logits, cache = self._prefill_jit(
            self.params,
            embeds,
            jnp.asarray(pos_padded)[:, None, :],
            cache,
            jnp.int32(prompt_len),
            seq_len=s_pad,
        )
        np.asarray(prefill_logits[0, :1])  # true sync (tunnel ignores block)
        pf.finish(prompt_tokens=prompt_len)

        gen_params = GenerateParams(
            max_new_tokens=max_new,
            do_sample=False,
            temperature=0.0,
            top_p=params.top_p,
            top_k=params.top_k,
            repetition_penalty=params.repetition_penalty,
            no_repeat_ngram_size=params.no_repeat_ngram_size,
            eos_ids=tuple(cfg.text.eos_token_ids),
            emit_eos=False,
            chunk_size=16 if stream is not None else 64,
        )
        generator = self._generator_cache.get(gen_params)
        if generator is None:
            # memoized per static params: a fresh Generator would retrace
            # and recompile the decode chunk on every request
            generator = Generator(self._step_fn, gen_params)
            self._generator_cache[gen_params] = generator
        gtimer = Timer("decode.generate")
        result = generator.generate(
            self.params,
            prefill_logits,
            cache,
            jnp.asarray([next_base], jnp.int32),
            [tokens],
            rng=jax.random.PRNGKey(params.seed or 0),
            stream_callback=stream,
        )
        gtimer.finish(generated=len(result.tokens[0]))

        generated = result.tokens[0]
        text = normalize_text(tokenizer.decode(generated, skip_special_tokens=True))
        return DecodeOutcome(
            text=text,
            prompt_tokens=prompt_len,
            response_tokens=len(generated),
            generated_tokens=generated,
            truncated=max_new < params.max_new_tokens,
        )
