"""Token selection: repetition penalty, no-repeat-ngram ban, top-k/top-p,
greedy argmax with torch-style first-index tie-break.

Behavior parity with ``crates/core/src/sampling.rs:34-256``. Two
implementations:

- host (NumPy): the executable spec, used by tests and by CPU-side tools.
- device (JAX): jittable ops over fixed-shape buffers, used inside the
  TPU decode loop so logits never leave the device
  (the reference pulls logits to the CPU every token —
  ``core/src/sampling.rs:40-43`` — which we explicitly avoid).

Sampling randomness differs between the two (StdRng vs threefry); greedy
decoding (the parity-gated path) is identical.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Protocol, Sequence

import numpy as np


class TokenSelectionParams(Protocol):
    do_sample: bool
    temperature: float
    top_p: Optional[float]
    top_k: Optional[int]
    repetition_penalty: float
    no_repeat_ngram_size: Optional[int]


# ---------------------------------------------------------------------------
# Host (NumPy) implementation — executable spec
# ---------------------------------------------------------------------------


def apply_repetition_penalty_host(
    scores: np.ndarray, context: Sequence[int], penalty: float
) -> None:
    """In-place: seen-token scores divided (if >0) or multiplied (if <=0)."""
    if penalty <= 0.0 or abs(penalty - 1.0) <= np.finfo(np.float32).eps:
        return
    penalty = max(penalty, np.finfo(np.float32).tiny)
    seen = set()
    for token in context:
        idx = int(token)
        if 0 <= idx < scores.shape[0] and idx not in seen:
            seen.add(idx)
            if scores[idx] > 0.0:
                scores[idx] /= penalty
            else:
                scores[idx] *= penalty


def banned_ngram_tokens_host(sequence: Sequence[int], ngram: int) -> set:
    """Tokens that would complete an already-seen ngram at the current
    position (HF no_repeat_ngram semantics)."""
    banned: set = set()
    seq = list(sequence)
    if ngram <= 1 or len(seq) < ngram - 1:
        return banned
    history: dict = {}
    for i in range(len(seq) - ngram + 1):
        window = seq[i : i + ngram]
        prefix = tuple(window[: ngram - 1])
        history.setdefault(prefix, set()).add(window[ngram - 1])
    prefix = tuple(seq[len(seq) - (ngram - 1) :])
    if prefix in history:
        banned |= history[prefix]
    return banned


def _argmax_first_tie(values: np.ndarray) -> Optional[int]:
    """First-index argmax over finite values; None if none are finite."""
    finite = np.isfinite(values)
    if not finite.any():
        return None
    masked = np.where(finite, values, -np.inf)
    return int(np.argmax(masked))


def _apply_top_k_host(logits: np.ndarray, top_k: int) -> None:
    finite_idx = np.flatnonzero(np.isfinite(logits))
    if top_k == 0 or finite_idx.size <= top_k:
        return
    # Stable sort descending by value; drop everything past the k-th.
    order = finite_idx[np.argsort(-logits[finite_idx], kind="stable")]
    logits[order[top_k:]] = -np.inf


def _apply_top_p_host(logits: np.ndarray, top_p: float) -> None:
    if not (0.0 <= top_p < 1.0):
        return
    finite_idx = np.flatnonzero(np.isfinite(logits))
    if finite_idx.size == 0:
        return
    order = finite_idx[np.argsort(-logits[finite_idx], kind="stable")]
    vals = logits[order]
    weights = np.exp(vals - vals[0])
    total = weights.sum()
    if total <= 0.0:
        return
    cumulative = np.cumsum(weights / total)
    exceeding = np.flatnonzero(cumulative > top_p)
    keep = int(exceeding[0]) + 1 if exceeding.size else order.size
    keep = max(keep, 1)
    drop_mask = np.ones(logits.shape[0], dtype=bool)
    drop_mask[order[:keep]] = False
    logits[drop_mask] = -np.inf


def select_token_id_host(
    logits: np.ndarray,
    params: TokenSelectionParams,
    context: Sequence[int],
    rng: Optional[np.random.Generator] = None,
) -> int:
    """Select the next token id from a [vocab] f32 logits vector."""
    logits = np.asarray(logits, dtype=np.float32).reshape(-1).copy()
    if logits.size == 0:
        raise ValueError("logits tensor is empty")

    adjusted = logits.copy()
    apply_repetition_penalty_host(adjusted, context, params.repetition_penalty)

    filtered = adjusted.copy()
    ngram = params.no_repeat_ngram_size
    if ngram is not None and ngram > 1:
        for token in banned_ngram_tokens_host(context, ngram):
            if 0 <= token < filtered.shape[0]:
                filtered[int(token)] = -np.inf
    if not np.isfinite(filtered).any():
        filtered = adjusted.copy()

    if params.do_sample and params.temperature > 0.0:
        logits64 = filtered.astype(np.float64) / params.temperature
        if params.top_k is not None and 0 < params.top_k < logits64.size:
            _apply_top_k_host(logits64, params.top_k)
        if params.top_p is not None and 0.0 <= params.top_p < 1.0:
            _apply_top_p_host(logits64, params.top_p)
        sampled = _sample_from_logits_host(logits64, rng or np.random.default_rng())
        if sampled is not None:
            return sampled

    for candidate in (filtered, adjusted, logits):
        best = _argmax_first_tie(candidate)
        if best is not None:
            return best
    return 0


def _sample_from_logits_host(
    logits: np.ndarray, rng: np.random.Generator
) -> Optional[int]:
    finite_idx = np.flatnonzero(np.isfinite(logits))
    if finite_idx.size == 0:
        return None
    vals = logits[finite_idx]
    weights = np.exp(vals - vals.max())
    weights = np.where(np.isfinite(weights) & (weights > 0.0), weights, 0.0)
    total = weights.sum()
    if total <= 0.0:
        return int(finite_idx[np.argmax(vals)])
    probs = weights / total
    return int(rng.choice(finite_idx, p=probs))


# ---------------------------------------------------------------------------
# Device (JAX) implementation — jittable, fixed shapes
# ---------------------------------------------------------------------------
# Context is carried as a [B, max_len] int32 buffer plus a [B] length; all
# shapes static so this composes with lax.while_loop decode.

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def apply_repetition_penalty_device(
    logits: jnp.ndarray,  # [B, V] f32
    context: jnp.ndarray,  # [B, L] int32
    context_len: jnp.ndarray,  # [B] int32
    penalty: jnp.ndarray,  # scalar f32
) -> jnp.ndarray:
    B, V = logits.shape
    L = context.shape[1]
    positions = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = positions < context_len[:, None]
    # Scatter "seen" into a V+1 buffer; invalid slots land in the overflow row.
    targets = jnp.where(valid, context, V)
    seen = jnp.zeros((B, V + 1), dtype=jnp.bool_)
    seen = seen.at[jnp.arange(B)[:, None], targets].set(True)[:, :V]
    penalized = jnp.where(logits > 0.0, logits / penalty, logits * penalty)
    apply = jnp.logical_and(seen, jnp.abs(penalty - 1.0) > 1e-7)
    return jnp.where(apply, penalized, logits)


def banned_ngram_mask_device(
    context: jnp.ndarray,  # [B, L] int32
    context_len: jnp.ndarray,  # [B] int32
    ngram: int,  # static
    vocab_size: int,  # static
) -> jnp.ndarray:
    """[B, V] bool mask of tokens banned by the no-repeat-ngram rule."""
    B, L = context.shape
    if ngram <= 1 or L < ngram:
        return jnp.zeros((B, vocab_size), dtype=jnp.bool_)
    n1 = ngram - 1
    # Current suffix: last (n-1) tokens before position `context_len`.
    suffix_pos = context_len[:, None] - n1 + jnp.arange(n1, dtype=jnp.int32)[None, :]
    suffix = jnp.take_along_axis(context, jnp.clip(suffix_pos, 0, L - 1), axis=1)
    # All windows of length n starting at i (i + ngram <= context_len).
    starts = jnp.arange(L - ngram + 1, dtype=jnp.int32)
    window_idx = starts[:, None] + jnp.arange(ngram, dtype=jnp.int32)[None, :]
    windows = context[:, window_idx]  # [B, W, ngram]
    prefix_match = jnp.all(windows[:, :, :n1] == suffix[:, None, :], axis=-1)
    window_valid = (starts[None, :] + ngram) <= context_len[:, None]
    has_suffix = context_len[:, None] >= n1
    match = prefix_match & window_valid & has_suffix  # [B, W]
    next_tokens = windows[:, :, n1]  # [B, W]
    targets = jnp.where(match, next_tokens, vocab_size)
    mask = jnp.zeros((B, vocab_size + 1), dtype=jnp.bool_)
    mask = mask.at[jnp.arange(B)[:, None], targets].set(True)
    return mask[:, :vocab_size]


def top_k_mask_device(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep exactly the top_k logits, -inf the rest. Ties at the k-th value
    break by lowest index, matching the host spec's stable descending sort
    (_apply_top_k_host)."""
    # Double stable argsort = rank by (value desc, index asc).
    order = jnp.argsort(-logits, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1, stable=True)
    return jnp.where(ranks >= top_k, _NEG_INF, logits)


def top_p_mask_device(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filter: keep the smallest prefix of the sorted distribution
    whose cumulative probability exceeds top_p."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumulative = jnp.cumsum(probs, axis=-1)
    # Keep positions whose *previous* cumulative mass is <= top_p.
    keep_sorted = (cumulative - probs) <= top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # Threshold = smallest kept logit.
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, _NEG_INF, logits)


class SlotSamplingParams(NamedTuple):
    """Per-row (dynamic) sampling knobs for continuous batching: one entry
    per slot, carried as device arrays so rows with different requests'
    parameters decode in the same compiled step."""

    temperature: jnp.ndarray  # [B] f32
    top_p: jnp.ndarray  # [B] f32 (>=1.0 or <0 disables)
    top_k: jnp.ndarray  # [B] i32 (<=0 or >=V disables)
    repetition_penalty: jnp.ndarray  # [B] f32 (1.0 disables)
    do_sample: jnp.ndarray  # [B] bool
    ngram: jnp.ndarray  # [B] i32 no-repeat-ngram size (<=1 disables)

    @staticmethod
    def full(B: int, params) -> "SlotSamplingParams":
        """Broadcast one host params object to all B rows."""

        def arr(v, d, dt):
            return jnp.full((B,), d if v is None else v, dt)

        return SlotSamplingParams(
            temperature=arr(params.temperature, 0.0, jnp.float32),
            top_p=arr(params.top_p, 1.0, jnp.float32),
            top_k=arr(params.top_k, 0, jnp.int32),
            repetition_penalty=arr(params.repetition_penalty, 1.0, jnp.float32),
            do_sample=jnp.full((B,), bool(params.do_sample), jnp.bool_),
            ngram=arr(params.no_repeat_ngram_size, 0, jnp.int32),
        )

    def set_row(self, row, params) -> "SlotSamplingParams":
        def st(buf, v, d):
            return buf.at[row].set(d if v is None else v)

        return SlotSamplingParams(
            temperature=st(self.temperature, params.temperature, 0.0),
            top_p=st(self.top_p, params.top_p, 1.0),
            top_k=st(self.top_k, params.top_k, 0),
            repetition_penalty=st(
                self.repetition_penalty, params.repetition_penalty, 1.0
            ),
            do_sample=self.do_sample.at[row].set(bool(params.do_sample)),
            ngram=st(self.ngram, params.no_repeat_ngram_size, 0),
        )


def banned_ngram_mask_slots(
    context: jnp.ndarray,  # [B, L] int32
    context_len: jnp.ndarray,  # [B] int32
    ngram_row: jnp.ndarray,  # [B] int32 per-row ngram size (<=1 disables)
    ngram_max: int,  # static upper bound on any row's ngram
    vocab_size: int,  # static
) -> jnp.ndarray:
    """[B, V] banned-token mask with per-row DYNAMIC ngram size.

    Enumerates target positions t: context[t] is banned iff the
    (n_r - 1) tokens preceding t equal the current (n_r - 1)-suffix.
    Windows are gathered at the static ngram_max width; shorter per-row
    ngrams mark leading window positions as don't-care.
    """
    B, L = context.shape
    N1 = ngram_max - 1
    if N1 < 1 or L < 2:
        return jnp.zeros((B, vocab_size), dtype=jnp.bool_)
    t = jnp.arange(L, dtype=jnp.int32)
    j = jnp.arange(N1, dtype=jnp.int32)
    idx = t[:, None] - N1 + j[None, :]  # [L, N1] prefix positions before t
    win = context[:, jnp.clip(idx, 0, L - 1)]  # [B, L, N1]
    sfx_idx = context_len[:, None] - N1 + j[None, :]  # [B, N1]
    sfx = jnp.take_along_axis(context, jnp.clip(sfx_idx, 0, L - 1), axis=1)
    care = j[None, :] >= (N1 - (ngram_row[:, None] - 1))  # [B, N1]
    eq = win == sfx[:, None, :]  # [B, L, N1]
    match = jnp.all(eq | ~care[:, None, :], axis=-1)  # [B, L]
    valid = (
        (t[None, :] >= (ngram_row[:, None] - 1))
        & (t[None, :] < context_len[:, None])
        & (ngram_row[:, None] > 1)
        & (context_len[:, None] >= (ngram_row[:, None] - 1))
    )
    match = match & valid
    targets = jnp.where(match, context, vocab_size)
    mask = jnp.zeros((B, vocab_size + 1), dtype=jnp.bool_)
    mask = mask.at[jnp.arange(B)[:, None], targets].set(True)
    return mask[:, :vocab_size]


def select_token_id_slots(
    logits: jnp.ndarray,  # [B, V] f32
    context: jnp.ndarray,  # [B, L] int32
    context_len: jnp.ndarray,  # [B] int32
    sampling: "SlotSamplingParams",
    *,
    ngram_max: int,  # static
    rng_key: jax.Array,
) -> jnp.ndarray:
    """Jittable next-token selection with PER-ROW dynamic knobs; [B] int32.

    Semantics per row match select_token_id_device (and the host spec);
    every stage is always compiled and no-ops via neutral parameter
    values, so one compiled step serves any mix of request params.
    """
    B, V = logits.shape
    logits = logits.astype(jnp.float32)

    # repetition penalty (per-row strength)
    pen = sampling.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0.0, logits / pen, logits * pen)
    L = context.shape[1]
    positions = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = positions < context_len[:, None]
    targets = jnp.where(valid, context, V)
    seen = jnp.zeros((B, V + 1), dtype=jnp.bool_)
    seen = seen.at[jnp.arange(B)[:, None], targets].set(True)[:, :V]
    apply_pen = seen & (jnp.abs(pen - 1.0) > 1e-7) & (pen > 0.0)
    adjusted = jnp.where(apply_pen, penalized, logits)

    # no-repeat-ngram ban (per-row size)
    banned = banned_ngram_mask_slots(
        context, context_len, sampling.ngram, ngram_max, V
    )
    filtered = jnp.where(banned, _NEG_INF, adjusted)
    any_valid = jnp.any(jnp.isfinite(filtered), axis=-1, keepdims=True)
    filtered = jnp.where(any_valid, filtered, adjusted)

    greedy = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
    use_sample = sampling.do_sample & (sampling.temperature > 0.0)

    def _sampled_branch(_):
        # per-row temperature / top-k / top-p — three [B, V] sorts, so
        # it only executes when some row actually samples (the cond
        # keeps all-greedy decode ~2x faster per step; its operands
        # carry no KV cache, so no aliasing copies)
        temp = jnp.maximum(sampling.temperature, 1e-6)[:, None]
        scaled = filtered / temp
        k_eff = jnp.where(
            (sampling.top_k <= 0) | (sampling.top_k >= V), V, sampling.top_k
        )
        order = jnp.argsort(-scaled, axis=-1, stable=True)
        ranks = jnp.argsort(order, axis=-1, stable=True)
        scaled = jnp.where(ranks >= k_eff[:, None], _NEG_INF, scaled)
        p_eff = jnp.where(
            (sampling.top_p < 0.0) | (sampling.top_p >= 1.0), 1.0, sampling.top_p
        )
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumulative = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cumulative - probs) <= p_eff[:, None]
        keep_sorted = keep_sorted.at[..., 0].set(True)
        threshold = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        scaled = jnp.where(scaled < threshold, _NEG_INF, scaled)
        sampled = jax.random.categorical(rng_key, scaled, axis=-1).astype(jnp.int32)
        return jnp.where(use_sample, sampled, greedy)

    return jax.lax.cond(
        jnp.any(use_sample), _sampled_branch, lambda _: greedy, None
    )


def select_token_id_device(
    logits: jnp.ndarray,  # [B, V] f32
    context: jnp.ndarray,  # [B, L] int32
    context_len: jnp.ndarray,  # [B] int32
    *,
    do_sample: bool,  # static
    temperature: float,  # static
    top_p: Optional[float],  # static
    top_k: Optional[int],  # static
    repetition_penalty: float,  # static
    no_repeat_ngram_size: Optional[int],  # static
    rng_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Jittable next-token selection; returns [B] int32.

    Sampling knobs are Python-static (they are fixed per request), so the
    compiled graph contains only the enabled stages.
    """
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    adjusted = logits
    if repetition_penalty > 0.0 and abs(repetition_penalty - 1.0) > 1e-7:
        adjusted = apply_repetition_penalty_device(
            logits, context, context_len, jnp.float32(repetition_penalty)
        )

    filtered = adjusted
    if no_repeat_ngram_size is not None and no_repeat_ngram_size > 1:
        banned = banned_ngram_mask_device(
            context, context_len, no_repeat_ngram_size, V
        )
        filtered = jnp.where(banned, _NEG_INF, adjusted)
        # If the ban wiped out every candidate, fall back to `adjusted`.
        any_valid = jnp.any(jnp.isfinite(filtered), axis=-1, keepdims=True)
        filtered = jnp.where(any_valid, filtered, adjusted)

    if do_sample and temperature > 0.0:
        scaled = filtered / jnp.float32(temperature)
        if top_k is not None and 0 < top_k < V:
            scaled = top_k_mask_device(scaled, top_k)
        if top_p is not None and 0.0 <= top_p < 1.0:
            scaled = top_p_mask_device(scaled, top_p)
        if rng_key is None:
            raise ValueError("rng_key required when do_sample=True")
        return jax.random.categorical(rng_key, scaled, axis=-1).astype(jnp.int32)

    return jnp.argmax(filtered, axis=-1).astype(jnp.int32)
