"""Generic jitted autoregressive generation loop.

Semantics mirror the reference generate
(infer-deepseek/src/model/mod.rs:1870-2048):
- the first token is selected from the prefill's last-position logits
  with the prompt as penalty context; if it is EOS the generation is
  empty;
- each loop iteration appends the current token to the context, runs a
  single-token forward, and selects the next token over
  (prompt + generated) context; EOS is never emitted;
- at most ``max_new_tokens`` tokens are produced.

Execution is TPU-first: the whole loop body — forward step, repetition
penalty, ngram ban, top-k/p, argmax/categorical — runs inside
``lax.while_loop`` on device. The host only sees tokens between
streaming chunks (``chunk_size`` steps per device round-trip;
the reference round-trips logits every token).

Batched rows decode in lockstep with per-row done flags (the reference
enforces batch=1; batching is the main TPU throughput lever).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampling import select_token_id_device
from .kv_cache import KVCache

# step_fn(params, token_ids [B] int32, cache, pos_state)
#   -> (logits [B, V] f32, cache, pos_state)
StepFn = Callable[[Any, jnp.ndarray, KVCache, Any], Tuple[jnp.ndarray, KVCache, Any]]


@dataclasses.dataclass(frozen=True)
class GenerateParams:
    """Static (compile-time) generation knobs."""

    max_new_tokens: int = 512
    do_sample: bool = False
    temperature: float = 0.0
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: Optional[int] = None
    eos_ids: Tuple[int, ...] = ()
    chunk_size: int = 32
    # DeepSeek's loop never emits EOS (break before push, mod.rs:2030);
    # Paddle's pushes EOS then breaks (infer-paddleocr/src/model.rs:370-376).
    emit_eos: bool = False


class LoopState(NamedTuple):
    cache: KVCache
    pos_state: Any
    context: jnp.ndarray  # [B, C] int32 — prompt + generated tokens
    ctx_len: jnp.ndarray  # [B] int32
    current: jnp.ndarray  # [B] int32 — token pending append
    done: jnp.ndarray  # [B] bool
    steps: jnp.ndarray  # scalar int32 — tokens emitted so far
    rng: jax.Array


@dataclasses.dataclass
class GenerationResult:
    tokens: List[List[int]]  # per row, EOS excluded
    prompt_tokens: int
    steps: int


def clamp_new_tokens(prompt_pad: int, requested: int, max_seq_len: int) -> int:
    """Effective max_new_tokens for a static [*, max_seq_len] KV budget.

    The cache holds prompt_pad prefill positions plus one slot per decode
    step; a request whose prompt + max_new_tokens overflows max_seq_len
    must be clamped (silent overflow would pin dynamic_update_slice writes
    onto the last slot and clamp RoPE lookups — corrupted output).
    Raises when the prompt alone leaves no room to generate.
    """
    capacity = max_seq_len - prompt_pad
    if capacity <= 0:
        raise ValueError(
            f"prompt ({prompt_pad} padded tokens) leaves no KV-cache room "
            f"to generate within max_seq_len={max_seq_len}"
        )
    if requested > capacity:
        from ..utils.logging import get_logger

        get_logger("dsocr.runtime").warning(
            "max_new_tokens %d exceeds remaining cache capacity %d "
            "(prompt_pad=%d, max_seq_len=%d); truncating",
            requested, capacity, prompt_pad, max_seq_len,
        )
        return capacity
    return requested


def _is_eos(token: jnp.ndarray, eos_ids: Tuple[int, ...]) -> jnp.ndarray:
    if not eos_ids:
        return jnp.zeros(token.shape, jnp.bool_)
    hits = [token == e for e in eos_ids]
    out = hits[0]
    for h in hits[1:]:
        out = out | h
    return out


class Generator:
    """Binds a model step function + static params into jitted chunk runs."""

    def __init__(self, step_fn: StepFn, params: GenerateParams):
        self.step_fn = step_fn
        self.params = params
        self._chunk = jax.jit(
            partial(self._run_chunk_impl), static_argnames=("n_steps",)
        )

    # -- device side --------------------------------------------------------

    def _select(self, logits, context, ctx_len, rng_key):
        p = self.params
        return select_token_id_device(
            logits,
            context,
            ctx_len,
            do_sample=p.do_sample,
            temperature=p.temperature,
            top_p=p.top_p,
            top_k=p.top_k,
            repetition_penalty=p.repetition_penalty,
            no_repeat_ngram_size=p.no_repeat_ngram_size,
            rng_key=rng_key,
        )

    def start(
        self,
        model_params: Any,
        prefill_logits: jnp.ndarray,  # [B, V] f32 (last prompt position)
        cache: KVCache,
        pos_state: Any,
        context: jnp.ndarray,  # [B, C] int32, prompt written at [0, ctx_len)
        ctx_len: jnp.ndarray,  # [B] int32
        rng: jax.Array,
    ) -> LoopState:
        """Select the first token from prefill logits (prompt-only context)."""
        rng, key = jax.random.split(rng)
        first = self._select(prefill_logits, context, ctx_len, key)
        done = _is_eos(first, self.params.eos_ids)
        return LoopState(
            cache=cache,
            pos_state=pos_state,
            context=context,
            ctx_len=ctx_len,
            current=first,
            done=done,
            steps=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    def _body(self, model_params: Any, state: LoopState) -> LoopState:
        p = self.params
        active = ~state.done
        B = state.context.shape[0]
        rows = jnp.arange(B)
        # 1. append `current` for active rows (EOS/finished rows freeze).
        safe_pos = jnp.minimum(state.ctx_len, state.context.shape[1] - 1)
        appended = state.context.at[rows, safe_pos].set(
            jnp.where(active, state.current, state.context[rows, safe_pos])
        )
        ctx_len = state.ctx_len + active.astype(jnp.int32)
        steps = state.steps + 1

        done = state.done
        if p.emit_eos:
            # Paddle semantics: EOS was appended above; freeze the row now.
            done = done | (active & _is_eos(state.current, p.eos_ids))

        # 2. forward one token (frozen rows feed a zero token; output unused).
        feed = jnp.where(active, state.current, 0).astype(jnp.int32)
        logits, cache, pos_state = self.step_fn(
            model_params, feed, state.cache, state.pos_state
        )

        # 3. select next token over prompt+generated context.
        rng, key = jax.random.split(state.rng)
        nxt = self._select(logits, appended, ctx_len, key)
        if not p.emit_eos:
            # DeepSeek semantics: freeze at selection; EOS never appended.
            done = done | _is_eos(nxt, p.eos_ids)
        current = jnp.where(done, state.current, nxt)
        return LoopState(cache, pos_state, appended, ctx_len, current, done, steps, rng)

    def _run_chunk_impl(
        self, model_params: Any, state: LoopState, n_steps: int
    ) -> LoopState:
        p = self.params

        def cond(s: LoopState):
            in_chunk = s.steps < jnp.minimum(
                state.steps + n_steps, jnp.int32(p.max_new_tokens)
            )
            return in_chunk & jnp.any(~s.done)

        def body(s: LoopState):
            # Always run the full body: the final iteration's forward is
            # wasted (its selection never lands because `cond` stops the
            # loop), but avoiding a lax.cond here keeps the carried KV
            # cache aliasable — the cond variant copied the cache buffers
            # every step.
            return self._body(model_params, s)

        return jax.lax.while_loop(cond, body, state)

    # -- host side ------------------------------------------------------------

    def generate(
        self,
        model_params: Any,
        prefill_logits: jnp.ndarray,
        cache: KVCache,
        pos_state: Any,
        prompt_tokens: Sequence[Sequence[int]],
        rng: Optional[jax.Array] = None,
        stream_callback: Optional[Callable[[int, List[int]], None]] = None,
    ) -> GenerationResult:
        """Run the full generation, streaming tokens to the callback between
        chunks. Returns per-row generated ids (EOS excluded)."""
        p = self.params
        B = len(prompt_tokens)
        prompt_lens = [len(t) for t in prompt_tokens]
        cap = max(prompt_lens) + p.max_new_tokens
        context = np.zeros((B, cap), dtype=np.int32)
        for i, toks in enumerate(prompt_tokens):
            context[i, : len(toks)] = toks
        ctx_len = jnp.asarray(prompt_lens, dtype=jnp.int32)

        if rng is None:
            rng = jax.random.PRNGKey(0)

        state = self.start(
            model_params,
            prefill_logits,
            cache,
            pos_state,
            jnp.asarray(context),
            ctx_len,
            rng,
        )

        # EOS on the prefill token → empty generation (ref :1963-1974).
        if bool(np.all(jax.device_get(state.done))):
            return GenerationResult(
                tokens=[[] for _ in range(B)],
                prompt_tokens=max(prompt_lens),
                steps=0,
            )

        emitted = 0
        # One device round-trip per chunk; without streaming the whole
        # generation is a single dispatch (EOS exits the while_loop on
        # device). Chunk-boundary state lands in ONE fused device_get —
        # per-get latency dominates on tunneled platforms.
        chunk = p.max_new_tokens if stream_callback is None else max(p.chunk_size, 1)
        while True:
            state = self._chunk(model_params, state, n_steps=chunk)
            steps, done_host, ctx_host, len_host = jax.device_get(
                (state.steps, state.done, state.context, state.ctx_len)
            )
            steps = int(steps)
            if stream_callback is not None and steps > emitted:
                for row in range(B):
                    gen = np.asarray(ctx_host)[
                        row, prompt_lens[row] : len_host[row]
                    ].tolist()
                    stream_callback(steps, gen)
            emitted = steps
            if steps >= p.max_new_tokens or bool(np.all(done_host)):
                break

        ctx_host = np.asarray(ctx_host)
        len_host = np.asarray(len_host)
        tokens = [
            ctx_host[row, prompt_lens[row] : len_host[row]].tolist() for row in range(B)
        ]
        return GenerationResult(
            tokens=tokens, prompt_tokens=max(prompt_lens), steps=emitted
        )
