"""Paged slot KV: a shared page pool behind the continuous-batching runtime.

The contiguous SlotCache reserves a worst-case [S_max] row per slot; the
paged variant draws fixed-size pages from one pool ([L, P, H_kv, page,
D]) so a slot only holds pages for its prompt + generation budget —
mixed-length workloads fit more concurrent rows in HBM, and the paged
decode-attention kernel (ops/pallas/paged_attention.py) walks only the
used pages instead of streaming the whole row.

Allocation is HOST-side (a free list): the scheduler admits rows between
device chunks, which is exactly when pages are granted/returned, so no
device-side allocator state is needed. Pages are refcounted to leave
room for prefix sharing (identical prompt-prefix pages mapped into
several tables); the OCR workload's prompts share only a ~3-token
scaffold before the image tokens, so sharing is exposed by the allocator
but not yet wired into the engines.

Reference analogue: growable KV chunks, core/src/cache.rs:15,340 — the
north star names a paged cache (BASELINE.json).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .slots import SlotRunner, SlotState


class PagedSlotCache(NamedTuple):
    """Page pool + per-slot page tables and logical lengths."""

    k: jnp.ndarray  # [L, P, H_kv, page, Dk] pool (model dtype or int8 codes)
    v: jnp.ndarray  # [L, P, H_kv, page, Dv]
    tables: jnp.ndarray  # [B, P_max] int32 pool page ids per slot
    lengths: jnp.ndarray  # [B] int32 logical tokens per slot
    # int8-quantized pool: per-(layer,page,head,offset) f32 scales
    k_scale: Optional[jnp.ndarray] = None  # [L, P, H_kv, page]
    v_scale: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def n_slots(self) -> int:
        return self.tables.shape[0]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        # logical per-row capacity bound (table capacity × page size)
        return self.tables.shape[1] * self.k.shape[3]


class PageAllocator:
    """Host-side refcounted free-list allocator over pool page ids."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free: List[int] = list(range(n_pages - 1, -1, -1))
        self._refs: Dict[int, int] = {}

    @property
    def free_count(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"page pool exhausted: need {n}, have {len(self._free)} "
                f"of {self.n_pages}"
            )
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._refs[p] = 1
        return pages

    def share(self, pages: List[int]) -> List[int]:
        """Bump refcounts (prefix sharing): the same physical pages are
        mapped into another slot's table."""
        for p in pages:
            self._refs[p] += 1
        return pages

    def release(self, pages: List[int]) -> None:
        for p in pages:
            refs = self._refs.get(p, 0) - 1
            if refs <= 0:
                self._refs.pop(p, None)
                self._free.append(p)
            else:
                self._refs[p] = refs


def new_page_pool(
    n_layers: int,
    n_pages: int,
    n_kv_heads: int,
    head_dim: int,
    v_head_dim: int,
    page_size: int,
    n_slots: int,
    table_capacity: int,
    dtype,
    kv_quant: Optional[str] = None,
) -> PagedSlotCache:
    quant = kv_quant == "int8"
    pool_dtype = jnp.int8 if quant else dtype

    def scales():
        # separate buffers: the join jit donates the whole state, and two
        # leaves aliasing one array would be a double donation
        if not quant:
            return None
        return jnp.zeros((n_layers, n_pages, n_kv_heads, page_size), jnp.float32)

    return PagedSlotCache(
        k=jnp.zeros(
            (n_layers, n_pages, n_kv_heads, page_size, head_dim), pool_dtype
        ),
        v=jnp.zeros(
            (n_layers, n_pages, n_kv_heads, page_size, v_head_dim), pool_dtype
        ),
        tables=jnp.zeros((n_slots, table_capacity), jnp.int32),
        lengths=jnp.zeros((n_slots,), jnp.int32),
        k_scale=scales(),
        v_scale=scales(),
    )


class PagedSlotRunner(SlotRunner):
    # join() allocates pool pages host-side per row — the batched
    # wave-join fast path does not apply
    supports_join_many = False
    """SlotRunner whose KV lives in a shared page pool.

    join() allocates pages for the row's prompt + generation budget,
    scatters the prefilled row KV into them, and installs the page table;
    release() returns the pages. The decode chunk itself is inherited —
    the engine's paged step_fn reads/writes through the page tables."""

    def __init__(self, step_fn, *, eos_ids, emit_eos=False, ngram_max=24,
                 allocator: PageAllocator):
        super().__init__(step_fn, eos_ids=eos_ids, emit_eos=emit_eos,
                         ngram_max=ngram_max)
        self.allocator = allocator
        self._row_pages: Dict[int, List[int]] = {}

    # -- device graph override -------------------------------------------------

    def _join_impl(
        self, state, row, row_k, row_v, prompt_row, prompt_len, pos0,
        first_token, first_active, budget, samp, pages_row=None,
    ):
        if pages_row is None:  # contiguous path (not used by this runner)
            return super()._join_impl(
                state, row, row_k, row_v, prompt_row, prompt_len, pos0,
                first_token, first_active, budget, samp,
            )
        cache: PagedSlotCache = state.cache
        page = cache.page_size
        s_pad = row_k.shape[3]
        n_prompt_pages = s_pad // page
        k_pool, v_pool = cache.k, cache.v
        ks_pool, vs_pool = cache.k_scale, cache.v_scale
        row_ks = row_vs = None
        if ks_pool is not None:
            # int8 pool: quantize the prefilled row on device
            from ..ops.attention import quantize_kv_int8

            row_k, row_ks = quantize_kv_int8(row_k)
            row_v, row_vs = quantize_kv_int8(row_v)
        zero = jnp.int32(0)
        for j in range(n_prompt_pages):  # static per s_pad bucket
            blk_k = jax.lax.slice_in_dim(row_k, j * page, (j + 1) * page, axis=3)
            blk_v = jax.lax.slice_in_dim(row_v, j * page, (j + 1) * page, axis=3)
            k_pool = jax.lax.dynamic_update_slice(
                k_pool, blk_k.astype(k_pool.dtype),
                (zero, pages_row[j], zero, zero, zero),
            )
            v_pool = jax.lax.dynamic_update_slice(
                v_pool, blk_v.astype(v_pool.dtype),
                (zero, pages_row[j], zero, zero, zero),
            )
            if ks_pool is not None:
                blk_ks = jax.lax.slice_in_dim(
                    row_ks, j * page, (j + 1) * page, axis=3
                )
                blk_vs = jax.lax.slice_in_dim(
                    row_vs, j * page, (j + 1) * page, axis=3
                )
                ks_pool = jax.lax.dynamic_update_slice(
                    ks_pool, blk_ks, (zero, pages_row[j], zero, zero)
                )
                vs_pool = jax.lax.dynamic_update_slice(
                    vs_pool, blk_vs, (zero, pages_row[j], zero, zero)
                )
        cache = PagedSlotCache(
            k=k_pool,
            v=v_pool,
            tables=state.cache.tables.at[row].set(pages_row),
            lengths=state.cache.lengths.at[row].set(prompt_len),
            k_scale=ks_pool,
            v_scale=vs_pool,
        )
        # non-cache state fields updated exactly like the base join
        sampling = type(state.sampling)(
            temperature=state.sampling.temperature.at[row].set(samp.temperature[0]),
            top_p=state.sampling.top_p.at[row].set(samp.top_p[0]),
            top_k=state.sampling.top_k.at[row].set(samp.top_k[0]),
            repetition_penalty=state.sampling.repetition_penalty.at[row].set(
                samp.repetition_penalty[0]
            ),
            do_sample=state.sampling.do_sample.at[row].set(samp.do_sample[0]),
            ngram=state.sampling.ngram.at[row].set(samp.ngram[0]),
        )
        return SlotState(
            cache=cache,
            context=state.context.at[row].set(prompt_row),
            ctx_len=state.ctx_len.at[row].set(prompt_len),
            prompt_len=state.prompt_len.at[row].set(prompt_len),
            pos=state.pos.at[row].set(pos0),
            current=state.current.at[row].set(first_token),
            active=state.active.at[row].set(first_active),
            budget=state.budget.at[row].set(budget),
            sampling=sampling,
            rng=state.rng,
        )

    # -- host API override -------------------------------------------------------

    def join(self, state, row, row_k, row_v, prompt_ids, prefill_logits,
             params, max_new, pos0=None, first=None):
        from ..core.sampling import SlotSamplingParams, select_token_id_host

        cache: PagedSlotCache = state.cache
        page = cache.page_size
        s_pad = row_k.shape[3]
        C = state.context.shape[1]
        n = len(prompt_ids)
        if n > C:
            raise ValueError(f"prompt ({n} tokens) exceeds context buffer {C}")
        P_max = cache.tables.shape[1]
        need = -(-max(s_pad, n + max_new) // page)  # ceil
        if need > P_max:
            raise ValueError(
                f"row needs {need} pages but tables hold {P_max}"
            )
        pages = self.allocator.alloc(need)
        self._row_pages[row] = pages
        padded_pages = np.zeros(P_max, np.int32)
        padded_pages[:need] = pages

        if first is None:
            rng = np.random.default_rng(params.seed or 0)
            first = select_token_id_host(
                np.asarray(prefill_logits, np.float32), params,
                list(prompt_ids), rng,
            )
        finished = (first in self.eos_ids) or max_new <= 0
        prompt_row = np.zeros(C, np.int32)
        prompt_row[:n] = prompt_ids
        samp = SlotSamplingParams.full(1, params)
        state = self._join_jit(
            state, jnp.int32(row), row_k, row_v, jnp.asarray(prompt_row),
            jnp.int32(n), jnp.int32(n if pos0 is None else pos0),
            jnp.int32(first), jnp.asarray(not finished), jnp.int32(max_new),
            samp, jnp.asarray(padded_pages),
        )
        if finished:
            self._release_row_pages(row)
        return state, finished, int(first)

    def _release_row_pages(self, row: int) -> None:
        pages = self._row_pages.pop(row, None)
        if pages:
            self.allocator.release(pages)

    def release_all_rows(self) -> None:
        """Free every row's pool pages. Public surface for the scheduler's
        device-fault recovery: crashed rows' release() never ran, and a
        leaked pool exhausts after a few recoveries (r4 advisor: the
        recovery path must not poke _row_pages/allocator directly)."""
        for row in list(self._row_pages):
            self._release_row_pages(row)

    def release(self, state, row: int):
        self._release_row_pages(row)
        return super().release(state, row)
