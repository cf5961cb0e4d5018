"""Sampling parity: NumPy host spec (contract: crates/core/src/sampling.rs)
and JAX device implementation agreement on the greedy path."""

import dataclasses

import numpy as np
import pytest

from dsocr_tpu.core.sampling import (
    apply_repetition_penalty_host,
    banned_ngram_tokens_host,
    select_token_id_host,
)


@dataclasses.dataclass
class P:
    do_sample: bool = False
    temperature: float = 0.0
    top_p: float = None
    top_k: int = None
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = None


def test_greedy_argmax_first_tie():
    logits = np.array([1.0, 3.0, 3.0, 2.0], dtype=np.float32)
    assert select_token_id_host(logits, P(), []) == 1


def test_repetition_penalty_positive_divided_negative_multiplied():
    scores = np.array([2.0, -2.0, 1.0], dtype=np.float32)
    apply_repetition_penalty_host(scores, [0, 1], 2.0)
    np.testing.assert_allclose(scores, [1.0, -4.0, 1.0])


def test_repetition_penalty_noop_when_one():
    scores = np.array([2.0, -2.0], dtype=np.float32)
    apply_repetition_penalty_host(scores, [0, 1], 1.0)
    np.testing.assert_allclose(scores, [2.0, -2.0])


def test_repetition_penalty_changes_argmax():
    logits = np.array([5.0, 4.9, 0.0], dtype=np.float32)
    assert select_token_id_host(logits, P(repetition_penalty=1.5), [0]) == 1


def test_banned_ngram_tokens():
    # sequence ...1,2 previously followed by 3 → 3 banned after suffix 1,2
    seq = [1, 2, 3, 7, 1, 2]
    assert banned_ngram_tokens_host(seq, 3) == {3}


def test_banned_ngram_multiple_continuations():
    seq = [1, 2, 3, 1, 2, 4, 1, 2]
    assert banned_ngram_tokens_host(seq, 3) == {3, 4}


def test_banned_ngram_too_short():
    assert banned_ngram_tokens_host([1], 3) == set()


def test_ngram_ban_affects_selection():
    logits = np.array([0.0, 0.0, 0.0, 10.0, 1.0], dtype=np.float32)
    # context [1,2,3,1,2]: suffix (1,2) previously followed by 3 → ban 3
    tok = select_token_id_host(logits, P(no_repeat_ngram_size=3), [1, 2, 3, 1, 2])
    assert tok == 4


def test_ngram_ban_all_banned_falls_back():
    logits = np.full(3, -np.inf, dtype=np.float32)
    logits[2] = 1.0
    # ban wipes the only finite logit → falls back to adjusted
    tok = select_token_id_host(logits, P(no_repeat_ngram_size=2), [0, 2, 0])
    assert tok == 2


def test_sampling_with_seed_reproducible():
    logits = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    p = P(do_sample=True, temperature=1.0)
    r1 = select_token_id_host(logits, p, [], np.random.default_rng(42))
    r2 = select_token_id_host(logits, p, [], np.random.default_rng(42))
    assert r1 == r2


def test_top_k_limits_support():
    logits = np.array([10.0, 9.0, -5.0, -6.0], dtype=np.float32)
    p = P(do_sample=True, temperature=1.0, top_k=2)
    rng = np.random.default_rng(0)
    picks = {select_token_id_host(logits, p, [], rng) for _ in range(50)}
    assert picks <= {0, 1}


def test_top_p_keeps_head():
    logits = np.array([10.0, 0.0, 0.0, 0.0], dtype=np.float32)
    p = P(do_sample=True, temperature=1.0, top_p=0.5)
    rng = np.random.default_rng(0)
    picks = {select_token_id_host(logits, p, [], rng) for _ in range(30)}
    assert picks == {0}


# ---------------------------------------------------------------------------
# Device (JAX) vs host agreement
# ---------------------------------------------------------------------------


def _device_pick(logits_np, context, **kw):
    import jax.numpy as jnp

    from dsocr_tpu.core.sampling import select_token_id_device

    L = 16
    ctx = np.zeros((1, L), dtype=np.int32)
    ctx[0, : len(context)] = context
    defaults = dict(
        do_sample=False,
        temperature=0.0,
        top_p=None,
        top_k=None,
        repetition_penalty=1.0,
        no_repeat_ngram_size=None,
    )
    defaults.update(kw)
    out = select_token_id_device(
        jnp.asarray(logits_np[None, :]),
        jnp.asarray(ctx),
        jnp.asarray([len(context)], dtype=jnp.int32),
        **defaults,
    )
    return int(out[0])


@pytest.mark.parametrize("seed", range(8))
def test_device_greedy_matches_host(seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=32).astype(np.float32)
    context = rng.integers(0, 32, size=rng.integers(0, 12)).tolist()
    host = select_token_id_host(logits, P(), context)
    dev = _device_pick(logits, context)
    assert host == dev


@pytest.mark.parametrize("seed", range(8))
def test_device_repetition_penalty_matches_host(seed):
    rng = np.random.default_rng(100 + seed)
    logits = rng.normal(size=32).astype(np.float32)
    context = rng.integers(0, 32, size=10).tolist()
    host = select_token_id_host(logits, P(repetition_penalty=1.7), context)
    dev = _device_pick(logits, context, repetition_penalty=1.7)
    assert host == dev


@pytest.mark.parametrize("seed", range(8))
def test_device_ngram_ban_matches_host(seed):
    rng = np.random.default_rng(200 + seed)
    logits = rng.normal(size=8).astype(np.float32)
    context = rng.integers(0, 8, size=14).tolist()
    host = select_token_id_host(logits, P(no_repeat_ngram_size=3), context)
    dev = _device_pick(logits, context, no_repeat_ngram_size=3)
    assert host == dev


def test_device_combined_matches_host():
    rng = np.random.default_rng(7)
    for _ in range(5):
        logits = rng.normal(size=16).astype(np.float32)
        context = rng.integers(0, 16, size=12).tolist()
        host = select_token_id_host(
            logits, P(repetition_penalty=1.3, no_repeat_ngram_size=2), context
        )
        dev = _device_pick(
            logits, context, repetition_penalty=1.3, no_repeat_ngram_size=2
        )
        assert host == dev


def test_device_top_k_tie_break_matches_host():
    # All ties with the k-th value must NOT be kept: exactly k survive,
    # earliest index wins (matches _apply_top_k_host's stable sort).
    import jax.numpy as jnp

    from dsocr_tpu.core.sampling import top_k_mask_device

    logits = np.array([1.0, 5.0, 5.0, 5.0, 0.0], dtype=np.float32)
    masked = np.asarray(top_k_mask_device(jnp.asarray(logits[None]), 2))[0]
    kept = np.flatnonzero(np.isfinite(masked))
    assert kept.tolist() == [1, 2]

    host = logits.astype(np.float64).copy()
    from dsocr_tpu.core.sampling import _apply_top_k_host

    _apply_top_k_host(host, 2)
    assert np.flatnonzero(np.isfinite(host)).tolist() == kept.tolist()


@pytest.mark.parametrize("seed", range(6))
def test_device_top_k_sampled_support_matches_host(seed):
    # With duplicated logit values the surviving support must agree.
    import jax.numpy as jnp

    from dsocr_tpu.core.sampling import _apply_top_k_host, top_k_mask_device

    rng = np.random.default_rng(300 + seed)
    logits = rng.integers(-3, 4, size=24).astype(np.float32)  # many ties
    k = int(rng.integers(1, 10))
    host = logits.astype(np.float64).copy()
    _apply_top_k_host(host, k)
    masked = np.asarray(top_k_mask_device(jnp.asarray(logits[None]), k))[0]
    assert (
        np.flatnonzero(np.isfinite(host)).tolist()
        == np.flatnonzero(np.isfinite(masked)).tolist()
    )
