"""DecodeParameters defaults + patch layering
(contract: crates/core/src/inference.rs:21-132,
crates/config/tests/inference_overrides.rs)."""

from dsocr_tpu.core import DecodeParameters, DecodeParametersPatch


def test_defaults():
    p = DecodeParameters()
    assert p.max_new_tokens == 512
    assert p.do_sample is False
    assert p.temperature == 0.0
    assert p.top_p == 1.0
    assert p.top_k is None
    assert p.repetition_penalty == 1.0
    assert p.no_repeat_ngram_size == 20
    assert p.seed is None
    assert p.use_cache is True


def test_sampling_defaults():
    p = DecodeParameters.with_sampling_defaults(64)
    assert p.max_new_tokens == 64
    assert p.top_p is None
    assert p.no_repeat_ngram_size is None


def test_patch_overrides_and_normalization():
    p = DecodeParameters()
    p += DecodeParametersPatch(top_p=1.0, top_k=0, no_repeat_ngram_size=0)
    # patched values are normalized: 1.0 → None, 0 → None
    assert p.top_p is None
    assert p.top_k is None
    assert p.no_repeat_ngram_size is None

    p += DecodeParametersPatch(top_p=0.9, top_k=5, no_repeat_ngram_size=3)
    assert p.top_p == 0.9
    assert p.top_k == 5
    assert p.no_repeat_ngram_size == 3


def test_patch_none_fields_leave_values():
    p = DecodeParameters(max_new_tokens=100, temperature=0.5)
    p += DecodeParametersPatch()
    assert p.max_new_tokens == 100
    assert p.temperature == 0.5


def test_add_returns_copy():
    p = DecodeParameters()
    q = p + DecodeParametersPatch(max_new_tokens=7)
    assert q.max_new_tokens == 7
    assert p.max_new_tokens == 512


def test_patch_layering_priority():
    base = DecodeParametersPatch(max_new_tokens=10, temperature=0.1)
    cli = DecodeParametersPatch(temperature=0.9)
    merged = cli.merged_over(base)
    assert merged.max_new_tokens == 10
    assert merged.temperature == 0.9


def test_patch_from_mapping_ignores_unknown():
    patch = DecodeParametersPatch.from_mapping(
        {"max_new_tokens": 33, "bogus": 1, "seed": 42}
    )
    assert patch.max_new_tokens == 33
    assert patch.seed == 42
