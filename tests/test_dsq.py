"""DSQ container + ggml-block quantizers
(contracts: crates/dsq/tests/reader.rs, crates/dsq-writer/tests/writer.rs)."""

import numpy as np
import pytest

from dsocr_tpu.dsq import (
    DsqReader,
    DsqWriter,
    dequantize_q4_k,
    dequantize_q6_k,
    dequantize_q8_0,
    quantize_q4_k,
    quantize_q6_k,
    quantize_q8_0,
)
from dsocr_tpu.dsq.quant import Q4K_BLOCK_BYTES, Q6K_BLOCK_BYTES, Q8_BLOCK_BYTES


def _weights(rng, rows, cols, scale=1.0):
    return (rng.normal(size=(rows, cols)) * scale).astype(np.float32)


# -- Q8_0 ----------------------------------------------------------------------


def test_q8_0_payload_size():
    rng = np.random.default_rng(0)
    w = _weights(rng, 4, 64)
    payload = quantize_q8_0(w, 4, 64)
    assert len(payload) == 4 * 2 * Q8_BLOCK_BYTES


def test_q8_0_roundtrip_error():
    rng = np.random.default_rng(1)
    w = _weights(rng, 8, 128)
    deq = dequantize_q8_0(quantize_q8_0(w, 8, 128), 8, 128)
    amax = np.abs(w.reshape(-1, 32)).max(1, keepdims=True)
    np.testing.assert_allclose(deq, w, atol=float(amax.max()) / 127 + 1e-6)


def test_q8_0_zero_block():
    w = np.zeros((1, 32), np.float32)
    payload = quantize_q8_0(w, 1, 32)
    assert payload == b"\x00" * Q8_BLOCK_BYTES
    np.testing.assert_array_equal(dequantize_q8_0(payload, 1, 32), w)


def test_q8_0_exact_values():
    # a block whose values are exact multiples of the scale round-trips exactly
    w = (np.arange(-16, 16, dtype=np.float32) * (127.0 / 16))[None, :]
    # amax = 15*127/16... construct simpler: values in {-127..127} scaled
    w = np.asarray([[float(i) for i in range(-127, 128, 8)][:32]], np.float32)
    deq = dequantize_q8_0(quantize_q8_0(w, 1, 32), 1, 32)
    scale = np.float16(np.abs(w).max() / 127.0).astype(np.float32)
    np.testing.assert_allclose(deq, np.round(w / scale) * scale, rtol=1e-3)


# -- Q6_K ----------------------------------------------------------------------


def test_q6_k_payload_size():
    rng = np.random.default_rng(2)
    w = _weights(rng, 2, 512)
    payload = quantize_q6_k(w, 2, 512)
    assert len(payload) == 2 * 2 * Q6K_BLOCK_BYTES


def test_q6_k_roundtrip_error():
    rng = np.random.default_rng(3)
    w = _weights(rng, 4, 256)
    deq = dequantize_q6_k(quantize_q6_k(w, 4, 256), 4, 256)
    err = np.abs(deq - w)
    # 6-bit quantization: relative error well under 5% of the block range
    assert err.max() < 0.05 * np.abs(w).max()


def test_q6_k_zero_block():
    w = np.zeros((1, 256), np.float32)
    payload = quantize_q6_k(w, 1, 256)
    assert payload == b"\x00" * Q6K_BLOCK_BYTES


def test_q6_k_block_misalignment_raises():
    with pytest.raises(ValueError):
        quantize_q6_k(np.zeros((1, 100), np.float32), 1, 100)


# -- Q4_K ----------------------------------------------------------------------


def test_q4_k_payload_size():
    rng = np.random.default_rng(4)
    w = _weights(rng, 3, 256)
    payload = quantize_q4_k(w, 3, 256)
    assert len(payload) == 3 * Q4K_BLOCK_BYTES


def test_q4_k_roundtrip_error():
    rng = np.random.default_rng(5)
    w = _weights(rng, 4, 256)
    deq = dequantize_q4_k(quantize_q4_k(w, 4, 256), 4, 256)
    err = np.abs(deq - w)
    # 4-bit with per-32 sub-block scale/min: coarse but bounded
    assert err.max() < 0.15 * np.abs(w).max()
    assert np.corrcoef(deq.reshape(-1), w.reshape(-1))[0, 1] > 0.99


def test_q4_k_scales_pack_unpack():
    from dsocr_tpu.dsq.quant import _pack_q4k_scales, _unpack_q4k_scales

    rng = np.random.default_rng(6)
    ls = rng.integers(0, 64, size=(5, 8)).astype(np.uint8)
    lm = rng.integers(0, 64, size=(5, 8)).astype(np.uint8)
    sc, m = _unpack_q4k_scales(_pack_q4k_scales(ls, lm))
    np.testing.assert_array_equal(sc, ls)
    np.testing.assert_array_equal(m, lm)


# -- container ----------------------------------------------------------------


def test_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    path = tmp_path / "snap.dsq"
    writer = DsqWriter(model_id="test-model", default_qdtype="Q8_0")
    w1 = _weights(rng, 8, 64)
    w2 = _weights(rng, 4, 256)
    bias = rng.normal(size=8).astype(np.float32)
    writer.quantize_and_add("layer.0.weight", w1, "Q8_0", bias=bias)
    writer.quantize_and_add("layer.1.weight", w2, "Q4_K")
    writer.add_float_tensor("head.weight", _weights(rng, 4, 16), "F32")
    writer.finalize(path)

    reader = DsqReader(path)
    assert reader.header.model_id == "test-model"
    assert reader.header.default_qdtype == "Q8_0"
    assert reader.header.block_size == 32
    assert reader.header.tensor_count == 3
    assert "layer.0.weight" in reader
    rec = reader.tensor("layer.0.weight")
    assert rec.out_dim == 8 and rec.in_dim == 64 and rec.q_dtype == "Q8_0"
    np.testing.assert_allclose(reader.bias_array(rec), bias)
    deq = reader.dequantize("layer.0.weight")
    np.testing.assert_allclose(deq, dequantize_q8_0(quantize_q8_0(w1, 8, 64), 8, 64))
    # float passthrough is exact
    head = reader.dequantize("head.weight")
    assert head.shape == (4, 16)
    reader.close()


def test_reader_rejects_bad_magic(tmp_path):
    path = tmp_path / "bad.dsq"
    path.write_bytes(b"NOTDSQ!" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        DsqReader(path)


def test_reader_rejects_bad_version(tmp_path):
    path = tmp_path / "bad2.dsq"
    path.write_bytes(b"DSQSNAP" + (99).to_bytes(4, "little") + b"\x00" * 64)
    with pytest.raises(ValueError, match="version"):
        DsqReader(path)


def test_reader_rejects_duplicate_names(tmp_path):
    path = tmp_path / "dup.dsq"
    writer = DsqWriter(model_id="m", default_qdtype="Q8_0")
    w = np.ones((1, 32), np.float32)
    writer.quantize_and_add("same", w, "Q8_0")
    writer.quantize_and_add("same", w, "Q8_0")
    writer.finalize(path)
    with pytest.raises(ValueError, match="duplicate"):
        DsqReader(path)


def test_bf16_float_record_roundtrip(tmp_path):
    import ml_dtypes

    rng = np.random.default_rng(8)
    path = tmp_path / "bf16.dsq"
    writer = DsqWriter(model_id="m", default_qdtype="Q6_K")
    w = _weights(rng, 2, 8)
    writer.add_float_tensor("t", w, "BF16")
    writer.finalize(path)
    reader = DsqReader(path)
    np.testing.assert_allclose(
        reader.dequantize("t"), w.astype(ml_dtypes.bfloat16).astype(np.float32)
    )


def test_q8_0_ties_round_away_from_zero():
    # Reference quantizer uses Rust f32::round (ties away from zero,
    # dsq-writer lib.rs:592); numpy's default rint is ties-to-even.
    w = np.zeros((1, 32), np.float32)
    w[0, 0] = 127.0  # amax → scale exactly 1.0
    w[0, 1] = 2.5
    w[0, 2] = -2.5
    w[0, 3] = 0.5
    w[0, 4] = -0.5
    w[0, 5] = 1.5
    payload = quantize_q8_0(w, 1, 32)
    codes = np.frombuffer(payload, np.uint8)[2:].view(np.int8)
    assert codes[0] == 127
    assert codes[1] == 3 and codes[2] == -3
    assert codes[3] == 1 and codes[4] == -1
    assert codes[5] == 2
