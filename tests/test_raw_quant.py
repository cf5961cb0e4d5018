"""Raw snapshot-payload pass-through for quantized serving.

The reference's QMatMul reads the snapshot's ggml payload bytes directly
(dsq-runtime/src/lib.rs:316-369). Q8_0 requantize(dequantize) is
bit-exact so round-tripping was fine; k-quants are NOT guaranteed exact,
so serving must pack the PUBLISHED payloads. These tests pin:
- quantize_plain / quantize_expert_stack short-circuit to the raw bytes
  (proved by feeding a payload of *different* weights),
- fused-key assembly (qkv = q+k+v payload concat per layer),
- loader collection from a real .dsq overlay + engine end-to-end."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.dsq.quant import (
    dequantize,
    quantize_q4_k,
    quantize_q6_k,
    quantize_q8_0,
)
from dsocr_tpu.models.deepseek.quantize import (
    _raw_for,
    quantize_expert_stack,
    quantize_plain,
)


def _other(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("method,quantizer", [
    ("q4_k", quantize_q4_k), ("q6_k", quantize_q6_k),
    ("q8_0", quantize_q8_0),
])
def test_plain_raw_payload_wins(method, quantizer):
    """The packed planes must come from the payload, not from
    requantizing `w` — use a payload of different weights to prove it."""
    rng = np.random.default_rng(1)
    i, o = 256, 8
    w = _other(rng, i, o)  # param layout [in, out]
    published = _other(rng, o, i)  # ggml rows [out, in] of OTHER weights
    payload = quantizer(published, o, i)

    packed = quantize_plain(
        w, method, raw={"method": method, "layers": [payload]}
    )
    baseline = quantize_plain(w, method)
    # pass-through target: a direct pack of the published payload
    if method == "q8_0":
        from dsocr_tpu.ops.pallas.dequant_matmul import pack_q8_0

        ref = dict(zip(("codes", "scales"), pack_q8_0(payload, o, i)))
    else:
        from dsocr_tpu.ops.pallas.kquant_matmul import pack_q4_k, pack_q6_k

        ref = (pack_q4_k if method == "q4_k" else pack_q6_k)(payload, o, i)
    for key in packed:
        np.testing.assert_array_equal(
            np.asarray(packed[key]), np.asarray(ref[key]),
            err_msg=f"{method} plane {key} not taken from raw payload",
        )
    assert any(
        not np.array_equal(np.asarray(packed[k]), np.asarray(baseline[k]))
        for k in packed
    )


def test_plain_raw_method_mismatch_falls_back():
    rng = np.random.default_rng(2)
    w = _other(rng, 256, 8)
    payload = quantize_q6_k(_other(rng, 8, 256), 8, 256)
    packed = quantize_plain(
        w, "q4_k", raw={"method": "q6_k", "layers": [payload]}
    )
    baseline = quantize_plain(w, "q4_k")
    for key in packed:
        np.testing.assert_array_equal(
            np.asarray(packed[key]), np.asarray(baseline[key])
        )


def test_plain_raw_bad_length_falls_back():
    rng = np.random.default_rng(3)
    w = _other(rng, 256, 8)
    payload = quantize_q4_k(_other(rng, 4, 256), 4, 256)  # wrong row count
    packed = quantize_plain(
        w, "q4_k", raw={"method": "q4_k", "layers": [payload]}
    )
    baseline = quantize_plain(w, "q4_k")
    for key in packed:
        np.testing.assert_array_equal(
            np.asarray(packed[key]), np.asarray(baseline[key])
        )


def test_expert_stack_raw_payload_wins():
    rng = np.random.default_rng(4)
    L, E, i, o = 2, 3, 256, 8
    w = _other(rng, L, E, i, o)
    published = _other(rng, L, E, o, i)
    raw = {
        "method": "q6_k",
        "layers": [
            [quantize_q6_k(published[l, e], o, i) for e in range(E)]
            for l in range(L)
        ],
    }
    packed = quantize_expert_stack(w, "q6_k", raw=raw)
    # q6_k requantize is not byte-stable, so compare against a direct
    # pack of the payloads:
    from dsocr_tpu.ops.pallas.kquant_matmul import pack_q6_k_inmajor

    for l in range(L):
        direct = pack_q6_k_inmajor(b"".join(raw["layers"][l]), E, o, i)
        for key in direct:
            np.testing.assert_array_equal(
                np.asarray(packed[key][l]), np.asarray(direct[key])
            )


def test_fused_raw_assembly_concats_parts():
    """qkv payload = q+k+v payloads per layer (fusion concatenates along
    the out dim → ggml rows append)."""
    raw = {
        ("dense_layers", "q_proj"): {"method": "q8_0", "layers": [b"Q0", b"Q1"]},
        ("dense_layers", "k_proj"): {"method": "q8_0", "layers": [b"K0", b"K1"]},
        ("dense_layers", "v_proj"): {"method": "q8_0", "layers": [b"V0", b"V1"]},
        ("moe_layers", "experts_gate"): {
            "method": "q4_k", "layers": [[b"g0", b"g1"]],
        },
        ("moe_layers", "experts_up"): {
            "method": "q4_k", "layers": [[b"u0", b"u1"]],
        },
    }
    fused = _raw_for(raw, "dense_layers", "qkv_proj")
    assert fused == {"method": "q8_0", "layers": [b"Q0K0V0", b"Q1K1V1"]}
    eg = _raw_for(raw, "moe_layers", "experts_gateup")
    assert eg == {"method": "q4_k", "layers": [[b"g0u0", b"g1u1"]]}
    assert _raw_for(raw, "dense_layers", "o_proj") is None
    # method mismatch kills the fuse
    raw[("dense_layers", "k_proj")]["method"] = "q6_k"
    assert _raw_for(raw, "dense_layers", "qkv_proj") is None


def test_loader_collects_raw_and_engine_packs_snapshot_codes(tmp_path):
    """End-to-end: a .dsq overlay on the attention projections is
    collected by the loader and the quantized engine's fused qkv codes
    equal a direct pack of the snapshot payloads."""
    from dsocr_tpu.dsq.format import DsqWriter
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.loader import load_deepseek_params
    from dsocr_tpu.ops.pallas.dequant_matmul import pack_q8_0
    from tests.test_loaders import _make_deepseek_checkpoint

    ckpt = tmp_path / "model.safetensors"
    cfg, tensors = _make_deepseek_checkpoint(ckpt)

    rng = np.random.default_rng(5)
    writer = DsqWriter(model_id="t", default_qdtype="Q8_0")
    published = {}
    for i in range(3):
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            name = f"model.layers.{i}.self_attn.{proj}"
            w = rng.normal(size=(32, 32)).astype(np.float32)
            published[name] = w
            writer.quantize_and_add(name, w, "Q8_0")
    snap = tmp_path / "snap.dsq"
    writer.finalize(snap)

    params = load_deepseek_params(
        ckpt, cfg, dtype=jnp.float32, snapshot_path=snap
    )
    raw = params["decoder"]["__raw_quant__"]
    assert ("dense_layers", "q_proj") in raw
    assert ("moe_layers", "o_proj") in raw
    assert raw[("moe_layers", "q_proj")]["method"] == "q8_0"
    assert len(raw[("moe_layers", "q_proj")]["layers"]) == 2  # moe layers 1,2

    engine = DeepseekOcrEngine(
        cfg, params=params, dtype=jnp.float32, max_seq_len=256, quantize="q8_0"
    )
    qkv = engine.params["decoder"]["dense_layers"]["qkv_proj"]
    expected_payload = b"".join(
        quantize_q8_0(published[f"model.layers.0.self_attn.{p}"], 32, 32)
        for p in ("q_proj", "k_proj", "v_proj")
    )
    exp_codes, exp_scales = pack_q8_0(expected_payload, 96, 32)
    np.testing.assert_array_equal(np.asarray(qkv["codes"][0]), np.asarray(exp_codes))
    np.testing.assert_array_equal(np.asarray(qkv["scales"][0]), np.asarray(exp_scales))


def test_q8_rows_matches_payload_path():
    """The direct array quantizer must be byte-identical to
    quantize_q8_0 -> pack_q8_0 (incl. tie rounding, zero blocks, and the
    f16-stored scale)."""
    from dsocr_tpu.models.deepseek.quantize import _q8_rows
    from dsocr_tpu.ops.pallas.dequant_matmul import pack_q8_0

    rng = np.random.default_rng(7)
    rows = rng.normal(size=(8, 96)).astype(np.float32) * 3
    rows[2] = 0.0  # zero block shortcut
    rows[3, :32] = 2.5 * (rows[3, :32] != 0)  # exercise tie rounding
    codes, scales = _q8_rows(rows)
    ref_codes, ref_scales = pack_q8_0(quantize_q8_0(rows, 8, 96), 8, 96)
    np.testing.assert_array_equal(codes, np.asarray(ref_codes))
    np.testing.assert_array_equal(scales, np.asarray(ref_scales))
