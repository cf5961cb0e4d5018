"""Model loading dispatch: ModelKind + resolved paths → engine.

Equivalent of the reference CLI's load_*_model dispatch
(crates/cli/src/app.rs:105-110).
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax.numpy as jnp

from ..core.engine import ModelKind, OcrEngine


_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "f32": jnp.float32,
    "float16": jnp.float16,
    "f16": jnp.float16,
}


def resolve_dtype(name: Optional[str]):
    if name is None:
        return jnp.bfloat16
    dtype = _DTYPES.get(name.lower())
    if dtype is None:
        raise ValueError(f"unsupported dtype {name!r}")
    return dtype


def parse_mesh_spec(spec: Optional[str]):
    """'dp=2,mp=4[,ep]' → (jax.sharding.Mesh, ep) (None → (None, False)).

    'ep' switches routed-expert stacks to expert parallelism over the mp
    axis (deepseek only — a beyond-the-reference capability; the
    reference bails on ep_size > 1, block.rs:1248-1252)."""
    if not spec:
        return None, False
    from ..parallel import make_mesh

    parts = {}
    ep = False
    for p in spec.split(","):
        if p.strip() in ("ep", "ep=true", "ep=1"):
            ep = True
            continue
        key, value = p.split("=")
        parts[key.strip()] = value
    dp = int(parts.get("dp", 1))
    mp = int(parts.get("mp", 1))
    return make_mesh(dp * mp, dp=dp), ep


def _snapshot_quant_method(snapshot_path) -> Optional[str]:
    """DSQ snapshot default dtype → runtime quantize method. Quantized
    snapshots serve PACKED at matmul time (the reference's QMatMul path,
    dsq-runtime/src/lib.rs:316-369): Q8_0 via ops/pallas/dequant_matmul
    (requantize of the dequantized payload is bit-exact, tested),
    Q4_K/Q6_K via the plane-decomposed ops/pallas/kquant_matmul kernels
    fed the snapshot's published payload bytes."""
    if not snapshot_path:
        return None
    from ..dsq.format import DsqReader

    reader = DsqReader(pathlib.Path(snapshot_path))
    try:
        return {
            "Q8_0": "q8_0", "Q4_K": "q4_k", "Q6_K": "q6_k"
        }.get(reader.header.default_qdtype)
    finally:
        reader.close()


def load_engine(
    kind: ModelKind,
    config_path: Optional[pathlib.Path] = None,
    weights_path: Optional[pathlib.Path] = None,
    snapshot_path: Optional[pathlib.Path] = None,
    dtype: Optional[str] = None,
    max_seq_len: int = 8192,
    mesh: Optional[Any] = None,
    quantize: Optional[str] = None,
    ep: bool = False,
    kv_quant: Optional[str] = None,
) -> OcrEngine:
    jdtype = resolve_dtype(dtype)
    if isinstance(mesh, str):
        mesh, spec_ep = parse_mesh_spec(mesh)
        ep = ep or spec_ep
    if kind is ModelKind.DEEPSEEK:
        from .deepseek import DeepseekOcrConfig, DeepseekOcrEngine
        from .deepseek.loader import load_deepseek_params

        cfg = (
            DeepseekOcrConfig.from_json(config_path)
            if config_path
            else DeepseekOcrConfig()
        )
        quantize = quantize or _snapshot_quant_method(snapshot_path)
        params = None
        if weights_path:
            params = load_deepseek_params(
                weights_path, cfg, dtype=jdtype, snapshot_path=snapshot_path
            )
        return DeepseekOcrEngine(
            cfg,
            params=params,
            dtype=jdtype,
            max_seq_len=max_seq_len,
            mesh=mesh,
            quantize=quantize,
            ep=ep,
            kv_quant=kv_quant,
        )
    if kind is ModelKind.PADDLE_OCR_VL:
        from .paddleocr import PaddleConfig, PaddleOcrEngine
        from .paddleocr.loader import load_paddle_params

        cfg = PaddleConfig.from_json(config_path) if config_path else PaddleConfig()
        quantize = quantize or _snapshot_quant_method(snapshot_path)
        params = None
        if weights_path:
            params = load_paddle_params(
                weights_path, cfg, dtype=jdtype, snapshot_path=snapshot_path
            )
        return PaddleOcrEngine(
            cfg, params=params, dtype=jdtype, max_seq_len=max_seq_len,
            quantize=quantize, kv_quant=kv_quant, mesh=mesh,
        )
    if kind is ModelKind.DOTS_OCR:
        from .dots import DotsConfig, DotsOcrEngine
        from .dots.loader import load_dots_params

        cfg = DotsConfig.from_json(config_path) if config_path else DotsConfig()
        quantize = quantize or _snapshot_quant_method(snapshot_path)
        params = None
        if weights_path:
            params = load_dots_params(
                weights_path, cfg, dtype=jdtype, snapshot_path=snapshot_path
            )
        return DotsOcrEngine(
            cfg, params=params, dtype=jdtype, max_seq_len=max_seq_len,
            quantize=quantize, kv_quant=kv_quant, mesh=mesh,
        )
    if kind is ModelKind.GLM_OCR:
        from .glm import GlmConfig, GlmOcrEngine
        from .glm.loader import load_glm_params

        cfg = GlmConfig.from_json(config_path) if config_path else GlmConfig()
        params = None
        if weights_path:
            params = load_glm_params(
                weights_path, cfg, dtype=jdtype, snapshot_path=snapshot_path
            )
        return GlmOcrEngine(
            cfg, params=params, dtype=jdtype, max_seq_len=max_seq_len,
            kv_quant=kv_quant, mesh=mesh,
        )
    raise ValueError(f"unsupported model kind {kind}")
