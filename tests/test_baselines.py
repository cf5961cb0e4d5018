"""Golden-baseline regression harness (tier 3, SURVEY.md §4).

Mirrors infer-deepseek/tests/baseline.rs: artifacts captured from the
Python reference implementation live under ``baselines/sample/`` as
``baseline.json`` metadata plus ``.npy`` tensors and token dumps. Tests
skip when the artifacts (or real weights) are absent — this machine has
no network egress and ships no weights.

Expected layout (same schema as the reference's baselines/):
    baselines/sample/baseline.json        {"prompt": ..., "image": ...,
                                           "model_id": ...,
                                           "prompt_tokens": [...],
                                           "generated_tokens": [...]}
    baselines/sample/vision_embeddings.npy   [n_tokens, n_embed]
    baselines/sample/projector_output.npy    [n_tokens, n_embed]
    baselines/sample/teacher_logits.npy      [steps, vocab] (optional)
    weights at $DEEPSEEK_OCR_CACHE_DIR/models/<model_id>/model.safetensors
"""

import json
import pathlib

import numpy as np
import pytest

BASELINE_DIR = pathlib.Path(__file__).resolve().parents[1] / "baselines" / "sample"


@pytest.fixture(scope="module", autouse=True)
def _full_canvas_upload():
    """Parity fixtures compare against HF goldens at tight tolerances:
    pin the canonical full-canvas upload path. Content-only upload
    rebuilds pixel-exact canvases but shifts tower numerics within
    ~2e-5 (XLA pad-into-conv fusion), enough to flip a greedy near-tie
    (ADVICE r3). Scoped so the rest of the suite keeps covering the
    production-default content-upload path."""
    mp = pytest.MonkeyPatch()
    mp.setenv("DSOCR_CONTENT_UPLOAD", "0")
    yield
    mp.undo()

pytestmark = pytest.mark.skipif(
    not (BASELINE_DIR / "baseline.json").exists(),
    reason="baseline artifacts not present (requires real weights + captured goldens)",
)


@pytest.fixture(scope="module")
def baseline():
    return json.loads((BASELINE_DIR / "baseline.json").read_text())


@pytest.fixture(scope="module")
def engine(baseline):
    import jax.numpy as jnp

    from dsocr_tpu.config import VirtualFileSystem
    from dsocr_tpu.models.deepseek import DeepseekOcrConfig, DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.loader import load_deepseek_params

    vfs = VirtualFileSystem()
    model_id = baseline.get("model_id", "deepseek-ocr")
    config_path = vfs.model_config(model_id)
    weights_path = vfs.model_weights(model_id)
    if not weights_path.exists():
        pytest.skip(f"weights not found at {weights_path}")
    cfg = (
        DeepseekOcrConfig.from_json(config_path)
        if config_path.exists()
        else DeepseekOcrConfig()
    )
    params = load_deepseek_params(weights_path, cfg, dtype=jnp.bfloat16)
    return DeepseekOcrEngine(cfg, params=params, dtype=jnp.bfloat16)


def test_baseline_vision_embeddings_match_reference(engine, baseline):
    from PIL import Image

    from dsocr_tpu.core import VisionSettings

    golden = np.load(BASELINE_DIR / "vision_embeddings.npy")
    image = np.asarray(
        Image.open(BASELINE_DIR / baseline["image"]).convert("RGB")
    )
    vin = engine.prepare_vision_input(
        image,
        VisionSettings(
            baseline.get("base_size", 1024),
            baseline.get("image_size", 640),
            baseline.get("crop_mode", True),
        ),
    )
    ours = np.asarray(engine.compute_image_embedding(vin), np.float32)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=2e-2, atol=2e-2)


def test_baseline_teacher_forcing_matches_reference(engine, baseline):
    """Feed the reference's generated tokens; greedy argmax at every step
    must reproduce the next reference token (the ≤1% mismatch north star
    is checked by bench.gate.mismatch_rate)."""
    import jax.numpy as jnp

    from dsocr_tpu.bench.gate import mismatch_rate
    from dsocr_tpu.models.deepseek.decoder import deepseek_forward, new_cache
    from dsocr_tpu.runtime.kv_cache import bump_length, reset

    prompt_tokens = baseline["prompt_tokens"]
    generated = baseline["generated_tokens"]
    if not generated:
        pytest.skip("baseline has no generated tokens")
    cfg = engine.cfg.language
    all_tokens = list(prompt_tokens) + list(generated)
    cache = reset(new_cache(cfg, 1, len(all_tokens) + 8, jnp.bfloat16))
    embeds = engine.params["decoder"]["embed_tokens"][jnp.asarray(all_tokens)][None]
    positions = jnp.arange(len(all_tokens), dtype=jnp.int32)[None]
    logits, _ = deepseek_forward(
        engine.params["decoder"], cfg, embeds.astype(engine.dtype_), positions,
        cache, engine._rope, full_logits=True,
    )
    preds = np.asarray(jnp.argmax(logits[0], -1))
    # prediction at position len(prompt)-1+i should equal generated[i]
    start = len(prompt_tokens) - 1
    predicted = preds[start : start + len(generated)].tolist()
    rate = mismatch_rate(generated, predicted)
    assert rate <= 0.01, f"token mismatch rate {rate:.3%} exceeds 1%"
