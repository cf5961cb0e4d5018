"""CLI end-to-end: tiny model in a fake cache dir, real tokenizer.json,
full argv surface (contract: crates/cli/src/app.rs)."""

import json
import pathlib
import sys

import numpy as np
import pytest
from PIL import Image

from dsocr_tpu.cli.app import main as cli_main


@pytest.fixture(scope="module")
def model_home(tmp_path_factory):
    """Fake cache dir with a tiny paddleocr-vl model + tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    from dsocr_tpu.models.paddleocr.config import tiny_paddle_config
    from tests.test_loaders import _make_paddle_checkpoint

    home = tmp_path_factory.mktemp("cache")
    mdir = home / "models" / "paddleocr-vl"
    mdir.mkdir(parents=True)

    cfg, _ = _make_paddle_checkpoint(mdir / "model.safetensors")
    # serialize the tiny config as config.json
    cfg_dict = {
        "architectures": ["PaddleOCRVLForConditionalGeneration"],
        "head_dim": cfg.head_dim,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "vocab_size": cfg.vocab_size,
        "num_attention_heads": cfg.num_attention_heads,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_key_value_heads": cfg.num_key_value_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "image_token_id": cfg.image_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": True,
        "rope_scaling": {"mrope_section": list(cfg.mrope_section)},
        "vision_config": {
            "hidden_size": cfg.vision_config.hidden_size,
            "intermediate_size": cfg.vision_config.intermediate_size,
            "num_hidden_layers": cfg.vision_config.num_hidden_layers,
            "num_attention_heads": cfg.vision_config.num_attention_heads,
            "num_channels": 3,
            "image_size": cfg.vision_config.image_size,
            "patch_size": cfg.vision_config.patch_size,
        },
    }
    (mdir / "config.json").write_text(json.dumps(cfg_dict))

    # word-level tokenizer over a tiny vocab (ids < vocab_size 256)
    vocab = {f"tok{i}": i for i in range(200)}
    vocab["OCR."] = 201
    vocab["[UNK]"] = 202
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(mdir / "tokenizer.json"))
    return home


@pytest.fixture()
def sample_image(tmp_path):
    img = np.random.default_rng(0).integers(0, 256, (28, 28, 3), dtype=np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(img).save(path)
    return path


def _run(argv, monkeypatch, home, capsys):
    monkeypatch.setenv("DEEPSEEK_OCR_CACHE_DIR", str(home))
    monkeypatch.setenv("DEEPSEEK_OCR_CONFIG_DIR", str(home / "cfg"))
    rc = cli_main(argv)
    return rc, capsys.readouterr()


def test_cli_inference_end_to_end(model_home, sample_image, monkeypatch, capsys, tmp_path):
    out_json = tmp_path / "out.json"
    rc, cap = _run(
        [
            "--model", "paddleocr-vl",
            "--prompt", "<image> OCR.",
            "--image", str(sample_image),
            "--base-size", "28",
            "--image-size", "56",
            "--max-new-tokens", "4",
            "--no-repeat-ngram-size", "0",
            "--quiet",
            "--output-json", str(out_json),
        ],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 0
    result = json.loads(out_json.read_text())
    assert result["prompt_tokens"] > 0
    assert 0 < result["response_tokens"] <= 4
    assert result["rendered_prompt"].startswith("<image>")


def test_cli_streaming_stdout(model_home, sample_image, monkeypatch, capsys):
    rc, cap = _run(
        [
            "--model", "paddleocr-vl",
            "--prompt", "<image> OCR.",
            "--image", str(sample_image),
            "--base-size", "28",
            "--image-size", "56",
            "--max-new-tokens", "3",
            "--no-repeat-ngram-size", "0",
            "--quiet",
        ],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 0
    assert len(cap.out.strip()) >= 0  # stream ran without error


def test_cli_image_slot_mismatch(model_home, monkeypatch, capsys):
    rc, cap = _run(
        ["--model", "paddleocr-vl", "--prompt", "<image> x", "--quiet"],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 1
    assert "slots" in cap.err


def test_cli_unknown_model(model_home, monkeypatch, capsys):
    rc, cap = _run(
        ["--model", "nope", "--prompt", "x", "--quiet"],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 1
    assert "unknown model" in cap.err


def test_cli_bench_output(model_home, sample_image, monkeypatch, capsys, tmp_path):
    bench_path = tmp_path / "bench.json"
    rc, _ = _run(
        [
            "--model", "paddleocr-vl",
            "--prompt", "<image> OCR.",
            "--image", str(sample_image),
            "--base-size", "28",
            "--image-size", "56",
            "--max-new-tokens", "2",
            "--no-repeat-ngram-size", "0",
            "--quiet",
            "--bench",
            "--bench-output", str(bench_path),
        ],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 0
    report = json.loads(bench_path.read_text())
    assert "stage_totals" in report
    assert "decode.generate" in report["stage_totals"]
    assert "model.load" in report["stage_totals"]


def test_cli_weights_snapshot_subcommand(model_home, monkeypatch, capsys):
    rc, cap = _run(
        ["weights", "snapshot", "--model", "deepseek-ocr", "--dtype", "q4k"],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 0
    assert "dsq export" in cap.out
    assert "q4k" in cap.out


def test_cli_device_flag_cpu(model_home, sample_image, monkeypatch, capsys):
    """--device cpu must steer JAX platform resolution (here already cpu)."""
    rc, cap = _run(
        [
            "--model", "paddleocr-vl",
            "--prompt", "<image> OCR.",
            "--image", str(sample_image),
            "--base-size", "28",
            "--image-size", "56",
            "--max-new-tokens", "2",
            "--device", "cpu",
            "--quiet",
        ],
        monkeypatch,
        model_home,
        capsys,
    )
    assert rc == 0


def test_apply_device_selection_validates():
    from dsocr_tpu.core.runtime_device import apply_device_selection

    apply_device_selection(None)   # no-op
    apply_device_selection("tpu")  # default platform, no-op
    apply_device_selection("cpu")  # matches the test harness platform
    import pytest as _pytest

    with _pytest.raises(ValueError):
        apply_device_selection("metal")
