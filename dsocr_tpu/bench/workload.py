"""Shared workload pieces for the headline bench (bench.py) and the
stage-attribution tool (dsocr_tpu.bench.attribution): both must measure
the SAME workload or attribution numbers don't explain the headline."""

from __future__ import annotations

import os

import numpy as np

IMAGE_TOKEN_ID = 128815  # deepseek tokenizer's <image> id


class BenchTokenizer:
    """Deterministic stand-in tokenizer (no tokenizer assets ship with
    this machine); yields realistic prompt lengths for '<image>\\n...'."""

    def encode(self, text):
        return [(ord(c) * 7 + 13) % 120000 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)

    def token_to_id(self, token):
        return IMAGE_TOKEN_ID if token == "<image>" else None


def load_page_image(env_var: str, tiny: bool) -> np.ndarray:
    """The benchmark page: the reference's sample_1.png when present
    (same page BASELINE.md's numbers used), else a same-size random
    page; tiny mode uses a 100px stand-in."""
    if tiny:
        return np.random.default_rng(0).integers(
            0, 256, size=(100, 100, 3), dtype=np.uint8
        )
    path = os.environ.get(env_var, "/root/reference/assets/sample_1.png")
    if os.path.exists(path):
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    return np.random.default_rng(0).integers(
        0, 256, size=(1756, 2852, 3), dtype=np.uint8
    )
