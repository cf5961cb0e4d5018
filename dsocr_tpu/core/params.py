"""Decode parameters and vision settings.

Contract parity with the reference ``crates/core/src/inference.rs:21-132``:
defaults (max_new_tokens=512, greedy, top_p=1.0 → normalized away,
no_repeat_ngram_size=20), and patch layering semantics where applying a
patch normalizes top_p (<1.0 kept), top_k (>0 kept) and
no_repeat_ngram_size (>0 kept).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional


@dataclasses.dataclass(frozen=True)
class VisionSettings:
    """Vision pre-processing knobs shared across OCR backends
    (ref: core/src/inference.rs:13-18)."""

    base_size: int
    image_size: int
    crop_mode: bool


def _normalize_top_p(probability: float) -> Optional[float]:
    return probability if probability < 1.0 else None


def _normalize_top_k(top_k: int) -> Optional[int]:
    return top_k if top_k > 0 else None


def _normalize_no_repeat_ngram_size(size: int) -> Optional[int]:
    return size if size > 0 else None


@dataclasses.dataclass
class DecodeParameters:
    """Generation options (ref: core/src/inference.rs:21-79)."""

    max_new_tokens: int = 512
    do_sample: bool = False
    temperature: float = 0.0
    top_p: Optional[float] = 1.0
    top_k: Optional[int] = None
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: Optional[int] = 20
    seed: Optional[int] = None
    use_cache: bool = True

    @classmethod
    def with_sampling_defaults(cls, max_new_tokens: int) -> "DecodeParameters":
        return cls(
            max_new_tokens=max_new_tokens,
            do_sample=False,
            temperature=0.0,
            top_p=None,
            top_k=None,
            repetition_penalty=1.0,
            no_repeat_ngram_size=None,
            seed=None,
            use_cache=True,
        )

    def apply(self, patch: "DecodeParametersPatch") -> "DecodeParameters":
        """In-place patch application (ref AddAssign, inference.rs:81-111).

        Returns self for chaining; note patched top_p/top_k/ngram values are
        normalized (1.0 → None, 0 → None) while constructor defaults are not.
        """
        if patch.max_new_tokens is not None:
            self.max_new_tokens = patch.max_new_tokens
        if patch.do_sample is not None:
            self.do_sample = patch.do_sample
        if patch.temperature is not None:
            self.temperature = patch.temperature
        if patch.top_p is not None:
            self.top_p = _normalize_top_p(patch.top_p)
        if patch.top_k is not None:
            self.top_k = _normalize_top_k(patch.top_k)
        if patch.repetition_penalty is not None:
            self.repetition_penalty = patch.repetition_penalty
        if patch.no_repeat_ngram_size is not None:
            self.no_repeat_ngram_size = _normalize_no_repeat_ngram_size(
                patch.no_repeat_ngram_size
            )
        if patch.seed is not None:
            self.seed = patch.seed
        if patch.use_cache is not None:
            self.use_cache = patch.use_cache
        return self

    def __iadd__(self, patch: "DecodeParametersPatch") -> "DecodeParameters":
        return self.apply(patch)

    def __add__(self, patch: "DecodeParametersPatch") -> "DecodeParameters":
        return dataclasses.replace(self).apply(patch)


@dataclasses.dataclass(frozen=True)
class DecodeParametersPatch:
    """Optional-field overlay for DecodeParameters
    (ref: core/src/inference.rs:35-47)."""

    max_new_tokens: Optional[int] = None
    do_sample: Optional[bool] = None
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    repetition_penalty: Optional[float] = None
    no_repeat_ngram_size: Optional[int] = None
    seed: Optional[int] = None
    use_cache: Optional[bool] = None

    @classmethod
    def from_mapping(cls, data: Mapping[str, Any]) -> "DecodeParametersPatch":
        """Build a patch from loosely-typed JSON/TOML data, ignoring unknown
        keys (serde(default) semantics on the reference structs)."""
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in fields and v is not None})

    def merged_over(self, other: "DecodeParametersPatch") -> "DecodeParametersPatch":
        """Layer self's set fields over `other` (later wins)."""
        values = {}
        for f in dataclasses.fields(self):
            mine = getattr(self, f.name)
            values[f.name] = mine if mine is not None else getattr(other, f.name)
        return DecodeParametersPatch(**values)
