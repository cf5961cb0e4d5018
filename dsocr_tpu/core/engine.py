"""Model-agnostic engine contract.

Parity with the reference ``OcrEngine`` trait
(``crates/core/src/inference.rs:160-208``): tokenizer + rendered prompt +
images + vision settings + decode params + optional stream callback →
DecodeOutcome. TPU-specific additions: engines expose their mesh/sharding
so the server can batch across requests.
"""

from __future__ import annotations

import dataclasses
import enum
import pathlib
from typing import Any, Callable, List, Optional, Protocol, Sequence, runtime_checkable

from .params import DecodeParameters, VisionSettings

# stream(step, generated_token_ids_so_far)
StreamCallback = Optional[Callable[[int, Sequence[int]], None]]


class ModelKind(enum.Enum):
    DEEPSEEK = "deepseek"
    PADDLE_OCR_VL = "paddle_ocr_vl"
    DOTS_OCR = "dots_ocr"
    GLM_OCR = "glm_ocr"


@dataclasses.dataclass
class DecodeOutcome:
    """Collected results from a decode call (ref inference.rs:161-167)."""

    text: str
    prompt_tokens: int
    response_tokens: int
    generated_tokens: List[int]
    # True when max_new_tokens was reduced to fit the KV-cache budget
    # (prompt + requested tokens exceeded max_seq_len).
    truncated: bool = False


@dataclasses.dataclass
class ModelLoadArgs:
    """Inputs to a model loader (ref inference.rs:178-186).

    `device` is a descriptive string ("tpu", "cpu"); `dtype` a JAX dtype
    name ("bfloat16", "float32"). `mesh` optionally carries a
    jax.sharding.Mesh for sharded load.
    """

    kind: ModelKind
    config_path: Optional[pathlib.Path] = None
    weights_path: Optional[pathlib.Path] = None
    snapshot_path: Optional[pathlib.Path] = None
    device: str = "tpu"
    dtype: str = "bfloat16"
    mesh: Optional[Any] = None


@runtime_checkable
class OcrEngine(Protocol):
    """Shared interface implemented by all OCR inference backends."""

    def kind(self) -> ModelKind: ...

    def device(self) -> str: ...

    def dtype(self) -> str: ...

    def weights_path(self) -> Optional[pathlib.Path]:
        return None

    def decode(
        self,
        tokenizer: Any,
        prompt: str,
        images: Sequence[Any],
        vision: VisionSettings,
        params: DecodeParameters,
        stream: StreamCallback = None,
    ) -> DecodeOutcome: ...
