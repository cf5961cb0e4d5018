"""TPU decode runtime: static-shape KV cache and the jitted generation loop.

Replaces the reference's host-driven per-token loop
(infer-deepseek/src/model/mod.rs:1870-2048) — which pulls logits to the
CPU every step — with an on-device `lax.while_loop` whose carry holds the
KV cache, the penalty context buffer, and the sampling state. Tokens only
return to the host between streaming chunks.
"""

from .kv_cache import KVCache, init_kv_cache, write_kv
from .generate import GenerateParams, GenerationResult, Generator, clamp_new_tokens

__all__ = [
    "KVCache",
    "init_kv_cache",
    "write_kv",
    "GenerateParams",
    "GenerationResult",
    "Generator",
    "clamp_new_tokens",
]
