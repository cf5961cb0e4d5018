"""Disk cache for random-init quantized host decoder trees.

Benchmarks on this machine pay ~15+ minutes per process to random-init a
3B-parameter f32 decoder on the single host core and re-quantize it —
for a tree that is a pure function of (config, seed, method, fusion).
With DSOCR_INIT_CACHE set to a directory, engines consult this cache
before running init+quantize and store the packed HOST tree (numpy int8
codes + f32 scales + float leaves) on a miss; a warm hit loads in
seconds. The reference has no analogue (it always loads real weights);
this exists because this environment has no network egress and therefore
no checkpoints (CLAUDE.md).

Scope limits (why this is safe):
  - Only consulted for RANDOM-INIT engines (params=None) — never for
    loader-provided weights, which carry raw published payloads.
  - The payload is a pickle of numpy leaves. Only load caches you wrote;
    the env var is opt-in and bench tools point it at /tmp.
  - The key includes a format version; bump FORMAT_VERSION when the
    quantizer packing changes, or delete the cache directory.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, Optional

FORMAT_VERSION = 1

_ENV = "DSOCR_INIT_CACHE"


def _cache_path(family: str, cfg, seed: int, method: str, fused: bool):
    root = os.environ.get(_ENV)
    if not root:
        return None
    tag = repr((FORMAT_VERSION, family, repr(cfg), int(seed), str(method),
                bool(fused)))
    digest = hashlib.sha256(tag.encode()).hexdigest()[:20]
    return os.path.join(root, f"{family}_{method}_{digest}.pkl")


def cached_quant_init(
    family: str,
    cfg,
    seed: int,
    method: str,
    fused: bool,
    build: Callable[[], dict],
) -> Optional[dict]:
    """Return the packed host tree for (family, cfg, seed, method, fused),
    loading from DSOCR_INIT_CACHE when possible and populating it after a
    miss. With the env unset this is just `build()`."""
    path = _cache_path(family, cfg, seed, method, fused)
    if path and os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    tree = build()
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(tree, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    return tree
