"""Prefix (prefill-packet) cache: reuse a request's full prefill result
— vision-tower embeddings, prompt KV, first-token logits — across
requests with an identical (prompt, images, vision) triple.

The reference wipes every per-request cache after each prompt
(PromptCacheGuard, reference core/src/cache.rs:375-382) and has no
prefix reuse; this is a green-field serving lever for the TPU build
(BASELINE.json's north star names KV reuse). It works because JAX
arrays are immutable and SlotRunner._join_jit donates only the slot
state (runtime/slots.py:148): the same prefilled packet can be inserted
into any number of slot rows, on any schedule, without copies beyond
the join's dynamic_update_slice.

Scope: exact-match full-prefix reuse (prompt text + raw image bytes +
VisionSettings). That covers the dominant real pattern — re-OCR of the
same page (retries, multi-prompt extraction, dedup'd crawls) — without
any paged-attention complexity. Partial-prefix (shared scaffold) reuse
is NOT attempted: vision embeddings land mid-prompt, so a text-only
shared prefix is a few tokens of KV.

Sampling stays per-request: the packet stores pre-sampling prefill
logits; the first token is drawn at join time with the request's own
params/seed (runtime/slots.py join), so a cached packet is parity-exact
for greedy and correctly re-sampled for stochastic requests.

OFF by default — entries pin device HBM (a DeepSeek 1024px crop-mode
packet is ~[L,1,H,1792,D] K+V ≈ 200+ MB bf16). Enable with
DSOCR_PREFIX_CACHE=<max entries> or ContinuousScheduler(prefix_cache=N).
"""

from __future__ import annotations

import hashlib
import threading
from collections import OrderedDict
from typing import Any, List, Optional

import numpy as np


def _digest_image(h, image: Any) -> None:
    arr = np.asarray(image)
    h.update(str(arr.shape).encode())
    h.update(str(arr.dtype).encode())
    h.update(arr.tobytes())


def request_key(prompt: str, images: List[Any], vision) -> str:
    """Digest of everything a prefill packet depends on. blake2b: the
    raw page bytes (~15 MB at 1024px scans) hash in ~15 ms on this
    host — noise next to the ~1.5 s prefill + towers it can save."""
    h = hashlib.blake2b(digest_size=16)
    h.update(prompt.encode())
    h.update(repr(vision).encode())
    for image in images:
        _digest_image(h, image)
    return h.hexdigest()


class PrefixCache:
    """Small thread-safe LRU of prefill packets (engine.prefill_for_slot
    return dicts). Counters feed /metrics."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._entries: "OrderedDict[str, dict]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._entries)

    def get(self, key: str) -> Optional[dict]:
        with self._lock:
            packet = self._entries.get(key)
            if packet is None:
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return packet

    def record_alias_hit(self) -> None:
        """A wave-local duplicate was served by aliasing another job's
        prefill: reclassify the earlier get() miss as a hit so /metrics
        hit-rates reflect saved work."""
        with self._lock:
            self.misses -= 1
            self.hits += 1

    def put(self, key: str, packet: dict) -> None:
        if self.capacity <= 0:
            return
        with self._lock:
            self._entries[key] = packet
            self._entries.move_to_end(key)
            while len(self._entries) > self.capacity:
                self._entries.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
