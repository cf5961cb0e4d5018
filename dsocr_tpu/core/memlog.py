"""Live memory accounting for KV-cache and RoPE-table buffers.

Parity with crates/core/src/memlog.rs: global byte counters updated by
the runtime, plus a snapshot logger. Enabled via DSOCR_MEMLOG=1 (the
reference gates on a cargo feature)."""

from __future__ import annotations

import os
import threading
from typing import Dict

_LOCK = threading.Lock()
_COUNTERS: Dict[str, int] = {"kv_bytes": 0, "rope_bytes": 0}


def enabled() -> bool:
    return os.environ.get("DSOCR_MEMLOG", "0") not in ("0", "", "false")


def set_kv(bytes_: int) -> None:
    with _LOCK:
        _COUNTERS["kv_bytes"] = int(bytes_)


def set_rope(bytes_: int) -> None:
    with _LOCK:
        _COUNTERS["rope_bytes"] = int(bytes_)


def add_kv(delta: int) -> None:
    with _LOCK:
        _COUNTERS["kv_bytes"] += int(delta)


def snapshot() -> Dict[str, int]:
    with _LOCK:
        return dict(_COUNTERS)


def log_snapshot(context: str = "") -> None:
    if not enabled():
        return
    import sys

    snap = snapshot()
    print(
        f"[memlog]{' ' + context if context else ''} "
        f"kv={snap['kv_bytes'] / 1e6:.1f}MB rope={snap['rope_bytes'] / 1e6:.1f}MB",
        file=sys.stderr,
    )
