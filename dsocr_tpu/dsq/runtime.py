"""Snapshot-aware weight source.

Equivalent of the reference's dsq-runtime SnapshotLoadPlan
(crates/dsq-runtime/src/lib.rs:120-133): when a `.dsq` snapshot carries a
record for a linear, its (dequantized) weights override the float
checkpoint's. Phase 2 (keeping weights packed in HBM behind a Pallas
dequant-matmul) plugs in at the same seam.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np

from ..utils.safetensors_io import CheckpointReader
from .format import DsqReader


class WeightSource:
    """CheckpointReader interface with DSQ snapshot overrides.

    Snapshot records are named without the `.weight` suffix
    (`model.layers.0.self_attn.q_proj`); checkpoint tensors include it.
    """

    def __init__(
        self,
        checkpoint: Optional[CheckpointReader],
        snapshot: Optional[DsqReader] = None,
    ):
        self.checkpoint = checkpoint
        self.snapshot = snapshot
        self.quantized_hits = 0
        self.float_hits = 0

    @classmethod
    def open(
        cls,
        weights_path: Optional[pathlib.Path],
        snapshot_path: Optional[pathlib.Path] = None,
    ) -> "WeightSource":
        checkpoint = CheckpointReader(weights_path) if weights_path else None
        snapshot = DsqReader(snapshot_path) if snapshot_path else None
        return cls(checkpoint, snapshot)

    def _snapshot_name(self, name: str) -> Optional[str]:
        if self.snapshot is None:
            return None
        base = name[: -len(".weight")] if name.endswith(".weight") else name
        return base if base in self.snapshot else None

    def __contains__(self, name: str) -> bool:
        if self._snapshot_name(name) is not None:
            return True
        return self.checkpoint is not None and name in self.checkpoint

    def get(self, name: str, dtype=None) -> np.ndarray:
        if name.endswith(".weight"):
            snap = self._snapshot_name(name)
            if snap is not None:
                self.quantized_hits += 1
                return self.snapshot.dequantize(snap, dtype or np.float32)
        if self.checkpoint is not None and name in self.checkpoint:
            self.float_hits += 1
            return self.checkpoint.get(name, dtype)
        if self.snapshot is not None and name.endswith(".bias"):
            record = self.snapshot.tensor(name[: -len(".bias")])
            if record is not None:
                bias = self.snapshot.bias_array(record)
                if bias is not None:
                    return bias.astype(dtype or np.float32)
        raise KeyError(f"tensor {name!r} not in checkpoint or snapshot")

    def get_optional(self, name: str, dtype=None):
        try:
            return self.get(name, dtype)
        except KeyError:
            return None

    def raw_quant(self, name: str):
        """(payload_bytes, q_dtype, out_dim, in_dim) when the snapshot
        stores `name` as a ggml-quantized record — lets the serving path
        pack the PUBLISHED codes directly (bit-identical to what the
        reference's QMatMul reads) instead of round-tripping k-quants
        through dequantize + requantize. None for float records or
        checkpoint-only tensors."""
        snap = self._snapshot_name(name)
        if snap is None:
            return None
        record = self.snapshot.tensor(snap)
        if record is None or record.q_dtype not in ("Q8_0", "Q4_K", "Q6_K"):
            return None
        return (
            self.snapshot.tensor_bytes(record),
            record.q_dtype,
            record.out_dim,
            record.in_dim,
        )

    def iter_prefix(self, prefix: str):
        if self.checkpoint is not None:
            yield from self.checkpoint.iter_prefix(prefix)
