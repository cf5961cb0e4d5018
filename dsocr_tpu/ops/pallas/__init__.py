"""Pallas TPU kernels for ops XLA can't fuse well:

- gather_matmul: per-row expert-weight gather fused into the matmul
  (MoE decode path) — avoids materializing gathered weight copies.
- dequant_matmul: DSQ block-dequantization fused into the matmul so
  quantized weights stay packed in HBM.
"""

from .gather_matmul import gather_matmul

__all__ = ["gather_matmul"]
