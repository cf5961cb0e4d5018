"""DSQ quantized-weight container stack.

Replicates the reference's dsq* crates (SURVEY.md §2.8): the `.dsq`
container format (magic DSQSNAP, version 1, little-endian header +
records + payload), ggml-block quantization (Q8_0 / Q4_K / Q6_K), the
runtime loader that maps records onto model linears, model adapters that
discover quantizable linears from a config, and the info/stats/export
CLI. Containers written by the reference's dsq-writer load unchanged.
"""

from .format import (
    DsqHeader,
    DsqRecord,
    DsqReader,
    DsqWriter,
    TENSOR_DTYPE_CODES,
)
from .quant import (
    quantize_q8_0,
    dequantize_q8_0,
    quantize_q4_k,
    dequantize_q4_k,
    quantize_q6_k,
    dequantize_q6_k,
    quantize,
    dequantize,
)

__all__ = [
    "DsqHeader",
    "DsqRecord",
    "DsqReader",
    "DsqWriter",
    "TENSOR_DTYPE_CODES",
    "quantize_q8_0",
    "dequantize_q8_0",
    "quantize_q4_k",
    "dequantize_q4_k",
    "quantize_q6_k",
    "dequantize_q6_k",
    "quantize",
    "dequantize",
]
