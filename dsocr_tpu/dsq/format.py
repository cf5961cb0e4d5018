"""`.dsq` container reader/writer.

Byte-exact implementation of the reference format
(crates/dsq/src/lib.rs): magic `DSQSNAP`, version 1, little-endian
header {candle_version, model_id, backend, default_qdtype, block_size,
tensor_count} then per-tensor records {name, out_dim, in_dim, q_dtype,
q_offset, q_len, bias_offset, bias_len, bias_dtype} followed by payload
bytes. Strings are u32-length-prefixed UTF-8. Containers produced by the
reference's dsq-writer load unchanged and vice versa.
"""

from __future__ import annotations

import dataclasses
import mmap
import pathlib
import struct
from typing import Dict, List, Optional

import numpy as np

MAGIC = b"DSQSNAP"
VERSION = 1

# dtype codes (ref dsq/src/lib.rs:60-70)
TENSOR_DTYPE_CODES = {
    "Q8_0": 8,
    "Q4_K": 12,
    "Q6_K": 14,
    "F16": 1,
    "BF16": 16,
    "F32": 0,
}
TENSOR_DTYPE_NAMES = {v: k for k, v in TENSOR_DTYPE_CODES.items()}

BIAS_DTYPE_CODES = {"U8": 0, "U32": 1, "I64": 2, "F16": 3, "F32": 4, "F64": 5, "BF16": 6}
BIAS_DTYPE_NAMES = {v: k for k, v in BIAS_DTYPE_CODES.items()}
_BIAS_NP = {"U8": np.uint8, "U32": np.uint32, "I64": np.int64, "F16": np.float16,
            "F32": np.float32, "F64": np.float64}

BLOCK_SIZES = {"Q8_0": 32, "Q4_K": 256, "Q6_K": 256}
ELEM_SIZES = {"F16": 2, "BF16": 2, "F32": 4}


@dataclasses.dataclass
class DsqHeader:
    version: int
    candle_version: str
    model_id: str
    backend: str
    default_qdtype: str
    block_size: int
    tensor_count: int


@dataclasses.dataclass
class DsqRecord:
    name: str
    out_dim: int
    in_dim: int
    q_dtype: str
    q_offset: int
    q_len: int
    bias_offset: Optional[int] = None
    bias_len: Optional[int] = None
    bias_dtype: Optional[str] = None


def _read_string(buf: memoryview, pos: int):
    (length,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    s = bytes(buf[pos : pos + length]).decode("utf-8")
    return s, pos + length


def _pack_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack("<I", len(raw)) + raw


class DsqReader:
    """mmap-backed zero-copy reader."""

    def __init__(self, path: pathlib.Path):
        self.path = pathlib.Path(path)
        self._file = open(self.path, "rb")
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        buf = memoryview(self._mmap)
        if bytes(buf[:7]) != MAGIC:
            raise ValueError(f"invalid snapshot magic: {bytes(buf[:7])!r}")
        pos = 7
        (version,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if version != VERSION:
            raise ValueError(f"unsupported snapshot version {version}, expected {VERSION}")
        candle_version, pos = _read_string(buf, pos)
        model_id, pos = _read_string(buf, pos)
        backend, pos = _read_string(buf, pos)
        (qdtype_code, block_size, tensor_count) = struct.unpack_from("<III", buf, pos)
        pos += 12
        if block_size == 0:
            raise ValueError("block_size must be non-zero")
        qdtype = TENSOR_DTYPE_NAMES.get(qdtype_code)
        if qdtype is None:
            raise ValueError(f"unsupported tensor dtype code {qdtype_code}")
        if BLOCK_SIZES.get(qdtype) != block_size:
            raise ValueError(
                f"snapshot block size {block_size} mismatches expected "
                f"{BLOCK_SIZES.get(qdtype)} for {qdtype}"
            )
        self.records: List[DsqRecord] = []
        self._index: Dict[str, int] = {}
        for _ in range(tensor_count):
            name, pos = _read_string(buf, pos)
            out_dim, in_dim, q_dtype_code = struct.unpack_from("<III", buf, pos)
            pos += 12
            q_offset, q_len, bias_offset, bias_len = struct.unpack_from("<QQQQ", buf, pos)
            pos += 32
            (bias_dtype_code,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            q_dtype = TENSOR_DTYPE_NAMES.get(q_dtype_code)
            if q_dtype is None:
                raise ValueError(f"unsupported tensor dtype code {q_dtype_code}")
            record = DsqRecord(
                name=name,
                out_dim=out_dim,
                in_dim=in_dim,
                q_dtype=q_dtype,
                q_offset=q_offset,
                q_len=q_len,
                bias_offset=bias_offset if bias_len else None,
                bias_len=bias_len if bias_len else None,
                bias_dtype=BIAS_DTYPE_NAMES[bias_dtype_code] if bias_len else None,
            )
            if q_len == 0:
                raise ValueError(f"tensor `{name}` has empty quantized payload")
            if name in self._index:
                raise ValueError(f"duplicate tensor record `{name}`")
            self._index[name] = len(self.records)
            self.records.append(record)
        self.metadata_len = pos
        for record in self.records:
            if record.q_offset < self.metadata_len:
                raise ValueError(
                    f"tensor `{record.name}` q_offset {record.q_offset} overlaps metadata"
                )
            if record.q_offset + record.q_len > len(self._mmap):
                raise ValueError(f"tensor `{record.name}` exceeds file size")
        self.header = DsqHeader(
            version=version,
            candle_version=candle_version,
            model_id=model_id,
            backend=backend,
            default_qdtype=qdtype,
            block_size=block_size,
            tensor_count=tensor_count,
        )

    def close(self):
        self._mmap.close()
        self._file.close()

    def tensor(self, name: str) -> Optional[DsqRecord]:
        idx = self._index.get(name)
        return self.records[idx] if idx is not None else None

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def tensor_bytes(self, record: DsqRecord) -> bytes:
        return self._mmap[record.q_offset : record.q_offset + record.q_len]

    def bias_array(self, record: DsqRecord) -> Optional[np.ndarray]:
        if record.bias_len is None:
            return None
        raw = self._mmap[record.bias_offset : record.bias_offset + record.bias_len]
        if record.bias_dtype == "BF16":
            import ml_dtypes

            return np.frombuffer(raw, np.uint16).view(ml_dtypes.bfloat16)
        return np.frombuffer(raw, _BIAS_NP[record.bias_dtype])

    def dequantize(self, name: str, dtype=np.float32) -> np.ndarray:
        """[out_dim, in_dim] float weights for a record."""
        from .quant import dequantize

        record = self.tensor(name)
        if record is None:
            raise KeyError(name)
        raw = self.tensor_bytes(record)
        if record.q_dtype in BLOCK_SIZES:
            out = dequantize(record.q_dtype, raw, record.out_dim, record.in_dim)
        elif record.q_dtype == "F32":
            out = np.frombuffer(raw, np.float32).reshape(record.out_dim, record.in_dim)
        elif record.q_dtype == "F16":
            out = np.frombuffer(raw, np.float16).reshape(record.out_dim, record.in_dim)
        elif record.q_dtype == "BF16":
            import ml_dtypes

            out = (
                np.frombuffer(raw, np.uint16)
                .view(ml_dtypes.bfloat16)
                .reshape(record.out_dim, record.in_dim)
            )
        else:
            raise ValueError(record.q_dtype)
        return out.astype(dtype)


class DsqWriter:
    """In-memory writer producing reference-compatible containers
    (ref dsq-writer/src/lib.rs: streaming payload + records, header
    written on finalize; here the payload is buffered)."""

    def __init__(
        self,
        model_id: str,
        default_qdtype: str = "Q8_0",
        backend: str = "dsocr_tpu",
        candle_version: str = "0.0.0",
    ):
        if default_qdtype not in BLOCK_SIZES:
            raise ValueError(f"default_qdtype must be quantized, got {default_qdtype}")
        self.model_id = model_id
        self.backend = backend
        self.candle_version = candle_version
        self.default_qdtype = default_qdtype
        self._entries: List[dict] = []

    def add_quantized_tensor(
        self,
        name: str,
        out_dim: int,
        in_dim: int,
        q_dtype: str,
        payload: bytes,
        bias: Optional[np.ndarray] = None,
    ) -> None:
        entry = {
            "name": name,
            "out_dim": out_dim,
            "in_dim": in_dim,
            "q_dtype": q_dtype,
            "payload": payload,
        }
        if bias is not None:
            bias = np.ascontiguousarray(bias)
            code = {np.dtype(np.float32): "F32", np.dtype(np.float16): "F16",
                    np.dtype(np.int64): "I64", np.dtype(np.uint8): "U8",
                    np.dtype(np.uint32): "U32", np.dtype(np.float64): "F64"}.get(bias.dtype)
            if code is None:
                raise ValueError(f"unsupported bias dtype {bias.dtype}")
            entry["bias"] = bias.tobytes()
            entry["bias_dtype"] = code
        self._entries.append(entry)

    def add_float_tensor(
        self, name: str, weights: np.ndarray, dtype: str = "F32",
        bias: Optional[np.ndarray] = None,
    ) -> None:
        out_dim, in_dim = weights.shape
        if dtype == "F32":
            payload = weights.astype(np.float32).tobytes()
        elif dtype == "F16":
            payload = weights.astype(np.float16).tobytes()
        elif dtype == "BF16":
            import ml_dtypes

            payload = weights.astype(ml_dtypes.bfloat16).tobytes()
        else:
            raise ValueError(dtype)
        self.add_quantized_tensor(name, out_dim, in_dim, dtype, payload, bias)

    def quantize_and_add(
        self, name: str, weights: np.ndarray, q_dtype: Optional[str] = None,
        bias: Optional[np.ndarray] = None,
    ) -> None:
        from .quant import quantize

        q_dtype = q_dtype or self.default_qdtype
        out_dim, in_dim = weights.shape
        payload = quantize(q_dtype, np.asarray(weights, np.float32), out_dim, in_dim)
        self.add_quantized_tensor(name, out_dim, in_dim, q_dtype, payload, bias)

    def finalize(self, path: pathlib.Path) -> None:
        header = bytearray()
        header += MAGIC
        header += struct.pack("<I", VERSION)
        header += _pack_string(self.candle_version)
        header += _pack_string(self.model_id)
        header += _pack_string(self.backend)
        header += struct.pack(
            "<III",
            TENSOR_DTYPE_CODES[self.default_qdtype],
            BLOCK_SIZES[self.default_qdtype],
            len(self._entries),
        )
        # compute metadata length: header + records
        records_len = 0
        for e in self._entries:
            records_len += 4 + len(e["name"].encode("utf-8")) + 12 + 32 + 4
        offset = len(header) + records_len
        records = bytearray()
        payloads = bytearray()
        for e in self._entries:
            q_offset = offset + len(payloads)
            payloads += e["payload"]
            bias_offset = bias_len = 0
            bias_code = 0
            if "bias" in e:
                bias_offset = offset + len(payloads)
                payloads += e["bias"]
                bias_len = len(e["bias"])
                bias_code = BIAS_DTYPE_CODES[e["bias_dtype"]]
            records += _pack_string(e["name"])
            records += struct.pack("<III", e["out_dim"], e["in_dim"],
                                   TENSOR_DTYPE_CODES[e["q_dtype"]])
            records += struct.pack("<QQQQ", q_offset, len(e["payload"]),
                                   bias_offset, bias_len)
            records += struct.pack("<I", bias_code)
        with open(path, "wb") as fh:
            fh.write(header)
            fh.write(records)
            fh.write(payloads)
