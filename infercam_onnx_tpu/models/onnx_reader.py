"""Minimal dependency-free ONNX reader.

The `onnx` python package is not available in this environment, but the
reference's model artifacts are ONNX files (version-RFB-320/640, reference
infer_server/src/nn.rs:21-22). This module implements just enough of the
protobuf wire format to pull the graph initializers (name -> numpy array)
out of a serialized ModelProto — which is all the weight converter in
models/convert.py needs (the graph topology is known: this framework
reimplements the network natively rather than interpreting the graph).

Wire-format facts used (protobuf encoding spec):
- message = stream of (tag, value); tag = (field_number << 3) | wire_type
- wire types: 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32
- ModelProto.graph = field 7 (message)
- GraphProto.initializer = field 5 (repeated TensorProto)
- TensorProto: dims = 1 (repeated int64), data_type = 2 (enum),
  float_data = 4 (packed float), int64_data = 7 (packed varint),
  name = 8 (string), raw_data = 9 (bytes)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

# ONNX TensorProto.DataType -> numpy dtype (little-endian)
_DTYPES = {
    1: np.dtype("<f4"),   # FLOAT
    2: np.dtype("u1"),    # UINT8
    3: np.dtype("i1"),    # INT8
    5: np.dtype("<i2"),   # INT16
    6: np.dtype("<i4"),   # INT32
    7: np.dtype("<i8"),   # INT64
    9: np.dtype("?"),     # BOOL
    10: np.dtype("<f2"),  # FLOAT16
    11: np.dtype("<f8"),  # DOUBLE
}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield field, wtype, val


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    data_type = 1
    name = ""
    raw = None
    float_words: list[bytes] = []
    int64_vals: list[int] = []
    for field, wtype, val in iter_fields(buf):
        if field == 1 and wtype == 0:
            dims.append(int(val))  # type: ignore[arg-type]
        elif field == 1 and wtype == 2:
            # packed repeated int64 dims
            pos = 0
            while pos < len(val):  # type: ignore[arg-type]
                v, pos = _read_varint(val, pos)  # type: ignore[arg-type]
                dims.append(v)
        elif field == 2 and wtype == 0:
            data_type = int(val)  # type: ignore[arg-type]
        elif field == 4:
            if wtype == 2:  # packed floats
                float_words.append(val)  # type: ignore[arg-type]
            elif wtype == 5:
                float_words.append(val)  # type: ignore[arg-type]
        elif field == 7:
            if wtype == 2:
                pos = 0
                while pos < len(val):  # type: ignore[arg-type]
                    v, pos = _read_varint(val, pos)  # type: ignore
                    int64_vals.append(v)
            elif wtype == 0:
                int64_vals.append(int(val))  # type: ignore[arg-type]
        elif field == 8 and wtype == 2:
            name = val.decode("utf-8")  # type: ignore[union-attr]
        elif field == 9 and wtype == 2:
            raw = val
    dtype = _DTYPES.get(data_type)
    if dtype is None:
        raise ValueError(f"unsupported ONNX tensor dtype {data_type}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)  # type: ignore[arg-type]
    elif float_words:
        arr = np.frombuffer(b"".join(float_words), dtype=np.dtype("<f4"))
    elif int64_vals:
        arr = np.asarray(int64_vals, dtype=np.int64)
    else:
        arr = np.zeros(0, dtype=dtype)
    if dims:
        arr = arr.reshape(dims)
    return name, arr


def read_onnx_initializers(path: str) -> dict[str, np.ndarray]:
    """Extract graph initializers (name -> array) from an ONNX file."""
    with open(path, "rb") as f:
        model = f.read()
    graph = None
    for field, wtype, val in iter_fields(model):
        if field == 7 and wtype == 2:  # ModelProto.graph
            graph = val
            break
    if graph is None:
        raise ValueError(f"{path}: no graph found (not an ONNX ModelProto?)")
    out: dict[str, np.ndarray] = {}
    for field, wtype, val in iter_fields(graph):  # type: ignore[arg-type]
        if field == 5 and wtype == 2:  # GraphProto.initializer
            name, arr = _parse_tensor(val)  # type: ignore[arg-type]
            out[name] = arr
    return out
