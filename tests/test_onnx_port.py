"""onnx_port wire-format reader: round-trip against a hand-encoded ONNX
file (no onnx package in the image, so the encoder below IS the spec)."""

import numpy as np

from adaprompt_tpu.utils.onnx_port import read_onnx_initializers


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _tensor(name: str, arr: np.ndarray) -> bytes:
    dtypes = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
              np.dtype(np.float16): 10}
    msg = b""
    for d in arr.shape:                      # dims, field 1 varint
        msg += _key(1, 0) + _varint(d)
    msg += _key(2, 0) + _varint(dtypes[arr.dtype])   # data_type
    msg += _ld(8, name.encode())                     # name
    msg += _ld(9, arr.tobytes())                     # raw_data
    return msg


def _model(tensors: dict) -> bytes:
    graph = b"".join(_ld(5, _tensor(n, a)) for n, a in tensors.items())
    graph += _ld(2, b"testgraph")            # GraphProto.name (ignored)
    model = _key(1, 0) + _varint(7)          # ir_version (ignored)
    model += _ld(7, graph)                   # ModelProto.graph
    return model


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv1.weight": rng.standard_normal((8, 3, 3, 3)).astype(np.float32),
        "bn1.running_mean": rng.standard_normal((8,)).astype(np.float32),
        "fc.bias": rng.standard_normal((16,)).astype(np.float32),
        "shape_info": np.asarray([1, 2, 3], np.int64),
        "half": rng.standard_normal((4, 2)).astype(np.float16),
    }
    path = tmp_path / "m.onnx"
    path.write_bytes(_model(tensors))
    got = read_onnx_initializers(str(path))
    assert set(got) == set(tensors)
    for name, arr in tensors.items():
        np.testing.assert_array_equal(got[name], arr)


def test_float_data_fallback(tmp_path):
    """Tensors stored via packed float_data (field 4) instead of raw_data."""
    arr = np.asarray([[1.5, -2.0], [0.25, 3.0]], np.float32)
    msg = b""
    for d in arr.shape:
        msg += _key(1, 0) + _varint(d)
    msg += _key(2, 0) + _varint(1)
    msg += _ld(4, arr.tobytes())             # packed float_data
    msg += _ld(8, b"w")
    model = _ld(7, _ld(5, msg))
    path = tmp_path / "f.onnx"
    path.write_bytes(model)
    got = read_onnx_initializers(str(path))
    np.testing.assert_array_equal(got["w"], arr)
