"""Golden-file tensor format round-trip tests (analog of utils.h:104-150)."""

import numpy as np
import ml_dtypes

from ggml_cuda_experiments_tpu.utils.tensor_io import load_tensor, save_tensor


def test_roundtrip_f32(tmp_path, rng):
    x = rng.normal(size=(4, 8, 16)).astype(np.float32)
    p = tmp_path / "t.tensor"
    save_tensor(p, x, "q_proj")
    y, name = load_tensor(p)
    assert name == "q_proj"
    assert np.array_equal(x, y)


def test_roundtrip_all_dtypes(tmp_path, rng):
    for dt in (np.float32, np.float16, ml_dtypes.bfloat16, np.int8):
        x = (rng.normal(size=(3, 5)) * 10).astype(dt)
        p = tmp_path / f"{np.dtype(dt).name}.tensor"
        save_tensor(p, x, np.dtype(dt).name)
        y, name = load_tensor(p)
        assert y.dtype == np.dtype(dt)
        assert np.array_equal(x.view(np.uint8), y.view(np.uint8))


def test_reference_wire_format(tmp_path):
    """Byte-level layout matches the reference reader's expectations
    (n_dims, dtype, ne[], name_len, name, data — utils.h:110-150)."""
    import struct
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = tmp_path / "wire.tensor"
    save_tensor(p, x, "ab")
    raw = p.read_bytes()
    n_dims, code = struct.unpack_from("<ii", raw, 0)
    assert (n_dims, code) == (2, 0)
    assert struct.unpack_from("<2i", raw, 8) == (2, 3)
    (nl,) = struct.unpack_from("<i", raw, 16)
    assert raw[20:22] == b"ab" and nl == 2
    assert np.frombuffer(raw, np.float32, offset=22).tolist() == x.ravel().tolist()
