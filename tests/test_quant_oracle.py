"""Quantization oracle round-trip tests (Q8_0 / Q4_0 / Q4_K / int8 rowwise)."""

import numpy as np
import pytest

from ggml_cuda_experiments_tpu.oracle import quant as q
from ggml_cuda_experiments_tpu.utils.harness import assert_close


@pytest.mark.parametrize("fmt,tol", [("q8_0", 0.01), ("q4_0", 0.12),
                                     ("q4_k", 0.10), ("q6_k", 0.04)])
def test_roundtrip_error(rng, fmt, tol):
    quantize, dequantize = q.FORMATS[fmt]
    x = rng.normal(size=(8, 512)).astype(np.float32)
    t = quantize(x)
    y = dequantize(t)
    assert y.shape == x.shape
    # block-quant is lossy; error must be bounded by ~scale/2 per element
    err = np.abs(y - x)
    scale = np.max(np.abs(x))
    assert float(err.max()) <= tol * scale, f"{fmt}: max err {err.max():.4f}"


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_requantize_fixed_point(rng, fmt):
    """Quantizing already-dequantized values must be (near) idempotent."""
    quantize, dequantize = q.FORMATS[fmt]
    x = rng.normal(size=(4, 256)).astype(np.float32)
    y1 = dequantize(quantize(x))
    y2 = dequantize(quantize(y1))
    assert_close(y2, y1, atol=1e-3, rtol=1e-2, name=f"{fmt} idempotence")


def test_q8_0_exact_when_scale_is_one(rng):
    """When a block's absmax is exactly 127, d == 1 and ints round-trip
    exactly (the analog of the reference's bitwise IMMA check,
    /root/reference/src/misc/tensor-core.cu:575-578)."""
    x = rng.integers(-127, 128, size=(4, 64)).astype(np.float32)
    x[..., 0] = 127.0  # pin absmax of every 32-block... blocks are 32 wide:
    x[..., 32] = -127.0
    y = q.dequantize_q8_0(q.quantize_q8_0(x))
    assert np.array_equal(y, x)


def test_q8_0_error_bound(rng):
    """Round-trip error is bounded by d/2 + fp16 scale rounding."""
    x = rng.normal(size=(8, 256)).astype(np.float32)
    t = q.quantize_q8_0(x)
    y = q.dequantize_q8_0(t)
    bound = np.repeat(t.d, q.QK, axis=-1) * 0.51
    assert np.all(np.abs(y - x) <= bound + 1e-6)


def test_nibble_pack_roundtrip(rng):
    v = rng.integers(0, 16, size=(3, 4, 32)).astype(np.uint8)
    assert np.array_equal(q.unpack_nibbles(q.pack_nibbles(v)), v)


def test_zero_block():
    """All-zero blocks must not produce NaN/inf (d == 0 guard)."""
    x = np.zeros((2, 256), np.float32)
    for fmt in ("q8_0", "q4_0", "q4_k", "q6_k"):
        quantize, dequantize = q.FORMATS[fmt]
        y = dequantize(quantize(x))
        assert np.all(y == 0.0), fmt


def test_int8_rowwise_roundtrip(rng):
    x = rng.normal(size=(5, 7, 128)).astype(np.float32)
    qs, scale = q.quantize_int8_rowwise(x)
    y = q.dequantize_int8_rowwise(qs, scale)
    assert_close(y, x, atol=float(np.abs(x).max()) / 127, rtol=0.02,
                 name="int8 rowwise")


def test_bits_per_weight(rng):
    x = rng.normal(size=(1, 256)).astype(np.float32)
    assert q.quantize_q8_0(x).bits_per_weight == pytest.approx(8.5)
    assert q.quantize_q4_0(x).bits_per_weight == pytest.approx(4.5)
    assert q.quantize_q4_k(x).bits_per_weight == pytest.approx(4.625)
