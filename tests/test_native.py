"""Native C++ quant codec must be bit-identical to the NumPy oracle."""

import numpy as np
import pytest

from ggml_cuda_experiments_tpu.oracle import quant as q
from ggml_cuda_experiments_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgct_native.so not built")


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_quantize_bitwise_matches_oracle(rng, fmt):
    x = rng.normal(size=(32, 1024)).astype(np.float32) * 3
    # throw in exact zeros, tiny and huge values
    x[0] = 0.0
    x[1, :32] = 1e-8
    x[2, :32] = 1e4
    a = native.quantize(x, fmt)
    b = q.FORMATS[fmt][0](x)
    for field in ("qs", "d", "sc", "mn", "dmin"):
        fa, fb = getattr(a, field, None), getattr(b, field, None)
        if fb is None:
            continue
        assert np.array_equal(np.asarray(fa), np.asarray(fb)), (
            f"{fmt}.{field} differs: "
            f"{np.argwhere(np.asarray(fa) != np.asarray(fb))[:4]}")


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_dequantize_bitwise_matches_oracle(rng, fmt):
    x = rng.normal(size=(16, 512)).astype(np.float32)
    t = q.FORMATS[fmt][0](x)
    a = native.dequantize(t)
    b = q.FORMATS[fmt][1](t)
    assert np.array_equal(a, b)


def test_threading_consistency(rng):
    """Multi-threaded split must not change results (pure per-row work)."""
    x = rng.normal(size=(64, 512)).astype(np.float32)
    a = native.quantize(x, "q4_k")
    b = native.quantize(x[:1], "q4_k")
    assert np.array_equal(a.qs[:1], b.qs)
