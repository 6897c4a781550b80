"""Pallas MXU matmul vs oracle — the analog of the reference's WMMA GEMM
correctness gates (fp16 HMMA rel-diff gate and int8 IMMA bitwise assert,
/root/reference/src/misc/tensor-core.cu:493-500, 575-578)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.ops.matmul import matmul
from ggml_cuda_experiments_tpu.oracle.attention import mulmat_ref
from ggml_cuda_experiments_tpu.utils.harness import assert_close


@pytest.mark.parametrize("shape", [(128, 128, 128), (256, 512, 384), (64, 200, 136)])
def test_f32(rng, shape):
    m, k, n = shape
    a = rng.normal(size=(m, k)).astype(np.float32)
    b = rng.normal(size=(k, n)).astype(np.float32)
    got = matmul(jnp.asarray(a), jnp.asarray(b))
    assert_close(got, mulmat_ref(a, b), atol=1e-4, rtol=1e-4, name="f32 matmul")


def test_bf16(rng):
    """bf16 operands, f32 accumulation — the HMMA analog with the oracle's
    operand rounding (utils.h:10-11 rounds through half; here bf16)."""
    m, k, n = 128, 512, 256
    a = rng.normal(size=(m, k)).astype(np.float32)
    b = rng.normal(size=(k, n)).astype(np.float32)
    got = matmul(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
                 out_dtype=jnp.float32)
    want = mulmat_ref(a, b, operand_dtype=jnp.bfloat16)
    assert_close(got, want, atol=1e-3, rtol=1e-3, name="bf16 matmul")


def test_int8_bitwise(rng):
    """int8 x int8 -> int32 must be bitwise exact (IMMA analog)."""
    m, k, n = 64, 256, 128
    a = rng.integers(-127, 128, size=(m, k)).astype(np.int8)
    b = rng.integers(-127, 128, size=(k, n)).astype(np.int8)
    got = matmul(jnp.asarray(a), jnp.asarray(b), out_dtype=jnp.int32)
    want = a.astype(np.int32) @ b.astype(np.int32)
    assert np.array_equal(np.asarray(got), want)


@pytest.mark.parametrize("ta,tb", [(False, True), (True, False), (True, True)])
def test_transpose_combos(rng, ta, tb):
    """All four transpose combos, like tensor-core.cu:215-254 (NN tested
    above)."""
    m, k, n = 64, 128, 192
    a = rng.normal(size=(k, m) if ta else (m, k)).astype(np.float32)
    b = rng.normal(size=(n, k) if tb else (k, n)).astype(np.float32)
    got = matmul(jnp.asarray(a), jnp.asarray(b), transpose_a=ta, transpose_b=tb)
    want = (a.T if ta else a) @ (b.T if tb else b)
    assert_close(got, want, atol=1e-4, rtol=1e-4, name=f"matmul ta={ta} tb={tb}")


def test_tall_skinny_matvec(rng):
    """Decode-shaped: batch-1 activation row times a big weight matrix."""
    a = rng.normal(size=(1, 2048)).astype(np.float32)
    b = rng.normal(size=(2048, 512)).astype(np.float32)
    got = matmul(jnp.asarray(a), jnp.asarray(b), block_m=8)
    assert_close(got, a @ b, atol=1e-3, rtol=1e-3, name="matvec")
