"""Split-KV flash decode vs the oracle — the analog of the reference's
flash_attn_row + fa_reduce path at kernel_test shapes (head_dim 128,
GQA 32/8, kv >= 256)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.ops.flash_decode import flash_decode
from ggml_cuda_experiments_tpu.oracle.attention import attention_ref
from ggml_cuda_experiments_tpu.utils.harness import assert_close


def _decode_ref(q, k, v, lengths=None, scale=None):
    """Oracle: one-token attention with per-sequence lengths."""
    b, hq, d = q.shape
    sk = k.shape[2]
    mask = None
    if lengths is not None:
        mask = np.where(
            np.arange(sk)[None, None, None, :] < np.asarray(lengths)[:, None, None, None],
            0.0, -np.inf).astype(np.float32)
    out = attention_ref(q[:, :, None], k, v, mask=mask, scale=scale)
    return out[:, :, 0]


def _rand(rng, b, hq, hkv, s, d):
    q = rng.normal(size=(b, hq, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    return q, k, v


def test_single_split(rng):
    q, k, v = _rand(rng, 1, 32, 8, 512, 128)
    got = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = _decode_ref(q, k, v)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="decode 1-split")


@pytest.mark.parametrize("splits", [2, 4])
def test_kv_splits_match_single(rng, splits):
    """Split-KV + LSE merge must equal the unsplit result — the core
    flash-decoding property (fa_reduce analog)."""
    q, k, v = _rand(rng, 2, 8, 4, 1024, 64)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    want = _decode_ref(q, k, v)
    got = flash_decode(qj, kj, vj, kv_splits=splits)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name=f"decode {splits}-split")


def test_varied_lengths(rng):
    """Per-sequence lengths: positions past `length` are masked; blocks fully
    past it are skipped."""
    q, k, v = _rand(rng, 3, 8, 8, 768, 64)
    lengths = np.array([256, 700, 1], np.int32)
    got = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(lengths), kv_splits=3, block_k=256)
    want = _decode_ref(q, k, v, lengths)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="decode lengths")


def test_length_not_block_multiple(rng):
    q, k, v = _rand(rng, 1, 4, 4, 512, 64)
    lengths = np.array([300], np.int32)
    got = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(lengths), block_k=128)
    want = _decode_ref(q, k, v, lengths)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="decode ragged length")


def test_mqa_group_of_one(rng):
    """Hq == Hkv (no grouping) still works (G = 1 sublane)."""
    q, k, v = _rand(rng, 1, 4, 4, 256, 64)
    got = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = _decode_ref(q, k, v)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="decode G=1")


def test_matches_flash_attention_kernel(rng):
    """Cross-kernel consistency: decode == flash_attention with Sq=1."""
    from ggml_cuda_experiments_tpu.ops.flash_attention import flash_attention
    q, k, v = _rand(rng, 1, 8, 2, 256, 64)
    got = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       kv_splits=2)
    # flash_attention needs Sq >= 1; give it the same single query token
    got2 = flash_attention(jnp.asarray(q[:, :, None]), jnp.asarray(k),
                           jnp.asarray(v), block_q=1)
    assert_close(got, np.asarray(got2)[:, :, 0], atol=2e-3, rtol=2e-3,
                 name="decode vs flash")


def test_layered_cache_matches_sliced(rng):
    """Full stacked cache [L, B, Hkv, S, D] + layer index must bit-match the
    per-layer-slice call (the layer is picked inside the BlockSpec index map
    so the model never materializes a cache-layer slice)."""
    import jax
    L = 3
    q, _, _ = _rand(rng, 2, 8, 4, 512, 64)
    k = rng.normal(size=(L, 2, 4, 512, 64)).astype(np.float32)
    v = rng.normal(size=(L, 2, 4, 512, 64)).astype(np.float32)
    lengths = np.array([57, 300], np.int32)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    lj = jnp.asarray(lengths)
    for li in (0, 2):
        want = flash_decode(qj, kj[li], vj[li], lj, kv_splits=2)
        got = flash_decode(qj, kj, vj, lj, layer=li, kv_splits=2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # traced layer index (decode loop / scan body)
    f = jax.jit(lambda i: flash_decode(qj, kj, vj, lj, layer=i))
    np.testing.assert_array_equal(
        np.asarray(f(jnp.int32(1))),
        np.asarray(flash_decode(qj, kj[1], vj[1], lj)))


def test_layered_cache_int8(rng):
    from ggml_cuda_experiments_tpu.oracle.quant import quantize_int8_rowwise
    L = 2
    q, _, _ = _rand(rng, 1, 8, 4, 256, 64)
    k = rng.normal(size=(L, 1, 4, 256, 64)).astype(np.float32)
    v = rng.normal(size=(L, 1, 4, 256, 64)).astype(np.float32)
    kq, ks = quantize_int8_rowwise(k)
    vq, vs = quantize_int8_rowwise(v)
    lengths = jnp.asarray([200], jnp.int32)
    args = map(jnp.asarray, (q, kq, vq, ks[..., 0], vs[..., 0]))
    qj, kj, vj, ksj, vsj = args
    for li in range(L):
        want = flash_decode(qj, kj[li], vj[li], lengths,
                            k_scale=ksj[li], v_scale=vsj[li])
        got = flash_decode(qj, kj, vj, lengths,
                           k_scale=ksj, v_scale=vsj, layer=li)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_quantized_kv(rng):
    """INT8 KV cache with per-token scales: kernel must match the oracle run
    on the dequantized cache (scale applied to score/prob rows is
    algebraically identical to dequantizing the tiles)."""
    from ggml_cuda_experiments_tpu.oracle.quant import (
        dequantize_int8_rowwise, quantize_int8_rowwise)
    q, k, v = _rand(rng, 2, 8, 4, 512, 64)
    kq, ks = quantize_int8_rowwise(k)
    vq, vs = quantize_int8_rowwise(v)
    kd = dequantize_int8_rowwise(kq, ks)
    vd = dequantize_int8_rowwise(vq, vs)
    lengths = np.array([300, 512], np.int32)

    got = flash_decode(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(lengths),
        k_scale=jnp.asarray(ks[..., 0]), v_scale=jnp.asarray(vs[..., 0]),
        kv_splits=2)
    want = _decode_ref(q, kd, vd, lengths)
    assert_close(got, want, atol=2e-2, rtol=2e-2, name="decode int8 kv")


def test_fp8_quantized_kv(rng):
    """FLOAT8_E4M3 KV cache with per-token scales (BASELINE's INT8/FP8 KV):
    kernel must match the oracle run on the dequantized cache."""
    import ml_dtypes
    from ggml_cuda_experiments_tpu.oracle.quant import (
        dequantize_fp8_rowwise, quantize_fp8_rowwise)
    q, k, v = _rand(rng, 2, 8, 4, 512, 64)
    kq, ks = quantize_fp8_rowwise(k)
    vq, vs = quantize_fp8_rowwise(v)
    kd = dequantize_fp8_rowwise(kq, ks)
    vd = dequantize_fp8_rowwise(vq, vs)
    lengths = np.array([300, 512], np.int32)

    got = flash_decode(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(lengths),
        k_scale=jnp.asarray(ks[..., 0]), v_scale=jnp.asarray(vs[..., 0]),
        kv_splits=2)
    want = _decode_ref(q, kd, vd, lengths)
    assert_close(got, want, atol=2e-2, rtol=2e-2, name="decode fp8 kv")
