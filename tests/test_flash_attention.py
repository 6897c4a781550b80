"""Flash-attention kernel vs the attention oracle — the analog of the
reference's kernel_test / test_llama comparisons (kernel_test.h shapes:
head_dim=128, GQA 32/8 heads) with hard tolerance asserts."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.ops.flash_attention import flash_attention
from ggml_cuda_experiments_tpu.oracle.attention import attention_ref
from ggml_cuda_experiments_tpu.utils.harness import assert_close


def _rand_qkv(rng, b, hq, hkv, sq, sk, d, dtype=np.float32):
    q = rng.normal(size=(b, hq, sq, d)).astype(dtype)
    k = rng.normal(size=(b, hkv, sk, d)).astype(dtype)
    v = rng.normal(size=(b, hkv, sk, d)).astype(dtype)
    return q, k, v


def test_basic(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 2, 128, 256, 64)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = attention_ref(q, k, v)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="flash basic")


def test_gqa_kernel_test_shapes(rng):
    """The reference harness config: 32 q heads, 8 kv heads, head_dim 128,
    kv 512 (kernel_test.h:2,25-27) — batch=1 decode-style plus longer q."""
    q, k, v = _rand_qkv(rng, 1, 32, 8, 128, 512, 128)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=128, block_k=256)
    want = attention_ref(q, k, v)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="flash GQA 32/8")


def test_causal(rng):
    q, k, v = _rand_qkv(rng, 2, 4, 4, 256, 256, 64)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=True)
    want = attention_ref(q, k, v, causal=True)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="flash causal")


def test_causal_offset(rng):
    """Sq < Sk: queries are the last Sq positions (decode/chunked prefill)."""
    q, k, v = _rand_qkv(rng, 1, 2, 2, 128, 512, 64)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=True)
    want = attention_ref(q, k, v, causal=True)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="flash causal offset")


def test_additive_mask(rng):
    """Explicit additive mask, incl. a fully-masked KV *block* whose skip
    must not perturb results (flash-llama.h:276-278 analog)."""
    b, hq, hkv, sq, sk, d = 1, 4, 2, 128, 512, 64
    q, k, v = _rand_qkv(rng, b, hq, hkv, sq, sk, d)
    mask = np.zeros((1, 1, sq, sk), np.float32)
    mask[..., 256:384] = -np.inf      # one whole 128-block masked out
    mask[..., ::7] = -np.inf          # scattered masking
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(mask), block_k=128)
    want = attention_ref(q, k, v, mask=mask)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="flash mask")


def test_scale(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 1, 128, 128, 64)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          scale=0.25)
    want = attention_ref(q, k, v, scale=0.25)
    assert_close(got, want, atol=2e-3, rtol=2e-3, name="flash scale")


def test_residuals_enable_cross_shard_merge(rng):
    """Splitting KV across two kernel calls and merging with the lse ops must
    equal one full-KV call — the context-parallel contract."""
    from ggml_cuda_experiments_tpu.ops.lse import AttnPartial, lse_combine, lse_finalize
    b, h, sq, sk, d = 1, 2, 128, 512, 64
    q, k, v = _rand_qkv(rng, b, h, h, sq, sk, d)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    want = np.asarray(flash_attention(qj, kj, vj))

    half = sk // 2
    parts = []
    for sl in (slice(0, half), slice(half, sk)):
        o, lse = flash_attention(qj, kj[:, :, sl], vj[:, :, sl],
                                 return_residuals=True)
        # convert (o_normalized, lse) into an (o_unnorm, m, s) partial with
        # m := lse, s := 1 (valid: o_unnorm = o * exp(lse - m) * s)
        parts.append(AttnPartial(
            o.astype(jnp.float32),
            lse[..., None],
            jnp.ones((*lse.shape, 1), jnp.float32),
        ))
    merged = lse_finalize(lse_combine(*parts))
    assert_close(merged, want, atol=2e-3, rtol=2e-3, name="residual merge")


def test_bf16(rng):
    q, k, v = _rand_qkv(rng, 1, 4, 4, 128, 256, 64)
    got = flash_attention(jnp.asarray(q, jnp.bfloat16),
                          jnp.asarray(k, jnp.bfloat16),
                          jnp.asarray(v, jnp.bfloat16))
    want = attention_ref(q, k, v, operand_dtype=jnp.bfloat16)
    assert_close(got, want, atol=3e-2, rtol=3e-2, name="flash bf16")
