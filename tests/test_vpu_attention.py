"""Non-MXU (VPU) prefill attention + custom-op packaging (M1 parity):
value vs the NumPy oracle on MMA-hostile shapes, and VJP vs jax autodiff
of the oracle formula — the "complete differentiable custom op" property
the reference gets from its ATen registration
(/root/reference/src/misc/attention.cu:478-596)."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.ops.vpu_attention import vpu_attention


def _oracle(q, k, v, lengths, causal, scale, q0_pos=0):
    B, H, T, D = q.shape
    S = k.shape[2]
    s = np.einsum("bhtd,bhsd->bhts", q, k).astype(np.float64) * scale
    kpos = np.arange(S)[None, None, None, :]
    valid = kpos < lengths[:, None, None, None]
    if causal:
        qpos = (q0_pos + np.arange(T))[None, None, :, None]
        valid = valid & (kpos <= qpos)
    s = np.where(valid, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", p, v).astype(np.float32)


# MMA-hostile shapes: head dims 40/64/80 (the reference's float/float2/
# float4 dispatch targets, attention.cu:534-585), tiny query counts
@pytest.mark.parametrize("D,T,causal", [(40, 3, False), (64, 5, True),
                                        (80, 16, True), (128, 4, True)])
def test_vpu_attention_matches_oracle(D, T, causal):
    rng = np.random.default_rng(0)
    B, H, S = 2, 3, 256
    q = rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    lengths = np.array([S, S - 37], np.int32)
    scale = 1.0 / np.sqrt(D)
    got = np.asarray(vpu_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), causal, None, 128, T - 1 if causal else 0))
    want = _oracle(q, k, v, lengths, causal, scale,
                   q0_pos=T - 1 if causal else 0)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_vpu_attention_vjp_matches_autodiff():
    """The custom VJP equals jax autodiff of the reference formula."""
    rng = np.random.default_rng(1)
    B, H, T, S, D = 1, 2, 4, 128, 64
    q = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([100], np.int32))
    scale = float(1.0 / np.sqrt(D))

    def ref(q, k, v):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
        kpos = jnp.arange(S)[None, None, None, :]
        valid = kpos < lengths[:, None, None, None]
        qpos = (T - 1 + jnp.arange(T))[None, None, :, None]
        valid = jnp.logical_and(valid, kpos <= qpos)
        s = jnp.where(valid, s, -0.7 * jnp.finfo(jnp.float32).max)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", p, v)

    def fused(q, k, v):
        return vpu_attention(q, k, v, lengths, True, None, 128, T - 1)

    do = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    out_r, vjp_r = jax.vjp(ref, q, k, v)
    out_f, vjp_f = jax.vjp(fused, q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=0, atol=2e-5)
    for gf, gr, name in zip(vjp_f(do), vjp_r(do), "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_vpu_attention_jittable_and_batched():
    """The op composes with jit + vmap like any native op."""
    rng = np.random.default_rng(2)
    B, H, T, S, D = 2, 2, 2, 128, 80
    q = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([S, 64], np.int32))
    f = jax.jit(lambda q, k, v: vpu_attention(q, k, v, lengths, False))
    got = np.asarray(f(q, k, v))
    want = _oracle(np.asarray(q), np.asarray(k), np.asarray(v),
                   np.asarray(lengths), False, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
