"""Fused attention-block kernel (ops/fused_attention.py) vs the composed
reference path (qmatmul -> rope -> cache append -> flash_decode -> qmatmul),
plus the wof weight layout it relies on.

The reference repo validates its decode pipeline the same way — composed
CPU oracle vs the fused GPU kernels (/root/reference/src/kernel_test.h:50-66
vs :157-163); here the composition is the repo's own (already-tested)
kernels, so the test isolates exactly the fusion."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.ops.flash_decode import flash_decode
from ggml_cuda_experiments_tpu.ops.fused_attention import (
    attention_fused, attention_fused_supported)

NH, D = 32, 128
DIM = NH * D


def _mk(seed=0, S=256, length=57, L=2, li=1, nkv=NH):
    rng = np.random.default_rng(seed)
    nq = (NH + 2 * nkv) * D
    wqkv = (rng.normal(size=(nq, DIM)) / np.sqrt(DIM)).astype(np.float32)
    wo = (rng.normal(size=(DIM, DIM)) / np.sqrt(DIM)).astype(np.float32)
    x = rng.normal(size=(1, DIM)).astype(np.float32)
    kc = (rng.normal(size=(L, 1, nkv, S, D)) * 0.3).astype(np.float32)
    vc = (rng.normal(size=(L, 1, nkv, S, D)) * 0.3).astype(np.float32)
    return wqkv, wo, x, jnp.asarray(kc, jnp.bfloat16), \
        jnp.asarray(vc, jnp.bfloat16), length, li


def _reference(wqkv_np, wo_np, x, kc, vc, length, li, theta=10000.0,
               nkv=NH):
    """Composed path using the production kernels (std layouts)."""
    kvd = nkv * D
    qkv = qm.qmatmul(jnp.asarray(x), qm.quantize(wqkv_np, "q4_k"),
                     x_quant8=True)
    q = qkv[:, :DIM].reshape(1, 1, NH, D)
    k = qkv[:, DIM:DIM + kvd].reshape(1, 1, nkv, D)
    v = qkv[:, DIM + kvd:].reshape(1, 1, nkv, D)
    pos = jnp.full((1, 1), length, jnp.int32)
    qr = llama.rope(q.astype(jnp.float32), pos, theta)
    kr = llama.rope(k.astype(jnp.float32), pos, theta)
    kn = kr[0, 0].astype(kc.dtype)                      # [nkv, D]
    vn = v[0, 0].astype(vc.dtype)
    kc2 = kc.at[li, 0, :, length, :].set(kn)
    vc2 = vc.at[li, 0, :, length, :].set(vn)
    o = flash_decode(qr[:, 0].astype(jnp.float32), kc2, vc2,
                     jnp.array([length + 1], jnp.int32), layer=li)
    out = qm.qmatmul(o.reshape(1, DIM), qm.quantize(wo_np, "q4_k"),
                     x_quant8=True)
    return np.asarray(out), np.asarray(kn.astype(jnp.float32)), \
        np.asarray(vn.astype(jnp.float32))


@pytest.mark.parametrize("length,S,nkv", [
    (57, 256, NH), (255, 256, NH), (500, 512, NH),
    (57, 256, 8), (500, 512, 8),      # GQA r=4 (llama3-8b 32/8)
    (127, 256, 4),                    # GQA r=8
])
def test_fused_matches_composed(length, S, nkv):
    wqkv_np, wo_np, x, kc, vc, _, li = _mk(seed=1, S=S, length=length,
                                           nkv=nkv)
    wqkv = qm.quantize(wqkv_np, "q4_k")
    wo = qm.quantize(wo_np, "q4_k", layout="wof")
    assert attention_fused_supported(wqkv, wo, NH, nkv, D, kc.dtype)

    out, kn, vn = attention_fused(
        jnp.asarray(x), wqkv, wo, kc, vc,
        jnp.array([length], jnp.int32), li,
        n_heads=NH, n_kv_heads=nkv, head_dim=D)
    ref, kn_ref, vn_ref = _reference(wqkv_np, wo_np, x, kc, vc, length, li,
                                     nkv=nkv)

    np.testing.assert_allclose(np.asarray(kn, np.float32), kn_ref,
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32), vn_ref,
                               rtol=0, atol=1e-6)
    scale = np.max(np.abs(ref))
    err = np.max(np.abs(np.asarray(out) - ref)) / scale
    # fused and composed both carry ~0.5%-class int8 activation quant on
    # the W_o input, but with DIFFERENT block groupings (wof vs std), and
    # the composed GQA path runs flash_decode's GQA-packed variant — the
    # two paths' rounding noise does not cancel. Per-head error is uniform
    # (no head-wiring component); MHA lands ~1e-3, GQA ~4e-3.
    assert err < 6e-3, f"fused vs composed rel err {err}"


def test_wof_layout_lossless():
    rng = np.random.default_rng(3)
    w = (rng.normal(size=(256, DIM)) / np.sqrt(DIM)).astype(np.float32)
    d_std = np.asarray(qm.dequantize_jnp(qm.quantize(w, "q4_k")))
    d_wof = np.asarray(qm.dequantize_jnp(qm.quantize(w, "q4_k",
                                                     layout="wof")))
    np.testing.assert_array_equal(d_std, d_wof)


def test_wof_qmatmul_matches_std():
    rng = np.random.default_rng(4)
    w = (rng.normal(size=(512, DIM)) / np.sqrt(DIM)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(1, DIM)).astype(np.float32))
    y_std = np.asarray(qm.qmatmul(x, qm.quantize(w, "q4_k"), x_quant8=True))
    y_wof = np.asarray(qm.qmatmul(x, qm.quantize(w, "q4_k", layout="wof"),
                                  x_quant8=True))
    np.testing.assert_allclose(y_std, y_wof, rtol=0,
                               atol=2e-6 * float(np.max(np.abs(y_std))))


def test_decode_step_uses_fused_path():
    """End-to-end: a 1-layer dim-4096 model decodes identically (within
    quant tolerance) with the fused attention path vs the unfused one."""
    import dataclasses
    from ggml_cuda_experiments_tpu.models.config import ModelConfig

    cfg = ModelConfig(name="t7b-mini", vocab_size=256, dim=DIM, n_layers=1,
                      n_heads=NH, n_kv_heads=NH, intermediate=512,
                      head_dim=D, x_quant8=True)
    # f32 model dtype: the fused kernel keeps q/k/v in f32 end-to-end, so
    # an f32 unfused twin isolates the fusion (a bf16 twin differs by its
    # own activation rounding, ~1e-1 on logits)
    params = llama.init_weights(cfg, seed=5, dtype=jnp.float32,
                                as_numpy=True)
    qp = llama.quantize_params(params, "q4_k", pad_intermediate=False)
    assert qp["layers"][0]["wo"].layout == "wof"
    cache = llama.KVCache.create(cfg, 1, 256)
    prompt = jnp.asarray(np.arange(8)[None, :] % 256, jnp.int32)
    logits, cache = llama.prefill(qp, cfg, prompt, cache)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits2, cache = llama.decode_step(qp, cfg, tok, cache)

    # unfused twin: same weights with a std-layout wo
    qp2 = llama.quantize_params(params, "q4_k", pad_intermediate=False)
    qp2["layers"][0]["wo"] = qm.quantize(
        np.asarray(params["layers"][0]["wo"], np.float32), "q4_k")
    cfg2 = dataclasses.replace(cfg, name="t7b-mini-std")
    cache2 = llama.KVCache.create(cfg2, 1, 256)
    l1, cache2 = llama.prefill(qp2, cfg2, prompt, cache2)
    l2, cache2 = llama.decode_step(qp2, cfg2, tok, cache2)

    np.testing.assert_allclose(np.asarray(logits2), np.asarray(l2),
                               rtol=0, atol=5e-2)
    assert np.array_equal(np.asarray(cache.lengths), [9])
