"""Permuted-hidden layout (cfg.hperm + llama.permute_hidden_params):
decode and prefill must be numerically equivalent to the standard layout
(same device-order operands reach every kernel; only XLA reduction order
inside rms_norm can differ, so logits agree to float tolerance).
"""

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.models.config import PRESETS


def _build(fmt="q4_k", head_fmt=None):
    cfg = dataclasses.replace(PRESETS["debug"], x_quant8=True)
    params = llama.quantize_params(
        llama.init_weights(cfg, seed=0, as_numpy=True), fmt,
        head_fmt=head_fmt)
    return cfg, jax.device_put(params)


@pytest.mark.parametrize("head_fmt", [None, "q6_k"])
def test_hperm_decode_matches_standard(head_fmt):
    cfg, params = _build(head_fmt=head_fmt)
    hp_params = llama.permute_hidden_params(params, cfg)
    hp_cfg = dataclasses.replace(cfg, hperm=True)

    prompt = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
    cache_a = llama.KVCache.create(cfg, 1, 128)
    cache_b = llama.KVCache.create(cfg, 1, 128)
    toks_a = llama.generate_scan(params, cfg, prompt, cache_a, 6)
    toks_b = llama.generate_scan(hp_params, hp_cfg, prompt, cache_b, 6)
    assert np.array_equal(np.asarray(toks_a), np.asarray(toks_b)), (
        np.asarray(toks_a), np.asarray(toks_b))


def test_hperm_prefill_logits_close():
    cfg, params = _build()
    hp_params = llama.permute_hidden_params(params, cfg)
    hp_cfg = dataclasses.replace(cfg, hperm=True)

    prompt = jnp.asarray(np.arange(1, 17)[None, :], jnp.int32)
    la, _ = llama.prefill(params, cfg, prompt,
                          llama.KVCache.create(cfg, 1, 128))
    lb, _ = llama.prefill(hp_params, hp_cfg, prompt,
                          llama.KVCache.create(hp_cfg, 1, 128))
    a, b = np.asarray(la), np.asarray(lb)
    denom = max(1e-6, float(np.max(np.abs(a))))
    assert float(np.max(np.abs(a - b))) / denom < 2e-2, (
        float(np.max(np.abs(a - b))), denom)


def test_fused_attention_x_prepermuted_identical():
    # the new static arg must be a pure permute move: pre-permuting x at
    # the caller and skipping the in-op permute is bit-identical
    from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
    from ggml_cuda_experiments_tpu.ops.fused_attention import attention_fused
    rng = np.random.default_rng(3)
    dim = 4096
    wqkv = qm.quantize(
        (rng.normal(size=(3 * dim, dim)) / 64).astype(np.float32), "q4_k")
    wo = qm.quantize(
        (rng.normal(size=(dim, dim)) / 64).astype(np.float32), "q4_k",
        layout="wof")
    x = jnp.asarray(rng.normal(size=(1, dim)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(1, 1, 32, 256, 128)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(1, 1, 32, 256, 128)), jnp.bfloat16)
    lens = jnp.asarray([19], jnp.int32)
    kw = dict(n_heads=32, n_kv_heads=32, head_dim=128)
    o1, k1, v1 = attention_fused(x, wqkv, wo, kc, vc, lens, 0, **kw)
    xp = qm.permute_activations(x.astype(jnp.float32))
    o2, k2, v2 = attention_fused(xp, wqkv, wo, kc, vc, lens, 0,
                                 x_prepermuted=True, **kw)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert np.array_equal(np.asarray(k1), np.asarray(k2))


def test_hperm_unfused_gates_match_fused():
    cfg, params = _build()
    hp_params = llama.permute_hidden_params(params, cfg)
    base = dataclasses.replace(cfg, hperm=True)
    prompt = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
    ref = None
    for fa, fm in ((False, False), (True, True)):
        c = dataclasses.replace(base, fuse_attn=fa, fuse_mlp=fm)
        toks = llama.generate_scan(hp_params, c, prompt,
                                   llama.KVCache.create(c, 1, 128), 6)
        toks = np.asarray(toks)
        if ref is None:
            ref = toks
        else:
            assert np.array_equal(ref, toks), (ref, toks)
