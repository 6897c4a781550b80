"""Fused prefill RoPE+repack kernel vs the jnp reference path."""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.ops.prefill_fuse import rope_pack_prefill


@pytest.mark.parametrize("nH,nKV", [(8, 8), (8, 2)])
def test_rope_pack_matches_reference(nH, nKV):
    T, D = 256, 128
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=(T, (nH + 2 * nKV) * D)),
                    jnp.bfloat16)
    pos = jnp.arange(T, dtype=jnp.int32)

    qT, kT, vT = rope_pack_prefill(
        y, pos, n_heads=nH, n_kv_heads=nKV, head_dim=D)

    q = y[:, :nH * D].reshape(1, T, nH, D)
    k = y[:, nH * D:(nH + nKV) * D].reshape(1, T, nKV, D)
    v = y[:, (nH + nKV) * D:].reshape(1, T, nKV, D)
    qr = llama.rope(q, pos[None], 10000.0)[0].transpose(1, 0, 2)
    kr = llama.rope(k, pos[None], 10000.0)[0].transpose(1, 0, 2)
    vr = v[0].transpose(1, 0, 2)

    for got, want, name in ((qT, qr, "q"), (kT, kr, "k"), (vT, vr, "v")):
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        assert np.max(np.abs(g - w)) < 2e-2, (name, np.max(np.abs(g - w)))


def test_prefill_logits_unchanged_by_fused_rope(monkeypatch):
    """End-to-end prefill A/B over the module gate: the fused rope+repack
    path and the XLA reference path must agree to float tolerance."""
    from ggml_cuda_experiments_tpu.models.config import ModelConfig
    import ggml_cuda_experiments_tpu.models.llama as L

    # head_dim 128 so the fuse gate is actually ON for the fused arm
    cfg = ModelConfig(
        name="pf-test", vocab_size=512, dim=1024, n_layers=2, n_heads=8,
        n_kv_heads=2, intermediate=1024, head_dim=128, max_seq_len=512,
        x_quant8=True)
    params = jax.device_put(llama.quantize_params(
        llama.init_weights(cfg, seed=0, as_numpy=True), "q4_k"))
    prompt = jnp.asarray(
        np.pad(np.arange(1, 17)[None, :], ((0, 0), (0, 112))), jnp.int32)

    outs = {}
    for fused in (True, False):
        monkeypatch.setattr(L, "PREFILL_FUSE_ROPE", fused)
        L.prefill.clear_cache()
        la, _ = L.prefill(params, cfg, prompt,
                          L.KVCache.create(cfg, 1, 256))
        outs[fused] = np.asarray(la)
    a, b = outs[True], outs[False]
    denom = max(1e-6, float(np.max(np.abs(b))))
    assert float(np.max(np.abs(a - b))) / denom < 2e-2, (
        float(np.max(np.abs(a - b))), denom)


