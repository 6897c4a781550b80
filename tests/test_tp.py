"""Tensor+data-parallel step vs the single-device model, on the 8-virtual-
CPU-device mesh (the multi-chip fake-backend test the reference lacks,
SURVEY §4c)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.parallel import tp
from ggml_cuda_experiments_tpu.parallel.mesh import make_mesh
from ggml_cuda_experiments_tpu.utils.harness import assert_close

CFG = PRESETS["debug"]          # 4 q heads, 2 kv heads, dim 256


@pytest.fixture(scope="module")
def params():
    return llama.init_weights(CFG, seed=5)


def _prompt(rng, b, t):
    return jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, t)), jnp.int32)


def test_mesh_construction():
    mesh = make_mesh(model=2, data=4)
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh.axis_names == ("data", "model")


def test_tp_prefill_matches_single(params, rng):
    mesh = make_mesh(model=2, data=2)
    toks = _prompt(rng, 2, 8)

    cache_s = llama.KVCache.create(CFG, 2, 256)
    want, _ = llama.prefill(params, CFG, toks, cache_s)

    sparams = tp.shard_params(params, mesh)
    cache = tp.create_sharded_cache(CFG, mesh, 2, 256)
    step = tp.make_tp_step(CFG, mesh, sparams, decode=False)
    got, new_cache = step(sparams, toks, cache)

    assert_close(np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2,
                 name="tp prefill logits")
    assert np.array_equal(np.asarray(new_cache.lengths), [8, 8])


def test_tp_decode_matches_single(params, rng):
    mesh = make_mesh(model=2, data=2)
    toks = _prompt(rng, 2, 8)

    # single-device reference: prefill then one decode step
    cache_s = llama.KVCache.create(CFG, 2, 256)
    logits_s, cache_s = llama.prefill(params, CFG, toks, cache_s)
    next_tok = jnp.argmax(logits_s, axis=-1).astype(jnp.int32)
    want, _ = llama.decode_step(params, CFG, next_tok, cache_s)

    # sharded: prefill step then decode step
    sparams = tp.shard_params(params, mesh)
    cache = tp.create_sharded_cache(CFG, mesh, 2, 256)
    pre = tp.make_tp_step(CFG, mesh, sparams, decode=False)
    dec = tp.make_tp_step(CFG, mesh, sparams, decode=True)
    logits_p, cache = pre(sparams, toks, cache)
    assert_close(np.asarray(logits_p), np.asarray(logits_s), atol=5e-2,
                 rtol=5e-2, name="tp prefill")
    got, _ = dec(sparams, jnp.argmax(logits_p, -1).astype(jnp.int32), cache)

    assert_close(np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2,
                 name="tp decode logits")


def test_tp_quantized_runs(params, rng):
    """Quantized TP: row-parallel per-shard interleaved encoding must slice
    into valid local tensors and produce logits close to the unsharded
    quantized model."""
    mesh = make_mesh(model=2, data=1)
    toks = _prompt(rng, 1, 8)

    # reference: globally-encoded quantized model (per-shard quantization
    # produces identical *values* since shard cuts align to block bounds;
    # only the interleaved encoding differs)
    cache_s = llama.KVCache.create(CFG, 1, 256)
    want, _ = llama.prefill(llama.quantize_params(params, "q8_0"), CFG,
                            toks, cache_s)

    qparams = tp.quantize_params_sharded(params, "q8_0", n_model=2)
    sparams = tp.shard_params(qparams, mesh)
    cache = tp.create_sharded_cache(CFG, mesh, 1, 256)
    step = tp.make_tp_step(CFG, mesh, sparams, decode=False)
    got, _ = step(sparams, toks, cache)

    assert_close(np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2,
                 name="tp quantized prefill")


def test_local_config_divisibility():
    with pytest.raises(AssertionError):
        tp.local_config(CFG, 3)
    l = tp.local_config(CFG, 2)
    assert l.n_heads == 2 and l.n_kv_heads == 1
