"""Pipeline parallelism: staged execution == single-device forward.

Covers the ``pp`` axis of the driver's parallelism contract: layers stacked
and sharded over a ``pipe`` mesh axis, GPipe microbatching with ppermute
handoff, masked cache writes on bubble steps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama, moe
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.parallel import pipeline
from jax.sharding import Mesh

CFG = dataclasses.replace(PRESETS["debug"], n_layers=4)


def _mesh(pipe: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:pipe]).reshape(pipe), ("pipe",))


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_prefill_matches_single(rng, n_micro):
    params = llama.init_weights(CFG, seed=0)
    B, T, S = 4, 8, 64
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)

    want, want_cache = llama.prefill(
        params, CFG, prompt, llama.KVCache.create(CFG, B, S))

    mesh = _mesh(2)
    sp, step = pipeline.make_pp_step(
        CFG, mesh, pipeline.stack_layers(params),
        n_micro=n_micro, decode=False)
    cache = pipeline.shard_cache_pp(llama.KVCache.create(CFG, B, S), mesh)
    got, got_cache = step(sp, prompt, cache)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # caches match too (stacked layer dim == concat of stage shards)
    np.testing.assert_allclose(np.asarray(got_cache.k),
                               np.asarray(want_cache.k), rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_array_equal(np.asarray(got_cache.lengths),
                                  np.asarray(want_cache.lengths))


def test_pp_decode_matches_single(rng):
    params = llama.init_weights(CFG, seed=1)
    B, T, S = 4, 8, 64
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)

    # single-device reference: prefill + 3 decode steps
    cache = llama.KVCache.create(CFG, B, S)
    logits, cache = llama.prefill(params, CFG, prompt, cache)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    want_toks = []
    for _ in range(3):
        want_toks.append(np.asarray(tok))
        logits, cache = llama.decode_step(params, CFG, tok, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

    # pipelined: same prefill + decode steps over 2 stages, 2 microbatches
    mesh = _mesh(2)
    stacked = pipeline.stack_layers(params)
    sp, pre = pipeline.make_pp_step(CFG, mesh, stacked, n_micro=2,
                                    decode=False)
    _, dec = pipeline.make_pp_step(CFG, mesh, stacked, n_micro=2,
                                   decode=True)
    pcache = pipeline.shard_cache_pp(llama.KVCache.create(CFG, B, S), mesh)
    logits, pcache = pre(sp, prompt, pcache)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    got_toks = []
    for _ in range(3):
        got_toks.append(np.asarray(tok))
        logits, pcache = dec(sp, tok[:, None], pcache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

    np.testing.assert_array_equal(np.stack(got_toks), np.stack(want_toks))


def test_pp_moe_compose(rng):
    """pp + ep compose: MoE layers pipeline-staged, experts replicated
    (expert_axis=None inside the stage) — logits match single-device."""
    cfg = dataclasses.replace(PRESETS["moe-debug"], n_layers=4)
    params = moe.init_moe_weights(cfg, seed=2)
    B, T, S = 4, 8, 64
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)

    want, _ = llama.prefill(params, cfg, prompt,
                            llama.KVCache.create(cfg, B, S))
    mesh = _mesh(4)
    sp, step = pipeline.make_pp_step(
        cfg, mesh, pipeline.stack_layers(params), n_micro=2, decode=False)
    cache = pipeline.shard_cache_pp(llama.KVCache.create(cfg, B, S), mesh)
    got, _ = step(sp, prompt, cache)
    # bf16 accumulation-order noise through 4 MoE layers; abs tolerance only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=6e-2)
