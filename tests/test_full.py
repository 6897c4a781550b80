"""The combined 5-axis (data/pipe/seq/model/expert) step vs single device.

The driver-contract configuration: one shard_map program composing tensor,
pipeline, sequence/context, expert, and data parallelism, on the virtual
8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama, moe
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.parallel import full

CFG = dataclasses.replace(PRESETS["moe-debug"], n_layers=2)


def test_make_full_mesh_factorization():
    mesh = full.make_full_mesh(8)
    assert dict(mesh.shape) == dict(data=1, pipe=2, seq=2, model=2,
                                    expert=1)
    assert tuple(mesh.axis_names) == full.AXES


@pytest.mark.parametrize("sizes", [
    dict(data=1, pipe=2, seq=2, model=2, expert=1),
    dict(data=2, pipe=1, seq=1, model=2, expert=2),
    dict(data=1, pipe=2, seq=1, model=2, expert=2),
])
def test_full_step_matches_single(rng, sizes):
    mesh = full.make_full_mesh(8, sizes)
    params = moe.init_moe_weights(CFG, seed=0, dtype=jnp.float32)
    B, T, S = 4, 8, 64
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)

    # single-device reference: prefill + 2 greedy decode steps
    cache = llama.KVCache.create(CFG, B, S, dtype=jnp.float32)
    logits, cache = llama.prefill(params, CFG, prompt, cache)
    want = [np.asarray(logits)]
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(2):
        logits, cache = llama.decode_step(params, CFG, tok, cache)
        want.append(np.asarray(logits))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

    sparams, pspecs = full.shard_full_params(params, mesh, CFG)
    pre = full.make_full_step(CFG, mesh, pspecs, n_micro=2, prefill_len=T,
                              decode=False)
    dec = full.make_full_step(CFG, mesh, pspecs, n_micro=2, prefill_len=T,
                              decode=True)
    fcache = full.create_full_cache(CFG, mesh, B, S, dtype=jnp.float32)
    logits, fcache = pre(sparams, prompt, fcache)
    got = [np.asarray(logits)]
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(2):
        logits, fcache = dec(sparams, tok, fcache)
        got.append(np.asarray(logits))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

    for step, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            g, w, rtol=2e-4, atol=2e-4,
            err_msg=f"step {step} sizes={sizes}")
