"""MoE block: routing math, oracle parity, expert parallelism, e2e decode.

The reference has no MoE; this covers the ``ep`` axis of the driver's
parallelism contract. Oracle pattern per SURVEY §4: NumPy reference with
hard tolerance asserts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama, moe
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.parallel.mesh import make_mesh

CFG = PRESETS["moe-debug"]


def test_router_topk(rng):
    logits = jnp.asarray(rng.normal(size=(3, 5, CFG.n_experts)), jnp.float32)
    w = np.asarray(moe.router_topk(logits, 2))
    # exactly k nonzeros, summing to 1
    assert np.all((w > 0).sum(-1) == 2)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)
    # the nonzeros are the argmax-2 of the logits
    top2 = np.argsort(np.asarray(logits), -1)[..., -2:]
    picked = np.sort(np.argsort(w, -1)[..., -2:], -1)
    np.testing.assert_array_equal(np.sort(top2, -1), picked)


def test_moe_mlp_matches_oracle(rng):
    params = moe.init_moe_weights(CFG, seed=3, dtype=jnp.float32)
    layer = params["layers"][0]
    x = jnp.asarray(rng.normal(size=(2, 4, CFG.dim)).astype(np.float32))
    got = np.asarray(moe.moe_mlp(layer, CFG, x))
    want = moe.moe_mlp_oracle(layer, CFG, np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_expert_parallel_matches_single(rng):
    """Experts sharded over a 4-way ``expert`` axis == unsharded compute."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    params = moe.init_moe_weights(CFG, seed=5, dtype=jnp.float32)
    layer = params["layers"][0]
    x = jnp.asarray(rng.normal(size=(2, 4, CFG.dim)).astype(np.float32))
    want = np.asarray(moe.moe_mlp(layer, CFG, x))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("expert",))
    especs = {k: (P("expert", None, None) if k in
                  ("w_gate", "w_up", "w_down") else P(None, None))
              for k in ("router", "w_gate", "w_up", "w_down")}
    elayer = {k: jax.device_put(layer[k], NamedSharding(mesh, especs[k]))
              for k in especs}

    f = shard_map(
        lambda lyr, x: moe.moe_mlp(lyr, CFG, x, expert_axis="expert"),
        mesh=mesh, in_specs=(especs, P()), out_specs=P(),
        check_vma=False)
    got = np.asarray(jax.jit(f)(elayer, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_decode_e2e(rng):
    """Full MoE model: prefill + a few decode steps produce finite logits
    and agree between generate (host loop) and generate_scan (jitted)."""
    cfg = dataclasses.replace(CFG, n_layers=2)
    params = moe.init_moe_weights(cfg, seed=7)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)

    toks = llama.generate(params, cfg, prompt, steps=4)
    cache = llama.KVCache.create(cfg, 2, 64)
    toks_scan = np.asarray(
        llama.generate_scan(params, cfg, prompt, cache, 4))
    np.testing.assert_array_equal(toks, toks_scan)
