"""Checkpoint container + sharded loading round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.utils import loader
from ggml_cuda_experiments_tpu.utils.harness import assert_close

CFG = PRESETS["debug"]


def test_container_roundtrip(tmp_path, rng):
    import ml_dtypes
    tensors = {
        "a": rng.normal(size=(4, 8)).astype(np.float32),
        "b.c": (rng.normal(size=(16,)) * 5).astype(ml_dtypes.bfloat16),
        "d": rng.integers(-100, 100, size=(3, 3)).astype(np.int8),
        "u": rng.integers(0, 255, size=(7,)).astype(np.uint8),
    }
    p = tmp_path / "ckpt.gctc"
    loader.save_container(p, tensors)
    back = loader.load_container(p)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype
        assert np.array_equal(np.asarray(back[k]), tensors[k]), k


def test_params_roundtrip_quantized(tmp_path, rng):
    params = llama.init_weights(CFG, seed=2)
    qparams = llama.quantize_params(params, "q4_k")
    p = tmp_path / "model.gctc"
    loader.save_params(p, qparams)
    back = loader.load_params(p)

    # logits must be identical
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    c1 = llama.KVCache.create(CFG, 1, 256)
    c2 = llama.KVCache.create(CFG, 1, 256)
    l1, _ = llama.prefill(qparams, CFG, toks, c1)
    l2, _ = llama.prefill(back, CFG, toks, c2)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))


def test_params_load_sharded(tmp_path, rng):
    from ggml_cuda_experiments_tpu.parallel.mesh import make_mesh
    params = llama.init_weights(CFG, seed=2)
    p = tmp_path / "dense.gctc"
    loader.save_params(p, params)
    mesh = make_mesh(model=2, data=1)
    sharded = loader.load_params(p, mesh=mesh)
    wq = sharded["layers"][0]["wq"]
    # sharded over 'model' on dim 0
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(wq.shape[0] // 2, wq.shape[1])}
    # and numerically intact
    assert_close(np.asarray(wq), np.asarray(params["layers"][0]["wq"],
                                            np.float32),
                 atol=0, rtol=0, name="sharded wq")
