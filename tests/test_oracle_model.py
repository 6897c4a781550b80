"""Full-model CPU oracle vs the engine: logits and perplexity parity.

BASELINE.md accuracy gate — the engine's quantized forward must match the
pure-NumPy llama.cpp-style reference at the same bit-width.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.oracle import model as om

CFG = PRESETS["debug"]


def test_oracle_forward_f32_matches_engine(rng):
    params = llama.init_weights(CFG, seed=0, dtype=jnp.float32)
    tokens = rng.integers(0, CFG.vocab_size, (2, 12)).astype(np.int32)
    cache = llama.KVCache.create(CFG, 2, 64, dtype=jnp.float32)
    got, _ = llama.prefill(params, CFG, jnp.asarray(tokens), cache,
                           all_logits=True)
    np_params = {k: (np.asarray(v, np.float32) if k != "layers" else
                     [{kk: np.asarray(vv, np.float32) for kk, vv in
                       l.items()} for l in v]) for k, v in params.items()}
    want = om.forward_logits(np_params, CFG, tokens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_k"])
def test_quantized_ppl_matches_oracle(rng, fmt):
    params = llama.init_weights(CFG, seed=1, as_numpy=True)
    qparams = llama.quantize_params(params, fmt)
    tokens = rng.integers(0, CFG.vocab_size, (1, 32)).astype(np.int32)

    cache = llama.KVCache.create(CFG, 1, 64)
    got, _ = llama.prefill(qparams, CFG, jnp.asarray(tokens), cache,
                           all_logits=True)
    got = np.asarray(got, np.float32)
    want = om.forward_logits(qparams, CFG, tokens)

    ppl_dev = om.perplexity(got, tokens)
    ppl_ref = om.perplexity(want, tokens)
    # same bit-width on both sides: only bf16 accumulation drift remains
    assert abs(ppl_dev - ppl_ref) / ppl_ref < 0.02, (ppl_dev, ppl_ref)
    assert np.abs(got - want).max() < 0.35


def test_perplexity_math():
    # uniform logits over V tokens -> PPL == V
    V = 64
    logits = np.zeros((1, 10, V), np.float32)
    tokens = np.arange(10, dtype=np.int64)[None] % V
    assert om.perplexity(logits, tokens) == pytest.approx(V, rel=1e-5)
    # delta distribution on the correct token -> PPL -> 1
    logits2 = np.full((1, 10, V), -100.0, np.float32)
    for t in range(10):
        logits2[0, t, (t + 1) % V] = 100.0
    tokens2 = (np.arange(10, dtype=np.int64)[None] + 0) % V
    # targets are tokens[1:] = 1..9 -> predicted exactly
    assert om.perplexity(logits2, np.arange(10)[None] % V) == \
        pytest.approx(1.0, abs=1e-5)
