"""Samplers: greedy/temperature/top-k/top-p semantics and engine wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.models.sampling import (
    SamplingParams, _mask_top_k, _mask_top_p, sample,
)


def test_greedy_is_argmax(rng):
    logits = jnp.asarray(rng.normal(size=(4, 100)), jnp.float32)
    got = sample(logits, jax.random.PRNGKey(0),
                 SamplingParams(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.argmax(np.asarray(logits), -1))


def test_top_k_masks_correctly(rng):
    logits = jnp.asarray(rng.normal(size=(3, 50)), jnp.float32)
    masked = np.asarray(_mask_top_k(logits, 5))
    assert np.all(np.isfinite(masked).sum(-1) == 5)
    top5 = np.sort(np.asarray(logits), -1)[:, -5:]
    for b in range(3):
        np.testing.assert_allclose(
            np.sort(masked[b][np.isfinite(masked[b])]), top5[b])


def test_top_k_only_samples_top_tokens(rng):
    logits = jnp.asarray(rng.normal(size=(200, 64)), jnp.float32)
    toks = np.asarray(sample(logits, jax.random.PRNGKey(1),
                             SamplingParams(temperature=1.0, top_k=3)))
    top3 = np.argsort(np.asarray(logits), -1)[:, -3:]
    assert all(toks[i] in top3[i] for i in range(200))


def test_top_p_keeps_nucleus(rng):
    # peaked distribution: one token has prob ~0.9 -> top_p=0.5 is greedy
    logits = jnp.zeros((100, 32), jnp.float32)
    logits = logits.at[:, 7].set(10.0)
    toks = np.asarray(sample(logits, jax.random.PRNGKey(2),
                             SamplingParams(temperature=1.0, top_p=0.5)))
    assert np.all(toks == 7)


def test_top_p_mask_mass(rng):
    logits = jnp.asarray(rng.normal(size=(8, 100)) * 3, jnp.float32)
    masked = np.asarray(_mask_top_p(logits, 0.8))
    probs = jax.nn.softmax(jnp.asarray(logits), -1)
    kept_mass = np.where(np.isfinite(masked), np.asarray(probs), 0).sum(-1)
    assert np.all(kept_mass >= 0.8 - 1e-5)          # nucleus covers p
    # minimality: dropping the smallest kept token goes below p
    for b in range(8):
        kept = np.isfinite(masked[b])
        smallest = np.min(np.asarray(logits)[b][kept])
        assert kept_mass[b] - np.asarray(probs)[b][
            np.asarray(logits)[b] == smallest].sum() < 0.8 + 1e-5


def test_temperature_sampling_distribution(rng):
    # two-token logit gap of 1.0 at T=1 -> P(tok0) ~ sigmoid(1) ~ 0.73
    logits = jnp.asarray(np.tile([1.0, 0.0], (4000, 1)), jnp.float32)
    toks = np.asarray(sample(logits, jax.random.PRNGKey(3),
                             SamplingParams(temperature=1.0)))
    frac = (toks == 0).mean()
    assert 0.68 < frac < 0.78


def test_generate_with_sampling_runs(rng):
    cfg = PRESETS["debug"]
    params = llama.init_weights(cfg, seed=0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    toks = llama.generate(params, cfg, prompt, steps=4,
                          sampling=SamplingParams(temperature=0.8, top_k=40,
                                                  top_p=0.95), seed=7)
    assert toks.shape == (2, 4)
    assert np.all((toks >= 0) & (toks < cfg.vocab_size))
    # deterministic given the seed
    toks2 = llama.generate(params, cfg, prompt, steps=4,
                           sampling=SamplingParams(temperature=0.8,
                                                   top_k=40, top_p=0.95),
                           seed=7)
    np.testing.assert_array_equal(toks, toks2)


def test_engine_sampling(rng):
    from ggml_cuda_experiments_tpu.models.engine import Engine

    cfg = PRESETS["debug"]
    params = llama.init_weights(cfg, seed=0)
    eng = Engine(params, cfg, max_batch=2, page_size=16, n_pages=64,
                 max_seq_len=128,
                 sampling=SamplingParams(temperature=0.9, top_k=20), seed=3)
    rid = eng.add_request(list(rng.integers(0, cfg.vocab_size, 5)),
                          max_new_tokens=6)
    done = eng.run_to_completion()
    assert len(done[rid]) == 6
