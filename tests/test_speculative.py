"""Speculative decoding + chunked verify/prefill.

The load-bearing property: greedy speculative decoding is LOSSLESS — its
output is bit-identical to plain greedy decoding of the target model, for
any draft model (good, bad, or identical) and any gamma.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama, speculative as spec
from ggml_cuda_experiments_tpu.models.config import PRESETS

CFG = PRESETS["debug"]


@pytest.fixture(scope="module")
def tparams():
    return llama.init_weights(CFG, seed=0)


@pytest.fixture(scope="module")
def tparams32():
    # f32 weights for the exact-equality tests: the verify pass (flash
    # attention over the cache) and stepwise decode (flash decode) are
    # different kernels, so bf16 accumulation flips near-tied argmaxes on
    # random models; in f32 both agree to ~1e-6 and greedy speculative
    # decoding is exactly lossless
    return llama.init_weights(CFG, seed=0, dtype=jnp.float32)


def test_chunk_step_matches_prefill(tparams, rng):
    """One chunk_step over an empty cache == prefill (all logits)."""
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)), jnp.int32)
    c1 = llama.KVCache.create(CFG, 2, 64)
    c2 = llama.KVCache.create(CFG, 2, 64)
    want, c1 = llama.prefill(tparams, CFG, toks, c1, all_logits=True)
    got, c2 = spec.chunk_step(tparams, CFG, toks, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(c1.lengths),
                                  np.asarray(c2.lengths))
    np.testing.assert_allclose(np.asarray(c1.k), np.asarray(c2.k),
                               rtol=2e-2, atol=2e-2)


def test_chunked_prefill_matches_whole(tparams, rng):
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)), jnp.int32)
    want, _ = llama.prefill(tparams, CFG, toks,
                            llama.KVCache.create(CFG, 1, 64))
    got, cache = spec.prefill_chunked(tparams, CFG, toks,
                                      llama.KVCache.create(CFG, 1, 64),
                                      chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert int(np.asarray(cache.lengths)[0]) == 16
    # decoding continues correctly from the chunk-built cache
    tok = jnp.argmax(got, -1).astype(jnp.int32)
    logits, _ = llama.decode_step(tparams, CFG, tok, cache)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_chunk_step_after_prefix(tparams, rng):
    """chunk_step over a non-empty cache == decoding those tokens one by
    one (same greedy choices)."""
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    extra = [int(t) for t in rng.integers(0, CFG.vocab_size, 3)]

    # reference: stepwise decode of the extra tokens
    c1 = llama.KVCache.create(CFG, 1, 64)
    logits, c1 = llama.prefill(tparams, CFG, prompt, c1)
    want = []
    for t in extra:
        logits, c1 = llama.decode_step(tparams, CFG,
                                       jnp.asarray([t], jnp.int32), c1)
        want.append(np.asarray(logits)[0])

    # chunked: one window
    c2 = llama.KVCache.create(CFG, 1, 64)
    _, c2 = llama.prefill(tparams, CFG, prompt, c2)
    got, c2 = spec.chunk_step(tparams, CFG,
                              jnp.asarray([extra], jnp.int32), c2)
    got = np.asarray(got)[0]
    for i in range(3):
        np.testing.assert_allclose(got[i], want[i], rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("draft_kind,gamma", [
    ("same", 3), ("different", 4), ("different", 1), ("tiny", 2),
])
def test_speculative_equals_greedy(tparams32, rng, draft_kind, gamma):
    if draft_kind == "same":
        dparams, dcfg = tparams32, CFG
    elif draft_kind == "different":
        dparams, dcfg = llama.init_weights(CFG, seed=99,
                                           dtype=jnp.float32), CFG
    else:                                  # a structurally smaller draft
        dcfg = dataclasses.replace(CFG, n_layers=1)
        dparams = llama.init_weights(dcfg, seed=7, dtype=jnp.float32)

    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    steps = 12
    want = llama.generate(
        tparams32, CFG, prompt, steps,
        cache=llama.KVCache.create(CFG, 1, 256, jnp.float32))
    got, stats = spec.speculative_generate(
        tparams32, CFG, dparams, dcfg, prompt, steps, gamma=gamma,
        cache_dtype=jnp.float32)
    np.testing.assert_array_equal(got, want, err_msg=str(stats))
    assert stats["verify_calls"] >= 1
    if draft_kind == "same":
        # an identical draft must be accepted (nearly) always
        assert stats["accepted"] >= 0.9 * stats["drafted"], stats


def test_speculative_bf16_smoke(tparams, rng):
    """bf16 end-to-end: right shape, valid tokens, sane acceptance."""
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    got, stats = spec.speculative_generate(
        tparams, CFG, tparams, CFG, prompt, 10, gamma=4)
    assert got.shape == (1, 10)
    assert np.all((got >= 0) & (got < CFG.vocab_size))
    assert stats["accepted"] >= 0.5 * stats["drafted"], stats


@pytest.mark.parametrize("draft_kind,gamma", [
    ("same", 3), ("different", 4), ("smaller", 2)])
def test_speculative_scan_equals_greedy(tparams32, rng, draft_kind, gamma):
    """The fully-on-device window scan (speculative_scan) emits exactly
    the greedy target stream, like the host loop — zero host syncs."""
    if draft_kind == "same":
        dparams, dcfg = tparams32, CFG
    elif draft_kind == "different":
        dparams, dcfg = llama.init_weights(CFG, seed=99,
                                           dtype=jnp.float32), CFG
    else:
        dcfg = dataclasses.replace(CFG, n_layers=1, name="draft")
        dparams = llama.init_weights(dcfg, seed=7, dtype=jnp.float32)

    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    steps, windows = 18, 8
    want = llama.generate(tparams32, CFG, prompt, steps=steps)[0].tolist()

    max_len = 256
    tcache = llama.KVCache.create(CFG, 1, max_len, jnp.float32)
    dcache = llama.KVCache.create(dcfg, 1, max_len, jnp.float32)
    tlogits, tcache = llama.prefill(tparams32, CFG, prompt, tcache)
    _, dcache = llama.prefill(dparams, dcfg, prompt, dcache)
    cur = jnp.argmax(tlogits, -1).astype(jnp.int32)

    toks, counts, _, _, _ = spec.speculative_scan(
        tparams32, CFG, dparams, dcfg, cur, tcache, dcache,
        gamma=gamma, windows=windows)
    toks, counts = np.asarray(toks), np.asarray(counts)
    stream = [int(np.asarray(cur)[0])]
    for w in range(windows):
        stream.extend(toks[w, :counts[w]].tolist())
    # a window emits 1..gamma+1 tokens, so the stream is a prefix of (or
    # covers) the greedy target stream; compare the overlap exactly
    n = min(len(stream), steps)
    assert n >= windows + 1
    assert stream[:n] == want[:n], (draft_kind, stream[:n], want[:n])
    if draft_kind == "same":
        assert counts.min() == gamma + 1      # identical draft: all accepted
