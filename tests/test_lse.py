"""Property tests for the associative (O, M, S) LSE combine.

The merge appears at four scopes in the reference (SURVEY.md §2.3 item 3);
here its algebra is verified once: associativity, commutativity, identity,
and agreement with a straight softmax — so every tiling/splitting of KV
blocks is provably equivalent.
"""

import numpy as np
import jax.numpy as jnp

from ggml_cuda_experiments_tpu.ops.lse import (
    AttnPartial, lse_combine, lse_combine_stacked, lse_finalize, lse_identity,
)
from ggml_cuda_experiments_tpu.oracle.attention import softmax_ref
from ggml_cuda_experiments_tpu.utils.harness import assert_close


def _partial_from_chunk(scores: np.ndarray, v: np.ndarray) -> AttnPartial:
    """Build a partial (o, m, s) from a chunk of logits+values, fp32."""
    m = np.max(scores, axis=-1, keepdims=True)
    p = np.exp(scores - m)
    s = np.sum(p, axis=-1, keepdims=True)
    o = p @ v
    return AttnPartial(jnp.asarray(o), jnp.asarray(m), jnp.asarray(s))


def _rand_partial(rng, rows=4, d=8, kv=16):
    scores = rng.normal(size=(rows, kv)).astype(np.float32)
    v = rng.normal(size=(kv, d)).astype(np.float32)
    return _partial_from_chunk(scores, v)


def test_associativity(rng):
    a, b, c = (_rand_partial(rng) for _ in range(3))
    left = lse_combine(lse_combine(a, b), c)
    right = lse_combine(a, lse_combine(b, c))
    for lf, rf in zip(left, right):
        assert_close(lf, rf, atol=1e-5, rtol=1e-5, name="associativity")


def test_commutativity(rng):
    a, b = _rand_partial(rng), _rand_partial(rng)
    ab, ba = lse_combine(a, b), lse_combine(b, a)
    for x, y in zip(ab, ba):
        assert_close(x, y, atol=1e-6, rtol=1e-6, name="commutativity")


def test_identity(rng):
    a = _rand_partial(rng)
    ident = lse_identity(a.o.shape)
    out = lse_combine(a, ident)
    for x, y in zip(out, a):
        assert_close(x, y, atol=1e-6, rtol=1e-6, name="identity")


def test_split_equals_full_softmax(rng):
    """Splitting KV into blocks + combine == full softmax attention."""
    rows, kv, d, nblocks = 4, 64, 16, 4
    scores = rng.normal(size=(rows, kv)).astype(np.float32) * 3.0
    v = rng.normal(size=(kv, d)).astype(np.float32)

    want = softmax_ref(scores) @ v

    bs = kv // nblocks
    parts = [
        _partial_from_chunk(scores[:, i * bs:(i + 1) * bs], v[i * bs:(i + 1) * bs])
        for i in range(nblocks)
    ]
    acc = parts[0]
    for p in parts[1:]:
        acc = lse_combine(acc, p)
    got = lse_finalize(acc)
    assert_close(got, want, atol=1e-5, rtol=1e-5, name="split-kv merge")

    stacked = AttnPartial(*(jnp.stack(f) for f in zip(*parts)))
    got2 = lse_finalize(lse_combine_stacked(stacked))
    assert_close(got2, want, atol=1e-5, rtol=1e-5, name="stacked merge")


def test_masked_block_is_identity(rng):
    """An all-masked (-inf scores) block must not perturb the result."""
    a = _rand_partial(rng)
    rows, d = a.o.shape
    masked = AttnPartial(
        jnp.zeros((rows, d)), jnp.full((rows, 1), -jnp.inf), jnp.zeros((rows, 1))
    )
    out = lse_combine(a, masked)
    for x, y in zip(out, a):
        assert_close(x, y, atol=1e-6, rtol=1e-6, name="masked block")
    out_finalized = lse_finalize(lse_combine(masked, masked))
    assert np.all(np.isfinite(np.asarray(out_finalized)))
