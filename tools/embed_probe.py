#!/usr/bin/env python
"""Isolate the prefill embed-gather cost (suspect for the 33.7 ms
non-layer prefill tail, tools/prefill_marginal.py round 4).

Times, chained-marginal on-chip:
  gather    h = embed[toks]                       (XLA gather)
  take      jnp.take(embed, toks, axis=0)
  onehot    one-hot bf16 matmul on the MXU
  dus       per-128-token-chunk dynamic-slice loop (lax.map analog)

Usage: python tools/embed_probe.py [--seq 512]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--dim", type=int, default=4096)
    args = ap.parse_args()
    T, V, D = args.seq, args.vocab, args.dim

    rng = np.random.default_rng(0)
    emb = jax.device_put(jnp.asarray(
        rng.normal(size=(V, D)).astype(np.float32), jnp.bfloat16))
    toks0 = jnp.asarray(rng.integers(0, V, (1, T)), jnp.int32)
    jax.block_until_ready(emb)

    def variants():
        def gather(toks):
            return emb[toks]

        def take(toks):
            return jnp.take(emb, toks[0], axis=0)[None]

        def onehot(toks):
            oh = jax.nn.one_hot(toks[0], V, dtype=jnp.bfloat16)
            return jax.lax.dot_general(
                oh, emb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)[None]

        def dus(toks):
            def one(t):
                return jax.lax.dynamic_slice(emb, (t, 0), (1, D))[0]
            return jax.vmap(one)(toks[0])[None]

        return [("gather", gather), ("take", take), ("onehot", onehot),
                ("dus", dus)]

    for name, fn in variants():
        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(toks, n, fn=fn):
            def body(_, carry):
                toks, acc = carry
                h = fn(toks)
                s = jnp.sum(h[:, :, 0].astype(jnp.float32))
                toks = (toks + 1 + s.astype(jnp.int32) % 3) % V
                return toks, acc + s
            return jax.lax.fori_loop(0, n, body, (toks, 0.0))[1]

        def run(n):
            t0 = time.perf_counter()
            np.asarray(chain(toks0, n))
            return time.perf_counter() - t0
        try:
            run(4), run(32)
            ts = min(run(4) for _ in range(2))
            tb = min(run(32) for _ in range(2))
            us = (tb - ts) / 28 * 1e6
            print(f"{name:7s}: {us:9.1f} us per [{T}]-token lookup "
                  f"({us/T:7.3f} us/row)", flush=True)
        except Exception as e:
            print(f"{name:7s}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
