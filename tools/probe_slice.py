#!/usr/bin/env python
"""Probe: does feeding flash_decode a per-layer slice of the full KV cache
cost an HBM copy per layer?

Compares three jitted loops, L=32 iterations each, marginal-timed:
  a) flash_decode(k[li], v[li]) — fresh layer slice each iter (model path)
  b) flash_decode(k0, v0)       — same pre-sliced layer every iter
  c) slice-only                 — k[li] consumed by a 1-element read

If XLA materializes the slice for the custom call, (a) - (b) ≈ 2 * 8 MB /
819 GB/s ≈ 20 us per layer at S=1024 bf16 Hkv=32 D=128.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops.flash_decode import flash_decode

L, B, Hq, Hkv, S, D = 32, 1, 32, 32, 1024, 128


def marginal(fn, x, n_small=4, n_big=16, reps=3):
    fs = jax.jit(fn, static_argnames="iters")
    np.asarray(fs(x, iters=n_small))
    np.asarray(fs(x, iters=n_big))
    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fs(x, iters=n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(n_big) - t(n_small)) / (n_big - n_small)


def main():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
    lengths = jnp.full((B,), 57, jnp.int32)   # short ctx like the bench
    k0, v0 = k[0], v[0]

    def loop_sliced(x, iters):
        h = x
        for li in range(L):
            o = flash_decode(h, k[li], v[li], lengths)
            h = (h + o * 1e-6).astype(h.dtype)
        return h if iters else None

    def run(fn, label, iters_pair=(1, 3)):
        # chain L-layer bodies `iters` times
        def outer(x, iters):
            h = x
            for _ in range(iters):
                h = fn(h)
            return h
        sec = marginal(outer, q, n_small=iters_pair[0], n_big=iters_pair[1])
        print(f"{label:28s}: {sec/L*1e6:7.2f} us/layer "
              f"({sec*1e3:.3f} ms per {L}-layer pass)")
        return sec / L

    def body_sliced(h):
        for li in range(L):
            o = flash_decode(h, k[li], v[li], lengths)
            h = (h + o * 1e-6).astype(h.dtype)
        return h

    def body_fixed(h):
        for _ in range(L):
            o = flash_decode(h, k0, v0, lengths)
            h = (h + o * 1e-6).astype(h.dtype)
        return h

    def body_slice_only(h):
        acc = h
        for li in range(L):
            acc = (acc + k[li, 0, :Hq, 0, :] * 1e-6).astype(acc.dtype)
        return acc

    a = run(body_sliced, "flash_decode on k[li]")
    b = run(body_fixed, "flash_decode on fixed k0")
    c = run(body_slice_only, "slice-only consume")
    print(f"slice overhead inside decode: {(a-b)*1e6:6.2f} us/layer")
    print(f"expected if full-slice copy : "
          f"{2 * B * Hkv * S * D * 2 / 819e9 * 1e6:6.2f} us/layer")


if __name__ == "__main__":
    main()
