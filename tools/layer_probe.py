#!/usr/bin/env python
"""Bisect the whole-layer kernel's cost (ops/layer_kernel.py).

The first TPU ladder measured the layer kernel at 46.2 tok/s vs 109.9 for
the two-megakernel path (+390 us/layer) — this probe times ONE layer's
kernel directly, chained (h fed back), with layer_step's static ``phase``
kwarg isolating phases:

  all       production
  no_bound  skip rope / W_o-boundary / mid-boundary selector builds
  no_attn   skip the flash fori-loop body as well
  stream    skip ALL compute (windows + explicit DMA only)
  only_pack / only_down
            the packed matvec stream (resp. the w_down phase) computes,
            everything else streamed — (only_X - stream) isolates that
            side's non-overlapped compute
  mega2     REFERENCE: attention_fused + mlp_fused chained in the same
            process (the path the layer kernel must beat)

Chained-marginal protocol (two chain lengths); the known ladder numbers
(~660 us/layer fused-layer vs ~285 us/layer mega2) sanity-check the
absolute scale — if "all" here disagrees wildly, distrust the probe.

Usage: python tools/layer_probe.py [--i1 32] [--i2 128] [--reps 3]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import layer_kernel as lk
from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.ops.fused_attention import attention_fused

DIM, HQ, HKV, D, KD, S = 4096, 32, 32, 128, 12288, 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i1", type=int, default=32)
    ap.add_argument("--i2", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="all,no_bound,no_attn,stream,mega2,all")
    ap.add_argument("--tile-cap", type=int, default=None,
                    help="layer_step tile_cap override (VMEM-pressure probe)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    import dataclasses
    perm = np.asarray(qm._perm(DIM))

    def prow(w):
        return dataclasses.replace(
            w, **{f: getattr(w, f)[perm] for f in qm._fields(w)})

    print("quantizing one 7B layer...", file=sys.stderr, flush=True)
    wqkv = qm.quantize(
        (rng.normal(size=(3 * DIM, DIM)) / 64).astype(np.float32), "q4_k")
    wo = prow(qm.quantize(
        (rng.normal(size=(DIM, DIM)) / 64).astype(np.float32), "q4_k",
        layout="wof"))
    guf = qm.quantize(qm.reorder_gu_rows(
        (rng.normal(size=(KD, DIM)) / 64).astype(np.float32),
        (rng.normal(size=(KD, DIM)) / 64).astype(np.float32)), "q4_k")
    down = prow(qm.quantize(
        (rng.normal(size=(DIM, KD)) / 64).astype(np.float32), "q4_k"))
    w_pack = lk.pack_stream(wqkv, wo, guf)
    wqkv, wo, guf, down, w_pack = jax.device_put(
        (wqkv, wo, guf, down, w_pack))
    anorm = jnp.ones((DIM,), jnp.float32)
    mnorm = jnp.ones((DIM,), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(1, 1, HKV, S, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(1, 1, HKV, S, D)), jnp.bfloat16)
    lens = jnp.asarray([57], jnp.int32)
    h0 = jnp.asarray(rng.normal(size=(1, DIM)).astype(np.float32))

    def chain_layer(inner, phase="all"):
        @jax.jit
        def f(h):
            def body(_, h):
                hn, kn, vn = lk.layer_step(
                    h, w_pack, down, anorm, mnorm, kc, vc, lens, 0,
                    n_heads=HQ, n_kv_heads=HKV, head_dim=D, phase=phase,
                    tile_cap=args.tile_cap)
                hn = jnp.where(jnp.isfinite(hn), hn, 0.0)
                return (hn * 1e-3 + h0 + 1e-6 * jnp.sum(kn)
                        .astype(jnp.float32))
            return jax.lax.fori_loop(0, inner, body, h)
        return f

    def chain_mega2(inner):
        @jax.jit
        def f(h):
            def body(_, h):
                var = jnp.mean(h * h, axis=-1, keepdims=True)
                x = h * jax.lax.rsqrt(var + 1e-5)
                o, kn, vn = attention_fused(
                    x, wqkv, wo, kc, vc, lens, 0,
                    n_heads=HQ, n_kv_heads=HKV, head_dim=D,
                    x_prepermuted=True)
                h2 = h + o
                var2 = jnp.mean(h2 * h2, axis=-1, keepdims=True)
                x2 = h2 * jax.lax.rsqrt(var2 + 1e-5)
                om = qm.mlp_fused(x2, guf, down)
                hn = h2 + om
                hn = jnp.where(jnp.isfinite(hn), hn, 0.0)
                return (hn * 1e-3 + h0 + 1e-6 * jnp.sum(kn)
                        .astype(jnp.float32))
            return jax.lax.fori_loop(0, inner, body, h)
        return f

    def marginal(mk):
        fa, fb = mk(args.i1), mk(args.i2)
        np.asarray(fa(h0)), np.asarray(fb(h0))

        def t(f):
            t0 = time.perf_counter()
            np.asarray(f(h0))
            return time.perf_counter() - t0
        ts = min(t(fa) for _ in range(args.reps))
        tb = min(t(fb) for _ in range(args.reps))
        return (tb - ts) / (args.i2 - args.i1)

    for v in args.variants.split(","):
        if v == "mega2":
            us = marginal(chain_mega2) * 1e6
        else:
            us = marginal(lambda i, v=v: chain_layer(i, phase=v)) * 1e6
        print(f"{v:9s}: {us:7.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
