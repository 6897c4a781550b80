#!/usr/bin/env python
"""Per-matvec-shape roofline probe at production 7B shapes.

Times qmatmul for one (N, K) at several block_n candidates via an
inner-count marginal (time(inner2) - time(inner1)) / (inner2 - inner1),
which cancels dispatch/fetch. Complements exp_q4_r2.py (which fixes
N=8192/32768, K=4096) with the REAL model shapes: wqkv (12288, 4096),
wo (4096, 4096), w_gu (24576, 4096), w_down (4096, 12288).

Usage: python tools/shape_probe.py [--shapes wqkv,wo,wgu,wdown]
       [--bns auto,512,1024,2048,4096]

Signal sizing (round 5): the old defaults (i1=32, i2=128) put only
~5-12 ms of marginal signal against the rig's +-10 ms tunnel jitter —
on a noisy day they read the SAME binary 35% low while bench.py's
interleaved-pair protocol read normal. Defaults now carry >= 150 ms of
marginal signal per CLAUDE.md's protocol rule; treat cross-session
absolute numbers as tenancy-relative regardless (always re-run the
unchanged reference config in-session).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--shapes", default="wqkv,wo,wgu,wdown")
ap.add_argument("--bns", default="auto,512,1024,2048,4096")
ap.add_argument("--i1", type=int, default=128)
ap.add_argument("--i2", type=int, default=2048)
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--preprep", action="store_true")
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.utils.device_info import chip_spec

SHAPES = {"wqkv": (12288, 4096), "wo": (4096, 4096),
          "wgu": (24576, 4096), "wdown": (4096, 12288)}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained(ql, K, inner, bn, preprep=False):
    N = ql.qs.shape[0]

    if preprep:
        # activation prep hoisted OUT of the loop entirely (selectors are
        # loop constants; a 1e-30 perturbation of sc keeps a data
        # dependency so XLA can't hoist the kernel): isolates the prep's
        # share of per-call overhead vs launch + first-tile DMA
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rng0 = np.random.default_rng(1)
        x0 = jnp.asarray(rng0.normal(size=(1, K)).astype(np.float32))
        xp = qm.permute_activations(x0)
        kb = K // 32
        kh = K // 2
        plan = qm.chunk8_plan(N, K, bn)
        bn_, Np, splits = plan["bn"], plan["Np"], plan["splits"]
        segs = qm._n_segs(K)
        kb_sel = 128 if segs > 1 else kb
        xl, xh = xp[0, :kh], xp[0, kh:]
        aq, sa = qm._quant_rows_blockwise(xl - xh / 16.0, kb, segs)
        bq, sb = qm._quant_rows_blockwise(xh / 16.0, kb, segs)
        sel = qm._selector_np(kh if segs == 1 else kh // segs,
                              kb_sel).astype(np.int8)
        if segs > 1:
            sel = np.tile(sel, (segs, 1))
        sel = jnp.asarray(sel)
        ea, eb = aq[:, None] * sel, bq[:, None] * sel
        c = 8.0 * qm._block_sums(xh, kb, segs)
        xs = qm._block_sums(xl + xh, kb, segs)
        sc0 = jnp.stack([c, xs, sa, sb])

        def pad_rows(a):
            return (jnp.pad(a, ((0, Np - a.shape[0]), (0, 0)))
                    if a.shape[0] != Np else a)

        arrays = [pad_rows(a) for a in (ql.qs, ql.es, ql.em)]
        cp = dict(dimension_semantics=("arbitrary",))
        if plan["vmem_limit"]:
            cp["vmem_limit_bytes"] = plan["vmem_limit"]
        import jax.experimental.pallas as _pl

        def raw(sc):
            return pl.pallas_call(
                functools.partial(qm._chunk8_kernel, fmt="q4_k",
                                  n_segs=segs, splits=splits),
                out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
                grid=(Np // bn_,),
                in_specs=[
                    pl.BlockSpec((kh, kb_sel), lambda n: (0, 0)),
                    pl.BlockSpec((kh, kb_sel), lambda n: (0, 0)),
                    pl.BlockSpec((4, kb), lambda n: (0, 0)),
                    pl.BlockSpec((bn_, kh), lambda n: (n, 0)),
                    pl.BlockSpec((bn_, kb), lambda n: (n, 0)),
                    pl.BlockSpec((bn_, kb), lambda n: (n, 0)),
                ],
                out_specs=pl.BlockSpec((1, bn_), lambda n: (0, n)),
                compiler_params=pltpu.CompilerParams(**cp),
            )(ea, eb, sc, *arrays)

        @jax.jit
        def f(x):
            def body(_, x):
                y = raw(sc0 + x[0:1, :kb] * 1e-30)[:, :N]
                if N >= 2 * K:
                    v = y[:, :K] + y[:, K:2 * K]
                elif N >= K:
                    v = y[:, :K]
                else:
                    v = jnp.tile(y, (1, -(-K // N)))[:, :K]
                return (v * 0.03).astype(jnp.float32)
            return jax.lax.fori_loop(0, inner, body, x)
        return f

    def call(x):
        return qm.qmatmul(x, ql, use_vpu=True, x_quant8=True, block_n=bn)

    @jax.jit
    def f(x):
        def body(_, x):
            y = call(x)
            if N >= 2 * K:
                v = y[:, :K] + y[:, K:2 * K]
            elif N >= K:
                v = y[:, :K]
            else:
                v = jnp.tile(y, (1, -(-K // N)))[:, :K]
            return (v * 0.03).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, x)
    return f


def probe(name, N, K, bn, preprep=False):
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(N, K)) / np.sqrt(K)).astype(np.float32)
    ql = jax.device_put(qm.quantize(w, "q4_k"))
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    ts = {}
    for inner in (args.i1, args.i2):
        f = chained(ql, K, inner, bn, preprep=preprep)
        np.asarray(f(x0))
        ts[inner] = min(_t(f, x0) for _ in range(args.reps))
    per = (ts[args.i2] - ts[args.i1]) / (args.i2 - args.i1)
    gbs = ql.nbytes / per / 1e9
    pct = 100 * gbs / (chip_spec().hbm_bytes_per_s / 1e9)
    plan = qm.chunk8_plan(N, K, bn)
    log(f"{name:6s}{' [preprep]' if preprep else '':10s} N={N:6d} "
        f"K={K:6d} bn={plan['bn']:5d} "
        f"grid={plan['grid']:2d} splits={len(plan['splits'])}x: "
        f"{per*1e6:7.1f} us/iter {gbs:6.1f} GB/s ({pct:5.1f}%)")
    return pct


def _t(f, x0):
    t0 = time.perf_counter()
    np.asarray(f(x0))
    return time.perf_counter() - t0


def main():
    for s in args.shapes.split(","):
        N, K = SHAPES[s]
        for bs in args.bns.split(","):
            bn = None if bs == "auto" else int(bs)
            if bn and bn > N:
                continue
            try:
                probe(s, N, K, bn, preprep=args.preprep)
            except Exception as e:
                log(f"{s} bn={bs}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
