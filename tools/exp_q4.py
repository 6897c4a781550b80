#!/usr/bin/env python
"""Experimental Q4_K matvec kernel variants (dev tool).

Variants over the same logical op y = x @ dequant(W)^T, B=1, q4_k:
  floor   minimal-compute streaming of the same byte volume -> DMA ceiling
  chunk   XOR-8 signed packing + algebraic unpack (t = lo*a + p*b) +
          lane-chunk block reduction + post-reduction scaling
  chunk32 same but unpack via int32 widen (isolate int8-& support/cost)

Usage: python tools/exp_q4.py [--cpu] [--check] [--bn 512]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--check", action="store_true")
ap.add_argument("--bn", type=int, default=512)
ap.add_argument("--variants", default="floor,chunk,chunk32")
ap.add_argument("--nmarg", action="store_true")
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.oracle import quant as quant_ref

K = 4096
N = 32768
N_SMALL = 8192
QK = 32
Kb = K // QK          # 128
KH = K // 2
S16 = KH // Kb        # 16 chunks


def ql_slice(ql, n):
    import dataclasses
    return dataclasses.replace(
        ql, shape=(n, ql.shape[1]),
        qs=ql.qs[:n], d=None if ql.d is None else ql.d[:n],
        es=None if ql.es is None else ql.es[:n],
        em=None if ql.em is None else ql.em[:n])


def pack_xor8(ql: qm.QuantLinear) -> jax.Array:
    """Repack qs [N, K/2] u8 (lo | hi<<4) as int8 with hi^8 so that
    int8(p) = lo + 16*hi - 128 exactly."""
    qs = np.asarray(ql.qs)
    return jnp.asarray((qs ^ 0x80).view(np.int8))


def _chunk_kernel(a_ref, b_ref, sc_ref, qs_ref, es_ref, em_ref, o_ref, *,
                  int8_ops: bool):
    p = qs_ref[...]
    if int8_ops:
        lo = (p & 0x0F).astype(jnp.float32)
        pf = p.astype(jnp.float32)
    else:
        p32 = p.astype(jnp.int32)
        lo = (p32 & 0x0F).astype(jnp.float32)
        pf = p32.astype(jnp.float32)
    t = lo * a_ref[...] + pf * b_ref[...]          # [bn, K/2]
    z = t[:, 0:Kb]
    for s in range(1, S16):
        z = z + t[:, s * Kb:(s + 1) * Kb]          # aligned 128-lane chunks
    es = es_ref[...].astype(jnp.float32)
    em = em_ref[...].astype(jnp.float32)
    # sc holds rows [c_b ; xs_b]: the pack-bias and min-term corrections
    y = es * (z + sc_ref[0:1]) - em * sc_ref[1:2]  # [bn, Kb]
    o_ref[...] = jnp.sum(y, axis=1)[None, :]


def _probe_kernel(a_ref, b_ref, sc_ref, qs_ref, es_ref, em_ref, o_ref, *,
                  mode: str):
    """Stripped variants to cost individual stages (NOT correct matvecs)."""
    p = qs_ref[...]
    if mode == "ponly":          # cast + mul + chunk (no unpack of lo)
        t = p.astype(jnp.float32) * b_ref[...]
    elif mode == "loonly":       # & + cast + mul + chunk
        t = (p & 0x0F).astype(jnp.float32) * a_ref[...]
    elif mode == "nochunk":      # full dequant+mul, lane-sum instead of chunks
        lo = (p & 0x0F).astype(jnp.float32)
        t = lo * a_ref[...] + p.astype(jnp.float32) * b_ref[...]
        o_ref[...] = jnp.sum(t, axis=1)[None, :]
        return
    elif mode == "floorhi":      # arithmetic hi-nibble: no mask, one cast
        pf = p.astype(jnp.float32)
        hi = jnp.floor(pf * 0.0625 + 8.0)
        t = pf * a_ref[...] + hi * b_ref[...]
    elif mode == "bf16":         # full compute in bf16
        lo = (p & 0x0F).astype(jnp.bfloat16)
        t = (lo * a_ref[...].astype(jnp.bfloat16)
             + p.astype(jnp.bfloat16) * b_ref[...].astype(jnp.bfloat16))
    else:
        raise ValueError(mode)
    z = t[:, 0:Kb].astype(jnp.float32)
    for s in range(1, S16):
        z = z + t[:, s * Kb:(s + 1) * Kb].astype(jnp.float32)
    es = es_ref[...].astype(jnp.float32)
    em = em_ref[...].astype(jnp.float32)
    y = es * (z + sc_ref[0:1]) - em * sc_ref[1:2]
    o_ref[...] = jnp.sum(y, axis=1)[None, :]


def make_probe(ql: qm.QuantLinear, bn: int, mode: str, n_rows: int = N):
    qs8 = pack_xor8(ql)
    es, em = ql.es, ql.em

    @jax.jit
    def f(xp):
        xl, xh = xp[0, :KH], xp[0, KH:]
        if mode == "floorhi":
            a = xl[None, :]
            b = (xh - 16.0 * xl)[None, :]
            c = 128.0 * xl.reshape(S16, Kb).sum(0)
        else:
            a = (xl - xh / 16.0)[None, :]
            b = (xh / 16.0)[None, :]
            c = 8.0 * xh.reshape(S16, Kb).sum(0)
        xs = (xl + xh).reshape(S16, Kb).sum(0)
        sc = jnp.stack([c, xs])
        return pl.pallas_call(
            functools.partial(_probe_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((1, n_rows), jnp.float32),
            grid=(n_rows // bn,),
            in_specs=[
                pl.BlockSpec((1, KH), lambda n: (0, 0)),
                pl.BlockSpec((1, KH), lambda n: (0, 0)),
                pl.BlockSpec((2, Kb), lambda n: (0, 0)),
                pl.BlockSpec((bn, KH), lambda n: (n, 0)),
                pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
                pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda n: (0, n)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * K,
                bytes_accessed=qs8.nbytes + es.nbytes + em.nbytes,
                transcendentals=0),
            interpret=args.cpu,
        )(a, b, sc, qs8, es, em)
    return f


def _floor_kernel(x_ref, qs_ref, es_ref, em_ref, o_ref):
    p32 = qs_ref[...]                               # int32 view [bn, K/8]
    acc = jnp.sum(p32, axis=1).astype(jnp.float32)  # [bn]
    acc += jnp.sum(es_ref[...].astype(jnp.float32) +
                   em_ref[...].astype(jnp.float32), axis=1)
    # depend on x so the chained timing loop cannot hoist the call
    o_ref[...] = acc[None, :] + x_ref[0, 0]


def make_chunk(ql: qm.QuantLinear, bn: int, int8_ops: bool, n_rows: int = N):
    qs8 = pack_xor8(ql)
    es, em = ql.es, ql.em

    @jax.jit
    def f(xp):
        xl, xh = xp[0, :KH], xp[0, KH:]
        a = (xl - xh / 16.0)[None, :]
        b = (xh / 16.0)[None, :]
        c = 8.0 * xh.reshape(S16, Kb).sum(0)
        xs = (xl + xh).reshape(S16, Kb).sum(0)
        sc = jnp.stack([c, xs])                     # [2, Kb]
        return pl.pallas_call(
            functools.partial(_chunk_kernel, int8_ops=int8_ops),
            out_shape=jax.ShapeDtypeStruct((1, n_rows), jnp.float32),
            grid=(n_rows // bn,),
            in_specs=[
                pl.BlockSpec((1, KH), lambda n: (0, 0)),
                pl.BlockSpec((1, KH), lambda n: (0, 0)),
                pl.BlockSpec((2, Kb), lambda n: (0, 0)),
                pl.BlockSpec((bn, KH), lambda n: (n, 0)),
                pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
                pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda n: (0, n)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * K,
                bytes_accessed=qs8.nbytes + es.nbytes + em.nbytes,
                transcendentals=0),
            interpret=args.cpu,
        )(a, b, sc, qs8, es, em)
    return f


def make_floor(ql: qm.QuantLinear, bn: int, n_rows: int = N):
    qs32 = jnp.asarray(np.asarray(ql.qs).view(np.int32))  # [N, K/8]
    es, em = ql.es, ql.em

    @jax.jit
    def f(xp):
        return pl.pallas_call(
            _floor_kernel,
            out_shape=jax.ShapeDtypeStruct((1, n_rows), jnp.float32),
            grid=(n_rows // bn,),
            in_specs=[
                pl.BlockSpec((1, K), lambda n: (0, 0)),
                pl.BlockSpec((bn, K // 8), lambda n: (n, 0)),
                pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
                pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda n: (0, n)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * K,
                bytes_accessed=qs32.nbytes + es.nbytes + em.nbytes,
                transcendentals=0),
            interpret=args.cpu,
        )(xp, qs32, es, em)
    return f


def measure_nmarginal(build, inner=96, reps=6):
    """build(n_rows) -> (fn(x)->y, nbytes). Times a chained loop at two N;
    the per-iteration overhead (fold + dispatch) cancels in the difference."""
    xp_j = jnp.asarray(np.random.default_rng(1)
                       .normal(size=(1, K)).astype(np.float32))
    out = {}
    for nn in (N_SMALL, N):
        f, nb = build(nn)

        @jax.jit
        def g(x, f=f):
            def body(_, x):
                y = f(x)
                return y[:, :K] * 0.03 + y[:, K:2 * K] * 0.03
            return jax.lax.fori_loop(0, inner, body, x)

        np.asarray(g(xp_j))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(g(xp_j))
            ts.append(time.perf_counter() - t0)
        out[nn] = (min(ts), nb)
    (t_s, nb_s), (t_l, nb_l) = out[N_SMALL], out[N]
    per = (t_l - t_s) / inner
    gbs = (nb_l - nb_s) / per / 1e9
    return per, gbs


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(N, K)) / np.sqrt(K)).astype(np.float32)
    ql = qm.quantize(w, "q4_k")
    nbytes = ql.nbytes
    x0 = rng.normal(size=(1, K)).astype(np.float32)
    xp = np.asarray(qm.permute_activations(jnp.asarray(x0)))

    if args.check:
        want = np.asarray(qm.qmatmul_xla(jnp.asarray(x0), ql,
                                         compute_dtype=jnp.float32))
        for int8_ops in (True, False):
            got = np.asarray(make_chunk(ql, args.bn, int8_ops)(xp))
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            print(f"chunk int8_ops={int8_ops}: rel err {err:.2e}")
        for mode in ("floorhi", "bf16"):
            got = np.asarray(make_probe(ql, args.bn, mode)(xp))
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            print(f"probe {mode}: rel err {err:.2e}")
        return

    if args.nmarg:
        def b_chunk(n):
            q = ql_slice(ql, n)
            return make_chunk(q, args.bn, True, n), q.nbytes

        def b_floor(n):
            q = ql_slice(ql, n)
            return make_floor(q, args.bn, n), q.nbytes

        def b_vpu2(n):
            q = ql_slice(ql, n)
            return (lambda x: qm.qmatmul(
                x, q, use_vpu=True, block_n=args.bn)), q.nbytes

        def b_q8(n):
            q8 = ql8_full
            import dataclasses
            q = dataclasses.replace(q8, shape=(n, K), qs=q8.qs[:n],
                                    d=q8.d[:n])
            return (lambda x: qm.qmatmul(x, q, block_n=args.bn)), q.nbytes

        ql8_full = qm.quantize(w, "q8_0")

        def mk_probe(mode):
            def b(n):
                q = ql_slice(ql, n)
                return make_probe(q, args.bn, mode, n), q.nbytes
            return b

        cases = [("floor", b_floor), ("chunk", b_chunk),
                 ("vpu2", b_vpu2), ("q8_mxu", b_q8)]
        cases += [(m, mk_probe(m))
                  for m in ("ponly", "loonly", "nochunk", "bf16", "floorhi")]
        for name, b in cases:
            if name not in args.variants:
                continue
            try:
                per, gbs = measure_nmarginal(b)
                print(f"{name} bn={args.bn}: marginal {gbs:.1f} GB/s "
                      f"({100*gbs/819:.1f}%)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {str(e)[:200]}", flush=True)
        return

    builders = {
        "floor": lambda: make_floor(ql, args.bn),
        "chunk": lambda: make_chunk(ql, args.bn, True),
        "chunk32": lambda: make_chunk(ql, args.bn, False),
        "ponly": lambda: make_probe(ql, args.bn, "ponly"),
        "loonly": lambda: make_probe(ql, args.bn, "loonly"),
        "nochunk": lambda: make_probe(ql, args.bn, "nochunk"),
        "bf16": lambda: make_probe(ql, args.bn, "bf16"),
    }
    xp_j = jnp.asarray(xp)
    for name in args.variants.split(","):
        try:
            f = builders[name]()

            def chained(inner):
                @jax.jit
                def g(x):
                    def body(_, x):
                        y = f(x)
                        return y[:, :K] * 0.03 + y[:, K:2*K] * 0.03
                    return jax.lax.fori_loop(0, inner, body, x)
                return g

            fns = {}

            def run(n):
                if n not in fns:
                    fns[n] = chained(n)
                    np.asarray(fns[n](xp_j))
                t0 = time.perf_counter()
                np.asarray(fns[n](xp_j))
                return time.perf_counter() - t0

            ts = min(run(32) for _ in range(4))
            tl = min(run(160) for _ in range(4))
            per = (tl - ts) / 128
            gbs = nbytes / per / 1e9
            print(f"{name} bn={args.bn}: {per*1e6:.1f} us/iter "
                  f"{gbs:.1f} GB/s ({100*gbs/819:.1f}%)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
