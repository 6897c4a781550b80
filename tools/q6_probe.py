#!/usr/bin/env python
"""Price the q6_k head's candidate compute patterns on the real chip.

VERDICT r4 item 6: the q6_k lm_head runs at ~53% of its stream floor on
the all-VPU chunk6 kernel, and the "compute-bound at 394 TOPS" rationale
for not building a chunk8-class int8-selector path was penciled, never
measured. This probe turns the pencil into numbers at the ONE shape that
matters (32000x4096 head; run as 32768/8192 size-marginal pairs):

  cur        the shipped all-VPU chunk6 kernel (qmatmul on a real q6 ql)
  stream     DMA floor for the same operands (qs+qh+es touched, no math)
  nib_global nibble part as 2 int8 MXU dots against a [KH, 256]
             global-interleave selector + the floor-chain hi4 extraction
             (the layout we already ship — 2x the MACs of segment-local)
  nib_seg    same with segment-local [*, 128] selector slices (half the
             MACs; needs a q6 lane-order change to be numerically right —
             this rung prices it before building it)
  bits2      the 2-bit plane's floor-chain VPU extraction + fold alone

Timing-only: nib_*/bits2 rungs use dummy selectors/activations — they
price compute patterns, not numerics. Decision rule: if
max(nib_seg, stream) + bits2-overlap ~= stream, the hybrid kernel is
worth building; if nib even at segment-local exceeds stream, the
compute-bound claim is CONFIRMED and goes to PERF.md as a measured
dead end.

Usage: python tools/q6_probe.py [--variants ...] [--reps 3]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.oracle import quant as quant_ref
from ggml_cuda_experiments_tpu.utils.platform import interpret_default

K = 4096
KH = K // 2          # qs bytes per row
KQ4 = K // 4         # qh bytes per row
KB6 = K // 16        # 16-element scale blocks per row (256)
N_SMALL, N_BIG = 8192, 32768
BN = 1024
SPLITS = (512, 512)  # row subtiles (VPU extraction pipelines vs MXU dots)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_kernel(ea_ref, eb_ref, xc_ref, qs_ref, qh_ref, es_ref, o_ref,
                  *, mode: str):
    if mode == "stream":
        o_ref[...] = (
            jnp.sum(qs_ref[:, :128].astype(jnp.float32), axis=1)
            + jnp.sum(qh_ref[:, :128].astype(jnp.float32), axis=1)
            + jnp.sum(es_ref[...].astype(jnp.float32), axis=1))[None, :]
        return
    outs = []
    r0 = 0
    for rows in SPLITS:
        p = qs_ref[r0:r0 + rows, :]                       # [rows, KH] int8
        if mode == "nib_global":
            z1 = jax.lax.dot_general(
                p, ea_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)         # [rows, 256]
            hi4 = jnp.floor(p.astype(jnp.float32) * 0.0625 + 8.0
                            ).astype(jnp.int8)
            z2 = jax.lax.dot_general(
                hi4, eb_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            z = (z1 + z2).astype(jnp.float32)
        elif mode == "nib_seg":
            hi4 = jnp.floor(p.astype(jnp.float32) * 0.0625 + 8.0
                            ).astype(jnp.int8)
            zs = []
            for s in range(2):                            # 2 segments
                sl = slice(s * (KH // 2), (s + 1) * (KH // 2))
                z1 = jax.lax.dot_general(
                    p[:, sl], ea_ref[sl, :128], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)     # [rows, 128]
                z2 = jax.lax.dot_general(
                    hi4[:, sl], eb_ref[sl, :128], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                zs.append(z1 + z2)
            z = jnp.concatenate(zs, axis=1).astype(jnp.float32)
        elif mode == "bits2":
            p2f = qh_ref[r0:r0 + rows, :].astype(jnp.float32)
            u_hi = jnp.floor(p2f * 0.0625 + 8.0)
            u_lo = p2f + 128.0 - 16.0 * u_hi
            h1 = jnp.floor(u_lo * 0.25)
            h0 = u_lo - 4.0 * h1
            h3 = jnp.floor(u_hi * 0.25)
            h2 = u_hi - 4.0 * h3
            xl1 = xc_ref[0:1, :KQ4]
            xl2 = xc_ref[1:2, :KQ4]
            xh1 = xc_ref[2:3, :KQ4]
            xh2 = xc_ref[3:4, :KQ4]
            t2 = h0 * xl1 + h1 * xl2 + h2 * xh1 + h3 * xh2
            z = (t2[:, :KB6] + t2[:, KB6:2 * KB6]
                 + t2[:, 2 * KB6:3 * KB6] + t2[:, 3 * KB6:])
        else:
            raise ValueError(mode)
        es = es_ref[r0:r0 + rows, :z.shape[1]].astype(jnp.float32)
        # per-subtile store (a 1-D concat of 512-wide parts needs
        # 1024-aligned offsets on Mosaic — store instead, like
        # quant_matmul's subtile-fold callback)
        o_ref[0:1, r0:r0 + rows] = jnp.sum(es * z, axis=1)[None, :]
        r0 += rows
    del outs


def make_probe(mode, rows_n, rng):
    qs = jnp.asarray(rng.integers(-128, 128, size=(rows_n, KH)), jnp.int8)
    qh = jnp.asarray(rng.integers(-128, 128, size=(rows_n, KQ4)), jnp.int8)
    es = jnp.asarray(rng.normal(size=(rows_n, KB6)) * 1e-3, jnp.bfloat16)
    ea = jnp.asarray(rng.integers(-8, 8, size=(KH, 256)), jnp.int8)
    eb = jnp.asarray(rng.integers(-8, 8, size=(KH, 256)), jnp.int8)
    xc = jnp.asarray(rng.normal(size=(4, KQ4)) * 1e-3, jnp.float32)
    nbytes = qs.nbytes + qh.nbytes + es.nbytes

    kern = functools.partial(_probe_kernel, mode=mode)
    grid = (rows_n // BN,)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, rows_n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((KH, 256), lambda n: (0, 0)),
            pl.BlockSpec((KH, 256), lambda n: (0, 0)),
            pl.BlockSpec((4, KQ4), lambda n: (0, 0)),
            pl.BlockSpec((BN, KH), lambda n: (n, 0)),
            pl.BlockSpec((BN, KQ4), lambda n: (n, 0)),
            pl.BlockSpec((BN, KB6), lambda n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((1, BN), lambda n: (0, n)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_n * K, bytes_accessed=nbytes + rows_n * 4,
            transcendentals=0),
        interpret=interpret_default(None),
    )

    # chained jitted loop (bench.py discipline): the weights are far too
    # big for VMEM, so XLA cannot hoist the stream out of the loop; the
    # scalar carry serializes iterations
    @functools.partial(jax.jit, static_argnames=("inner",))
    def run(c0, inner):
        def body(_, c):
            o = call(ea, eb, xc * (1.0 + c * 1e-20), qs, qh, es)
            return jnp.sum(o) * 1e-20
        return jax.lax.fori_loop(0, inner, body, c0)

    return run, nbytes


def make_cur(rows_n, rng):
    w = (rng.normal(size=(rows_n, K)) / np.sqrt(K)).astype(np.float32)
    ql = jax.device_put(qm.from_oracle(quant_ref.quantize_q6_k(w)))
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    nbytes = ql.nbytes

    @functools.partial(jax.jit, static_argnames=("inner",))
    def run(c0, inner):
        def body(_, c):
            y = qm.qmatmul(x * (1.0 + c * 1e-20), ql)
            return jnp.sum(y) * 1e-20
        return jax.lax.fori_loop(0, inner, body, c0)

    return run, nbytes


def marginal_pair(fs_small, fs_big, inner, reps):
    def t(f):
        t0 = time.perf_counter()
        np.asarray(f(jnp.float32(0.0), inner))
        return time.perf_counter() - t0

    ts = min(t(fs_small) for _ in range(reps))
    tb = min(t(fs_big) for _ in range(reps))
    return (tb - ts) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="stream,cur,nib_global,nib_seg,bits2")
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    from ggml_cuda_experiments_tpu.utils.device_info import chip_spec
    peak = chip_spec().hbm_bytes_per_s

    for v in args.variants.split(","):
        mk = make_cur if v == "cur" else functools.partial(make_probe, v)
        fs, nb_s = mk(N_SMALL, rng)
        fb, nb_b = mk(N_BIG, rng)
        np.asarray(fs(jnp.float32(0.0), args.inner))   # compile + warm
        np.asarray(fb(jnp.float32(0.0), args.inner))
        per = marginal_pair(fs, fb, args.inner, args.reps)
        dbytes = nb_b - nb_s
        gbs = dbytes / per / 1e9
        print(f"{v:10s}: {per*1e6:7.1f} us/Diter  {gbs:6.1f} GB/s "
              f"({100*gbs/(peak/1e9):5.1f}% roofline)", flush=True)


if __name__ == "__main__":
    main()
