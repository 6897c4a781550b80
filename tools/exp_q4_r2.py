#!/usr/bin/env python
"""Round-2 Q4_K matvec experiments: close the roofline gap 74% -> >=85%.

Diagnosis from round 1 (PERF.md): at bn=1024/K=4096 the two int8 selector
dots cost ~2.7 us/step vs ~3.2 us of DMA, plus ~1 us of VPU epilogue (the
`p & 15` unpack + scale combine) and ~0.5 us/step fixed cost. Step ~4.3 us
-> 74%. Target step <= 3.7 us (85%).

Probes (same streamed bytes, same BlockSpecs, varying compute):
  dma      minimal compute (1 cast + slice sum)      -> DMA + fixed floor
  zponly   one int8 selector dot, no AND             -> + 1 dot
  zlonly   AND + one int8 selector dot               -> + AND + 1 dot
  full     current production _chunk8_kernel          -> everything
  cols256  full but 256-col selectors                 -> dot marginal cost

Variants:
  vmem     full kernel + CompilerParams(vmem_limit_bytes=...) + bn sweep
  split    zp on MXU + zl as VPU slice-fold (f32 or int32) -> unit overlap
  subtile  AND+dots in row sub-tiles (smaller temps, bigger bn)

Usage: python tools/exp_q4_r2.py [--probes a,b,...] [--inner 96]
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
ap.add_argument("--inner", type=int, default=96)
ap.add_argument("--reps", type=int, default=6)
ap.add_argument("--probes", default="dma,zponly,full,base")
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
from ggml_cuda_experiments_tpu.utils.device_info import chip_spec

K = 4096
N_SMALL = 8192
N_BIG = 32768
QK = 32
Kb = K // QK         # 128
KH = K // 2          # 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# shared prep (identical to _qmatmul_chunk8's)
# --------------------------------------------------------------------------

def prep(xp):
    xl, xh = xp[0, :KH], xp[0, KH:]
    a = xl - xh / 16.0
    bvec = xh / 16.0
    aq, sa = qm._quant_rows_blockwise(a, Kb, 1)
    bq, sb = qm._quant_rows_blockwise(bvec, Kb, 1)
    sel = qm._selector_np(KH, Kb).astype(np.int8)
    sel = jnp.asarray(sel)
    ea = aq[:, None] * sel
    eb = bq[:, None] * sel
    c = 8.0 * qm._block_sums(xh, Kb, 1)
    xs = qm._block_sums(xl + xh, Kb, 1)
    sc = jnp.stack([c, xs, sa, sb])
    return ea, eb, sc, (xl, xh)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def k_dma(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    p = qs_ref[...]
    z = p[:, :Kb].astype(jnp.float32)
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_zponly(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    p = qs_ref[...]
    dims = (((1,), (0,)), ((), ()))
    zp = jax.lax.dot_general(p, eb_ref[...], dims,
                             preferred_element_type=jnp.int32)
    sb = sc_ref[3:4]
    z = sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_zlonly(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    p = qs_ref[...]
    lo = p & 0x0F
    dims = (((1,), (0,)), ((), ()))
    zl = jax.lax.dot_general(lo, ea_ref[...], dims,
                             preferred_element_type=jnp.int32)
    sa = sc_ref[2:3]
    z = sa * zl.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_full(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    qm._chunk8_kernel(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref,
                      fmt="q4_k", n_segs=1)


def k_onedot(e2_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    """ONE dot per step: lhs = [lo | p] [bn, K], selector e2 [K, 256] with
    ea on cols 0..127 for the lo half (zero elsewhere) and eb on cols
    128..255 for the p half. Exact same math as the two-dot kernel but a
    single MXU op — one selector weight-load per step instead of two."""
    p = qs_ref[...]
    lhs = jnp.concatenate([p & 0x0F, p], axis=1)          # [bn, K] int8
    dims = (((1,), (0,)), ((), ()))
    z2 = jax.lax.dot_general(lhs, e2_ref[...], dims,
                             preferred_element_type=jnp.int32)
    zl, zp = z2[:, :Kb], z2[:, Kb:]
    sa, sb = sc_ref[2:3], sc_ref[3:4]
    z = sa * zl.astype(jnp.float32) + sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_onedot_sub(e2_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref, *,
                 nsub: int, bn: int):
    """One-dot kernel with row-subtiled AND+concat+dot (overlap windows)."""
    dims = (((1,), (0,)), ((), ()))
    sub = bn // nsub
    zs = []
    for i in range(nsub):
        p = qs_ref[i * sub:(i + 1) * sub, :]
        lhs = jnp.concatenate([p & 0x0F, p], axis=1)
        zs.append(jax.lax.dot_general(lhs, e2_ref[...], dims,
                                      preferred_element_type=jnp.int32))
    z2 = jnp.concatenate(zs, axis=0)
    zl, zp = z2[:, :Kb], z2[:, Kb:]
    sa, sb = sc_ref[2:3], sc_ref[3:4]
    z = sa * zl.astype(jnp.float32) + sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_cols256(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    """Timing probe: selectors with 2x columns (dot cost doubles)."""
    p = qs_ref[...]
    lo = p & 0x0F
    dims = (((1,), (0,)), ((), ()))
    zl = jax.lax.dot_general(lo, ea_ref[...], dims,
                             preferred_element_type=jnp.int32)[:, :Kb]
    zp = jax.lax.dot_general(p, eb_ref[...], dims,
                             preferred_element_type=jnp.int32)[:, :Kb]
    sa, sb = sc_ref[2:3], sc_ref[3:4]
    z = sa * zl.astype(jnp.float32) + sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_noand(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    """Timing probe only (WRONG MATH): both dots but no AND — zl uses p."""
    p = qs_ref[...]
    dims = (((1,), (0,)), ((), ()))
    zl = jax.lax.dot_general(p, ea_ref[...], dims,
                             preferred_element_type=jnp.int32)
    zp = jax.lax.dot_general(p, eb_ref[...], dims,
                             preferred_element_type=jnp.int32)
    sa, sb = sc_ref[2:3], sc_ref[3:4]
    z = sa * zl.astype(jnp.float32) + sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_split_f32(af_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref):
    """zp on MXU (int8 dot, no prep) + zl on VPU (slice fold in f32,
    unquantized activations so no sa error)."""
    p = qs_ref[...]
    dims = (((1,), (0,)), ((), ()))
    zp = jax.lax.dot_general(p, eb_ref[...], dims,
                             preferred_element_type=jnp.int32)
    lo = p & 0x0F
    zl = lo[:, 0:Kb].astype(jnp.float32) * af_ref[0:1, 0:Kb]
    for s in range(1, KH // Kb):
        zl = zl + (lo[:, s * Kb:(s + 1) * Kb].astype(jnp.float32)
                   * af_ref[0:1, s * Kb:(s + 1) * Kb])
    sb = sc_ref[3:4]
    z = zl + sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


def k_subtile(ea_ref, eb_ref, sc_ref, qs_ref, s1_ref, s2_ref, o_ref, *,
              nsub: int, bn: int):
    """Both dots, but AND+dots run per row-subtile: the lo temp is bn/nsub
    rows, and subtile i+1's AND can overlap subtile i's dots."""
    dims = (((1,), (0,)), ((), ()))
    sub = bn // nsub
    zs = []
    for i in range(nsub):
        p = qs_ref[i * sub:(i + 1) * sub, :]
        lo = p & 0x0F
        zl = jax.lax.dot_general(lo, ea_ref[...], dims,
                                 preferred_element_type=jnp.int32)
        zp = jax.lax.dot_general(p, eb_ref[...], dims,
                                 preferred_element_type=jnp.int32)
        zs.append((zl, zp))
    zl = jnp.concatenate([a for a, _ in zs], axis=0)
    zp = jnp.concatenate([b for _, b in zs], axis=0)
    sa, sb = sc_ref[2:3], sc_ref[3:4]
    z = sa * zl.astype(jnp.float32) + sb * zp.astype(jnp.float32) + sc_ref[0:1]
    es = s1_ref[...].astype(jnp.float32)
    em = s2_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.sum(es * z - em * sc_ref[1:2], axis=1)[None, :]


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def run_variant(kernel, ql, xp, bn, *, sel_cols=Kb, vmem=None,
                split_af=False, onedot=False):
    N = ql.qs.shape[0]
    ea, eb, sc, (xl, xh) = prep(xp)
    if sel_cols != Kb:
        ea = jnp.tile(ea, (1, sel_cols // Kb))
        eb = jnp.tile(eb, (1, sel_cols // Kb))
    if split_af:
        a = (xl - xh / 16.0)[None, :]                      # f32 [1, KH]
        first = a
        fspec = pl.BlockSpec((1, KH), lambda n: (0, 0))
    elif onedot:
        e2 = jnp.zeros((K, 2 * Kb), jnp.int8)
        e2 = e2.at[:KH, :Kb].set(ea).at[KH:, Kb:].set(eb)
        first = e2
        fspec = pl.BlockSpec((K, 2 * Kb), lambda n: (0, 0))
    else:
        first = ea
        fspec = pl.BlockSpec((KH, sel_cols), lambda n: (0, 0))
    cp = dict(dimension_semantics=("arbitrary",))
    if vmem:
        cp["vmem_limit_bytes"] = vmem
    arrays = [ql.qs, ql.es, ql.em]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        grid=(N // bn,),
        in_specs=[
            fspec,
            pl.BlockSpec((KH, sel_cols), lambda n: (0, 0)),
            pl.BlockSpec((4, Kb), lambda n: (0, 0)),
            pl.BlockSpec((bn, KH), lambda n: (n, 0)),
            pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
            pl.BlockSpec((bn, Kb), lambda n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda n: (0, n)),
        compiler_params=pltpu.CompilerParams(**cp),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K,
            bytes_accessed=sum(a_.size * a_.dtype.itemsize for a_ in arrays)
            + K * 4 + N * 4,
            transcendentals=0),
        interpret=args.cpu,
    )(first, eb, sc, *arrays)
    return out


# --------------------------------------------------------------------------
# measurement (size-marginal, as bench.py)
# --------------------------------------------------------------------------

def measure(name, fn_for):
    """fn_for(ql) -> jitted chained callable taking x [1, K]."""
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(N_BIG, K)) / np.sqrt(K)).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    timed = {}
    for rows in (N_SMALL, N_BIG):
        ql = jax.device_put(qm.quantize(w[:rows], "q4_k"))
        f = fn_for(ql)
        np.asarray(f(x0))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            ts.append(time.perf_counter() - t0)
        timed[rows] = (min(ts), ql.nbytes)
        del ql
    (t_s, nb_s), (t_l, nb_l) = timed[N_SMALL], timed[N_BIG]
    per_iter = (t_l - t_s) / args.inner
    gbs = (nb_l - nb_s) / per_iter / 1e9
    spec = chip_spec()
    pct = 100.0 * gbs / (spec.hbm_bytes_per_s / 1e9)
    log(f"{name:34s} {per_iter*1e6:7.1f} us/Diter  {gbs:6.1f} GB/s "
        f"({pct:5.1f}% roofline)")
    return pct


def chained(call, inner):
    @jax.jit
    def f(x):
        def body(_, x):
            y = call(x)
            return (y[:, :K] * 0.03 + y[:, K:2 * K] * 0.03
                    ).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, x)
    return f


def variant_fn(kernel, bn, **kw):
    def fn_for(ql):
        def call(x):
            xp = qm.permute_activations(x.astype(jnp.float32))
            return run_variant(kernel, ql, xp, bn, **kw)
        return chained(call, args.inner)
    return fn_for


def check(kernel, bn, **kw):
    rng = np.random.default_rng(1)
    w = (rng.normal(size=(2048, K)) / np.sqrt(K)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    ql = qm.quantize(w, "q4_k")
    ref = qm.qmatmul(x, ql, use_vpu=True, x_quant8=True)
    xp = qm.permute_activations(x.astype(jnp.float32))
    got = run_variant(kernel, ql, xp, bn, **kw)
    err = float(jnp.max(jnp.abs(got - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref)))
    kname = getattr(kernel, "__name__", None) or str(kernel.func.__name__)
    log(f"  check {kname} bn={bn}: max|diff|={err:.3e} "
        f"(scale {scale:.2f})")
    return err


PROBES = {
    # name -> (kernel, bn, kwargs)
    "dma": (k_dma, 1024, {}),
    "dma2048": (k_dma, 2048, dict(vmem=100 * 2**20)),
    "zponly": (k_zponly, 1024, {}),
    "zlonly": (k_zlonly, 1024, {}),
    "full": (k_full, 1024, {}),
    "full512": (k_full, 512, {}),
    "full2048": (k_full, 2048, dict(vmem=100 * 2**20)),
    "full4096": (k_full, 4096, dict(vmem=100 * 2**20)),
    "cols256": (k_cols256, 1024, dict(sel_cols=256)),
    "noand": (k_noand, 1024, {}),
    "fullv": (k_full, 1024, dict(vmem=100 * 2**20)),
    "split": (k_split_f32, 1024, dict(split_af=True)),
    "split2048": (k_split_f32, 2048, dict(split_af=True, vmem=100 * 2**20)),
    "sub2": (functools.partial(k_subtile, nsub=2, bn=2048), 2048,
             dict(vmem=100 * 2**20)),
    "sub4": (functools.partial(k_subtile, nsub=4, bn=4096), 4096,
             dict(vmem=100 * 2**20)),
    "sub4b": (functools.partial(k_subtile, nsub=4, bn=2048), 2048,
              dict(vmem=100 * 2**20)),
    "sub8": (functools.partial(k_subtile, nsub=8, bn=4096), 4096,
             dict(vmem=100 * 2**20)),
    "onedot": (k_onedot, 1024, dict(onedot=True)),
    "onedot2048": (k_onedot, 2048, dict(onedot=True, vmem=100 * 2**20)),
    "onedotsub4": (functools.partial(k_onedot_sub, nsub=4, bn=4096), 4096,
                   dict(onedot=True, vmem=100 * 2**20)),
    "onedotsub2": (functools.partial(k_onedot_sub, nsub=2, bn=2048), 2048,
                   dict(onedot=True, vmem=100 * 2**20)),
}


def main():
    names = args.probes.split(",")
    if args.check:
        for n in names:
            if n == "base":
                continue
            kern, bn, kw = PROBES[n]
            check(kern, bn, **kw)
        return
    log(f"K={K}, sizes {N_SMALL}->{N_BIG}, inner={args.inner}")
    results = {}
    for n in names:
        if n == "base":
            def fn_for(ql):
                return chained(lambda x: qm.qmatmul(
                    x, ql, use_vpu=True, x_quant8=True), args.inner)
            results[n] = measure("base (production qmatmul)", fn_for)
            continue
        kern, bn, kw = PROBES[n]
        try:
            results[n] = measure(f"{n} bn={bn} {kw}",
                                 variant_fn(kern, bn, **kw))
        except Exception as e:
            log(f"{n}: FAILED {str(e)[:300]}")
    log("\nsummary: " + "  ".join(f"{k}={v:.1f}%" for k, v in results.items()))


if __name__ == "__main__":
    main()
