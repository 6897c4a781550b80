#!/usr/bin/env python
"""Localize the prefill pipelined-GEMM loss (TTFT, VERDICT r3 item 4).

tools/prefill_marginal.py measured the 7B prefill MLP at ~1.43 ms/layer vs
a 0.78 ms MXU bound (55%). _pipe_kernel claims dequant (VPU) overlaps the
dot (MXU) across grid steps; this probe prices each phase separately at
prefill shapes (T=512).

Protocol: SIZE-marginal interleaved pairs (bench.py discipline — a chained
loop over ONE weight lets XLA/Mosaic keep it VMEM-resident and measures
fantasy rates; the first version of this probe did exactly that and read
158% of the MXU bound). Two row counts N_small/N_big at the same K are
chained back-to-back per pair; the per-call marginal is dt / d(rows) *
rows_big, i.e. the cost of the extra rows scaled to the big shape. DMA for
these shapes is ~7x under the MXU bound, so the number prices compute:

  both     production kernel (dequant + dot)
  dequant  dot skipped — DMA + VPU dequant + scratch write
  dot      dequant skipped — DMA + MXU dot from (stale) scratch
  xla      jnp dot on PRE-dequantized dense bf16 weights (pure MXU ref)

If both ~= dequant + dot the phases serialize; if both ~= max(...) the
kernel is at its structural limit and the TTFT loss is elsewhere.

Usage: python tools/pipe_probe.py [--t 512] [--inner 64] [--pairs 5]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm


def make_chain(inner, K, call):
    @jax.jit
    def f(x):
        def body(_, x):
            y = call(x)
            if y.shape[1] < K:                   # fold back to [T, K]
                y = jnp.concatenate([y] * (-(-K // y.shape[1])), axis=1)
            yk = y[:, :K]                        # probe phases can emit NaN
            yk = jnp.where(jnp.isfinite(yk), yk, 0.0)
            return (yk * 0.01 + 0.1 * x).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, x)
    return f


def pair_marginal(f_small, f_big, x0, inner, n_small, n_big, pairs):
    """Median over interleaved pairs of (t_big - t_small) / inner,
    scaled to the full big shape: cost_big ~= dt * n_big / (n_big - n_small)."""
    np.asarray(f_small(x0)), np.asarray(f_big(x0))     # compile + warm
    vals = []
    for _ in range(pairs):
        t0 = time.perf_counter()
        np.asarray(f_small(x0))
        t1 = time.perf_counter()
        np.asarray(f_big(x0))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / inner
        vals.append(dt * n_big / (n_big - n_small))
    vals.sort()
    return vals[len(vals) // 2], [round(v * 1e6, 1) for v in vals]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--inner", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--ks", default="4096,12288")
    args = ap.parse_args()
    T = args.t

    rng = np.random.default_rng(0)
    for K in map(int, args.ks.split(",")):
        n_small, n_big = (8192, 24576) if K == 4096 else (4096, 12288)
        w = (rng.normal(size=(n_big, K)) / np.sqrt(K)).astype(np.float32)
        x0 = jnp.asarray(rng.normal(size=(T, K)).astype(np.float32))
        qls = {n: jax.device_put(qm.quantize(w[:n], "q4_k"))
               for n in (n_small, n_big)}
        wds = {n: jnp.asarray(w[:n], jnp.bfloat16) for n in (n_small, n_big)}

        mxu_us = 2 * T * n_big * K / 197e12 * 1e6
        print(f"[N={n_big} K={K}] T={T}: MXU bound {mxu_us:.0f} us, "
              f"q4_k DMA {qls[n_big].nbytes / 819e9 * 1e6:.0f} us",
              flush=True)

        def run(label):
            fs = {n: make_chain(
                args.inner, K,
                (lambda x, n=n: qm.qmatmul(x, qls[n], pipelined=True))
                if label != "xla" else
                (lambda x, n=n: jax.lax.dot_general(
                    x.astype(jnp.bfloat16), wds[n],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)))
                for n in (n_small, n_big)}
            m, vals = pair_marginal(fs[n_small], fs[n_big], x0, args.inner,
                                    n_small, n_big, args.pairs)
            print(f"  {label:8s}: {m*1e6:7.1f} us/call-equiv "
                  f"({mxu_us / (m*1e6) * 100:5.1f}% of MXU bound) "
                  f"pairs={vals}", flush=True)

        for label in ("both", "sub", "dequant", "dot", "both", "sub"):
            qm.PIPE_MODE = "sub" if label == "sub" else "slots"
            qm.PIPE_PHASE = label if label in ("dequant", "dot") else "both"
            qm.qmatmul.clear_cache()
            run(label)
        qm.PIPE_PHASE, qm.PIPE_MODE = "both", "sub"
        qm.qmatmul.clear_cache()
        run("xla")


if __name__ == "__main__":
    main()
