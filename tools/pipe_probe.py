#!/usr/bin/env python
"""Localize the prefill pipelined-GEMM loss (TTFT, VERDICT r3 item 4).

tools/prefill_marginal.py measured the 7B prefill MLP at ~1.43 ms/layer vs
a 0.78 ms MXU bound (55%). _pipe_kernel claims dequant (VPU) overlaps the
dot (MXU) across grid steps; this probe prices each phase separately at the
real prefill shapes using the chained-marginal protocol (two chain lengths,
host fetch, difference — dispatch/RTT cancel):

  both     production kernel (dequant + dot)
  dequant  dot skipped — DMA + VPU dequant + scratch write
  dot      dequant skipped — DMA + MXU dot from (stale) scratch
  xla_bf16 jnp dot on PRE-dequantized dense bf16 weights (pure MXU ref,
           weights stream 2 B/w instead of 0.56 — DMA-heavier but no VPU)

If both ~= dequant + dot, the phases serialize (the claimed overlap is not
happening); if both ~= max(dequant, dot) the kernel is already at its
structural limit and the loss is elsewhere (glue between layers).

Usage: python tools/pipe_probe.py [--t 512] [--inner-small 4] [--inner-big 12]
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


def marginal(fn, x0, inner_small, inner_big, reps=3):
    fa, fb = fn(inner_small), fn(inner_big)
    np.asarray(fa(x0)), np.asarray(fb(x0))        # compile + warm

    def t(f):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        return time.perf_counter() - t0

    ts = min(t(fa) for _ in range(reps))
    tb = min(t(fb) for _ in range(reps))
    return (tb - ts) / (inner_big - inner_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--inner-small", type=int, default=4)
    ap.add_argument("--inner-big", type=int, default=12)
    ap.add_argument("--shapes", default="24576x4096,4096x12288")
    args = ap.parse_args()
    T = args.t

    rng = np.random.default_rng(0)
    for shape in args.shapes.split(","):
        N, K = map(int, shape.split("x"))
        w = (rng.normal(size=(N, K)) / np.sqrt(K)).astype(np.float32)
        ql = jax.device_put(qm.quantize(w, "q4_k"))
        wd = jnp.asarray(w, jnp.bfloat16)          # dense bf16 reference
        x0 = jnp.asarray(rng.normal(size=(T, K)).astype(np.float32))

        flops = 2 * T * N * K
        mxu_us = flops / 197e12 * 1e6
        dma_us = ql.nbytes / 819e9 * 1e6
        print(f"[{N}x{K}] T={T}: MXU bound {mxu_us:.0f} us, "
              f"q4_k DMA {dma_us:.0f} us, dense-bf16 DMA "
              f"{wd.nbytes / 819e9 * 1e6:.0f} us", flush=True)

        def chained_pipe(inner):
            @jax.jit
            def f(x):
                def body(_, x):
                    y = qm.qmatmul(x, ql, pipelined=True)
                    if y.shape[1] < K:           # fold back to [T, K]
                        y = jnp.concatenate([y] * (-(-K // y.shape[1])),
                                            axis=1)
                    yk = y[:, :K]                # probe phases can emit NaN
                    yk = jnp.where(jnp.isfinite(yk), yk, 0.0)
                    return (yk * 0.01 + 0.1 * x).astype(jnp.float32)
                return jax.lax.fori_loop(0, inner, body, x)
            return f

        def chained_xla(inner):
            @jax.jit
            def f(x):
                def body(_, x):
                    y = jax.lax.dot_general(
                        x.astype(jnp.bfloat16), wd,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if y.shape[1] < K:
                        y = jnp.concatenate([y] * (-(-K // y.shape[1])),
                                            axis=1)
                    return (y[:, :K] * 0.01 + 0.1 * x).astype(jnp.float32)
                return jax.lax.fori_loop(0, inner, body, x)
            return f

        for phase in ("both", "dequant", "dot", "both"):
            qm.PIPE_PHASE = phase
            qm.qmatmul.clear_cache()
            us = marginal(chained_pipe, x0, args.inner_small,
                          args.inner_big) * 1e6
            print(f"  pipe[{phase:7s}]: {us:7.1f} us/call "
                  f"({mxu_us / us * 100:5.1f}% of MXU bound)", flush=True)
        qm.PIPE_PHASE = "both"
        qm.qmatmul.clear_cache()
        us = marginal(chained_xla, x0, args.inner_small, args.inner_big) * 1e6
        print(f"  xla_bf16 dense : {us:7.1f} us/call "
              f"({mxu_us / us * 100:5.1f}% of MXU bound)", flush=True)


if __name__ == "__main__":
    main()
