#!/usr/bin/env python
"""MXU GEMM throughput benchmark — the TPU analog of the reference's WMMA
GEMM latency/TFLOPS rigs (HMMA fp16 + IMMA int8, /root/reference/src/misc/
tensor-core.cu:41-73,507-589, and the CTA-tiled TFLOPS print,
/root/reference/src/misc/cudaTensorCoreGemm.cu:406-407).

Measures: Pallas MXU-tiled GEMM vs XLA dot, bf16->f32 (HMMA analog) and
int8->int32 (IMMA analog), as TFLOP/s and % of MXU peak.

Timing: chained fori_loop with a size-marginal pair and a host fetch —
block_until_ready returns early on the tunneled backend (see bench.py), so
the marginal of two chain lengths with np.asarray completion is the only
trustworthy latency here.

Run: python tools/gemm_bench.py [--sizes 2048,4096] [--xla-only]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.utils.device_info import chip_spec


def chained_gemm(mm, a, b, inner):
    @jax.jit
    def f():
        def body(_, a):
            c = mm(a, b)
            # fold output back to input dtype/shape: keeps the loop closed
            # with a cheap elementwise op (cancels in the marginal)
            return (c[:, :a.shape[1]] * 1e-3).astype(a.dtype)
        return jax.lax.fori_loop(0, inner, body, a)
    return f


def measure(mm, a, b, flops, inner_small=4, inner_big=16, reps=5):
    ts = {}
    for inner in (inner_small, inner_big):
        f = chained_gemm(mm, a, b, inner)
        np.asarray(f())                       # compile + warm
        best = min(_timed(f) for _ in range(reps))
        ts[inner] = best
    per = (ts[inner_big] - ts[inner_small]) / (inner_big - inner_small)
    return per, flops / per


def _timed(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096,8192")
    ap.add_argument("--xla-only", action="store_true")
    args = ap.parse_args()
    spec = chip_spec()
    peak = spec.peak_flops_bf16
    print(f"{spec.device_kind}: peak {peak/1e12:.0f} TFLOP/s bf16")

    rng = np.random.default_rng(0)
    for n in (int(s) for s in args.sizes.split(",")):
        a16 = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
        b16 = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
        flops = 2.0 * n ** 3

        cases = {}
        xla = lambda a, b: jax.lax.dot(a, b,
                                       preferred_element_type=jnp.float32)
        cases[f"XLA dot bf16 {n}^3"] = (xla, a16, b16, peak)
        if not args.xla_only:
            from ggml_cuda_experiments_tpu.ops.matmul import matmul
            cases[f"Pallas MXU bf16 {n}^3"] = (
                lambda a, b: matmul(a, b), a16, b16, peak)
        # IMMA analog: int8 x int8 -> int32 (2x bf16 peak on v5e MXU)
        a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
        i8 = lambda a, b: jax.lax.dot(a, b,
                                      preferred_element_type=jnp.int32)
        cases[f"XLA dot int8 {n}^3"] = (i8, a8, b8, 2 * peak)

        for name, (mm, a, b, pk) in cases.items():
            try:
                per, fps = measure(mm, a, b, flops)
                print(f"{name:24s}: {per*1e3:8.3f} ms  "
                      f"{fps/1e12:7.2f} TFLOP/s  ({100*fps/pk:5.1f}% MXU)")
            except Exception as e:
                print(f"{name:24s}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
