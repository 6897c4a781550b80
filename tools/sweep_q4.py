#!/usr/bin/env python
"""Variant sweep for the Q4_K dequant-matvec roofline (dev tool).

Measures each kernel variant x block_n with bench.py's marginal-timing
harness so results are comparable with the headline number.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.utils.device_info import chip_spec

K = 4096
N = 8192


def make_chained(inner, **kw):
    @jax.jit
    def chained(x, ql):
        def body(_, x):
            y = qm.qmatmul(x, ql, **kw)
            x = y[:, :K].astype(jnp.float32) + y[:, K:].astype(jnp.float32)
            return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-6)
        return jax.lax.fori_loop(0, inner, body, x)
    return chained


def measure(fmt, **kw):
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(N, K)) / np.sqrt(K)).astype(np.float32)
    ql = jax.device_put(qm.quantize(w, fmt))
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    fns = {}

    def run(n):
        if n not in fns:
            fns[n] = make_chained(n, **kw)
            np.asarray(fns[n](x0, ql))
        t0 = time.perf_counter()
        np.asarray(fns[n](x0, ql))
        return time.perf_counter() - t0

    t_short = min(run(32) for _ in range(3))
    t_long = min(run(160) for _ in range(3))
    per_iter = (t_long - t_short) / 128
    gbs = ql.nbytes / per_iter / 1e9
    spec = chip_spec()
    pct = 100.0 * gbs / (spec.hbm_bytes_per_s / 1e9)
    print(f"{fmt} {kw}: {per_iter*1e6:.1f} us/iter, {gbs:.1f} GB/s "
          f"({pct:.1f}%)", flush=True)
    return pct


if __name__ == "__main__":
    cases = [
        dict(use_vpu=True, block_n=1024),
        dict(use_vpu=True, block_n=512),
        dict(use_vpu=True, block_n=2048),
        dict(pipelined=True, use_vpu=False, block_n=512),
        dict(pipelined=True, use_vpu=False, block_n=256),
        dict(pipelined=True, use_vpu=False, block_n=1024),
        dict(use_vpu=False, block_n=512),        # MXU B-padded path
    ]
    for kw in cases:
        try:
            measure("q4_k", **kw)
        except Exception as e:
            print(f"q4_k {kw}: FAILED {str(e)[:160]}", flush=True)
