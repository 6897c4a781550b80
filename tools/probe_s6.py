#!/usr/bin/env python
"""Ablate the s6 scale-decode cost on the chip: same size-marginal pair
method as bench.py, one row per decode variant (see
quant_matmul.S6_DECODE_VARIANT) plus the "e" encoding baseline."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.utils.device_info import chip_spec

K, N_S, N_B, INNER, PAIRS = 4096, 8192, 32768, 1024, 5  # noqa


def make_chained(inner, ql, **kw):
    @jax.jit
    def chained(x):
        def body(_, x):
            y = qm.qmatmul(x, ql, **kw)
            return (y[:, :K] * 0.03 + y[:, K:2 * K] * 0.03
                    ).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, x)
    return chained


def measure(enc, variant=None):
    if variant is not None:
        qm.S6_DECODE_VARIANT = variant
        qm.qmatmul.clear_cache()
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(N_B, K)) / np.sqrt(K)).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    fs, nb = {}, {}
    for rows in (N_S, N_B):
        ql = qm.quantize(w[:rows], "q4_k", enc=enc)
        fs[rows] = make_chained(INNER, ql, use_vpu=True, x_quant8=True)
        nb[rows] = ql.nbytes
        np.asarray(fs[rows](x0))
    spec = chip_spec()
    best = []
    for _ in range(PAIRS):
        t0 = time.perf_counter(); np.asarray(fs[N_S](x0))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(fs[N_B](x0))
        tl = time.perf_counter() - t0
        per = (tl - ts) / INNER
        best.append(per)
    per = sorted(best)[len(best) // 2]
    gbs = (nb[N_B] - nb[N_S]) / per / 1e9
    pct = 100 * gbs * 1e9 / spec.hbm_bytes_per_s
    print(f"{enc:>3} {variant or '-':>7}: {per*1e6:6.1f} us/Diter "
          f"{gbs:6.1f} GB/s ({pct:.1f}% roofline)", flush=True)
    return per


def main():
    measure("e")
    for v in ("cast", "constdd"):
        measure("s6", v)
    measure("e")        # bracket for drift
    qm.S6_DECODE_VARIANT = "eyedot"


if __name__ == "__main__":
    main()
