#!/usr/bin/env python
"""Probe: per-call cost of qmatmul's XLA-side activation prep (permute,
blockwise int8 quant, ea/eb selector materialization).

Two chained loops over C=3 cycled distinct weights (defeats VMEM hoisting):
  A) y feeds the next x  -> prep re-runs every iteration (model-like)
  B) x loop-invariant    -> XLA hoists the whole prep out of the loop
A - B = the prep cost per call.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm

C = 3
N, K = 12288, 4096


def run_case(dep: bool, n, qls, x0):
    @jax.jit
    def f(x):
        def body(i, x):
            xin = x if dep else x0
            y = jax.lax.switch(
                i % C, [lambda xx, q=q: qm.qmatmul(xx, q, x_quant8=True)
                        for q in qls], xin)
            out = y[:, :K] * 1e-3
            return out if dep else x + jnp.sum(out) * 0.0
        return jax.lax.fori_loop(0, n, body, x)
    np.asarray(f(x0))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    qls = [jax.device_put(qm.quantize(
        (rng.normal(size=(N, K)) / np.sqrt(K)).astype(np.float32), "q4_k"))
        for _ in range(C)]
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    for dep in (True, False):
        ns, nb = 24, 96
        ts = run_case(dep, ns, qls, x0)
        tb = run_case(dep, nb, qls, x0)
        per = (tb - ts) / (nb - ns)
        nbytes = qls[0].nbytes
        print(f"dep={dep}: {per*1e6:7.2f} us/call  "
              f"{nbytes/per/1e9:6.1f} GB/s ({nbytes/per/8.19e9:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
