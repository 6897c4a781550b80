#!/usr/bin/env python
"""Cache-proof qmatmul microbenchmark.

The chained-loop microbenches (profile_decode.py, bench.py's roofline) hold
ONE weight loop-invariant inside a jitted fori_loop; when the weight (or a
field of it) fits VMEM, XLA hoists it on-chip and the kernel measures far
above the HBM roofline (a 9 MB wo "measured" 434%). Real decode streams
*different* weights every call.

This tool defeats hoisting by cycling C >= 3 distinct same-shape weights
with ``lax.switch`` on the loop index — aggregate footprint > VMEM, so every
call re-streams from HBM. Marginal timing between two loop lengths removes
dispatch/fetch overhead as usual.

Usage:
  python tools/honest_bench.py --shape 12288x4096 --bn 0,512,1024,2048
  python tools/honest_bench.py --model llama2-7b          # all model shapes
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm

C = 3     # weight copies cycled by the loop index


def measure(N, K, fmt, bn, xq8, n_small=12, n_big=48, reps=3):
    rng = np.random.default_rng(0)
    qls = []
    for i in range(C):
        w = (rng.normal(size=(N, K)) / np.sqrt(K)).astype(np.float32)
        qls.append(jax.device_put(qm.quantize(w, fmt)))
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    kw = dict(x_quant8=xq8)
    if bn:
        kw["block_n"] = bn

    def maker(n):
        @jax.jit
        def f(x):
            def body(i, x):
                y = jax.lax.switch(
                    i % C, [lambda x, q=q: qm.qmatmul(x, q, **kw)
                            for q in qls], x)
                x = y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))
                return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-6)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    def run(n):
        f = maker(n)
        np.asarray(f(x0))
        return min((lambda t0: (np.asarray(f(x0)),
                                time.perf_counter() - t0)[1])(
                       time.perf_counter()) for _ in range(reps))

    us = (run(n_big) - run(n_small)) / (n_big - n_small) * 1e6
    nb = qls[0].nbytes
    gbs = nb / (us / 1e6) / 1e9
    return us, gbs, 100 * gbs / 819


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default=None, help="NxK")
    ap.add_argument("--model", default=None)
    ap.add_argument("--fmt", default="q4_k")
    ap.add_argument("--bn", default="0", help="comma list; 0 = auto")
    ap.add_argument("--no-xq8", action="store_true")
    args = ap.parse_args()

    shapes = []
    if args.shape:
        n, k = args.shape.split("x")
        shapes.append((int(n), int(k)))
    if args.model:
        from ggml_cuda_experiments_tpu.models.config import PRESETS
        cfg = PRESETS[args.model]
        d, hd = cfg.dim, cfg.head_dim
        ip = -(-cfg.intermediate // 4096) * 4096
        if ip > 1.15 * cfg.intermediate:
            ip = cfg.intermediate
        shapes += [((cfg.n_heads + 2 * cfg.n_kv_heads) * hd, d),
                   (d, cfg.n_heads * hd), (2 * ip, d), (d, ip),
                   (cfg.vocab_size, d)]
    if not shapes:
        shapes = [(12288, 4096)]

    for (N, K) in shapes:
        for bn in [int(b) for b in args.bn.split(",")]:
            us, gbs, pct = measure(N, K, args.fmt, bn, not args.no_xq8)
            print(f"[{N:6d}x{K:6d}] bn={bn or 'auto':>5} {us:8.1f} us  "
                  f"{gbs:6.1f} GB/s  {pct:5.1f}% roofline", flush=True)


if __name__ == "__main__":
    main()
