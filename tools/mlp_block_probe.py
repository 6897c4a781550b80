#!/usr/bin/env python
"""Per-call cost of the decode MLP block: fused megakernel vs unfused
chain, iteration-marginal (includes prep + launch + ramp, unlike the
size-marginal roofline number — this is the cost the decode loop pays).

Round-3 layer decomposition measured the MLP block at 167.3 us/layer vs a
103.7 us DMA floor (62%); this probe isolates where the integration loss
lives and validates phase-overlap changes to ``mlp_fused``.

Usage: python tools/mlp_block_probe.py [--dim 4096] [--inter 12288]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp


def marginal(fn, x0, n_small=64, n_big=320, reps=3):
    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        return time.perf_counter() - t0
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: fn(v), x)

    fs = lambda x: chain(x, n_small)
    fb = lambda x: chain(x, n_big)
    run(fs), run(fb)
    ts = min(run(fs) for _ in range(reps))
    tb = min(run(fb) for _ in range(reps))
    return (tb - ts) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--inter", type=int, default=12288)
    args = ap.parse_args()
    d, inter = args.dim, args.inter

    from ggml_cuda_experiments_tpu.ops import quant_matmul as qm

    rng = np.random.default_rng(0)
    wg = (rng.normal(size=(inter, d)) / np.sqrt(d)).astype(np.float32)
    wu = (rng.normal(size=(inter, d)) / np.sqrt(d)).astype(np.float32)
    wd = (rng.normal(size=(d, inter)) / np.sqrt(inter)).astype(np.float32)

    w_guf = jax.device_put(qm.quantize(qm.reorder_gu_rows(wg, wu), "q4_k"))
    w_gu = jax.device_put(qm.quantize(np.concatenate([wg, wu]), "q4_k"))
    w_down = jax.device_put(qm.quantize(wd, "q4_k"))
    jax.block_until_ready([w_guf.qs, w_gu.qs, w_down.qs])

    wbytes = w_guf.nbytes + w_down.nbytes
    floor = wbytes / 819e9
    print(f"weight stream {wbytes/2**20:.1f} MiB -> floor "
          f"{floor*1e6:.1f} us @819GB/s", flush=True)

    x0 = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))

    def norm(y):
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

    def fused(x):
        xp = qm.permute_activations(x)
        y = qm.mlp_fused(xp, w_guf, w_down)
        return norm(y)

    def unfused(x):
        # the real unfused path: one fused w_gu stream, prepermuted output
        y = qm.qmatmul(x, w_gu, x_quant8=True)
        kd = y.shape[-1] // 2
        mid = jax.nn.silu(y[..., :kd]) * y[..., kd:]
        out = qm.qmatmul(qm.permute_activations(mid), w_down,
                         x_quant8=True, x_prepermuted=True)
        return norm(out)

    for name, f in (("unfused", unfused), ("fused", fused)):
        us = marginal(f, x0) * 1e6
        print(f"{name:9s}: {us:7.1f} us/block "
              f"({100*floor*1e6/us:5.1f}% of stream floor)", flush=True)


if __name__ == "__main__":
    main()
