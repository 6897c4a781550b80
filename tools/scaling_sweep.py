#!/usr/bin/env python
"""Scaling-efficiency sweep: decode tokens/s vs device count
(BASELINE.json config 5; target >= 80% efficiency 1 host -> N hosts).

Weak-scaling serving measurement: the global batch grows with the mesh, so
efficiency = tok/s(N) / (N * tok/s(1)). Two modes:

  dp   batch sharded over a ``data`` axis (each shard decodes its own
       sequences; zero cross-device traffic on the token path) — this is
       the cross-host (DCN) axis of a pod, so its efficiency IS the
       multi-host scaling number
  tp   weights tensor-sharded over a ``model`` axis at fixed batch
       (strong scaling within an ICI domain; 2 psums/layer)

On a real pod, run one process per host after
``multihost.init_distributed`` and the same code measures true ICI/DCN
scaling; on a dev box it runs on N virtual CPU devices
(--cpu, jax.config 'jax_num_cpu_devices'), which validates the harness and
the SPMD programs, not the interconnect.

Usage:
  python tools/scaling_sweep.py --cpu --model debug --sizes 1,2,4,8
  python tools/scaling_sweep.py --model llama2-7b --mode tp   # real chips
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--model", default="debug")
ap.add_argument("--fmt", default=None, help="q4_k/q8_0/... (default dense)")
ap.add_argument("--mode", default="dp", choices=("dp", "tp"))
ap.add_argument("--sizes", default="1,2,4,8")
ap.add_argument("--batch-per-shard", type=int, default=1)
ap.add_argument("--steps", type=int, default=32)
ap.add_argument("--cache", type=int, default=256)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices",
                      max(int(s) for s in args.sizes.split(",")))
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.parallel import tp
from ggml_cuda_experiments_tpu.parallel.mesh import make_mesh


def measure(n: int, cfg, params_host) -> float:
    """tokens/s at mesh size n (marginal over two step counts)."""
    if args.mode == "dp":
        mesh = make_mesh(data=n, model=1)
        batch = args.batch_per_shard * n
    else:
        mesh = make_mesh(data=1, model=n)
        batch = args.batch_per_shard
    if args.fmt and args.mode == "tp":
        qp = tp.quantize_params_sharded(params_host, args.fmt,
                                        mesh.shape["model"])
    elif args.fmt:
        qp = llama.quantize_params(params_host, args.fmt)
    else:
        qp = params_host
    params = tp.shard_params(qp, mesh)
    step = tp.make_tp_step(cfg, mesh, params, decode=True)

    def run(steps):
        cache = tp.create_sharded_cache(cfg, mesh, batch, args.cache)
        tok = jnp.zeros((batch,), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(steps):
            logits, cache = step(params, tok, cache)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        np.asarray(tok)
        return time.perf_counter() - t0

    small, big = max(2, args.steps // 4), args.steps
    run(small), run(big)                       # compile
    ts = min(run(small) for _ in range(2))
    tb = min(run(big) for _ in range(2))
    return batch * (big - small) / (tb - ts)


def main():
    cfg = PRESETS[args.model]
    params_host = jax.tree.map(
        lambda a: np.asarray(a, np.float32),
        llama.init_weights(cfg, seed=0, as_numpy=True))
    sizes = [int(s) for s in args.sizes.split(",")]
    base = None
    print(f"model={args.model} fmt={args.fmt or 'dense'} mode={args.mode} "
          f"batch/shard={args.batch_per_shard}", flush=True)
    for n in sizes:
        if args.mode == "tp" and cfg.n_kv_heads % n:
            print(f"n={n}: skipped (model axis must divide n_kv_heads "
                  f"{cfg.n_kv_heads})", flush=True)
            continue
        tok_s = measure(n, cfg, params_host)
        if base is None:
            base = (sizes[0], tok_s)
        n0, t0 = base
        eff = tok_s / (t0 * n / n0) if args.mode == "dp" else tok_s / t0
        label = "efficiency" if args.mode == "dp" else "speedup"
        print(f"n={n}: {tok_s:8.1f} tok/s  {label} {eff:5.2f}", flush=True)


if __name__ == "__main__":
    main()
