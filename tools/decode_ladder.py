#!/usr/bin/env python
"""Decode-throughput ladder: batch-1 tok/s with each megakernel gate
toggled, same process, same weights, back-to-back — the controlled
same-day comparison PERF.md's decode table quotes (single-number
cross-day comparisons are tenancy-noise; the reference's
measure-after-every-change discipline is /root/reference/src/kernel_test.h:149-228).

Usage: python tools/decode_ladder.py [--model=llama2-7b] [--rungs=all]
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(params, cfg, steps_a=8, steps_b=40, reps=3, batch=1):
    from ggml_cuda_experiments_tpu.models import llama

    def run(steps, plen=16):
        cache = llama.KVCache.create(cfg, batch, 1024)
        p = jnp.ones((batch, plen), jnp.int32)
        t0 = time.perf_counter()
        toks = llama.generate_scan(params, cfg, p, cache, steps)
        np.asarray(toks)
        return time.perf_counter() - t0

    run(steps_a)
    run(steps_b)
    ta = min(run(steps_a) for _ in range(reps))
    tb = min(run(steps_b) for _ in range(reps))
    return (steps_b - steps_a) / (tb - ta)


def main():
    model = "llama2-7b"
    for a in sys.argv:
        if a.startswith("--model="):
            model = a.split("=", 1)[1]

    from ggml_cuda_experiments_tpu.models.config import PRESETS
    from ggml_cuda_experiments_tpu.utils import loader
    from ggml_cuda_experiments_tpu.models import llama

    base = dataclasses.replace(PRESETS[model], x_quant8=True)
    import os
    ckpt = f"/tmp/bench_ckpt_{model}_q4_k_v6.gctc"
    for a in sys.argv:
        if a.startswith("--ckpt="):
            ckpt = a.split("=", 1)[1]
    t0 = time.perf_counter()
    if os.path.exists(ckpt):
        params = loader.load_params(ckpt)
    else:
        params = llama.quantize_params(
            llama.init_weights(base, seed=0, as_numpy=True), "q4_k")
        loader.save_params(ckpt, params)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    log(f"weights ready in {time.perf_counter()-t0:.0f}s")

    rungs = [
        ("unfused (flash_decode + per-matvec kernels)",
         dict(fuse_attn=False, fuse_mlp=False)),
        ("+ fused MLP", dict(fuse_attn=False, fuse_mlp=True)),
        ("+ fused attention", dict(fuse_attn=True, fuse_mlp=False)),
        ("+ both megakernels", dict(fuse_attn=True, fuse_mlp=True)),
    ]
    hperm_params = None
    if "--hperm" in sys.argv:
        t0 = time.perf_counter()
        hperm_params = jax.device_put(
            llama.permute_hidden_params(params, base))
        jax.block_until_ready(jax.tree.leaves(hperm_params))
        log(f"hperm transform in {time.perf_counter()-t0:.0f}s")
        rungs += [
            ("hperm + both megakernels",
             dict(hperm=True, fuse_attn=True, fuse_mlp=True)),
            ("hperm + LAYER megakernel",
             dict(hperm=True, fuse_layer=True)),
        ]
    if "--layer-only" in sys.argv:
        rungs = [r for r in rungs if "hperm" in r[0] or "both" in r[0]]
    if "--hperm-only" in sys.argv:
        # drop the base rungs AND the base params (batch-8 caches plus
        # two param copies exceed HBM; the hperm copy alone fits)
        rungs = [r for r in rungs if r[1].get("hperm")]
        params = None
    batch = 1
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    results = []
    for name, kw in rungs:
        cfg = dataclasses.replace(base, **kw)
        p = hperm_params if kw.get("hperm") else params
        t0 = time.perf_counter()
        tok_s = measure(p, cfg, batch=batch) * batch
        results.append((name, tok_s))
        log(f"{name}: {tok_s:.1f} tok/s  "
            f"({batch * 1e3/tok_s:.2f} ms/step; batch {batch}; rung took "
            f"{time.perf_counter()-t0:.0f}s)")
    print("\n=== decode ladder", model, f"(batch {batch}) ===")
    for name, tok_s in results:
        print(f"{tok_s:8.1f} tok/s  {name}")


if __name__ == "__main__":
    main()
