"""Marginal-timing probe: fused attention megakernel vs the composed
unfused path (qmatmul wqkv -> rope -> append -> flash_decode -> qmatmul wo)
at 7B decode shapes, on the real chip.

  python tools/fused_attn_probe.py [--len N] [--S N] [--reps N]

Chained-unrolled fori_loop pairs (16 vs 80 calls), min-of-reps, host fetch
to bound completion (bench.py methodology)."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import time
import numpy as np
import jax.numpy as jnp

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.ops.flash_decode import flash_decode
from ggml_cuda_experiments_tpu.ops.fused_attention import attention_fused
from ggml_cuda_experiments_tpu.models import llama

NH, D = 32, 128
DIM = NH * D


def arg(name, default):
    for a in sys.argv:
        if a.startswith(f"--{name}="):
            return int(a.split("=")[1])
    return default


def main():
    S = arg("S", 1024)
    length = arg("len", 40)
    reps = arg("reps", 6)
    n_lo, n_hi = arg("lo", 16), arg("hi", 80)
    rng = np.random.default_rng(1)
    wqkv = jax.device_put(qm.quantize(
        (rng.normal(size=(3 * DIM, DIM)) / np.sqrt(DIM)).astype(np.float32),
        "q4_k"))
    wo_np = (rng.normal(size=(DIM, DIM)) / np.sqrt(DIM)).astype(np.float32)
    wo_wof = jax.device_put(qm.quantize(wo_np, "q4_k", layout="wof"))
    wo_std = jax.device_put(qm.quantize(wo_np, "q4_k"))
    li, L = 1, 2
    kc = jnp.asarray((rng.normal(size=(L, 1, NH, S, D)) * 0.3), jnp.bfloat16)
    vc = jnp.asarray((rng.normal(size=(L, 1, NH, S, D)) * 0.3), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, DIM)).astype(np.float32))
    lens = jnp.array([length], jnp.int32)

    def fused_once(xx):
        o, _, _ = attention_fused(
            xx, wqkv, wo_wof, kc, vc, lens, li,
            n_heads=NH, n_kv_heads=NH, head_dim=D)
        return (o[:, :DIM] * 1e-3).astype(jnp.float32)

    def unfused_once(xx):
        qkv = qm.qmatmul(xx, wqkv, x_quant8=True)
        q = qkv[:, :DIM].reshape(1, 1, NH, D)
        k = qkv[:, DIM:2 * DIM].reshape(1, 1, NH, D)
        v = qkv[:, 2 * DIM:].reshape(1, 1, NH, D)
        pos = jnp.full((1, 1), length, jnp.int32)
        qr = llama.rope(q.astype(jnp.float32), pos, 10000.0)
        kr = llama.rope(k.astype(jnp.float32), pos, 10000.0)
        kc2 = kc.at[li, 0, :, length, :].set(kr[0, 0].astype(kc.dtype))
        vc2 = vc.at[li, 0, :, length, :].set(v[0, 0].astype(vc.dtype))
        o = flash_decode(qr[:, 0].astype(jnp.float32), kc2, vc2,
                         lens + 1, layer=li)
        y = qm.qmatmul(o.reshape(1, DIM), wo_std, x_quant8=True)
        return (y * 1e-3).astype(jnp.float32)

    def make(once, n):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, n, lambda i, xx: once(xx), x,
                                     unroll=True)
        return f

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name, once in (("fused", fused_once), ("unfused", unfused_once)):
        fa, fb = make(once, n_lo), make(once, n_hi)
        np.asarray(fa(x)); np.asarray(fb(x))
        us = (t(fb) - t(fa)) / (n_hi - n_lo) * 1e6
        print(f"{name:8s} attention/layer: {us:7.1f} us  "
              f"(ctx {length}, S {S})", flush=True)


if __name__ == "__main__":
    main()
