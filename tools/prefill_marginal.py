#!/usr/bin/env python
"""TTFT decomposition: per-layer prefill cost + per-component ablations —
the prefill analog of tools/layer_marginal.py (VERDICT r3 item 4: 97 ms
measured vs a ~75 ms bound, with no decomposition published until now).

Times full prefill(T tokens) while varying layer count (layer-marginal)
and while ablating blocks inside the layer, all on the real checkpoint:

    full        the real prefill layer
    attn        attention block only (qkv + rope + cache write + flash + wo)
    mlp         MLP block only
    attn_mat    qkv+wo GEMMs only (no rope/cache/flash) — GEMM vs glue
    mlp_mat     gate_up+down GEMMs, silu glue dropped

plus the non-layer tail (embed + final norm + lm_head + argmax) directly
via a 0-layer prefill, and the last-token decode-shaped pieces.

Usage: python tools/prefill_marginal.py [--model llama2-7b] [--seq 512]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--fmt", default="q4_k")
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-pipe", action="store_true",
                    help="force the XLA dequant+GEMM fallback for "
                         "prefill-sized matmuls (A/B vs the pipelined "
                         "dequant kernel)")
    ap.add_argument("--pipe-bn", type=int, default=0,
                    help="override the pipelined kernel's row-tile size")
    ap.add_argument("--modes", default="attn,mlp,attn_mat,mlp_mat,flash")
    args = ap.parse_args()

    from ggml_cuda_experiments_tpu.models.config import PRESETS
    from ggml_cuda_experiments_tpu.models import llama
    from ggml_cuda_experiments_tpu.utils import loader

    cfg = dataclasses.replace(PRESETS[args.model], x_quant8=True)
    if args.no_pipe:
        llama._QPIPE_MAX_ROWS = 0       # GEMMs fall through to qmatmul_xla
    if args.pipe_bn:
        import functools as _ft
        from ggml_cuda_experiments_tpu.ops import quant_matmul as _qm
        llama.qmatmul = _ft.partial(_qm.qmatmul, block_n=args.pipe_bn)
    T = args.seq
    ckpt = f"/tmp/bench_ckpt_{args.model}_{args.fmt}_v6.gctc"
    if os.path.exists(ckpt):
        print(f"loading {ckpt}", flush=True)
        params = loader.load_params(ckpt)
    else:
        params = llama.quantize_params(
            llama.init_weights(cfg, seed=0, as_numpy=True), args.fmt)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree.leaves(params))
    L = cfg.n_layers

    def make_prefill(mode):
        @functools.partial(jax.jit, static_argnames=("n_layers",))
        def f(params, toks, cache, n_layers):
            lcfg = dataclasses.replace(cfg, n_layers=n_layers)
            B, Tt = toks.shape
            positions = jnp.broadcast_to(
                jnp.arange(Tt, dtype=jnp.int32), (B, Tt))
            h = params["embed"][toks]
            from ggml_cuda_experiments_tpu.ops.flash_attention import (
                flash_attention)
            for li in range(n_layers):
                layer = params["layers"][li]
                if mode in ("full", "attn"):
                    attn, cache = llama._attention_block(
                        layer, lcfg, h, cache, li, positions, decode=False)
                    h = h + attn
                elif mode == "attn_mat":
                    x = llama.rms_norm(h, layer["attn_norm"], lcfg.rms_eps)
                    q, k, v = llama.qkv_proj(layer, x, lcfg)
                    o = q + 1e-6 * (jnp.sum(k) + jnp.sum(v))
                    h = h + llama.apply_linear(
                        o.astype(h.dtype), layer["wo"], xq8=lcfg.x_quant8)
                elif mode == "flash":
                    # flash_attention alone on fresh q/k/v (weights read
                    # replaced by a cheap broadcast so only the kernel and
                    # its layout glue are in the marginal)
                    x = llama.rms_norm(h, layer["attn_norm"], lcfg.rms_eps)
                    B_, T_, D_ = x.shape
                    Hq, Hkv, hd = lcfg.n_heads, lcfg.n_kv_heads, lcfg.head_dim
                    q = jnp.broadcast_to(x[:, :, None, :hd],
                                         (B_, T_, Hq, hd)) * (1e-3 * li + 1)
                    kv = jnp.broadcast_to(x[:, :, None, :hd],
                                          (B_, T_, Hkv, hd))
                    o = flash_attention(
                        q.transpose(0, 2, 1, 3),
                        kv.transpose(0, 2, 1, 3),
                        kv.transpose(0, 2, 1, 3), causal=True)
                    h = h + o.transpose(0, 2, 1, 3).reshape(B_, T_, -1)[
                        ..., :1] * 1e-6
                if mode in ("full", "mlp"):
                    h = h + llama._mlp_block(layer, lcfg, h)
                elif mode == "mlp_mat":
                    x = llama.rms_norm(h, layer["mlp_norm"], lcfg.rms_eps)
                    wgu = layer.get("w_gu_f", layer.get("w_gu"))
                    y = llama.apply_linear(x, wgu, xq8=lcfg.x_quant8)
                    kd = y.shape[-1] // 2
                    h = h + llama.apply_linear(
                        y[..., kd:] + 1e-6 * y[..., :kd], layer["w_down"],
                        xq8=lcfg.x_quant8, x_prepermuted=True)
            h = llama.rms_norm(h, params["final_norm"], cfg.rms_eps)
            logits = llama.apply_linear(h[:, -1], params["lm_head"],
                                        xq8=cfg.x_quant8)
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return f

    toks = jnp.ones((1, T), jnp.int32)

    def timed(f, nl, reps):
        def run():
            cache = llama.KVCache.create(cfg, 1, 1024)
            t0 = time.perf_counter()
            np.asarray(f(params, toks, cache, nl))
            return time.perf_counter() - t0
        run()
        return min(run() for _ in range(reps))

    print(f"prefill T={T} decomposition ({args.model} {args.fmt})",
          flush=True)
    full = make_prefill("full")
    t0l = timed(full, 0, args.reps)
    print(f"non-layer (embed+norm+head+argmax): {t0l*1e3:7.2f} ms",
          flush=True)
    per = {}
    for nl in (L // 2, L):
        per[nl] = timed(full, nl, args.reps)
        print(f"full {nl:2d} layers: {per[nl]*1e3:7.2f} ms", flush=True)
    lay = (per[L] - per[L // 2]) / (L - L // 2)
    print(f"-> full-layer marginal: {lay*1e3:7.3f} ms/layer; "
          f"{L} layers = {lay*L*1e3:6.1f} ms; "
          f"fixed = {(per[L]-lay*L)*1e3:5.1f} ms", flush=True)

    for mode in args.modes.split(","):
        g = make_prefill(mode)
        pm = {nl: timed(g, nl, args.reps) for nl in (L // 2, L)}
        m = (pm[L] - pm[L // 2]) / (L - L // 2)
        print(f"{mode:8s}-only marginal: {m*1e3:7.3f} ms/layer "
              f"(x{L} = {m*L*1e3:5.1f} ms)", flush=True)

    # bounds
    d, hd, ip = cfg.dim, cfg.head_dim, -(-cfg.intermediate // 4096) * 4096
    flops_l = 2 * T * ((cfg.n_heads + 2 * cfg.n_kv_heads) * hd * d
                       + d * d + 3 * ip * d) + 4 * T * T * d
    print(f"MXU bound/layer @197TF bf16: {flops_l/197e12*1e3:6.3f} ms "
          f"(x{L} = {flops_l*L/197e12*1e3:5.1f} ms)")


if __name__ == "__main__":
    main()
