#!/usr/bin/env python
"""Layer-marginal decode profiling: HONEST per-layer cost decomposition.

The chained-microbench numbers in profile_decode.py overstate small weights:
a loop-invariant weight that fits VMEM (~16 MB) is hoisted by XLA and never
re-streamed, so e.g. the 9 MB wo matvec "measures" 400% of the HBM roofline.
Real models stream DIFFERENT weights every layer, so nothing is cacheable.

This tool times full decode steps on the real checkpoint while varying the
layer count (t(L1) - t(L0)) / (L1 - L0) and while ablating blocks inside the
layer (attention-only / MLP-only / glue-only forward variants). Every number
is a marginal over distinct-weight layers — no cache assistance possible.

Usage: python tools/layer_marginal.py [--model llama2-7b] [--fmt q4_k]
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


def bench_steps(fn, params, cfg, cache_maker, n_small=8, n_big=40, reps=3):
    """Seconds per decode step via the step-marginal method."""
    def run(steps):
        cache = cache_maker()
        tok = jnp.zeros((1,), jnp.int32)
        t0 = time.perf_counter()
        out = fn(params, tok, cache, steps)
        np.asarray(out)
        return time.perf_counter() - t0
    run(n_small), run(n_big)                     # compile both
    ts = min(run(n_small) for _ in range(reps))
    tb = min(run(n_big) for _ in range(reps))
    return (tb - ts) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--fmt", default="q4_k")
    ap.add_argument("--cache", type=int, default=1024)
    ap.add_argument("--ablate", action="store_true",
                    help="also run the glue-isolation ablation modes")
    args = ap.parse_args()

    from ggml_cuda_experiments_tpu.models.config import PRESETS
    from ggml_cuda_experiments_tpu.models import llama
    from ggml_cuda_experiments_tpu.utils import loader

    cfg = dataclasses.replace(PRESETS[args.model], x_quant8=True)
    # share bench.py's checkpoint cache (same v3 segment-local layout)
    ckpt = f"/tmp/bench_ckpt_{args.model}_{args.fmt}_v6.gctc"
    if os.path.exists(ckpt):
        print(f"loading {ckpt}", flush=True)
        params = loader.load_params(ckpt)
    else:
        params = llama.quantize_params(
            llama.init_weights(cfg, seed=0, as_numpy=True), args.fmt)
        try:
            loader.save_params(ckpt, params)
        except Exception as e:
            print(f"checkpoint cache failed: {e}", flush=True)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree.leaves(params))

    L = cfg.n_layers

    def make_stepper(mode):
        """mode: 'full' | 'attn' | 'mlp' | ablations.

        Ablation modes keep the layer's weight-stream traffic identical and
        drop glue stages, so mode differences isolate the glue:
          attn_mat   qkv+wo matvecs only (no rope/cache-write/flash_decode)
          attn_nofd  + rope + cache write, no flash_decode kernel
          mlp_mat    gate_up+down matvecs, silu(gate)*up replaced by `up`
        """
        @functools.partial(jax.jit, static_argnames=("steps", "n_layers"),
                           donate_argnums=(2,))
        def gen(params, tok, cache, steps, n_layers):
            lcfg = dataclasses.replace(cfg, n_layers=n_layers)

            def attn_ablate(layer, h, cache, li, positions, with_rope):
                import jax.numpy as jnp
                B, T, _ = h.shape
                Hq, Hkv, D = lcfg.n_heads, lcfg.n_kv_heads, lcfg.head_dim
                x = llama.rms_norm(h, layer["attn_norm"], lcfg.rms_eps)
                q, k, v = llama.qkv_proj(layer, x, lcfg)
                q = q.reshape(B, T, Hq, D)
                if with_rope:
                    k = k.reshape(B, T, Hkv, D)
                    q = llama.rope(q, positions, lcfg.rope_theta)
                    k = llama.rope(k, positions, lcfg.rope_theta)
                    kt = k.transpose(0, 2, 1, 3)
                    vt = v.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
                    pos0 = positions[:, 0]
                    cache = dataclasses.replace(
                        cache,
                        k=llama._write_cache_layer(cache.k, li, kt, pos0),
                        v=llama._write_cache_layer(cache.v, li, vt, pos0))
                o = (q + 1e-6 * jnp.sum(v)).reshape(B, T, Hq * D)
                out = llama.apply_linear(o.astype(h.dtype), layer["wo"],
                                         xq8=lcfg.x_quant8)
                return out, cache

            def mlp_mat(layer, h):
                x = llama.rms_norm(h, layer["mlp_norm"], lcfg.rms_eps)
                if "w_gu_f" in layer:       # fused layout checkpoint
                    y = llama.apply_linear(x, layer["w_gu_f"],
                                           xq8=lcfg.x_quant8)
                    kd = y.shape[-1] // 2
                    gate, up = y[..., :kd], y[..., kd:]
                    return llama.apply_linear(
                        up + 1e-6 * gate, layer["w_down"],
                        xq8=lcfg.x_quant8, x_prepermuted=True)
                gate, up = llama.gate_up_proj(layer, x, xq8=lcfg.x_quant8)
                return llama.apply_linear(up + 1e-6 * gate, layer["w_down"],
                                          xq8=lcfg.x_quant8)

            def step(carry, _):
                tok, cache = carry
                positions = cache.lengths[:, None]
                h = params["embed"][tok[:, None]]
                for li in range(n_layers):
                    layer = params["layers"][li]
                    if mode in ("full", "attn"):
                        attn, cache = llama._attention_block(
                            layer, lcfg, h, cache, li, positions,
                            decode=True)
                        h = h + attn
                    elif mode in ("attn_mat", "attn_nofd"):
                        attn, cache = attn_ablate(
                            layer, h, cache, li, positions,
                            with_rope=(mode == "attn_nofd"))
                        h = h + attn
                    if mode in ("full", "mlp"):
                        h = h + llama._mlp_block(layer, lcfg, h)
                    elif mode == "mlp_mat":
                        h = h + mlp_mat(layer, h)
                h = llama.rms_norm(h, params["final_norm"], lcfg.rms_eps)
                logits = llama.apply_linear(h[:, -1], params["lm_head"],
                                            xq8=lcfg.x_quant8)
                cache = dataclasses.replace(
                    cache, lengths=cache.lengths + 1)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (nxt, cache), nxt

            (_, _), toks = jax.lax.scan(step, (tok, cache), None,
                                        length=steps)
            return toks

        return gen

    def cache_maker():
        return llama.KVCache.create(cfg, 1, args.cache)

    results = {}
    full = make_stepper("full")

    # layer-marginal full cost
    per = {}
    for nl in (L // 2, L):
        f = lambda p, t, c, s, nl=nl: full(p, t, c, s, nl)
        sec = bench_steps(f, params, cfg, cache_maker)
        per[nl] = sec
        print(f"full model, {nl} layers: {sec*1e3:7.3f} ms/token "
              f"({1/sec:6.1f} tok/s)", flush=True)
    layer_ms = (per[L] - per[L // 2]) / (L - L // 2) * 1e3
    base_ms = per[L] * 1e3 - layer_ms * L       # embed+lm_head+sampling
    results["full layer"] = layer_ms
    print(f"-> marginal per-layer: {layer_ms*1e3:6.1f} us; "
          f"non-layer (embed+head+argmax): {base_ms:5.2f} ms", flush=True)

    # block ablations, layer-marginal within each mode
    modes = ("attn", "mlp", "attn_mat", "attn_nofd", "mlp_mat") \
        if args.ablate else ("attn", "mlp")
    for mode in modes:
        g = make_stepper(mode)
        pm = {}
        for nl in (L // 2, L):
            f = lambda p, t, c, s, nl=nl: g(p, t, c, s, nl)
            pm[nl] = bench_steps(f, params, cfg, cache_maker)
        m_ms = (pm[L] - pm[L // 2]) / (L - L // 2) * 1e3
        results[mode] = m_ms
        print(f"{mode:4s}-only layer marginal: {m_ms*1e3:6.1f} us/layer",
              flush=True)

    print("-" * 60)
    f_, a_, m_ = (results["full layer"], results["attn"], results["mlp"])
    print(f"attention block : {a_*1e3:6.1f} us/layer")
    print(f"mlp block       : {m_*1e3:6.1f} us/layer")
    print(f"full layer      : {f_*1e3:6.1f} us/layer "
          f"(blocks sum to {(a_+m_)*1e3:6.1f})")
    # ideal weight-stream floors for comparison
    d, hd, ip = cfg.dim, cfg.head_dim, -(-cfg.intermediate // 4096) * 4096
    bpp = {"q4_k": 0.5625, "q8_0": 1.0625, "q6_k": 0.8203,
           "q4_0": 0.5625}[args.fmt]
    attn_bytes = ((cfg.n_heads + 2 * cfg.n_kv_heads) * hd * d + d * d) * bpp
    mlp_bytes = 3 * ip * d * bpp
    bw = 819e9
    print(f"floors @819GB/s : attn {attn_bytes/bw*1e6:6.1f} us, "
          f"mlp {mlp_bytes/bw*1e6:6.1f} us, "
          f"layer {(attn_bytes+mlp_bytes)/bw*1e6:6.1f} us")


if __name__ == "__main__":
    main()
