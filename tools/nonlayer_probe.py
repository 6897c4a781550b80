#!/usr/bin/env python
"""Decompose the NON-LAYER decode cost (embed + final norm + lm_head +
argmax + scan glue) — the single largest measured decode loss in round 3
(~450 us/step vs a ~116 us lm_head stream floor, PERF.md).

Method: a 0-layer decode scan whose step does a staged prefix of the real
non-layer work; every stage is forced by DATA DEPENDENCE on the next token
(the carried token is derived from the stage's output, so XLA cannot
dead-code any of it). Stage deltas isolate each component:

    scan    carried (tok, lengths) only           -> scan/dispatch glue
    embed   + h = embed[tok]                      -> embed gather
    norm    + final rms_norm                      -> norm cost
    head    + lm_head matvec (sum-forced logits)  -> the matvec itself
    argmax  + argmax over logits (the real step)  -> sampling cost

Timing is step-marginal inside ONE jit (t(S_big) - t(S_small)) /
(S_big - S_small) with a host fetch bounding completion (the only honest
method on this backend — PERF.md methodology).

Usage: python tools/nonlayer_probe.py [--model llama2-7b] [--fmt q4_k]
       [--head-fmt q6_k] [--reps 3]
"""

import argparse
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
    ap.add_argument("--head-fmt", default=None,
                    help="also probe the head stage with this lm_head "
                         "format (e.g. q6_k — the 7B wire anchor's head)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--steps", type=int, nargs=2, default=(16, 256))
    args = ap.parse_args()

    from ggml_cuda_experiments_tpu.models.config import PRESETS
    from ggml_cuda_experiments_tpu.models import llama
    from ggml_cuda_experiments_tpu.utils import loader
    import dataclasses

    cfg = dataclasses.replace(PRESETS[args.model], x_quant8=True)
    V = cfg.vocab_size

    ckpt = f"/tmp/bench_ckpt_{args.model}_{args.fmt}_v6.gctc"
    if os.path.exists(ckpt):
        print(f"loading {ckpt}", flush=True)
        params = loader.load_params(ckpt)
        nl = {"embed": params["embed"], "final_norm": params["final_norm"],
              "lm_head": params["lm_head"]}
    else:
        # only the non-layer weights are needed — build just those
        print("building non-layer weights only", flush=True)
        import ml_dtypes
        rng = np.random.default_rng(0)
        emb = (rng.normal(size=(V, cfg.dim)).astype(np.float32) * 0.02)
        from ggml_cuda_experiments_tpu.ops.quant_matmul import quantize
        nl = {"embed": emb.astype(ml_dtypes.bfloat16),
              "final_norm": np.ones((cfg.dim,), ml_dtypes.bfloat16),
              "lm_head": quantize(
                  rng.normal(size=(V, cfg.dim)).astype(np.float32)
                  / np.sqrt(cfg.dim), args.fmt)}
    nl = jax.device_put(nl)
    jax.block_until_ready(jax.tree.leaves(nl))

    heads = {"": nl["lm_head"]}
    if args.head_fmt:
        from ggml_cuda_experiments_tpu.ops.quant_matmul import (
            dequantize_jnp, quantize)
        w = np.asarray(dequantize_jnp(nl["lm_head"])) \
            if not isinstance(nl["lm_head"], np.ndarray) else nl["lm_head"]
        hq = jax.device_put(quantize(w, args.head_fmt))
        jax.block_until_ready(jax.tree.leaves(hq))
        heads[args.head_fmt] = hq

    def make_stepper(mode, head):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def gen(nl, tok0, steps):
            def step(carry, _):
                tok, lengths = carry
                lengths = lengths + 1
                if mode == "scan":
                    return ((tok + 1) % V, lengths), tok
                h = nl["embed"][tok[:, None]]          # [B, 1, dim]
                if mode == "embed":
                    s = jnp.sum(h.astype(jnp.float32))
                    nxt = (tok + 1 + s.astype(jnp.int32)) % V
                    return (nxt, lengths), tok
                h = llama.rms_norm(h, nl["final_norm"], cfg.rms_eps)
                if mode == "norm":
                    s = jnp.sum(h.astype(jnp.float32))
                    nxt = (tok + 1 + s.astype(jnp.int32)) % V
                    return (nxt, lengths), tok
                logits = llama.apply_linear(h[:, -1], head,
                                            xq8=cfg.x_quant8)
                if mode == "head":
                    s = jnp.sum(logits.astype(jnp.float32))
                    nxt = (tok + 1 + s.astype(jnp.int32)) % V
                    return (nxt, lengths), tok
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (nxt, lengths), tok

            carry0 = (tok0, jnp.zeros((1,), jnp.int32))
            (_, _), toks = jax.lax.scan(step, carry0, None, length=steps)
            return toks

        return gen

    s_small, s_big = args.steps
    tok0 = jnp.zeros((1,), jnp.int32)

    def marginal(gen):
        def run(steps):
            t0 = time.perf_counter()
            np.asarray(gen(nl, tok0, steps))
            return time.perf_counter() - t0
        run(s_small), run(s_big)                  # compile
        ts = min(run(s_small) for _ in range(args.reps))
        tb = min(run(s_big) for _ in range(args.reps))
        return (tb - ts) / (s_big - s_small)

    rows = []
    for mode in ("scan", "embed", "norm", "head", "argmax"):
        for hname, head in heads.items():
            if hname and mode not in ("head", "argmax"):
                continue
            sec = marginal(make_stepper(mode, head))
            label = mode + (f" [{hname} head]" if hname else "")
            rows.append((label, sec * 1e6))
            print(f"{label:22s}: {sec*1e6:7.1f} us/step", flush=True)

    print("-" * 50)
    base = dict(rows)
    order = ["scan", "embed", "norm", "head", "argmax"]
    prev = 0.0
    for m in order:
        if m in base:
            print(f"{m:10s} delta: {base[m]-prev:7.1f} us")
            prev = base[m]
    hb = -(-V // 256) * 256
    head_bytes = heads[""].nbytes if hasattr(heads[""], "nbytes") else 0
    print(f"lm_head stream floor @819GB/s: {head_bytes/819e9*1e6:6.1f} us "
          f"({head_bytes/2**20:.1f} MiB)")


if __name__ == "__main__":
    main()
