#!/usr/bin/env python
"""Headline benchmark: % of HBM-bandwidth roofline on the Q4_K fused
dequant-matvec (the BASELINE.json primary metric; target >= 85%).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 85.0 (the driver-set target). Context lines
(q8_0 roofline, per-config table) go to stderr.

Method: a jitted fori_loop chains the fused matvec (decode shape:
x [1, 4096] against W [8192, 4096]^T, folded back to [1, 4096] so the loop
is closed); every iteration re-streams the quantized weights from HBM.
Marginal timing ((t_long - t_short) / extra_iters, with a host-side value
fetch forcing completion) removes the dispatch/fetch overhead of the
tunneled device — plain block_until_ready on this backend returns before
execution finishes, which would overstate GB/s by ~100x.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.utils.device_info import chip_spec, device_summary

K = 4096          # 7B model dim
N = 8192          # two stacked 7B attention-shaped projections per iter
N_SMALL = 8192    # size-marginal pair for roofline_pct
N_BIG = 32768
# Chain length: the per-pair marginal signal must dwarf the tunnel's
# dispatch/RTT jitter (~±10 ms on this rig). inner=2048 puts ~150 ms of
# on-device q4_k marginal into each (small, big) pair, so a ±10 ms
# timing spike moves a pair by ~7%, not by the 10-25x swings the old
# inner=96 protocol admitted (BENCH_r02's 937.9%-of-roofline trial).
INNER = 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chained(inner, ql, **kw):
    # NOTE: static (unrolled-at-trace) loop bound on purpose. A traced-bound
    # while loop measures nonsense on this backend (q8_0 apparently >190% of
    # the DMA floor); the statically-unrolled fori pipeline gives
    # self-consistent numbers that scale linearly with `inner`.
    # The inter-iteration fold is purely elementwise (no reduction): a
    # serializing scalar op between kernels adds ~10us dead time per
    # iteration, which understates GB/s — and it cancels exactly in the
    # two-size marginal below anyway.
    @jax.jit
    def chained(x):
        def body(_, x):
            y = qm.qmatmul(x, ql, **kw)
            return (y[:, :K] * 0.03 + y[:, K:2 * K] * 0.03
                    ).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, x)
    return chained


def _time_once(f, x0) -> float:
    t0 = time.perf_counter()
    np.asarray(f(x0))                        # fetch => full completion
    return time.perf_counter() - t0


def roofline_pct(fmt, inner=INNER, n_pairs=13, min_valid=7, **kw) -> float:
    """% of peak HBM BW, measured as the SIZE-marginal rate: the chained
    loop is timed with N=32768 and N=8192 row weights and the difference
    divided by the byte difference — per-call dispatch, fold latency and
    host<->device fetch cancel, leaving the kernel's streaming rate.

    Trial protocol (reference discipline: warmup + many repeats,
    /root/reference/src/misc/tensor-core.cu:41-73):
    - small and big runs are timed back-to-back as INTERLEAVED PAIRS, so
      tenancy/clock drift between the two phases cancels per pair (the old
      protocol min-reduced each size over a separate phase — a lucky RTT
      draw on one side produced physically impossible marginals);
    - each pair yields one marginal-rate sample; samples outside
      (0, 100]% of roofline are physically impossible (faster than the
      HBM, or a negative marginal) and are REJECTED with a remeasure —
      a kernel cannot beat the roofline, so such a sample can only be a
      timing artifact;
    - the reported number is the median of >= ``min_valid`` valid pairs
      (extra pairs are run if rejections eat the budget)."""
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(N_BIG, K)) / np.sqrt(K)).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    fs, nbytes = {}, {}
    for rows in (N_SMALL, N_BIG):
        ql = jax.device_put(qm.quantize(w[:rows], fmt))
        fs[rows] = make_chained(inner, ql, **kw)
        nbytes[rows] = ql.nbytes
        np.asarray(fs[rows](x0))             # compile + warm
    spec = chip_spec()
    peak_gbs = spec.hbm_bytes_per_s / 1e9
    dbytes = nbytes[N_BIG] - nbytes[N_SMALL]
    valid, rejected = [], []
    for i in range(3 * n_pairs):
        if i >= n_pairs and len(valid) >= min_valid:
            break
        t_s = _time_once(fs[N_SMALL], x0)
        t_l = _time_once(fs[N_BIG], x0)
        per_iter = (t_l - t_s) / inner
        pct = (100.0 * (dbytes / per_iter / 1e9) / peak_gbs
               if per_iter > 0 else float("inf"))
        (valid if 0.0 < pct <= 100.0 else rejected).append(pct)
    if not valid:                            # catastrophic rig noise
        # clamp into [0, 100]: a negative marginal is as impossible as a
        # faster-than-HBM one; never report a physically meaningless pct
        valid = [min(max(p, 0.0), 100.0)
                 for p in rejected if np.isfinite(p)] or [0.0]
    pcts = sorted(valid)
    pct = pcts[len(pcts) // 2]
    gbs = pct / 100.0 * peak_gbs
    log(f"{fmt}: {dbytes / (gbs * 1e9) * 1e6:.1f} us/Diter median, "
        f"{gbs:.1f} GB/s of {peak_gbs:.0f} "
        f"({pct:.1f}% roofline)  {kw}\n"
        f"  pairs valid={[round(p, 1) for p in sorted(valid)]} "
        f"rejected={[round(p, 1) for p in rejected]}")
    return pct


def decode_bench(model: str = "tinyllama-1.1b", fmt: str = "q4_k",
                 steps_a: int = 8, steps_b: int = 40) -> float:
    """End-to-end decode tokens/s (batch 1) for a real-shaped model.

    Marginal timing between two fully-jitted lax.scan generations removes
    prefill + dispatch overhead."""
    from ggml_cuda_experiments_tpu.models.config import PRESETS
    from ggml_cuda_experiments_tpu.models import llama
    import time as _t

    from ggml_cuda_experiments_tpu.utils import loader
    import os

    import dataclasses as _dc
    cfg = _dc.replace(PRESETS[model],
                      x_quant8="--exact" not in sys.argv)
    # v6: Q4_K-E default restored (s6 measured slower on-chip; the
    # encoding/layout is baked into the cached device arrays, so the key
    # must change with it)
    ckpt = f"/tmp/bench_ckpt_{model}_{fmt}_v6.gctc"
    t0 = _t.perf_counter()
    if os.path.exists(ckpt):
        log(f"loading cached checkpoint {ckpt}...")
        params = loader.load_params(ckpt)
        log(f"  loaded in {_t.perf_counter()-t0:.0f}s")
    else:
        log(f"building {model} {fmt} ({cfg.num_params()/1e9:.2f}B params)...")
        params = llama.init_weights(cfg, seed=0, as_numpy=True)
        params = llama.quantize_params(params, fmt)
        log(f"  quantized in {_t.perf_counter()-t0:.0f}s")
        try:
            loader.save_params(ckpt, params)
            log(f"  cached to {ckpt}")
        except Exception as e:
            log(f"  checkpoint cache failed: {e}")
    t0 = _t.perf_counter()
    params = jax.device_put(params)
    jax.block_until_ready(params)
    log(f"  device transfer issued in {_t.perf_counter()-t0:.0f}s")

    # Deploy layout for B=1 decode: permuted-hidden + whole-layer kernel
    # (round-5 ladder: 124.1 vs 108.9 tok/s on 7B; exact transform, token
    # streams identical — tests/test_hperm.py, test_layer_kernel.py).
    if "--no-hperm" not in sys.argv:
        try:
            t0 = _t.perf_counter()
            params = llama.permute_hidden_params(params, cfg)
            jax.block_until_ready(jax.tree.leaves(params))
            cfg = _dc.replace(cfg, hperm=True)
            log(f"  hperm layout + packed layer stream in "
                f"{_t.perf_counter()-t0:.0f}s (--no-hperm to disable)")
        except Exception as e:
            log(f"  hperm transform unavailable: {str(e)[:120]}")

    prompt = jnp.ones((1, 16), jnp.int32)

    def run(steps, batch=1, plen=16):
        # batch 8 at S=1024 is a 4.3 GB cache — next to the base weights
        # + the hperm/m_pack layout (~8.9 GB shared-structure total) it
        # OOMs the 16 GB chip; S=512 halves it and the decode reads the
        # same valid-length KV bytes either way
        cache = llama.KVCache.create(cfg, batch, 512 if batch > 1 else 1024)
        p = jnp.ones((batch, plen), jnp.int32)
        t0 = _t.perf_counter()
        toks = llama.generate_scan(params, cfg, p, cache, steps)
        np.asarray(toks)                     # force completion
        return _t.perf_counter() - t0

    # per-decoded-token weight-stream bytes: everything a decode step
    # actually streams (quantized linears at their REAL wire size + dense
    # head/norms); the embed table contributes one row lookup, not a
    # stream, so it is excluded. This replaces the old hard-coded
    # 0.625 B/weight (the Q4_K-E inflated encoding) — the denominator now
    # tracks the encoding the model actually ships in.
    def _leaf_bytes(leaf):
        return getattr(leaf, "nbytes", 0)

    def _layer_stream(layer):
        # per-step streamed weights only: with the packed stream present
        # the layer kernel streams w_pack + w_down; the separate
        # wqkv/wo/w_gu_f it was packed from stay resident for prefill
        # and must NOT double the denominator
        if "w_pack" in layer:
            drop = {"wqkv", "wo", "w_gu_f", "w_gate", "w_up"}
            layer = {k: v for k, v in layer.items() if k not in drop}
        return sum(_leaf_bytes(l) for l in jax.tree.leaves(layer))

    stream_bytes = (sum(_layer_stream(l) for l in params["layers"])
                    + sum(_leaf_bytes(l) for l in jax.tree.leaves(
                        [params["lm_head"], params["final_norm"]])))
    log(f"  weight stream: {stream_bytes/1e9:.2f} GB/token "
        f"({stream_bytes * 8 / cfg.num_params():.2f} bits/weight incl. "
        f"dense head/norms)")

    run(steps_a)                             # compile both
    run(steps_b)
    ta = min(run(steps_a) for _ in range(2))
    tb = min(run(steps_b) for _ in range(2))
    tok_s = (steps_b - steps_a) / (tb - ta)
    log(f"{model} {fmt} decode: {tok_s:.1f} tok/s "
        f"({(tb-ta)/(steps_b-steps_a)*1e3:.1f} ms/token, batch 1)")

    # p50 TTFT: prefill(512) + first decode step == generate 1 token
    try:
        ttfts = sorted(run(1, batch=1, plen=512) for _ in range(5))
        log(f"{model} {fmt} TTFT (512-token prompt, p50): "
            f"{ttfts[len(ttfts)//2]*1e3:.0f} ms")
    except Exception as e:
        log(f"TTFT measurement failed: {str(e)[:200]}")

    # batched decode throughput (BASELINE config 3: batch 1-8)
    try:
        t8a = min(run(steps_a, batch=8) for _ in range(2))
        t8b = min(run(steps_b, batch=8) for _ in range(2))
        steps_s8 = (steps_b - steps_a) / (t8b - t8a)
        log(f"{model} {fmt} decode batch 8: {steps_s8 * 8:.1f} tok/s total "
            f"({(t8b-t8a)/(steps_b-steps_a)*1e3:.1f} ms/step)")
    except Exception as e:
        log(f"batch-8 measurement failed: {str(e)[:200]}")
    return tok_s, stream_bytes


def vmem_report() -> None:
    """Per-kernel VMEM-footprint estimates for the benched shapes — the
    analog of the reference's shared-memory-KB print
    (/root/reference/src/kernel_test.h:230-232)."""
    for N_r, K_r in ((N_BIG, K), (4096, K), (11008, K), (4096, 12288)):
        p = qm.chunk8_plan(N_r, K_r)
        parts = ", ".join(f"{k} {v/2**20:.1f}M" for k, v in p["vmem_est"].items())
        log(f"q4_k matvec N={N_r} K={K_r}: bn={p['bn']} grid={p['grid']} "
            f"splits={p['splits']} vmem~{p['vmem_est_total']/2**20:.1f} MiB "
            f"(limit {'default' if p['vmem_limit'] is None else p['vmem_limit']//2**20}M)"
            f" [{parts}]")


class _Tracer:
    """`--trace`: wrap the measured region in jax.profiler.trace (xprof)."""

    def __init__(self, enabled: bool, out="/root/repo/xprof_trace"):
        self.enabled, self.out = enabled, out

    def __enter__(self):
        if self.enabled:
            import jax.profiler
            jax.profiler.start_trace(self.out)
            log(f"tracing to {self.out}")
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import jax.profiler
            jax.profiler.stop_trace()
            log(f"trace written to {self.out}")


def main() -> None:
    log(device_summary())
    trace = _Tracer("--trace" in sys.argv)
    if "--decode" in sys.argv:
        model = "tinyllama-1.1b"
        for a in sys.argv:
            if a.startswith("--model="):
                model = a.split("=", 1)[1]
        tok_s, stream_bytes = decode_bench(model)
        # Declared target: 85% of the model's weight-stream bound (every
        # decoded token streams all weights once) — the same
        # 85%-of-roofline bar as the primary metric, applied to
        # end-to-end decode. The denominator is the ACTUAL wire size of
        # the quantized model (measured from the device arrays), so the
        # bar cannot be softened by an inflated encoding.
        spec = chip_spec()
        target = 0.85 * spec.hbm_bytes_per_s / stream_bytes
        log(f"decode target: 0.85 * weight-stream bound = {target:.1f} tok/s")
        print(json.dumps({
            "metric": f"{model} q4_k decode throughput (batch 1)",
            "value": round(tok_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_s / target, 4),
        }))
        return

    vmem_report()
    with trace:
        q8 = roofline_pct("q8_0", n_pairs=4, min_valid=3, block_n=512)
        # the tunneled chip's sustained rate wanders between samples
        # (tenancy / clock noise); the pair protocol inside roofline_pct
        # (interleaved sizes, physical-plausibility filter, median of >=5
        # valid pairs) is the robustness layer — see its docstring
        pct = roofline_pct("q4_k", use_vpu=True, x_quant8=True)
        # ACHIEVABLE-ceiling control, measured in the same session: the
        # same operands/grid with the compute stubbed out (DMA stream
        # only). The kernel cannot beat this number on this day's rig, so
        # pct/ceiling is the tenancy-independent figure of merit — the
        # context the reference ships with every run via its shmem print
        # (/root/reference/src/kernel_test.h:230-232).
        try:
            qm.CHUNK8_STREAM_ONLY = True
            qm.qmatmul.clear_cache()
            ceiling = roofline_pct("q4_k", n_pairs=5, min_valid=3,
                                   use_vpu=True, x_quant8=True)
        except Exception as e:
            log(f"stream-only ceiling control failed: {str(e)[:200]}")
            ceiling = None
        finally:
            qm.CHUNK8_STREAM_ONLY = False
            qm.qmatmul.clear_cache()
    of_achievable = (round(100.0 * pct / ceiling, 2)
                     if ceiling else None)
    log(f"q4_k median: {pct:.1f}% (q8_0: {q8:.1f}%; stream-only ceiling "
        f"{ceiling and round(ceiling, 1)}% -> {of_achievable}% of achievable)")

    spec = chip_spec()
    print(json.dumps({
        "metric": f"q4_k dequant-matvec HBM roofline ({spec.device_kind})",
        "value": round(pct, 2),
        "unit": "% of peak HBM BW",
        "vs_baseline": round(pct / 85.0, 4),
        "ceiling_pct": ceiling and round(ceiling, 2),
        "pct_of_achievable": of_achievable,
    }))


if __name__ == "__main__":
    main()
