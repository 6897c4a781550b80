#!/usr/bin/env python
"""Analytical ICI scaling model, cross-checked against compiled collectives.

BASELINE.json's multi-host target (>=80% tokens/s scaling efficiency,
1 host -> N>=2 hosts at 7B Q4_K) cannot be measured on this single-chip dev
rig, so this tool provides the evidence trail instead:

1. an ANALYTICAL per-token ICI model: bytes over ICI per token per layer
   for each parallel axis (tp/sp/pp/ep) at 7B and 70B shapes, against ICI
   bandwidth and per-collective latency, yielding predicted scaling
   efficiency per axis;
2. a CROSS-CHECK: the tensor-parallel decode step is compiled on a virtual
   8-device CPU mesh and the collective ops in the optimized HLO are
   counted and sized — the model's bytes must match what XLA actually
   emits.

Hardware constants (documented assumptions, edit to retarget):
- v5e HBM: 819 GB/s/chip.
- v5e ICI: 2D torus, ~45 GB/s one-way per axis direction per chip
  (scaling-book figure); a bidirectional ring all-reduce on one mesh axis
  sustains ~2*45 = 90 GB/s/chip of algorithmic bandwidth.
- per-collective latency floor: ~1 us per hop (ring all-reduce of tiny
  decode activations is LATENCY-bound, not bandwidth-bound — this is the
  term that actually limits batch-1 TP decode scaling).
- DCN (across hosts): ~25 GB/s/host round — two orders below ICI, which
  is why the multi-host layout is data/pipeline-parallel, never TP.

Usage: python tools/ici_model.py [--check-hlo]
"""

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

HBM = 819e9
ICI_AR = 90e9          # algorithmic all-reduce GB/s per chip (one axis)
HOP_US = 1.0           # per-hop collective latency (us)
A = 2                  # bf16 activation bytes


def fmt_us(x):
    return f"{x*1e6:8.2f} us"


MODELS = {
    "7B": dict(dim=4096, inter=11008, n_layers=32, n_heads=32, n_kv=32,
               head_dim=128),
    "70B": dict(dim=8192, inter=28672, n_layers=80, n_heads=64, n_kv=8,
                head_dim=128),
}


def weight_bytes_layer(m, bpw=0.625):
    # q + k + v (dim -> (Hq + 2*Hkv)*hd), o ((Hq*hd) -> dim), gate/up/down
    return ((m["dim"] * (m["n_heads"] + 2 * m["n_kv"]) * m["head_dim"]
             + m["n_heads"] * m["head_dim"] * m["dim"])
            + 3 * m["dim"] * m["inter"]) * bpw


def analyze(name, m, n, batch=1):
    """Per-token per-layer times on n chips for each parallel axis."""
    wb = weight_bytes_layer(m)
    t_comp = wb / n / HBM                      # weight-stream floor/chip
    rows = {}

    # TP (Megatron): 2 all-reduces of the [B, dim] activation per layer.
    ar_bytes = 2 * (n - 1) / n * batch * m["dim"] * A       # per chip, each
    t_tp = 2 * (ar_bytes / ICI_AR + (n - 1) * HOP_US * 1e-6)
    rows["tp"] = (t_comp, t_tp)

    # SP (context-parallel split-KV decode): each layer merges per-shard
    # (O, m, s) partials: one psum/pmax pair over [B, Hq, D+2] f32.
    sp_bytes = 2 * (n - 1) / n * batch * m["n_heads"] * (
        m["head_dim"] + 2) * 4
    t_sp = sp_bytes / ICI_AR + 2 * (n - 1) * HOP_US * 1e-6
    # weights are REPLICATED under pure SP: per-chip stream not reduced
    rows["sp"] = (wb / HBM, t_sp)

    # PP: one [B, dim] activation handoff per stage boundary, amortized
    # over layers; bubble fraction (p-1)/(m+p-1) with m=4 microbatches.
    pp_bytes = batch * m["dim"] * A / (m["n_layers"] / n)   # per layer amort
    t_pp = pp_bytes / (45e9) + HOP_US * 1e-6 / (m["n_layers"] / n)
    rows["pp"] = (t_comp, t_pp)

    # EP (MoE, for the moe family): two all_to_alls of [B, dim] per MoE
    # layer (dispatch + combine), (n-1)/n of bytes cross-chip.
    ep_bytes = 2 * (n - 1) / n * batch * m["dim"] * A
    t_ep = ep_bytes / (2 * 45e9) + 2 * (n - 1) * HOP_US * 1e-6
    rows["ep"] = (t_comp, t_ep)

    print(f"\n{name} on {n} chips (batch {batch}; weight-stream/chip/layer "
          f"{fmt_us(t_comp)}):")
    print(f"  {'axis':4s} {'compute/layer':>14s} {'ici/layer':>12s} "
          f"{'eff (overlap)':>14s} {'eff (serial)':>13s}")
    for axis, (tc, tx) in rows.items():
        eff_o = tc / max(tc, tx)
        eff_s = tc / (tc + tx)
        print(f"  {axis:4s} {fmt_us(tc):>14s} {fmt_us(tx):>12s} "
              f"{eff_o:13.1%} {eff_s:12.1%}")
    return rows


def check_hlo():
    """Compile the TP decode step on a virtual 8-CPU mesh and count the
    collective bytes XLA actually emits; compare with the model."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    from ggml_cuda_experiments_tpu.models import llama
    from ggml_cuda_experiments_tpu.models.config import ModelConfig
    from ggml_cuda_experiments_tpu.parallel import tp
    from ggml_cuda_experiments_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(model=8, data=1)
    cfg = ModelConfig(
        name="hlo-check", vocab_size=256, dim=256, n_layers=2,
        n_heads=8, n_kv_heads=8, intermediate=512, head_dim=64,
        max_seq_len=128)
    params = llama.init_weights(cfg, seed=0)
    sparams = tp.shard_params(params, mesh)
    cache = tp.create_sharded_cache(cfg, mesh, 1, 128)
    step = tp.make_tp_step(cfg, mesh, sparams, decode=True)
    tok = jnp.zeros((1,), jnp.int32)
    lowered = jax.jit(step).lower(sparams, tok, cache)
    hlo = lowered.compile().as_text()

    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2}
    counts = {}
    for kind in ("all-reduce", "collective-permute", "all-gather",
                 "all-to-all", "reduce-scatter"):
        total = 0
        ops = 0
        for mo in re.finditer(
                rf"=\s*(\w+)\[([\d,]*)\](?:{{[\d,]*}})?\s+{kind}\(", hlo):
            dt, dims = mo.group(1), mo.group(2)
            n = 1
            for d in filter(None, dims.split(",")):
                n *= int(d)
            total += n * dt_bytes.get(dt, 4)
            ops += 1
        counts[kind] = (ops, total)
    print("\nHLO collective census (TP=8, decode step, dim=256, 2 layers):")
    for kind, (ops, total) in counts.items():
        if ops:
            print(f"  {kind:20s} {ops:3d} ops, {total:8d} payload bytes")
    # model prediction: 2 ARs/layer of [B, dim] (the repo psums in f32
    # after the f32-accumulated matmuls); lm_head logits return
    # vocab-SHARDED and are reassembled by the jit out-sharding, so no
    # additional AR appears.
    ars, ar_total = counts["all-reduce"]
    expect_ops = 2 * cfg.n_layers
    expect_bytes = expect_ops * cfg.dim * 4
    ok = ars == expect_ops and ar_total == expect_bytes
    print(f"  model predicts {expect_ops} all-reduces x {cfg.dim * 4} B "
          f"(2/layer, f32 [B,dim]): {'OK' if ok else 'MISMATCH'} "
          f"(got {ars} ops, {ar_total} B)")
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-hlo", action="store_true")
    args = ap.parse_args()

    for name, m in MODELS.items():
        for n in (2, 4, 8):
            analyze(name, m, n)

    print("""
Multi-host (DCN) note: the >=80% 1->N host target is met by keeping
per-token collectives OFF the DCN entirely — data-parallel request
sharding across hosts (throughput scales with host count; zero per-token
cross-host bytes; only load imbalance costs) with TP/SP confined to the
intra-host ICI domain, where the table above predicts >=97% bandwidth
efficiency and the latency term (the real cost at batch 1) stays
intra-host. Per-token DCN bytes under this layout: 0.""")

    if args.check_hlo:
        check_hlo()


if __name__ == "__main__":
    main()
