#!/usr/bin/env python
"""Roofline-headroom sweep over chunk8 tile/subtile knobs, using bench.py's
robust interleaved-pair protocol (NOT the old min-reduce chains) so every
number is comparable to the driver's metric of record.

Knobs: block_n (grid tile rows) and the row-subtile target inside the
kernel body (quant_matmul._row_splits). Round-3 shipped bn=4096 with
1024-row subtiles at 85-87%; the diagnosed remaining tail is per-grid-step
fixed cost + the unpack/dot chain's non-overlapped tail (VERDICT item 3).

Usage: python tools/roofline_sweep.py [--pairs 7]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import bench
from ggml_cuda_experiments_tpu.ops import quant_matmul as qm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--min-valid", type=int, default=5)
    ap.add_argument("--variants", default="base,bn8192,bn2048,sub512,sub2048")
    args = ap.parse_args()

    orig_splits = qm._row_splits

    def set_target(t):
        qm._row_splits = lambda bn, target=t: orig_splits(bn, target)

    for v in args.variants.split(","):
        kw = dict(use_vpu=True, x_quant8=True)
        qm._row_splits = orig_splits
        qm.CHUNK8_FOLD = "subtile"        # module default
        qm.CHUNK8_EXTRA_CONST_WINDOWS = 0
        qm.CHUNK8_EXTRA_TILED_WINDOWS = 0
        qm.CHUNK8_STREAM_ONLY = False
        if v == "base":
            pass
        elif v.startswith("bn"):
            kw["block_n"] = int(v[2:])
            # PROTOCOL GUARD: a forced block_n >= N_SMALL gives the pair's
            # small side a 1-step grid (serialized DMA/compute), inflating
            # t_small and therefore the marginal — the round-4 bn=8192
            # "88.8%" artifact. Both pair sizes must keep >= 2 steps.
            if kw["block_n"] * 2 > bench.N_SMALL:
                print(f"VARIANT {v}: SKIPPED (block_n {kw['block_n']} "
                      f"would give N_SMALL={bench.N_SMALL} a 1-step grid "
                      f"— marginal would be an artifact)")
                continue
        elif v.startswith("sub"):
            set_target(int(v[3:]))
        elif v.startswith("fold_"):
            qm.CHUNK8_FOLD = v[5:]        # "full" | "subtile"
        elif v == "stream":               # DMA-only ceiling probe
            qm.CHUNK8_STREAM_ONLY = True
        elif v.startswith("cwin"):        # N extra const probe windows
            qm.CHUNK8_EXTRA_CONST_WINDOWS = int(v[4:])
        elif v.startswith("twin"):        # N extra tiled probe windows
            qm.CHUNK8_EXTRA_TILED_WINDOWS = int(v[4:])
        else:
            print(f"unknown variant {v}")
            continue
        qm.qmatmul.clear_cache()
        try:
            pct = bench.roofline_pct("q4_k", n_pairs=args.pairs,
                                     min_valid=args.min_valid, **kw)
            print(f"VARIANT {v:8s}: {pct:.1f}%", flush=True)
        except Exception as e:
            print(f"VARIANT {v:8s}: FAILED {str(e)[:150]}", flush=True)
    qm._row_splits = orig_splits


if __name__ == "__main__":
    main()
