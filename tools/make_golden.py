#!/usr/bin/env python
"""Regenerate the golden end-to-end logits file used by
tests/test_golden.py — the analog of the reference's llama.cpp tensor dumps
(/root/reference/src/flash-matrix.cu:69-73), produced by this repo's own
deterministic debug model instead of an external capture.

Run (CPU) after an *intentional* numerics change:
    python tools/make_golden.py
and commit the updated tests/data/golden_debug.tensor.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.utils.tensor_io import save_tensor

OUT = Path(__file__).resolve().parents[1] / "tests" / "data"

PROMPT = np.arange(1, 9, dtype=np.int32)[None]   # fixed 8-token prompt
SEED = 1234
STEPS = 4


def main() -> None:
    cfg = PRESETS["debug"]
    params = llama.init_weights(cfg, seed=SEED)
    qparams = llama.quantize_params(params, "q4_k")

    cache = llama.KVCache.create(cfg, 1, 256)
    logits, cache = llama.prefill(qparams, cfg, jnp.asarray(PROMPT), cache)
    toks = [int(jnp.argmax(logits, -1)[0])]
    all_logits = [np.asarray(logits)]
    for _ in range(STEPS - 1):
        logits, cache = llama.decode_step(
            qparams, cfg, jnp.asarray(toks[-1:], jnp.int32), cache)
        toks.append(int(jnp.argmax(logits, -1)[0]))
        all_logits.append(np.asarray(logits))

    OUT.mkdir(parents=True, exist_ok=True)
    save_tensor(OUT / "golden_debug.tensor",
                np.concatenate(all_logits, axis=0).astype(np.float32),
                name=f"debug_q4k_seed{SEED}_prompt{PROMPT.tolist()}")
    print("tokens:", toks)
    print("wrote", OUT / "golden_debug.tensor")


if __name__ == "__main__":
    main()
