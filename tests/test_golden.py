"""Golden-file end-to-end logits test — the analog of the reference's
three-way CPU/CUDA/llama.cpp-dump comparison (test_llama,
/root/reference/src/flash-matrix.cu:265-337): the full quantized pipeline
(q4_k weights, flash prefill, flash decode, KV cache) must reproduce the
committed logits. Regenerate with tools/make_golden.py ONLY after an
intentional numerics change."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.utils.tensor_io import load_tensor
from ggml_cuda_experiments_tpu.utils.harness import assert_close

GOLDEN = Path(__file__).parent / "data" / "golden_debug.tensor"


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden file not generated")
def test_end_to_end_matches_golden():
    want, name = load_tensor(GOLDEN)
    assert name.startswith("debug_q4k_seed1234")

    cfg = PRESETS["debug"]
    params = llama.quantize_params(llama.init_weights(cfg, seed=1234), "q4_k")
    prompt = jnp.asarray(np.arange(1, 9, dtype=np.int32)[None])
    cache = llama.KVCache.create(cfg, 1, 256)
    logits, cache = llama.prefill(params, cfg, prompt, cache)
    got = [np.asarray(logits)]
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(want.shape[0] - 1):
        logits, cache = llama.decode_step(params, cfg, tok, cache)
        got.append(np.asarray(logits))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    got = np.concatenate(got, axis=0)
    # bit-stable on the same backend; tiny tolerance for cross-platform runs
    assert_close(got, want, atol=1e-4, rtol=1e-4, name="golden logits")
    assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1)), \
        "greedy tokens diverge from golden"
