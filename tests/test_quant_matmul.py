"""Fused dequant-matmul kernels vs the quantization oracle.

The correctness contract: qmatmul (Pallas, fused dequant) == x @ dequant^T
computed entirely by the NumPy oracle — dequantization must be bit-identical,
so the only difference is matmul accumulation order (fp32, tiny)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggml_cuda_experiments_tpu.oracle import quant as quant_ref
from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.utils.harness import assert_close

FMTS = ["q8_0", "q4_0", "q4_k"]


def _device_dequant_ref(fmt, t, enc="e"):
    """The device dequant contract: GGML semantics for q8_0/q4_0; the
    Q6_K-E encoding for q6_k; for q4_k, the Q4_K-E bf16 effective scales
    (the default), or with ``enc="s6"`` the opt-in storage encoding's
    semantics (f32 = bf16(d) * exact 6-bit sc, in-kernel decode)."""
    import ml_dtypes
    if fmt == "q6_k":
        n, k = t.shape
        es = (np.repeat(t.d, 16, -1) * t.sc.astype(np.float32)
              ).astype(ml_dtypes.bfloat16).astype(np.float32)
        q = t.qs.reshape(n, k // 16, 16).astype(np.float32) - 32.0
        return (q * es[..., None]).reshape(n, k)
    if fmt != "q4_k":
        return quant_ref.FORMATS[fmt][1](t)
    n, k = t.shape
    if enc == "s6":
        dbf = t.d.astype(ml_dtypes.bfloat16).astype(np.float32)
        dmbf = t.dmin.astype(ml_dtypes.bfloat16).astype(np.float32)
        es = np.repeat(dbf, 8, -1) * t.sc.astype(np.float32)
        em = np.repeat(dmbf, 8, -1) * t.mn.astype(np.float32)
    else:                                # Q4_K-E
        es, em = qm.q4_k_effective(t)
        es = es.astype(np.float32)
        em = em.astype(np.float32)
    q = quant_ref.unpack_nibbles(t.qs.reshape(n, k // 32, 16)).astype(np.float32)
    return (q * es[..., None] - em[..., None]).reshape(n, k)


@pytest.mark.parametrize("fmt", FMTS)
def test_device_dequant_matches_contract(rng, fmt):
    """dequantize_jnp must reproduce the device dequant contract
    bit-for-bit."""
    w = rng.normal(size=(64, 512)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    want = _device_dequant_ref(fmt, t)
    ql = qm.from_oracle(t)
    got = np.asarray(qm.dequantize_jnp(ql))
    assert np.array_equal(got, want), f"{fmt} dequant mismatch"


def test_q4_k_e_encoding_close_to_ggml(rng):
    """The Q4_K-E bf16 effective scales stay within ~0.4% of exact GGML
    Q4_K dequantization — far below the 4-bit quantization step."""
    w = rng.normal(size=(32, 512)).astype(np.float32)
    t = quant_ref.quantize_q4_k(w)
    exact = quant_ref.dequantize_q4_k(t)
    device = _device_dequant_ref("q4_k", t)
    denom = max(1e-6, float(np.abs(exact).max()))
    assert float(np.abs(device - exact).max()) / denom < 0.01


@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("batch", [1, 8])
def test_qmatmul_fused_f32(rng, fmt, batch):
    """compute_dtype=f32: result must match the oracle to accumulation
    error only (dequant itself is bit-exact)."""
    n, k = 256, 1024
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    ql = qm.from_oracle(t)
    want = x @ _device_dequant_ref(fmt, t).T
    got = qm.qmatmul(jnp.asarray(x), ql, block_n=128,
                     compute_dtype=jnp.float32)
    assert_close(got, want, atol=5e-3, rtol=5e-3, name=f"qmatmul {fmt} B={batch}")


@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("batch,vpu", [(1, True), (1, False), (8, False)])
def test_qmatmul_fused_bf16_default(rng, fmt, batch, vpu):
    """Default bf16 compute (MXU-native / VPU matvec): f16-level accuracy,
    like the reference's fp16 WMMA dequant path."""
    n, k = 256, 1024
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    ql = qm.from_oracle(t)
    want = x @ _device_dequant_ref(fmt, t).T
    got = qm.qmatmul(jnp.asarray(x), ql, block_n=128, use_vpu=vpu)
    # bf16 weight rounding ~0.4% relative; amplified by K-sum cancellation
    scale = np.abs(want).max()
    err = np.abs(np.asarray(got) - want).max()
    assert err < 0.02 * scale, f"{fmt} B={batch} vpu={vpu}: err {err} vs {scale}"


@pytest.mark.parametrize("fmt", FMTS)
def test_qmatmul_xla_baseline(rng, fmt):
    n, k = 128, 512
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(4, k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    ql = qm.from_oracle(t)
    want = x @ _device_dequant_ref(fmt, t).T
    got = qm.qmatmul_xla(jnp.asarray(x), ql)
    assert_close(got, want, atol=5e-3, rtol=5e-3, name=f"qmatmul_xla {fmt}")


def test_qmatmul_unaligned_n(rng):
    """N not a multiple of block_n exercises the row-padding path."""
    n, k = 320, 512
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(2, k)).astype(np.float32)
    t = quant_ref.quantize_q8_0(w)
    ql = qm.from_oracle(t)
    want = x @ quant_ref.dequantize_q8_0(t).T
    got = qm.qmatmul(jnp.asarray(x), ql, block_n=256,
                     compute_dtype=jnp.float32)
    assert_close(got, want, atol=5e-3, rtol=5e-3, name="qmatmul unaligned N")


def test_nbytes_counts_packed_nibbles(rng):
    w = rng.normal(size=(64, 512)).astype(np.float32)
    ql = qm.quantize(w, "q4_0")
    # 4 bits/weight + f32 scale per 32
    assert ql.nbytes == 64 * 512 // 2 + 64 * (512 // 32) * 4


@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("k", [1024, 5632])   # 5632: K/32=176, repeat-hostile
def test_qmatvec_vpu_any_k(rng, fmt, k):
    """The 3-D VPU matvec path must handle any K multiple of 256 (incl.
    K/32 not a multiple of 128, where pltpu.repeat cannot lower)."""
    n = 64
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(1, k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    ql = qm.from_oracle(t)
    want = x @ _device_dequant_ref(fmt, t).T
    got = qm.qmatmul(jnp.asarray(x), ql, block_n=64, use_vpu=True)
    scale = np.abs(want).max()
    err = np.abs(np.asarray(got) - want).max()
    # K=5632 runs the bf16 selector-matmul fold -> bf16-level error
    tol = 5e-3 if k == 1024 else 2e-2
    assert err < tol * scale, f"{fmt} K={k}: err {err} vs scale {scale}"


@pytest.mark.parametrize("batch", [2, 5, 8])
def test_qmatvec_vpu_batched(rng, batch):
    """B-looped VPU path for small decode batches."""
    n, k = 128, 1024
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    t = quant_ref.quantize_q4_k(w)
    ql = qm.from_oracle(t)
    want = x @ _device_dequant_ref("q4_k", t).T
    got = qm.qmatmul(jnp.asarray(x), ql, block_n=128, use_vpu=True)
    scale = np.abs(want).max()
    # batched VPU path folds through a bf16 selector matmul
    assert np.abs(np.asarray(got) - want).max() < 2e-2 * scale


def test_misaligned_k_mxu_falls_back(rng):
    """B > VPU limit with repeat-hostile K must still be correct (XLA
    fallback)."""
    n, k = 64, 5632
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(16, k)).astype(np.float32)
    t = quant_ref.quantize_q8_0(w)
    ql = qm.from_oracle(t)
    want = x @ quant_ref.dequantize_q8_0(t).T
    got = qm.qmatmul(jnp.asarray(x), ql)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() < 2e-2 * scale


@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("batch", [1, 4])
def test_qmatmul_pipelined(rng, fmt, batch):
    """Software-pipelined dequant/dot kernel (epilogue-step grid) matches
    the device dequant contract at bf16 accuracy."""
    n, k = 512, 1024
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    ql = qm.from_oracle(t)
    want = x @ _device_dequant_ref(fmt, t).T
    got = qm.qmatmul(jnp.asarray(x), ql, block_n=128, pipelined=True)
    scale = np.abs(want).max()
    err = np.abs(np.asarray(got) - want).max()
    assert err < 2e-2 * scale, f"{fmt} pipelined B={batch}: err {err}"


@pytest.mark.parametrize("fmt", ["q4_k", "q4_0"])
def test_qmatmul_x_quant8(rng, fmt):
    """Integer-dot decode path (llama.cpp Q4_K x Q8_K analog): activations
    per-32-block int8-quantized, block dots as int8 MXU matmuls
    (_chunk8_kernel). Accuracy class = llama.cpp CUDA decode (~0.5% rel)."""
    n, k = 640, 4096
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    ql = qm.quantize(w, fmt)
    x = jnp.asarray(rng.normal(size=(1, k)).astype(np.float32))
    want = np.asarray(qm.qmatmul_xla(x, ql, compute_dtype=jnp.float32))
    got = np.asarray(qm.qmatmul(x, ql, use_vpu=True, x_quant8=True))
    scale = np.abs(want).max()
    err = np.abs(got - want).max()
    assert err < 2e-2 * scale, f"{fmt} x_quant8: err {err} vs scale {scale}"


def test_qmatmul_chunk_exact_fold(rng):
    """The f32 chunk-fold kernel (_chunk_kernel) is exact up to f32
    summation order: tight tolerance vs the f32 XLA reference."""
    n, k = 512, 4096
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    ql = qm.quantize(w, "q4_k")
    x = jnp.asarray(rng.normal(size=(1, k)).astype(np.float32))
    want = np.asarray(qm.qmatmul_xla(x, ql, compute_dtype=jnp.float32))
    got = np.asarray(qm.qmatmul(x, ql, use_vpu=True))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-4 * scale


def test_model_x_quant8_decode(rng):
    """End-to-end decode step with cfg.x_quant8: logits stay close to the
    exact-kernel decode (int8 activation quantization error only)."""
    import dataclasses
    import jax
    from ggml_cuda_experiments_tpu.models import llama
    from ggml_cuda_experiments_tpu.models.config import ModelConfig

    cfg = ModelConfig(name="t", vocab_size=256, dim=4096, n_layers=1,
                      n_heads=4, n_kv_heads=2, intermediate=4096,
                      head_dim=64, max_seq_len=128)
    params = llama.init_weights(cfg, seed=0)
    params = llama.quantize_params(params, "q4_k")
    cache = llama.KVCache.create(cfg, 1, 128)
    tok = jnp.zeros((1,), jnp.int32)
    exact, _ = llama.decode_step(params, cfg, tok, cache)
    cfg8 = dataclasses.replace(cfg, x_quant8=True)
    cache = llama.KVCache.create(cfg, 1, 128)
    q8, _ = llama.decode_step(params, cfg8, tok, cache)
    exact, q8 = np.asarray(exact), np.asarray(q8)
    scale = np.abs(exact).max()
    assert np.abs(q8 - exact).max() < 3e-2 * scale


# ---------------------------------------------------------------------------
# q6_k (16-element scale blocks; its own lane order and kernel)
# ---------------------------------------------------------------------------

def test_q6_device_dequant_matches_contract(rng):
    w = rng.normal(size=(64, 512)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    ql = qm.from_oracle(t)
    got = np.asarray(qm.dequantize_jnp(ql))
    assert np.array_equal(got, _device_dequant_ref("q6_k", t))


def test_q6_k_e_encoding_close_to_exact(rng):
    """bf16 effective per-16 scales stay well inside the 6-bit step."""
    w = rng.normal(size=(32, 512)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    exact = quant_ref.dequantize_q6_k(t)
    device = _device_dequant_ref("q6_k", t)
    denom = max(1e-6, float(np.abs(exact).max()))
    assert float(np.abs(device - exact).max()) / denom < 0.005


def test_q6_chunk_kernel_matvec(rng):
    """B=1 fast path (K/16 lane-aligned): accumulation error only."""
    n, k = 256, 2048
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    ql = qm.from_oracle(t)
    x = rng.normal(size=(1, k)).astype(np.float32)
    got = np.asarray(qm.qmatmul(jnp.asarray(x), ql))
    want = x @ _device_dequant_ref("q6_k", t).T
    assert_close(got, want, atol=5e-4, rtol=5e-4, name="q6_k chunk matvec")


@pytest.mark.parametrize("k", [4096, 8192])
def test_q6_hybrid_kernel_matvec(rng, k):
    """K % 4096 == 0 routes to the segment-local hybrid kernel (int8 MXU
    nibble dots + exact VPU 2-bit fold). The nibble activations are
    int8-quantized per scale block, so tolerance matches the q4 x_quant8
    class, not the exact-f32 chunk6 kernel."""
    n = 256
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    ql = qm.from_oracle(t)
    x = rng.normal(size=(1, k)).astype(np.float32)
    got = np.asarray(qm.qmatmul(jnp.asarray(x), ql))
    want = x @ _device_dequant_ref("q6_k", t).T
    denom = max(1e-6, float(np.abs(want).max()))
    rel = float(np.abs(got - want).max()) / denom
    assert rel < 2e-2, rel


def test_q6_dequant_roundtrip_seg_layout(rng):
    """dequantize_jnp must invert the segment-local lane order exactly."""
    n, k = 64, 4096
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    got = np.asarray(qm.dequantize_jnp(qm.from_oracle(t)))
    assert np.array_equal(got, _device_dequant_ref("q6_k", t))


@pytest.mark.parametrize("batch", [1, 4])
def test_q6_x_prepermuted(rng, batch):
    """q6_k must honor x_prepermuted (cfg.hperm feeds x in the q4-class
    std interleave; q6_k's own lane order differs — round-4 advisor found
    the permute applied on top of the hperm order, producing garbage)."""
    n, k = 256, 2048
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    ql = qm.from_oracle(t)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    xh = x[:, np.asarray(qm._perm(k))]       # hperm order, as llama.py does
    # f32 compute: this CPU backend's DotThunk lacks bf16 dots at B>1
    got = np.asarray(qm.qmatmul(jnp.asarray(xh), ql, x_prepermuted=True,
                                compute_dtype=jnp.float32))
    want = np.asarray(qm.qmatmul(jnp.asarray(x), ql,
                                 compute_dtype=jnp.float32))
    assert_close(got, want, atol=1e-5, rtol=1e-5, name="q6_k prepermuted")


@pytest.mark.parametrize("batch,k", [(1, 1024), (8, 2048)])
def test_q6_fallback_paths(rng, batch, k):
    """Unaligned-K B=1 and batched inputs route to the XLA dequant path."""
    n = 128
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    t = quant_ref.quantize_q6_k(w)
    ql = qm.from_oracle(t)
    x = rng.normal(size=(batch, k)).astype(np.float32)
    got = np.asarray(qm.qmatmul(jnp.asarray(x), ql))
    want = x @ _device_dequant_ref("q6_k", t).T
    assert_close(got, want, atol=3e-2, rtol=3e-2, name="q6_k fallback")


def test_q6_quantize_entry(rng):
    """quantize(w, 'q6_k') end-to-end (native codec when built)."""
    w = rng.normal(size=(64, 512)).astype(np.float32)
    ql = qm.quantize(w, "q6_k")
    assert ql.fmt == "q6_k" and ql.qh is not None
    deq = np.asarray(qm.dequantize_jnp(ql))
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.05


# ---------------------------------------------------------------------------
# segment-local interleave (K % 4096 == 0, K > 4096 — e.g. the padded 7B
# w_down K=12288): every kernel path must agree with the stored layout
# ---------------------------------------------------------------------------

def test_segment_layout_invariants():
    """The segment-local perm keeps the two nibble-half lanes of byte i at
    (i, i+K/2), keeps both lanes of a byte in one scale block, and maps
    lane j to stored scale column ((j % (K/2)) // 2048)*128 + j % 128."""
    k = 12288
    p, p32 = qm._perm(k), qm._perm32(k)
    assert np.array_equal(np.sort(p), np.arange(k))
    assert np.array_equal(np.sort(p32), np.arange(k // 32))
    j = np.arange(k)
    col = ((j % (k // 2)) // 2048) * 128 + (j % 128)   # stored scale column
    lo_blk = p[: k // 2] // 32                         # logical block of lane
    hi_blk = p[k // 2:] // 32
    # byte i pairs lanes (i, i+K/2): both nibbles share a scale block
    assert np.array_equal(lo_blk, hi_blk)
    # the stored scale column of lane j holds lane j's logical block
    assert np.array_equal(p32[col], p // 32)


def test_segment_layout_permute_activations(rng):
    """permute_activations must equal gathering by _perm for seg layouts."""
    for k in (8192, 12288):
        x = rng.normal(size=(2, k)).astype(np.float32)
        got = np.asarray(qm.permute_activations(jnp.asarray(x)))
        assert np.array_equal(got, x[:, qm._perm(k)]), f"K={k}"


@pytest.mark.parametrize("fmt", FMTS)
def test_segment_dequant_contract(rng, fmt):
    """dequantize_jnp round-trips the segment-local encoding bit-for-bit."""
    n, k = 16, 8192
    w = rng.normal(size=(n, k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    got = np.asarray(qm.dequantize_jnp(qm.from_oracle(t)))
    assert np.array_equal(got, _device_dequant_ref(fmt, t)), fmt


@pytest.mark.parametrize("k", [8192, 12288])
@pytest.mark.parametrize("path", ["chunk", "chunk8", "mxu_b8", "vpu_e_b2",
                                  "pipelined", "q8_mxu_b1", "xla"])
def test_segment_layout_all_paths(rng, k, path):
    """Every dispatch path agrees with the oracle under the segment-local
    layout (q4_k except the q8_0 MXU case)."""
    n = 256
    fmt = "q8_0" if path == "q8_mxu_b1" else "q4_k"
    w = (rng.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)
    t = quant_ref.FORMATS[fmt][0](w)
    ql = qm.from_oracle(t)
    b = {"mxu_b8": 8, "vpu_e_b2": 2, "xla": 4}.get(path, 1)
    x = rng.normal(size=(b, k)).astype(np.float32)
    want = x @ _device_dequant_ref(fmt, t).T
    xj = jnp.asarray(x)
    if path == "chunk":
        got = qm.qmatmul(xj, ql, use_vpu=True)
        tol = 1e-4                       # f32 fold: summation order only
    elif path == "chunk8":
        got = qm.qmatmul(xj, ql, use_vpu=True, x_quant8=True)
        tol = 2e-2                       # int8 activation quantization
    elif path == "mxu_b8":
        got = qm.qmatmul(xj, ql, block_n=128)
        tol = 2e-2                       # bf16 MXU compute
    elif path == "vpu_e_b2":
        got = qm.qmatmul(xj, ql, block_n=128, use_vpu=True)
        tol = 2e-2                       # bf16 selector fold
    elif path == "pipelined":
        got = qm.qmatmul(xj, ql, block_n=128, pipelined=True)
        tol = 2e-2
    elif path == "q8_mxu_b1":
        got = qm.qmatmul(xj, ql, block_n=128, compute_dtype=jnp.float32)
        tol = 1e-4
    else:
        got = qm.qmatmul_xla(xj, ql, compute_dtype=jnp.float32)
        tol = 1e-4
    scale = np.abs(want).max()
    err = np.abs(np.asarray(got) - want).max()
    assert err < tol * scale, f"{path} K={k}: err {err} vs scale {scale}"


@pytest.mark.parametrize("kd", [4096, 8192])
def test_mlp_fused_matches_unfused(rng, kd):
    """Fused silu-MLP kernel (one Pallas call: w_gu matvec -> silu*mul ->
    in-kernel activation quant/selector build -> w_down matvec) must match
    the unfused two-call path with the same quantized weights."""
    kg, nd = 4096, 256
    wg = (rng.normal(size=(kd, kg)) / 64).astype(np.float32)
    wu = (rng.normal(size=(kd, kg)) / 64).astype(np.float32)
    wd = (rng.normal(size=(nd, kd)) / 64).astype(np.float32)
    w_guf = qm.quantize(qm.reorder_gu_rows(wg, wu), "q4_k")
    w_down = qm.quantize(wd, "q4_k")
    assert qm.mlp_fused_supported(w_guf, w_down)

    x = jnp.asarray((rng.normal(size=(1, kg))).astype(np.float32))
    xp = qm.permute_activations(x)
    got = np.asarray(qm.mlp_fused(xp, w_guf, w_down))

    # unfused reference over the SAME quantized weights + the same
    # per-block int8 activation quantization (x_quant8)
    y = np.asarray(qm.qmatmul(x, w_guf, use_vpu=True, x_quant8=True))
    mid_p = (y[:, :kd] / (1 + np.exp(-y[:, :kd]))) * y[:, kd:]
    mid = mid_p[:, qm._inv_perm(kd)]
    want = np.asarray(qm.qmatmul(jnp.asarray(mid), w_down,
                                 use_vpu=True, x_quant8=True))
    scale = max(np.abs(want).max(), 1e-6)
    err = np.abs(got - want).max() / scale
    assert err < 2e-2, f"rel err {err:.3e}"


# ---------------------------------------------------------------------------
# s6 opt-in storage encoding: every kernel path must decode it in-kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [4096, 12288])
@pytest.mark.parametrize("path", ["chunk", "chunk8", "mxu_b16",
                                  "pipelined", "xla"])
def test_s6_encoding_all_paths(rng, k, path):
    """from_oracle(enc="s6") against the s6 dequant contract on each
    dispatch path (the s6 wire layout: combined int8 sc|mn + bf16
    superblock d|dmin, quant_matmul module docstring)."""
    import jax.numpy as jnp
    n = 256
    w = rng.normal(size=(n, k)).astype(np.float32) / np.sqrt(k)
    t = quant_ref.quantize_q4_k(w)
    ql = qm.from_oracle(t, enc="s6")
    assert ql.enc == "s6" and ql.em is None
    assert ql.nbytes * 8 / (n * k) == pytest.approx(4.625)
    want_w = _device_dequant_ref("q4_k", t, enc="s6")
    np.testing.assert_array_equal(
        np.asarray(qm.dequantize_jnp(ql)), want_w)
    B = 16 if path == "mxu_b16" else 1
    x = rng.normal(size=(B, k)).astype(np.float32)
    want = x @ want_w.T
    xj = jnp.asarray(x)
    if path == "chunk":
        got = qm.qmatmul(xj, ql, use_vpu=True)
        tol = 1e-4
    elif path == "chunk8":
        got = qm.qmatmul(xj, ql, use_vpu=True, x_quant8=True)
        tol = 2e-2
    elif path == "mxu_b16":
        got = qm.qmatmul(xj, ql, block_n=128)
        tol = 2e-2
    elif path == "pipelined":
        got = qm.qmatmul(xj, ql, block_n=128, pipelined=True)
        tol = 2e-2
    else:
        got = qm.qmatmul_xla(xj, ql, compute_dtype=jnp.float32)
        tol = 1e-4
    scale = np.abs(want).max()
    err = np.abs(np.asarray(got) - want).max()
    assert err < tol * scale, f"s6 {path} K={k}: err {err} vs {scale}"


def test_s6_wof_and_mlp_fused(rng):
    """s6 x wof layout, and the fused-MLP kernel decoding s6 in-kernel."""
    import jax.numpy as jnp
    k = 4096
    w = rng.normal(size=(256, k)).astype(np.float32) / 64
    ql = qm.from_oracle(quant_ref.quantize_q4_k(w), layout="wof",
                        enc="s6")
    ref = np.asarray(qm.dequantize_jnp(ql))
    x = rng.normal(size=(1, k)).astype(np.float32)
    y = np.asarray(qm.qmatmul(jnp.asarray(x), ql, use_vpu=True,
                              x_quant8=True))
    want = x @ ref.T
    assert np.abs(y - want).max() < 2e-2 * np.abs(want).max()

    kg, kd = 4096, 12288
    wg = rng.normal(size=(kd, kg)).astype(np.float32) / 64
    wu = rng.normal(size=(kd, kg)).astype(np.float32) / 64
    wd = rng.normal(size=(kg, kd)).astype(np.float32) / 110
    w_guf = qm.from_oracle(
        quant_ref.quantize_q4_k(qm.reorder_gu_rows(wg, wu)), enc="s6")
    w_down = qm.from_oracle(quant_ref.quantize_q4_k(wd), enc="s6")
    assert qm.mlp_fused_supported(w_guf, w_down)
    x = rng.normal(size=(1, kg)).astype(np.float32) * 0.05
    xp = qm.permute_activations(jnp.asarray(x))
    got = np.asarray(qm.mlp_fused(xp, w_guf, w_down))
    gu_ref = np.asarray(qm.dequantize_jnp(w_guf))
    dn_ref = np.asarray(qm.dequantize_jnp(w_down))
    y = x @ gu_ref.T
    g, u = y[:, :kd], y[:, kd:]
    mid_p = (g / (1 + np.exp(-g))) * u
    mid = np.zeros_like(mid_p)
    mid[:, np.asarray(qm._perm(kd))] = mid_p
    want = mid @ dn_ref.T
    assert np.abs(got - want).max() < 2e-2 * np.abs(want).max()


def test_plans_zero_pad_for_model_shapes():
    """The B=1 dispatch tile plans must produce ZERO row padding for every
    128-multiple N — a padded plan jnp.pads the whole weight INSIDE the
    jit, which XLA does not hoist out of a decode scan (round 4: the q4_k
    lm_head [32000, 4096] re-copied 78 MiB every step, 3x the matvec
    cost; tools/nonlayer_probe.py)."""
    from ggml_cuda_experiments_tpu.ops.quant_matmul import (
        _bn_no_pad, chunk8_plan)

    for n, k in ((32000, 4096), (32768, 4096), (24576, 4096),
                 (12288, 4096), (8192, 4096),
                 (4096, 4096), (4096, 12288), (32000, 2048), (5632, 2048)):
        p = chunk8_plan(n, k)
        assert p["Np"] == n, (n, k, p)
        assert n % p["bn"] == 0
    # no >=1024 divisor tile exists for these, but the tiered fallback
    # still finds a ZERO-pad tile (a few extra grid steps beat re-copying
    # the whole weight through jnp.pad on every call):
    # 11008 = 128*2*43 -> bn=256; llama3-8b head 128256 = 128*2*3*167
    # -> bn=768
    for n, want_bn in ((11008, 256), (128256, 768)):
        p = chunk8_plan(n, 4096)
        assert p["Np"] == n and p["bn"] == want_bn, (n, p)
    assert _bn_no_pad(11008, 4096) == 256
    # benched shapes keep their measured-optimal plans (segmented-K cap
    # raised to 1024 by the round-4 subtile fold: 79.7% vs 68.8 at 512)
    assert chunk8_plan(32768, 4096)["bn"] == 4096
    assert chunk8_plan(4096, 12288)["bn"] == 1024
    # helper contract: only 128-multiple N; tiered fallback below
    assert _bn_no_pad(32000, 4096) == 3200
    assert _bn_no_pad(32001, 4096) == 0
