"""GGUF reader/writer: wire-format round trips, llama.cpp name mapping,
and end-to-end model load -> generation.

The codecs are validated by encode->decode round trips (bit-exact) and by
dequant equivalence against the planar oracle, so a checkpoint written by
llama.cpp (same wire layout) decodes to identical numerics.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.oracle import quant as q
from ggml_cuda_experiments_tpu.utils import gguf
from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.models.config import PRESETS


def test_q4k_scale_pack_roundtrip(rng):
    sc = rng.integers(0, 64, (50, 8)).astype(np.uint8)
    mn = rng.integers(0, 64, (50, 8)).astype(np.uint8)
    packed = gguf._q4k_scale_pack(sc, mn)
    sc2, mn2 = gguf._q4k_scale_unpack(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_wire_roundtrip_bit_exact(rng, fmt, tmp_path):
    w = rng.normal(size=(8, 512)).astype(np.float32)
    t = q.FORMATS[fmt][0](w)
    raw, gt = gguf.encode_tensor(t)
    t2 = gguf.decode_tensor(raw, gt, t.shape)
    deq = q.FORMATS[fmt][1]
    np.testing.assert_array_equal(deq(t), deq(t2))


def test_file_roundtrip(rng, tmp_path):
    path = str(tmp_path / "t.gguf")
    w1 = rng.normal(size=(16, 256)).astype(np.float32)
    w2 = rng.normal(size=(64,)).astype(np.float32)
    gguf.write_gguf(path, {
        "a.weight": q.quantize_q4_k(w1),
        "b.weight": w2,
    }, {"general.architecture": "llama", "llama.block_count": 2,
        "general.name": "test", "pi": 3.5, "flag": True,
        "words": ["x", "y"]})
    gf = gguf.read_gguf(path)
    assert gf.metadata["general.name"] == "test"
    assert gf.metadata["pi"] == pytest.approx(3.5)
    assert gf.metadata["flag"] is True
    assert gf.metadata["words"] == ["x", "y"]
    assert gf.tensors["a.weight"].shape == (16, 256)
    got = gf.load("a.weight")
    np.testing.assert_array_equal(
        q.dequantize_q4_k(got), q.dequantize_q4_k(q.quantize_q4_k(w1)))
    np.testing.assert_allclose(gf.load("b.weight"), w2)


def test_q6_k_dequant_known_values():
    """Hand-built single Q6_K superblock: all quants = 32+v (so q-32 = v),
    scale 2, d = 0.5 -> x = v."""
    blocks = np.zeros((1, 210), np.uint8)
    # ql: low nibbles of elems 0-31 and 32-63 per half; set q=34 -> val 2
    # q = (ql & 0xF) | ((qh bits) << 4) - 32; choose ql=2, qh bits=2 -> q=34
    blocks[0, :128] = 0x22          # both nibbles 2
    blocks[0, 128:192] = 0xAA       # qh: bits 10 at every 2-bit field
    blocks[0, 192:208] = 1          # scales = 1
    blocks[0, 208:210] = np.array([0.5], np.float16).view(np.uint8)
    out = gguf._dequantize_q6_k(blocks, (256,))
    # q = 2 | (2<<4) = 34; (34-32)*1*0.5 = 1.0
    np.testing.assert_allclose(out, np.full(256, 1.0), atol=1e-3)


def _tiny_model_gguf(path, rng, fmt="q4_k"):
    cfg = dataclasses.replace(PRESETS["debug"], dim=256, intermediate=512,
                              vocab_size=512)
    quant = {"q8_0": q.quantize_q8_0, "q4_0": q.quantize_q4_0,
             "q4_k": q.quantize_q4_k}[fmt]
    t = {}
    norm = lambda *s: rng.normal(size=s).astype(np.float32) / np.sqrt(s[-1])
    t["token_embd.weight"] = norm(cfg.vocab_size, cfg.dim)
    t["output_norm.weight"] = np.ones(cfg.dim, np.float32)
    t["output.weight"] = quant(norm(cfg.vocab_size, cfg.dim))
    for i in range(cfg.n_layers):
        hd = cfg.head_dim
        t[f"blk.{i}.attn_q.weight"] = quant(norm(cfg.n_heads * hd, cfg.dim))
        t[f"blk.{i}.attn_k.weight"] = quant(
            norm(cfg.n_kv_heads * hd, cfg.dim))
        t[f"blk.{i}.attn_v.weight"] = quant(
            norm(cfg.n_kv_heads * hd, cfg.dim))
        t[f"blk.{i}.attn_output.weight"] = quant(
            norm(cfg.dim, cfg.n_heads * hd))
        t[f"blk.{i}.ffn_gate.weight"] = quant(
            norm(cfg.intermediate, cfg.dim))
        t[f"blk.{i}.ffn_up.weight"] = quant(norm(cfg.intermediate, cfg.dim))
        t[f"blk.{i}.ffn_down.weight"] = quant(
            norm(cfg.dim, cfg.intermediate))
        t[f"blk.{i}.attn_norm.weight"] = np.ones(cfg.dim, np.float32)
        t[f"blk.{i}.ffn_norm.weight"] = np.ones(cfg.dim, np.float32)
    md = {
        "general.architecture": "llama", "general.name": "tiny",
        "llama.block_count": cfg.n_layers,
        "llama.embedding_length": cfg.dim,
        "llama.attention.head_count": cfg.n_heads,
        "llama.attention.head_count_kv": cfg.n_kv_heads,
        "llama.feed_forward_length": cfg.intermediate,
        "llama.attention.key_length": cfg.head_dim,
        "llama.context_length": cfg.max_seq_len,
        "llama.vocab_size": cfg.vocab_size,
        "llama.rope.freq_base": cfg.rope_theta,
        "llama.attention.layer_norm_rms_epsilon": cfg.rms_eps,
    }
    gguf.write_gguf(path, t, md)
    return cfg


def test_load_gguf_end_to_end(rng, tmp_path):
    path = str(tmp_path / "tiny.gguf")
    want_cfg = _tiny_model_gguf(path, rng)
    params, cfg = gguf.load_gguf(path)
    assert cfg.dim == want_cfg.dim
    assert cfg.n_layers == want_cfg.n_layers
    assert cfg.n_kv_heads == want_cfg.n_kv_heads
    assert cfg.vocab_size == want_cfg.vocab_size
    assert cfg.head_dim == want_cfg.head_dim

    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    toks = llama.generate(params, cfg, prompt, steps=4)
    assert toks.shape == (1, 4)
    assert np.all((toks >= 0) & (toks < cfg.vocab_size))


def test_load_gguf_matches_oracle_forward(rng, tmp_path):
    """Logits from the GGUF-loaded model == logits from the same oracle
    tensors quantized in-process (loader adds no numeric drift)."""
    from ggml_cuda_experiments_tpu.ops.quant_matmul import from_oracle

    path = str(tmp_path / "tiny2.gguf")
    _tiny_model_gguf(path, rng, fmt="q8_0")
    params, cfg = gguf.load_gguf(path)
    gf = gguf.read_gguf(path)

    # independent in-process build from the same wire tensors
    params2 = {"layers": []}
    params2["embed"] = jnp.asarray(gf.load("token_embd.weight"),
                                   jnp.bfloat16)
    params2["final_norm"] = jnp.asarray(gf.load("output_norm.weight"),
                                        jnp.bfloat16)
    params2["lm_head"] = from_oracle(gf.load("output.weight"))
    for i in range(cfg.n_layers):
        params2["layers"].append({
            "wq": from_oracle(gf.load(f"blk.{i}.attn_q.weight")),
            "wk": from_oracle(gf.load(f"blk.{i}.attn_k.weight")),
            "wv": from_oracle(gf.load(f"blk.{i}.attn_v.weight")),
            "wo": from_oracle(gf.load(f"blk.{i}.attn_output.weight")),
            "w_gate": from_oracle(gf.load(f"blk.{i}.ffn_gate.weight")),
            "w_up": from_oracle(gf.load(f"blk.{i}.ffn_up.weight")),
            "w_down": from_oracle(gf.load(f"blk.{i}.ffn_down.weight")),
            "attn_norm": jnp.asarray(
                gf.load(f"blk.{i}.attn_norm.weight"), jnp.bfloat16),
            "mlp_norm": jnp.asarray(
                gf.load(f"blk.{i}.ffn_norm.weight"), jnp.bfloat16),
        })

    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    cache1 = llama.KVCache.create(cfg, 1, 64)
    cache2 = llama.KVCache.create(cfg, 1, 64)
    l1, _ = llama.prefill(params, cfg, prompt, cache1)
    l2, _ = llama.prefill(params2, cfg, prompt, cache2)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
