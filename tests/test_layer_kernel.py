"""Whole-layer kernel vs the composed two-megakernel + XLA-glue reference.

The layer kernel chains attn-norm -> wqkv -> rope -> flash decode -> wo ->
residual -> mlp-norm -> w_gu -> silu -> w_down -> residual in one call
(permuted-hidden layout). Reference: attention_fused + mlp_fused with the
same permuted weights, glued in jnp — identical operand math, so the
outputs must agree to float-accumulation tolerance.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
from ggml_cuda_experiments_tpu.ops.fused_attention import attention_fused
from ggml_cuda_experiments_tpu.ops.layer_kernel import (
    layer_step, layer_step_supported, pack_stream,
)

DIM, HQ, HKV, D = 4096, 32, 32, 128
KD = 12288
EPS = 1e-5


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(7)
    perm = np.asarray(qm._perm(DIM))
    wqkv = qm.quantize(
        (rng.normal(size=(3 * DIM, DIM)) / 64).astype(np.float32), "q4_k")
    wo = qm.quantize(
        (rng.normal(size=(DIM, DIM)) / 64).astype(np.float32), "q4_k",
        layout="wof")
    wg = (rng.normal(size=(KD, DIM)) / 64).astype(np.float32)
    wu = (rng.normal(size=(KD, DIM)) / 64).astype(np.float32)
    wd = (rng.normal(size=(DIM, KD)) / 64).astype(np.float32)
    guf = qm.quantize(qm.reorder_gu_rows(wg, wu), "q4_k")
    down = qm.quantize(wd, "q4_k")

    import dataclasses
    def prow(w):
        return dataclasses.replace(
            w, **{f: getattr(w, f)[perm] for f in qm._fields(w)})

    wo_p, down_p = prow(wo), prow(down)
    w_pack = pack_stream(wqkv, wo_p, guf)
    anorm = (1.0 + 0.1 * rng.normal(size=(DIM,))).astype(np.float32)
    mnorm = (1.0 + 0.1 * rng.normal(size=(DIM,))).astype(np.float32)
    kc = jnp.asarray(rng.normal(size=(2, 1, HKV, 256, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(2, 1, HKV, 256, D)), jnp.bfloat16)
    h_log = jnp.asarray(rng.normal(size=(1, DIM)).astype(np.float32))
    return dict(wqkv=wqkv, wo=wo, wo_p=wo_p, guf=guf, down=down,
                down_p=down_p, w_pack=w_pack, anorm=anorm, mnorm=mnorm,
                kc=kc, vc=vc, h_log=h_log, perm=perm)


def test_e2e_decode_matches_megakernels():
    """cfg.fuse_layer decode tokens == the two-megakernel hperm decode on
    a 2-layer dim-4096 model (the smallest shape the gate accepts) — for
    BOTH fused paths: the whole-MODEL kernel (m_pack present) and the
    per-layer kernel (m_pack stripped)."""
    import dataclasses
    from ggml_cuda_experiments_tpu.models import llama
    from ggml_cuda_experiments_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        name="lk-test", vocab_size=512, dim=4096, n_layers=2, n_heads=32,
        n_kv_heads=32, intermediate=4096, head_dim=128, max_seq_len=512,
        x_quant8=True, hperm=True)
    params = llama.quantize_params(
        llama.init_weights(cfg, seed=1, as_numpy=True), "q4_k")
    params = llama.permute_hidden_params(params, cfg)
    assert "m_pack" in params
    params = jax.device_put(params)
    # per-layer variant: strip m_pack, rebuild the per-layer streams
    # (permute_hidden_params drops them once m_pack exists)
    per_layer = {k: v for k, v in params.items() if k != "m_pack"}
    per_layer["layers"] = [
        dict(l, w_pack=pack_stream(l["wqkv"], l["wo"], l["w_gu_f"]))
        for l in params["layers"]]
    prompt = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)

    toks = {}
    for name, p, fl in (("mega2", params, False),
                        ("model", params, True),
                        ("layer", per_layer, True)):
        c = dataclasses.replace(cfg, fuse_layer=fl)
        cache = llama.KVCache.create(c, 1, 256)
        toks[name] = np.asarray(
            llama.generate_scan(p, c, prompt, cache, 5))
    assert np.array_equal(toks["mega2"], toks["model"]), toks
    assert np.array_equal(toks["mega2"], toks["layer"]), toks


def test_supported_gate(weights):
    layer = {"wqkv": weights["wqkv"], "wo": weights["wo_p"],
             "w_gu_f": weights["guf"], "w_down": weights["down_p"],
             "w_pack": weights["w_pack"]}
    assert layer_step_supported(layer, HQ, HKV, D, jnp.bfloat16)
    assert not layer_step_supported(dict(layer, wo=weights["wqkv"]),
                                    HQ, HKV, D, jnp.bfloat16)
    miss = dict(layer)
    del miss["w_pack"]
    assert not layer_step_supported(miss, HQ, HKV, D, jnp.bfloat16)


def test_layer_kernel_matches_composed(weights):
    w = weights
    perm = w["perm"]
    h_p = w["h_log"][:, perm]
    anorm_p = jnp.asarray(w["anorm"][perm])
    mnorm_p = jnp.asarray(w["mnorm"][perm])
    lens = jnp.asarray([23], jnp.int32)

    h_next, kn, vn = layer_step(
        h_p, w["w_pack"], w["down_p"],
        anorm_p, mnorm_p, w["kc"], w["vc"], lens, 1,
        n_heads=HQ, n_kv_heads=HKV, head_dim=D, rms_eps=EPS)

    # composed reference on the SAME permuted-hidden convention
    def rms(x, wn):
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + EPS) * wn

    x_attn = rms(h_p.astype(jnp.float32), anorm_p)
    o_attn, kn_r, vn_r = attention_fused(
        x_attn, w["wqkv"], w["wo_p"], w["kc"], w["vc"], lens, 1,
        n_heads=HQ, n_kv_heads=HKV, head_dim=D, x_prepermuted=True)
    h2 = h_p.astype(jnp.float32) + o_attn
    x_mlp = rms(h2, mnorm_p)
    o_mlp = qm.mlp_fused(x_mlp, w["guf"], w["down_p"])
    ref = h2 + o_mlp

    a, b = np.asarray(h_next), np.asarray(ref)
    denom = max(1e-6, float(np.max(np.abs(b))))
    rel = float(np.max(np.abs(a - b))) / denom
    assert rel < 5e-3, rel
    # k/v: the in-kernel attn-norm's reduction order differs from the
    # composed jnp reference by ulps, which moves a few bf16 roundings
    kn, kn_r = np.asarray(kn, np.float32), np.asarray(kn_r, np.float32)
    vn, vn_r = np.asarray(vn, np.float32), np.asarray(vn_r, np.float32)
    assert float(np.max(np.abs(kn - kn_r))) < 2e-2 * max(
        1.0, float(np.max(np.abs(kn_r))))
    assert float(np.max(np.abs(vn - vn_r))) < 2e-2 * max(
        1.0, float(np.max(np.abs(vn_r))))
    assert np.isfinite(a).all()


@pytest.mark.parametrize("phase", ["no_bound", "no_attn", "stream",
                                   "only_pack", "only_down"])
def test_probe_phases_trace(weights, phase):
    """Every layer_probe bisection phase must at least TRACE (the round-4
    'stream' variant hit a scratch-slice shape error at trace time;
    jax.eval_shape catches that class of bug without running the kernel)."""
    w = weights
    lens = jnp.asarray([23], jnp.int32)
    out = jax.eval_shape(
        lambda h: layer_step(
            h, w["w_pack"], w["down_p"],
            jnp.asarray(w["anorm"]), jnp.asarray(w["mnorm"]),
            w["kc"], w["vc"], lens, 1,
            n_heads=HQ, n_kv_heads=HKV, head_dim=D, phase=phase),
        jax.ShapeDtypeStruct((1, DIM), jnp.float32))
    assert out[0].shape == (1, DIM)
