"""Whole-DECODER-LAYER fused Pallas kernel for batch-1 decode.

ONE kernel launch runs: attn RMSNorm -> wqkv dequant-matvec -> RoPE -> KV
append-in-stream -> split-KV flash decode -> W_o dequant-matvec -> residual
-> MLP RMSNorm -> w_gu dequant-matvec -> silu*mul -> w_down dequant-matvec
-> residual. It merges ops/fused_attention.py and quant_matmul.mlp_fused
into one grid, eliminating one Pallas launch + pipeline ramp and ALL
inter-block XLA glue per layer (~20 us/launch measured,
tools/layer_marginal.py --ablate, PERF.md "Decode (r4 s2)").

PACKED UNIFORM STREAM (round-5 redesign). The round-4 kernel gave each
projection its own windowed operands and its own pl.when compute body —
and the round-5 bisection (PERF.md "Whole-layer megakernel") measured
that with THREE OR MORE distinct matvec bodies in one Mosaic program,
every phase's compute ran with ZERO overlap against the weight DMA
(pairs of phases overlapped fine; the full set cost stream + compute +
boundaries exactly, 2.4x the two-megakernel path). The fix is
structural: wqkv, W_o and w_gu are packed offline into ONE row-stacked
quantized weight (``pack_stream``), streamed as one windowed operand
with ONE shared compute body — phase transitions are selector-scratch
rebuilds at tile-edge boundary steps, not separate code paths. The
reference's analogous discipline is keeping V transposed-contiguous so
the hot loop needs no layout fixups (flash_row_float.h:176-177): pick
the storage layout that makes the hot loop uniform.

Requires the PERMUTED-HIDDEN layout (models/llama.permute_hidden_params +
cfg.hperm): h arrives in the interleaved lane order, wo and w_down rows
are pre-permuted so their outputs land back in that order — the chain
then never needs the in-kernel lane permute Mosaic does not have. The
reference runs this pipeline as 3+ kernels with host glue
(/root/reference/src/flash_row_float.h:4-200,415-472 + kernel_test.h
:107-163); here the weight streams of all four projections share one
continuous HBM pipeline.

Phase map over the (nP + nD)-step grid (7B: 10 + 4 = 14; the packed
stream is [wqkv | W_o | w_gu] = 12288+4096+24576 rows, bn=4096 tiles):
  step 0 (before tile 0): h2 <- h residual init; attn RMSNorm +
      activation quantize/selector build (_act_quant_build); first KV
      block DMA start.
  [0, nP): ONE uniform chunk8 body: packed tile i -> ybig[i*bn:].
  step nQt-1 (after its matvec): RoPE splice (q scaled+rotated, k/v_new
      emitted for the cache append), then the in-kernel double-buffered
      flash decode over valid KV blocks, then the W_o boundary (MXU
      eye-dot transpose + quantize) rebuilds the SAME selector scratch —
      the W_o tiles' DMA streams UNDER the flash loop.
  step nQt+nWt (before its matvec): h2 += ybig W_o rows (residual), MLP
      RMSNorm + selector rebuild (Kq == Kwo == Kgu == dim, so all three
      phases share eas/ebs/sca and the one body).
  step nP-1 (after its matvec): mid = silu(g)*u from ybig gu rows +
      selector build for w_down (ead/ebd/scd).
  [nP, nP+nD): w_down chunk8 tiles (segmented K) + residual -> h_next.

Gate (layer_step_supported): B == 1, head_dim 128, dim == 4096, MHA/GQA
r in {1, 2, 4, 8}, q4_k "e" weights in the fused layout (wqkv, wof wo,
w_gu_f, w_down with Kd % 4096 == 0) plus the packed stream
(``pack_stream``; built by permute_hidden_params), bf16/f32 contiguous
cache.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.ops.fused_attention import (
    DEFAULT_MASK_VALUE, wof_shape_supported,
)
from ggml_cuda_experiments_tpu.ops.quant_matmul import (
    QuantLinear, _act_quant_build, _chunk8_compute, _n_segs, _row_splits,
    _store_row, chunk8_plan,
)
from ggml_cuda_experiments_tpu.utils.platform import interpret_default


def pack_stream(wqkv: QuantLinear, wo: QuantLinear,
                w_guf: QuantLinear) -> QuantLinear:
    """Row-stack [wqkv | wo | w_gu_f] into ONE q4_k-e weight so the layer
    kernel streams a single uniform operand (see module docstring). Rows
    are independent in the chunk8 encoding, so stacking is exact; the
    column interpretation per segment (std / wof / gu_f) is carried by
    the selector content built at the phase boundaries, not the bytes."""
    ws = (wqkv, wo, w_guf)
    k = wqkv.array_shape[1]
    assert all(w.fmt == "q4_k" and w.enc == "e" for w in ws), \
        [w.fmt + "/" + w.enc for w in ws]
    assert all(w.array_shape[1] == k for w in ws), \
        [w.array_shape for w in ws]
    n_total = sum(w.array_shape[0] for w in ws)
    cat = {f: jnp.concatenate([getattr(w, f) for w in ws], axis=0)
           for f in ("qs", "es", "em")}
    return dataclasses.replace(wqkv, shape=(n_total, k), **cat)


def _pack_bn(nq: int, nw: int, ng: int, cap: int) -> int:
    """Largest 128-multiple tile that lands every phase boundary on a
    tile edge (7B: gcd(12288, 4096, 24576) -> 4096; llama3-8b GQA:
    gcd(6144, 4096, 28672) -> 2048)."""
    g = math.gcd(math.gcd(nq, nw), ng)
    bn = min(cap, g)
    while g % bn or bn % 128:
        bn -= 128
        assert bn > 0, (nq, nw, ng, cap)
    return bn


def _layer_kernel(
    *refs,
    nP: int, bn: int, nQt: int, nWt: int, nD: int, bnD: int,
    NQ: int, NW: int, nL: int,
    n_blocks: int, n_groups: int, ht: int, bk: int, nH: int, nKV: int,
    Kd: int, segsD: int,
    splits, splitsD, cache_dtype, rms_eps: float,
    phase: str = "all",
):
    it = iter(refs)
    len_ref, lyr_ref = next(it), next(it)         # scalar prefetch
    h_ref, anorm_ref, mnorm_ref, rope_ref, eye_ref = (next(it)
                                                      for _ in range(5))
    pqs_ref, pes_ref, pem_ref = next(it), next(it), next(it)
    k_any, v_any = next(it), next(it)
    dqs_ref, des_ref, dem_ref = next(it), next(it), next(it)
    o_ref, kn_ref, vn_ref = next(it), next(it), next(it)
    ybig, qt, eas, ebs, sca = (next(it) for _ in range(5))
    m_scr, l_scr, acc_scr, ofin, h2, hcur = (next(it) for _ in range(6))
    ead, ebd, scd = (next(it) for _ in range(3))
    kbuf, vbuf = next(it), next(it)
    (kv_sem,) = it

    # ``phase``: measurement-only trace-time gate (tools/layer_probe.py):
    # "all" (production), "no_attn" (skip the flash fori-loop body),
    # "no_bound" (skip rope/selector builds; consumers read stale
    # selectors), "stream" (skip ALL compute), "only_pack" (the packed
    # matvec stream + its builds, down streamed), "only_down" (inverse).
    # A static kwarg — NOT a module global — so a crashed probe can't
    # poison production traces. Probe outputs stay LIVE (the down-phase
    # stream store folds ybig/h2 at 1e-6) so Mosaic cannot dead-code a
    # disabled consumer's producer and fake an overlap number.
    c_pack = phase in ("all", "no_attn", "no_bound", "only_pack")
    c_flash = phase in ("all", "no_bound")
    c_rope = phase in ("all", "no_attn")
    b_entry = phase in ("all", "no_attn", "only_pack")
    b_wo = phase in ("all", "no_attn")
    b_mid = phase in ("all", "no_attn", "only_pack")
    b_down = phase in ("all", "no_attn", "only_down")
    c_down = phase in ("all", "no_attn", "no_bound", "only_down")
    i = pl.program_id(0)
    D = 128
    r = nH // nKV
    kh_pg = ht // r
    T = nP + nD                                   # grid steps per layer
    WB = nQt + nWt                                # wo-residual / mlp step
    length = len_ref[0]                           # INCLUDING the new token
    # ``nL``: layers in this launch. The per-layer entry (layer_step)
    # passes nL=1 + the cache layer index via scalar prefetch; the
    # whole-MODEL entry (model_step) runs all layers in ONE launch
    # (grid nL*T) and derives the layer from the step index.
    lyr = lyr_ref[0] + (i // T if nL > 1 else 0)
    s = i - (i // T) * T if nL > 1 else i
    nvalid = jnp.minimum((length + bk - 1) // bk, n_blocks)

    def kv_copies(t, slot, lyr_=None):
        g = t // nvalid
        blk = t - g * nvalid
        row0 = g * kh_pg
        base = blk * bk
        li = lyr if lyr_ is None else lyr_
        src_k = k_any.at[li, 0, pl.ds(row0, kh_pg), pl.ds(base, bk)]
        src_v = v_any.at[li, 0, pl.ds(row0, kh_pg), pl.ds(base, bk)]
        return (pltpu.make_async_copy(src_k, kbuf.at[slot],
                                      kv_sem.at[0, slot]),
                pltpu.make_async_copy(src_v, vbuf.at[slot],
                                      kv_sem.at[1, slot]))

    @pl.when(i == 0)
    def _first():
        # the residual chain lives in hcur across all nL layers;
        # h_ref is read exactly once, at the very first step
        hcur[...] = h_ref[...].astype(jnp.float32)

    @pl.when(s == 0)
    def _entry():
        # h2 starts as this layer's residual input; the W_o boundary
        # ACCUMULATES into it
        h2[...] = hcur[...]
        if b_entry:
            h = h2[...]                           # [1, dim] permuted
            var = jnp.sum(h * h, axis=1, keepdims=True) / h.shape[1]
            x = h * jax.lax.rsqrt(var + rms_eps) * anorm_ref[0]
            _act_quant_build(x, 1, eye_ref[...].astype(jnp.float32),
                             eas, ebs, sca)
        for c in kv_copies(0, 0):                 # first KV block
            c.start()

    @pl.when(s == WB)
    def _wo_residual_and_mlp_build():
        # traced before _matvec, so at step WB the selector rebuild
        # happens before the first gu tile consumes it
        if not b_mid:
            return
        h2[...] = h2[...] + ybig[0:1, NQ:NQ + NW]  # attn-out residual
        hv = h2[...]
        var = jnp.sum(hv * hv, axis=1, keepdims=True) / hv.shape[1]
        x = hv * jax.lax.rsqrt(var + rms_eps) * mnorm_ref[0]
        _act_quant_build(x, 1, eye_ref[...].astype(jnp.float32),
                         eas, ebs, sca)

    @pl.when(s < nP)
    def _matvec():
        # THE one uniform body: packed tile s -> ybig rows. Identical
        # code for the wqkv / W_o / w_gu phases; only the selector
        # scratch content (rebuilt at boundaries) distinguishes them.
        if not c_pack:
            ybig[0:1, pl.ds(s * bn, bn)] = jnp.sum(
                pqs_ref[:, :128].astype(jnp.float32), axis=1)[None, :]
            return
        es = pes_ref[...].astype(jnp.float32)
        em = pem_ref[...].astype(jnp.float32)
        y = _chunk8_compute(eas, ebs, sca[...], pqs_ref, es, em,
                            n_segs=1, splits=splits,
                            store=_store_row(ybig, s * bn))
        if y is not None:
            ybig[0:1, pl.ds(s * bn, bn)] = y

    @pl.when(s == nQt - 1)
    def _rope_flash_wobuild():
        # -- RoPE splice + cache-append staging ---------------------------
        if c_rope:
            Cq, S2q = rope_ref[0:1, :], rope_ref[1:2, :]
            C, S2 = rope_ref[2:3, :], rope_ref[3:4, :]
            for h in range(nH):
                qt[h:h + 1, :] = ybig[0:1, D * h:D * (h + 1)]
            qraw = qt[...]
            qt[...] = qraw * Cq + pltpu.roll(qraw, 64, 1) * S2q
            k0 = nH * D
            for h in range(nKV):
                ofin[h:h + 1, :] = ybig[0:1, k0 + D * h:k0 + D * (h + 1)]
            kraw = ofin[0:nKV, :]                 # ofin reused as staging
            kn_ref[...] = (kraw * C + pltpu.roll(kraw, 64, 1) * S2
                           ).astype(cache_dtype)
            v0 = (nH + nKV) * D
            for h in range(nKV):
                vn_ref[h:h + 1, :] = ybig[0:1, v0 + D * h:v0 + D * (h + 1)
                                          ].astype(cache_dtype)
        else:
            kn_ref[...] = jnp.zeros_like(kn_ref)
            vn_ref[...] = jnp.zeros_like(vn_ref)

        # -- split-KV flash decode (W_o tile DMA streams underneath) ------
        total = n_groups * nvalid
        newpos = length - 1

        def drain(t, _):
            # DMA-only twin of ``body`` for the probe phases that skip
            # attention compute: every started KV copy MUST still be
            # waited (an unwaited async copy is an illegal Mosaic
            # program — it crashed the first r5 bisection with a TPU
            # INTERNAL error), and the probe wants the KV stream's DMA
            # cost included in every phase.
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < total)
            def _prefetch():
                for c in kv_copies(t + 1, 1 - slot):
                    c.start()

            for c in kv_copies(t, slot):
                c.wait()
            return 0

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            g = t // nvalid
            blk = t - g * nvalid
            base = blk * bk
            row0q = g * ht
            row0k = g * kh_pg

            @pl.when(t + 1 < total)
            def _prefetch():
                for c in kv_copies(t + 1, 1 - slot):
                    c.start()

            for c in kv_copies(t, slot):
                c.wait()

            @pl.when(blk == 0)
            def _init():
                m_scr[pl.ds(row0q, ht), :] = jnp.full((ht, 128), -jnp.inf,
                                                      jnp.float32)
                l_scr[pl.ds(row0q, ht), :] = jnp.zeros((ht, 128),
                                                       jnp.float32)
                acc_scr[...] = jnp.zeros_like(acc_scr)

            q = qt[pl.ds(row0q, ht), :]
            k = kbuf[slot]
            on_new = (base + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk, 1), 1)) == newpos
            kn = kn_ref[pl.ds(row0k, kh_pg), :]
            kf = jnp.where(on_new, kn[:, None, :], k).astype(jnp.float32)
            if r == 1:
                s = jnp.sum(q[:, None, :] * kf, axis=-1)       # [ht, bk]
            else:
                s = jnp.concatenate(
                    [jnp.sum(q[sub * r:(sub + 1) * r, None, :]
                             * kf[sub][None, :, :], axis=-1)
                     for sub in range(kh_pg)], axis=0)
            kpos = base + jax.lax.broadcasted_iota(jnp.int32, (ht, bk), 1)
            s = jnp.where(kpos < length, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[pl.ds(row0q, ht), :]
            l_prev = l_scr[pl.ds(row0q, ht), :]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_scr[pl.ds(row0q, ht), :] = m_next
            l_scr[pl.ds(row0q, ht), :] = l_next
            acc_scr[...] *= alpha[:, :1]
            v = vbuf[slot]
            vn = vn_ref[pl.ds(row0k, kh_pg), :]
            vf = jnp.where(on_new, vn[:, None, :], v).astype(jnp.float32)
            if r == 1:
                acc_scr[...] += jnp.sum(p[:, :, None] * vf, axis=1)
            else:
                acc_scr[...] += jnp.concatenate(
                    [jnp.sum(p[sub * r:(sub + 1) * r][:, :, None]
                             * vf[sub][None, :, :], axis=1)
                     for sub in range(kh_pg)], axis=0)

            @pl.when(blk == nvalid - 1)
            def _finalize():
                l = l_next[:, :1]
                lsafe = jnp.where(l == 0.0, 1.0, l)
                ofin[pl.ds(row0q, ht), :] = acc_scr[...] / lsafe

            return 0

        if c_flash:
            jax.lax.fori_loop(0, total, body, 0)
        else:                                 # phases w/o flash: DMA only
            jax.lax.fori_loop(0, total, drain, 0)
        if not b_wo:
            return
        # -- W_o boundary: transpose per-head output on the MXU and
        # quantize into the shared selector scratch (wof column layout) --
        eye = eye_ref[...].astype(jnp.float32)
        oT = jax.lax.dot_general(
            eye, ofin[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # [128, nH]
        xp = jnp.concatenate(
            [oT[32 * c:32 * (c + 1), :] for c in range(4)], axis=1)
        xl, xh = xp[:16, :], xp[16:, :]                    # [16, 128]
        av = xl - xh / 16.0
        bv = xh / 16.0
        amax_a = jnp.max(jnp.abs(av), axis=0, keepdims=True)
        amax_b = jnp.max(jnp.abs(bv), axis=0, keepdims=True)
        sa = jnp.where(amax_a == 0.0, 1.0, amax_a / 127.0)
        sb = jnp.where(amax_b == 0.0, 1.0, amax_b / 127.0)
        sca[0:1, :] = 8.0 * jnp.sum(xh, axis=0, keepdims=True)
        sca[1:2, :] = jnp.sum(xl + xh, axis=0, keepdims=True)
        sca[2:3, :] = sa
        sca[3:4, :] = sb
        aq = jnp.clip(jnp.round(av / sa), -127, 127)
        bq = jnp.clip(jnp.round(bv / sb), -127, 127)
        nt = eas.shape[0] // 128
        for t in range(nt):
            sl = slice(128 * t, 128 * (t + 1))
            eas[sl, :] = (eye * aq[t:t + 1, :]).astype(jnp.int8)
            ebs[sl, :] = (eye * bq[t:t + 1, :]).astype(jnp.int8)

    @pl.when(s == nP - 1)
    def _mid_boundary():
        if not b_down:
            return
        g0 = NQ + NW
        g = ybig[0:1, g0:g0 + Kd]
        u = ybig[0:1, g0 + Kd:]
        mid = (g * jax.nn.sigmoid(g)) * u
        _act_quant_build(mid, segsD, eye_ref[...].astype(jnp.float32),
                         ead, ebd, scd)

    @pl.when(s >= nP)
    def _down_phase():
        # stores feed BOTH hcur (the next layer's residual input) and
        # o_ref (a single [1, dim] output block revisited every layer —
        # intermediate layers' values are overwritten, the final
        # writeback carries the last layer's hidden)
        t = s - nP

        def put(sl, val):
            hcur[0:1, sl] = val
            o_ref[0:1, sl] = val

        if not c_down:
            put(pl.ds(t * bnD, bnD),
                jnp.sum(dqs_ref[:, :128].astype(jnp.float32),
                        axis=1)[None, :bnD]
                + 1e-6 * ybig[0:1, pl.ds(t * bnD, bnD)]
                + 1e-6 * h2[0:1, pl.ds(t * bnD, bnD)])
            return
        es = des_ref[...].astype(jnp.float32)
        em = dem_ref[...].astype(jnp.float32)

        def store(r0, rows, y):                   # mlp out + residual
            sl = pl.ds(t * bnD + r0, rows)
            put(sl, y[None, :] + h2[0:1, sl])

        res = _chunk8_compute(ead, ebd, scd[...], dqs_ref, es, em,
                              n_segs=segsD, splits=splitsD, store=store)
        if res is not None:
            sl = pl.ds(t * bnD, bnD)
            put(sl, res + h2[0:1, sl])


def fused_layout_ok(layer: dict, n_heads: int, n_kv_heads: int,
                    head_dim: int, cache_dtype) -> bool:
    """Static gate for the fused-kernel weight layout: q4_k-e with wof
    W_o + w_gu_f, dim 4096, MHA/GQA r in {1,2,4,8}, bf16/f32 contiguous
    cache. The whole-MODEL path needs this plus params['m_pack']; the
    per-layer path (layer_step_supported) additionally needs the
    per-layer packed stream."""
    need = ("wqkv", "wo", "w_gu_f", "w_down")
    if any(k not in layer for k in need):
        return False
    ws = [layer[k] for k in need]
    if not all(isinstance(w, QuantLinear) and w.fmt == "q4_k"
               and w.enc == "e" for w in ws):
        return False
    wqkv, wo, guf, down = ws
    dim = n_heads * head_dim
    nw, kw = wo.array_shape
    if wo.layout != "wof" or not wof_shape_supported(
            nw, kw, n_heads, n_kv_heads, head_dim):
        return False
    nq, kq = wqkv.array_shape
    if (nq, kq) != ((n_heads + 2 * n_kv_heads) * head_dim, dim):
        return False
    ng, kg = guf.array_shape
    nd, kd = down.array_shape
    if kg != dim or nd != dim or ng != 2 * kd or kd % 4096 != 0:
        return False
    if (kg // 32) % 128 != 0:
        return False
    return cache_dtype in (jnp.bfloat16, jnp.float32)


def layer_step_supported(layer: dict, n_heads: int, n_kv_heads: int,
                         head_dim: int, cache_dtype) -> bool:
    """fused_layout_ok + the per-layer packed stream present."""
    if not fused_layout_ok(layer, n_heads, n_kv_heads, head_dim,
                           cache_dtype):
        return False
    pack = layer.get("w_pack")
    nq = layer["wqkv"].array_shape[0]
    nw = layer["wo"].array_shape[0]
    ng = layer["w_gu_f"].array_shape[0]
    dim = n_heads * head_dim
    return (isinstance(pack, QuantLinear)
            and pack.array_shape == (nq + nw + ng, dim))


def _dispatch(
    h, pqs, pes, pem, dqs, des, dem, anorm2, mnorm2,
    k_cache, v_cache, lengths, layer0, *,
    nL: int, n_heads: int, n_kv_heads: int, head_dim: int,
    rope_theta: float, rms_eps: float, scale: float | None,
    block_k: int, interpret: bool | None, phase: str,
    tile_cap: int | None, wbytes: int,
):
    """Shared pallas dispatch for layer_step (nL=1) and model_step
    (nL = all layers in ONE launch; grid nL*(nP+nD), layer derived from
    the step index). Operands are raw arrays stacked over layers:
    pqs/pes/pem [nL*NP, ...], dqs/des/dem [nL*ND, ...],
    anorm2/mnorm2 [nL, dim]."""
    nH, nKV, D = n_heads, n_kv_heads, head_dim
    dim = nH * D
    L, B, _, S, _ = k_cache.shape
    assert B == 1 and h.shape == (1, dim)
    if scale is None:
        scale = float(1.0 / D ** 0.5)
    bk = min(block_k, S)
    assert S % bk == 0
    n_blocks = S // bk
    ht = 8
    r = nH // nKV
    assert nH % nKV == 0 and ht % r == 0
    kh_pg = ht // r
    n_groups = nH // ht

    NPt, K = pqs.shape[0], pqs.shape[1] * 2
    assert K == dim and NPt % nL == 0
    NP = NPt // nL
    NQ = (nH + 2 * nKV) * D
    NW = dim
    NG = NP - NQ - NW
    NDt, Kd = dqs.shape[0], dqs.shape[1] * 2
    assert NDt % nL == 0
    ND = NDt // nL
    assert NG == 2 * Kd and ND == dim
    bn = _pack_bn(NQ, NW, NG, tile_cap or 4096)
    nQt, nWt = NQ // bn, NW // bn
    nP = NP // bn
    splits = _row_splits(bn)
    segsD = _n_segs(Kd)
    planD = chunk8_plan(ND, Kd)
    bnD, splitsD = planD["bn"], planD["splits"]
    assert ND % bnD == 0
    nD = ND // bnD
    T = nP + nD
    grid = (nL * T,)

    # rope rows (rotate-half): out = x*C + roll(x, 64)*S2
    pos = lengths[0].astype(jnp.float32)
    freqs = rope_theta ** (-jnp.arange(0, D // 2, dtype=jnp.float32)
                           / (D // 2))
    ang = pos * freqs
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    C = jnp.concatenate([cosv, cosv])
    S2 = jnp.concatenate([-sinv, sinv])
    rope = jnp.stack([C * scale, S2 * scale, C, S2])       # [4, 128]

    eye = jnp.asarray(np.eye(128, dtype=np.int8))
    lens_incl = lengths.astype(jnp.int32) + 1
    lyr0 = jnp.atleast_1d(jnp.asarray(layer0, jnp.int32))
    cache_dtype = k_cache.dtype

    def _ls(i):
        l = i // T
        return l, i - l * T

    cmap = lambda i, lens, lyr_: (0, 0)
    lmap = lambda i, lens, lyr_: (_ls(i)[0], 0)
    lmap3 = lambda i, lens, lyr_: (_ls(i)[0], 0, 0)

    def pmap(i, lens, lyr_):
        l, s = _ls(i)
        return (l * nP + jnp.minimum(s, nP - 1), 0)

    def dmap(i, lens, lyr_):
        l, s = _ls(i)
        return (l * nD + jnp.clip(s - nP, 0, nD - 1), 0)

    kb = K // 32
    kbd = Kd // 32
    in_specs = [
        pl.BlockSpec((1, dim), cmap),                # h
        # [nL, 1, dim] with (1, 1, dim) blocks: the real-TPU lowering
        # requires the LAST TWO block dims to divide (8, 128) or equal
        # the array dims — a (1, dim) block over [nL, dim] violates the
        # sublane rule (interpret mode accepted it; the chip did not)
        pl.BlockSpec((1, 1, dim), lmap3),            # attn_norm
        pl.BlockSpec((1, 1, dim), lmap3),            # mlp_norm
        pl.BlockSpec((4, 128), cmap),                # rope
        pl.BlockSpec((128, 128), cmap),              # eye
        pl.BlockSpec((bn, K // 2), pmap),            # packed qs
        pl.BlockSpec((bn, kb), pmap),                # packed es
        pl.BlockSpec((bn, kb), pmap),                # packed em
        pl.BlockSpec(memory_space=pl.ANY),           # k cache
        pl.BlockSpec(memory_space=pl.ANY),           # v cache
        pl.BlockSpec((bnD, Kd // 2), dmap),          # down qs
        pl.BlockSpec((bnD, kbd), dmap),              # down es
        pl.BlockSpec((bnD, kbd), dmap),              # down em
    ]
    operands = [
        h.astype(jnp.float32),
        anorm2.reshape(-1, 1, anorm2.shape[-1]).astype(jnp.float32),
        mnorm2.reshape(-1, 1, mnorm2.shape[-1]).astype(jnp.float32),
        rope, eye,
        pqs, pes, pem,
        k_cache, v_cache,
        dqs, des, dem,
    ]

    scratch = [
        pltpu.VMEM((1, NP), jnp.float32),            # ybig
        pltpu.VMEM((nH, 128), jnp.float32),          # qt
        pltpu.VMEM((K // 2, 128), jnp.int8),         # eas (shared)
        pltpu.VMEM((K // 2, 128), jnp.int8),         # ebs (shared)
        pltpu.VMEM((4, kb), jnp.float32),            # sca (shared)
        pltpu.VMEM((nH, 128), jnp.float32),          # m
        pltpu.VMEM((nH, 128), jnp.float32),          # l
        pltpu.VMEM((ht, 128), jnp.float32),          # acc
        pltpu.VMEM((nH, 128), jnp.float32),          # ofin
        pltpu.VMEM((1, dim), jnp.float32),           # h2
        pltpu.VMEM((1, dim), jnp.float32),           # hcur
        pltpu.VMEM((Kd // 2, 128), jnp.int8),        # ead
        pltpu.VMEM((Kd // 2, 128), jnp.int8),        # ebd
        pltpu.VMEM((4, kbd), jnp.float32),           # scd
        pltpu.VMEM((2, kh_pg, bk, D), cache_dtype),  # kbuf
        pltpu.VMEM((2, kh_pg, bk, D), cache_dtype),  # vbuf
        pltpu.SemaphoreType.DMA((2, 2)),             # kv sems
    ]

    kernel = functools.partial(
        _layer_kernel,
        nP=nP, bn=bn, nQt=nQt, nWt=nWt, nD=nD, bnD=bnD,
        NQ=NQ, NW=NW, nL=nL,
        n_blocks=n_blocks, n_groups=n_groups, ht=ht, bk=bk,
        nH=nH, nKV=nKV, Kd=Kd, segsD=segsD,
        splits=splits, splitsD=splitsD,
        cache_dtype=cache_dtype, rms_eps=rms_eps, phase=phase)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, ND), cmap),             # h_next (revisited)
            pl.BlockSpec((nKV, D), lmap),            # k_new rows
            pl.BlockSpec((nKV, D), lmap),            # v_new rows
        ],
        scratch_shapes=scratch,
    )

    h_next, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, ND), jnp.float32),
            jax.ShapeDtypeStruct((nL * nKV, D), cache_dtype),
            jax.ShapeDtypeStruct((nL * nKV, D), cache_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=nL * 2 * (NP * K + ND * Kd) + nL * 4 * nH * S * D,
            bytes_accessed=wbytes
            + nL * 2 * nKV * S * D * k_cache.dtype.itemsize,
            transcendentals=nL * (nH * S + Kd)),
        interpret=interpret_default(interpret),
    )(lens_incl, lyr0, *operands)
    return h_next, k_new, v_new


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "rope_theta",
                     "rms_eps", "scale", "block_k", "interpret", "phase",
                     "tile_cap"),
)
def layer_step(
    h: jax.Array,                 # [1, dim] PERMUTED hidden (pre-norm)
    w_pack: QuantLinear,          # pack_stream(wqkv, wo_wof, w_gu_f)
    w_down: QuantLinear,          # rows hperm-permuted
    attn_norm: jax.Array,         # [dim] permuted
    mlp_norm: jax.Array,          # [dim] permuted
    k_cache: jax.Array,           # [L, 1, Hkv, S, D]
    v_cache: jax.Array,
    lengths: jax.Array,           # [1] int32, BEFORE this token
    layer,
    *,
    n_heads: int, n_kv_heads: int, head_dim: int,
    rope_theta: float = 10000.0, rms_eps: float = 1e-5,
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool | None = None,
    phase: str = "all",
    tile_cap: int | None = None,
):
    """Returns (h_next [1, dim] f32 PERMUTED post-layer hidden,
    k_new [Hkv, D], v_new [Hkv, D]) for the caller's cache append."""
    dim = n_heads * head_dim
    return _dispatch(
        h, w_pack.qs, w_pack.es, w_pack.em,
        w_down.qs, w_down.es, w_down.em,
        attn_norm.reshape(1, dim), mlp_norm.reshape(1, dim),
        k_cache, v_cache, lengths, layer,
        nL=1, n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        rope_theta=rope_theta, rms_eps=rms_eps, scale=scale,
        block_k=block_k, interpret=interpret, phase=phase,
        tile_cap=tile_cap, wbytes=w_pack.nbytes + w_down.nbytes)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "rope_theta",
                     "rms_eps", "scale", "block_k", "interpret", "phase",
                     "tile_cap"),
)
def model_step(
    h: jax.Array,                 # [1, dim] PERMUTED hidden (embedded tok)
    m_pack: dict,                 # build_model_pack(params) arrays
    k_cache: jax.Array,           # [L, 1, Hkv, S, D]
    v_cache: jax.Array,
    lengths: jax.Array,           # [1] int32, BEFORE this token
    *,
    n_heads: int, n_kv_heads: int, head_dim: int,
    rope_theta: float = 10000.0, rms_eps: float = 1e-5,
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool | None = None,
    phase: str = "all",
    tile_cap: int | None = None,
):
    """ALL decoder layers in ONE Pallas launch (the per-layer launch tax
    and inter-layer XLA glue measured ~26 us/layer in-scan vs in-chain —
    PERF.md round 5). Returns (h_last [1, dim] f32 PERMUTED hidden after
    the last layer, k_new [L, Hkv, D], v_new [L, Hkv, D]); the caller
    appends k/v with ONE dynamic-update-slice per cache array and runs
    final-norm + head."""
    L = k_cache.shape[0]
    nKV, D = n_kv_heads, head_dim
    h_next, k_new, v_new = _dispatch(
        h, m_pack["qs"], m_pack["es"], m_pack["em"],
        m_pack["dqs"], m_pack["des"], m_pack["dem"],
        m_pack["anorm"], m_pack["mnorm"],
        k_cache, v_cache, lengths, 0,
        nL=L, n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        rope_theta=rope_theta, rms_eps=rms_eps, scale=scale,
        block_k=block_k, interpret=interpret, phase=phase,
        tile_cap=tile_cap,
        wbytes=sum(m_pack[k].nbytes for k in
                   ("qs", "es", "em", "dqs", "des", "dem")))
    return (h_next, k_new.reshape(L, nKV, D), v_new.reshape(L, nKV, D))
