"""Whole-transformer-LAYER fused Pallas kernel for batch-1 decode.

ONE kernel launch per layer: attn rms-norm -> wqkv dequant-matvec -> RoPE
-> KV append (in-stream splice + staging for the cache write) -> split-KV
flash decode -> W_o matvec -> residual -> mlp rms-norm -> gate/up matvec
-> silu*mul -> down matvec -> residual. The only per-layer XLA left is the
two tiny cache dynamic-update-slices.

Why: decode at 7B is weight-stream-bound (136.4 MB/layer at Q4_K-E =
166 us of HBM floor), and every extra Pallas call adds launch + pipeline
ramp while every windowed operand adds per-grid-step bookkeeping
(~0.25 us/window/step, measured — see ops/fused_attention.py). This
kernel runs a SINGLE grid step and streams all four weight matrices with
explicit double-buffered ``make_async_copy`` chains, so the HBM engine
never idles between phases and there is no window bookkeeping at all.

Machinery (all probed on-chip, see tools/probe_mosaic_r3.py and
fused_attention.py's design notes):
- Both rms-norms run in-kernel on the [32, 128] residual tile; the
  normed activations reach the int8 selector matvec via the MXU
  eye-transpose (lane-contraction orientation; HIGHEST precision) plus
  sublane slicing — which requires wqkv, W_o AND w_gu stored in the
  lossless "wof" column layout (quant_matmul._perm_wof).
- w_gu additionally keeps the fused-MLP ROW order (reorder_gu_rows), so
  the silu intermediate emerges in w_down's interleaved activation order
  (row order and column layout are independent axes).
- wqkv and w_gu tiles share one [4096, 2048] stream-buffer pair (same
  tile shape); w_down streams through its own [512, 6144] pair; W_o is
  copied once at prologue and consumed resident.

The reference's whole repo is the ATTENTION slice of this pipeline split
over three kernels + host glue (/root/reference/src/flash_row_float.h,
src/kernel_test.h:107-163); the MLP half has no reference analog (the
driver-mandated quantized-inference extension, SURVEY §7 R8).

Gate (``layer_fused_supported``): B == 1, MHA 32 heads x 128, dim 4096,
intermediate % 4096 == 0 (7B pads 11008 -> 12288), q4_k weights in wof
layout, bf16/f32 contiguous cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.ops.quant_matmul import (
    QuantLinear, _chunk8_compute, _row_splits,
)
from ggml_cuda_experiments_tpu.utils.platform import interpret_default

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_HI = jax.lax.Precision.HIGHEST


def _norm_quant_selectors(htile, gw, eas, ebs, scs, eye_f32, eps):
    """rms-norm the [32, 128] residual tile, rearrange into the wof
    activation order (eye-transpose + sublane slices), int8-quantize per
    block and materialize the selector matrices into eas/ebs + scs.
    Returns nothing; the following chunk8 phases consume the scratch."""
    ss = jnp.sum(htile * htile) / (32.0 * 128.0)
    x2 = htile * jax.lax.rsqrt(ss + eps) * gw                 # [32, 128]
    oT = jax.lax.dot_general(
        eye_f32, x2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)    # [128, 32]
    xp = jnp.concatenate(
        [oT[32 * c:32 * (c + 1), :] for c in range(4)], axis=1)
    xl, xh = xp[:16, :], xp[16:, :]
    av = xl - xh / 16.0
    bv = xh / 16.0
    amax_a = jnp.max(jnp.abs(av), axis=0, keepdims=True)
    amax_b = jnp.max(jnp.abs(bv), axis=0, keepdims=True)
    sa = jnp.where(amax_a == 0.0, 1.0, amax_a / 127.0)
    sb = jnp.where(amax_b == 0.0, 1.0, amax_b / 127.0)
    scs[0:1, :] = 8.0 * jnp.sum(xh, axis=0, keepdims=True)
    scs[1:2, :] = jnp.sum(xl + xh, axis=0, keepdims=True)
    scs[2:3, :] = sa
    scs[3:4, :] = sb
    aq = jnp.clip(jnp.round(av / sa), -127, 127)
    bq = jnp.clip(jnp.round(bv / sb), -127, 127)
    for t in range(16):
        sl = slice(128 * t, 128 * (t + 1))
        eas[sl, :] = (eye_f32 * aq[t:t + 1, :]).astype(jnp.int8)
        ebs[sl, :] = (eye_f32 * bq[t:t + 1, :]).astype(jnp.int8)


def _layer_kernel(
    len_ref, lyr_ref,
    h_ref, ga_ref, gm_ref, cs_ref, eye_ref,
    qqs, qes, qem, k_any, v_any, wqs, wes, wem,
    gqs, ges, gem, dqs, des, dem,
    hn_ref, kn_ref, vn_ref,
    # scratch
    sq, ses, sem, db, dbes, dbem, woq, woes, woem,
    kbuf, vbuf, eas, ebs, scs, ead, ebd, scd,
    yqkv, ygu, qt, m_scr, l_scr, acc_scr, ofin, h2t,
    s_sem, d_sem, kv_sem, wo_sem,
    *, nQ: int, nG: int, nD: int, bnD: int, Kd: int, segsD: int,
    n_groups: int, ht: int, bk: int, nH: int, eps: float,
    cache_dtype,
):
    D = 128
    length = len_ref[0]
    lyr = lyr_ref[0]
    n_blocks_alloc = k_any.shape[3] // bk
    nvalid = jnp.minimum((length + bk - 1) // bk, n_blocks_alloc)
    eye = eye_ref[...].astype(jnp.float32)

    # ---- DMA plumbing -------------------------------------------------
    def stream_copies(t, slot):
        """Tile t of the shared 4096-row stream: t<nQ -> wqkv, else w_gu."""
        if t < nQ:
            srcs = (qqs, qes, qem)
            r0 = 4096 * t
        else:
            srcs = (gqs, ges, gem)
            r0 = 4096 * (t - nQ)
        dsts = (sq, ses, sem)
        return [pltpu.make_async_copy(
                    s.at[pl.ds(r0, 4096)], d.at[slot], s_sem.at[f, slot])
                for f, (s, d) in enumerate(zip(srcs, dsts))]

    def down_copies(t, slot):
        r0 = bnD * t
        return [pltpu.make_async_copy(
                    s.at[pl.ds(r0, bnD)], d.at[slot], d_sem.at[f, slot])
                for f, (s, d) in enumerate(zip((dqs, des, dem),
                                               (db, dbes, dbem)))]

    def kv_copies(t, slot):
        g = t // nvalid
        blk = t - g * nvalid
        return [
            pltpu.make_async_copy(
                k_any.at[lyr, 0, pl.ds(g * ht, ht), pl.ds(blk * bk, bk)],
                kbuf.at[slot], kv_sem.at[0, slot]),
            pltpu.make_async_copy(
                v_any.at[lyr, 0, pl.ds(g * ht, ht), pl.ds(blk * bk, bk)],
                vbuf.at[slot], kv_sem.at[1, slot]),
        ]

    wo_copies = [pltpu.make_async_copy(wqs, woq, wo_sem.at[0]),
                 pltpu.make_async_copy(wes, woes, wo_sem.at[1]),
                 pltpu.make_async_copy(wem, woem, wo_sem.at[2])]

    # prologue: first stream tile leads, then everything else queues in
    for c in stream_copies(0, 0):
        c.start()
    for c in kv_copies(0, 0):
        c.start()
    for c in wo_copies:
        c.start()

    # ---- attention norm -> wqkv selectors -----------------------------
    htile = h_ref[...].astype(jnp.float32)                    # [32, 128]
    _norm_quant_selectors(htile, ga_ref[...], eas, ebs, scs, eye, eps)

    # ---- wqkv phase (stream tiles 0..nQ-1) ----------------------------
    # Issue t+1 BEFORE waiting on t: with two slots the other slot's
    # previous compute retired in the prior iteration, so the copy is
    # hazard-free (the paged_attention state-machine ordering).
    for t in range(nQ):
        slot = t % 2
        for c in stream_copies(t + 1, 1 - slot):      # tiles 1..nQ
            c.start()
        for c in stream_copies(t, slot):
            c.wait()
        es = ses[slot].astype(jnp.float32)
        em = sem[slot].astype(jnp.float32)
        y = _chunk8_compute(eas, ebs, scs[...],
                            sq.at[slot], es, em,
                            n_segs=1, splits=(1024,) * 4)
        yqkv[0:1, pl.ds(4096 * t, 4096)] = y

    # ---- rope boundary ------------------------------------------------
    Cq, S2q = cs_ref[0:1, :], cs_ref[1:2, :]
    C, S2 = cs_ref[2:3, :], cs_ref[3:4, :]
    for h in range(nH):
        qt[h:h + 1, :] = yqkv[0:1, D * h:D * (h + 1)]
    qraw = qt[...]
    qt[...] = qraw * Cq + pltpu.roll(qraw, 64, 1) * S2q
    k0 = nH * D
    for h in range(nH):
        ofin[h:h + 1, :] = yqkv[0:1, k0 + D * h:k0 + D * (h + 1)]
    kraw = ofin[...]
    kn_ref[...] = (kraw * C + pltpu.roll(kraw, 64, 1) * S2
                   ).astype(cache_dtype)
    v0 = 2 * nH * D
    for h in range(nH):
        vn_ref[h:h + 1, :] = yqkv[0:1, v0 + D * h:v0 + D * (h + 1)
                                  ].astype(cache_dtype)

    # ---- split-KV attention (manual double-buffered DMA loop) ---------
    total = n_groups * nvalid
    newpos = length - 1

    def attn_body(t, _):
        slot = jax.lax.rem(t, 2)
        g = t // nvalid
        blk = t - g * nvalid
        base = blk * bk
        row0 = g * ht

        @pl.when(t + 1 < total)
        def _prefetch():
            for c in kv_copies(t + 1, 1 - slot):
                c.start()

        for c in kv_copies(t, slot):
            c.wait()

        @pl.when(blk == 0)
        def _init():
            m_scr[pl.ds(row0, ht), :] = jnp.full((ht, 128), -jnp.inf,
                                                 jnp.float32)
            l_scr[pl.ds(row0, ht), :] = jnp.zeros((ht, 128), jnp.float32)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = qt[pl.ds(row0, ht), :]
        k = kbuf[slot]
        on_new = (base + jax.lax.broadcasted_iota(
            jnp.int32, (1, bk, 1), 1)) == newpos
        kn = kn_ref[pl.ds(row0, ht), :]
        kf = jnp.where(on_new, kn[:, None, :], k).astype(jnp.float32)
        s = jnp.sum(q[:, None, :] * kf, axis=-1)
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, (ht, bk), 1)
        s = jnp.where(kpos < length, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[pl.ds(row0, ht), :]
        l_prev = l_scr[pl.ds(row0, ht), :]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[pl.ds(row0, ht), :] = m_next
        l_scr[pl.ds(row0, ht), :] = l_next
        acc_scr[...] *= alpha[:, :1]
        v = vbuf[slot]
        vn = vn_ref[pl.ds(row0, ht), :]
        vf = jnp.where(on_new, vn[:, None, :], v).astype(jnp.float32)
        acc_scr[...] += jnp.sum(p[:, :, None] * vf, axis=1)

        @pl.when(blk == nvalid - 1)
        def _finalize():
            l = l_next[:, :1]
            lsafe = jnp.where(l == 0.0, 1.0, l)
            ofin[pl.ds(row0, ht), :] = acc_scr[...] / lsafe

        return 0

    jax.lax.fori_loop(0, total, attn_body, 0)

    # ---- W_o: selectors from the transposed attention output ----------
    oT = jax.lax.dot_general(
        eye, ofin[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)
    xp = jnp.concatenate(
        [oT[32 * c:32 * (c + 1), :] for c in range(4)], axis=1)
    xl, xh = xp[:16, :], xp[16:, :]
    av, bv = xl - xh / 16.0, xh / 16.0
    amax_a = jnp.max(jnp.abs(av), axis=0, keepdims=True)
    amax_b = jnp.max(jnp.abs(bv), axis=0, keepdims=True)
    sa = jnp.where(amax_a == 0.0, 1.0, amax_a / 127.0)
    sb = jnp.where(amax_b == 0.0, 1.0, amax_b / 127.0)
    scs[0:1, :] = 8.0 * jnp.sum(xh, axis=0, keepdims=True)
    scs[1:2, :] = jnp.sum(xl + xh, axis=0, keepdims=True)
    scs[2:3, :] = sa
    scs[3:4, :] = sb
    aq = jnp.clip(jnp.round(av / sa), -127, 127)
    bq = jnp.clip(jnp.round(bv / sb), -127, 127)
    for t in range(16):
        sl = slice(128 * t, 128 * (t + 1))
        eas[sl, :] = (eye * aq[t:t + 1, :]).astype(jnp.int8)
        ebs[sl, :] = (eye * bq[t:t + 1, :]).astype(jnp.int8)

    for c in wo_copies:
        c.wait()
    y_wo = _chunk8_compute(eas, ebs, scs[...],
                           woq, woes[...].astype(jnp.float32),
                           woem[...].astype(jnp.float32),
                           n_segs=1, splits=(1024,) * 4)       # [1, 4096]
    h2t[...] = htile + y_wo.reshape(32, 128)

    # ---- mlp norm -> gate/up selectors; start the w_down stream -------
    _norm_quant_selectors(h2t[...], gm_ref[...], eas, ebs, scs, eye, eps)
    for c in down_copies(0, 0):
        c.start()

    # ---- gate/up phase (stream tiles nQ..nQ+nG-1; tile nQ was issued
    # by the wqkv loop and streamed during attention) -------------------
    for t in range(nG):
        slot = (nQ + t) % 2
        if nQ + t + 1 < nQ + nG:
            for c in stream_copies(nQ + t + 1, 1 - slot):
                c.start()
        for c in stream_copies(nQ + t, slot):
            c.wait()
        es = ses[slot].astype(jnp.float32)
        em = sem[slot].astype(jnp.float32)
        y = _chunk8_compute(eas, ebs, scs[...],
                            sq.at[slot], es, em,
                            n_segs=1, splits=(1024,) * 4)
        ygu[0:1, pl.ds(4096 * t, 4096)] = y

    # ---- silu boundary: build w_down's operands (mlp_fused design) ----
    khd = Kd // 2
    g_ = ygu[0:1, :Kd]
    u_ = ygu[0:1, Kd:]
    mid = (g_ * jax.nn.sigmoid(g_)) * u_                      # [1, Kd]
    xl2 = mid[:, :khd]
    xh2 = mid[:, khd:]
    a2 = xl2 - xh2 / 16.0
    b2 = xh2 / 16.0
    span = khd // segsD
    nrow = span // 128
    for s_ in range(segsD):
        base = s_ * span
        amax_a2 = jnp.zeros((1, 128), jnp.float32)
        amax_b2 = jnp.zeros((1, 128), jnp.float32)
        sum_xh = jnp.zeros((1, 128), jnp.float32)
        sum_x = jnp.zeros((1, 128), jnp.float32)
        for t in range(nrow):
            sl = slice(base + t * 128, base + (t + 1) * 128)
            amax_a2 = jnp.maximum(amax_a2, jnp.abs(a2[:, sl]))
            amax_b2 = jnp.maximum(amax_b2, jnp.abs(b2[:, sl]))
            sum_xh = sum_xh + xh2[:, sl]
            sum_x = sum_x + xl2[:, sl] + xh2[:, sl]
        sa2 = jnp.where(amax_a2 == 0.0, 1.0, amax_a2 / 127.0)
        sb2 = jnp.where(amax_b2 == 0.0, 1.0, amax_b2 / 127.0)
        cs_ = slice(s_ * 128, (s_ + 1) * 128)
        scd[0:1, cs_] = 8.0 * sum_xh
        scd[1:2, cs_] = sum_x
        scd[2:3, cs_] = sa2
        scd[3:4, cs_] = sb2
        for t in range(nrow):
            sl = slice(base + t * 128, base + (t + 1) * 128)
            aq2 = jnp.clip(jnp.round(a2[:, sl] / sa2), -127, 127)
            bq2 = jnp.clip(jnp.round(b2[:, sl] / sb2), -127, 127)
            ead[sl, :] = (eye * aq2).astype(jnp.int8)
            ebd[sl, :] = (eye * bq2).astype(jnp.int8)

    # ---- down phase + final residual ----------------------------------
    for h in range(nH):
        yqkv[0:1, D * h:D * (h + 1)] = h2t[h:h + 1, :]   # h2 flat, reuse
    for t in range(nD):
        slot = t % 2
        if t + 1 < nD:
            for c in down_copies(t + 1, 1 - slot):
                c.start()
        for c in down_copies(t, slot):
            c.wait()
        es = dbes[slot].astype(jnp.float32)
        em = dbem[slot].astype(jnp.float32)
        y = _chunk8_compute(ead, ebd, scd[...],
                            db.at[slot], es, em,
                            n_segs=segsD, splits=_row_splits(bnD))
        hn_ref[0:1, pl.ds(bnD * t, bnD)] = (
            y + yqkv[0:1, pl.ds(bnD * t, bnD)])


def layer_fused_supported(layer: dict, n_heads: int, n_kv_heads: int,
                          head_dim: int, cache_dtype) -> bool:
    wqkv = layer.get("wqkv")
    wo = layer.get("wo")
    wgu = layer.get("w_gu_f")
    wd = layer.get("w_down")
    for w in (wqkv, wo, wgu, wd):
        if not isinstance(w, QuantLinear) or w.fmt != "q4_k":
            return False
    if not (wqkv.layout == wo.layout == wgu.layout == "wof"):
        return False
    if wd.layout != "std":
        return False
    if head_dim != 128 or n_heads != n_kv_heads or n_heads != 32:
        return False
    dim = n_heads * head_dim
    if wqkv.array_shape != (3 * dim, dim) or wo.array_shape != (dim, dim):
        return False
    ng, kg = wgu.array_shape
    nd, kd = wd.array_shape
    if kg != dim or nd != dim or ng != 2 * kd or kd % 4096 != 0:
        return False
    if ng % 4096 != 0 or kd // 4096 < 1:
        return False
    return cache_dtype in (jnp.bfloat16, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "head_dim", "rope_theta", "rms_eps",
                     "scale", "block_k", "interpret"),
)
def layer_fused(
    h: jax.Array,                 # [1, dim] residual stream (logical)
    layer_w: dict,                # wqkv/wo/w_gu_f (wof), w_down (std),
                                  # attn_norm / mlp_norm vectors
    k_cache: jax.Array,           # [L, 1, H, S, D]
    v_cache: jax.Array,
    lengths: jax.Array,           # [1], length BEFORE this token
    layer,
    *,
    n_heads: int, head_dim: int, rope_theta: float, rms_eps: float,
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool | None = None,
):
    """Returns (h_next [1, dim] f32, k_new, v_new [H, D] cache dtype)."""
    wqkv, wo = layer_w["wqkv"], layer_w["wo"]
    wgu, wd = layer_w["w_gu_f"], layer_w["w_down"]
    nH, D = n_heads, head_dim
    dim = nH * D
    L, B, _, S, _ = k_cache.shape
    assert B == 1 and h.shape == (1, dim)
    if scale is None:
        scale = float(1.0 / D ** 0.5)
    bk = min(block_k, S)
    assert S % bk == 0
    ht = 8
    n_groups = nH // ht
    NQ = 3 * dim
    nQ = NQ // 4096
    Ng, _ = wgu.array_shape
    nG = Ng // 4096
    _, Kd = wd.array_shape
    segsD = Kd // 4096
    bnD = 512
    nD = dim // bnD

    htile = h.reshape(32, 128).astype(jnp.float32)
    ga = layer_w["attn_norm"].astype(jnp.float32).reshape(32, 128)
    gm = layer_w["mlp_norm"].astype(jnp.float32).reshape(32, 128)
    eye = jnp.asarray(np.eye(128, dtype=np.int8))

    pos = lengths[0].astype(jnp.float32)
    freqs = rope_theta ** (-jnp.arange(0, D // 2, dtype=jnp.float32)
                           / (D // 2))
    ang = pos * freqs
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    C = jnp.concatenate([cosv, cosv])
    S2 = jnp.concatenate([-sinv, sinv])
    cs = jnp.stack([C * scale, S2 * scale, C, S2])

    lens_incl = lengths.astype(jnp.int32) + 1
    lyr = jnp.atleast_1d(jnp.asarray(layer, jnp.int32))
    cmap = lambda lens, lyr_: (0, 0)
    cache_dtype = k_cache.dtype

    kernel = functools.partial(
        _layer_kernel, nQ=nQ, nG=nG, nD=nD, bnD=bnD, Kd=Kd, segsD=segsD,
        n_groups=n_groups, ht=ht, bk=bk, nH=nH, eps=rms_eps,
        cache_dtype=cache_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((32, 128), lambda i, lens, lyr_: (0, 0)),  # h
            pl.BlockSpec((32, 128), lambda i, lens, lyr_: (0, 0)),  # ga
            pl.BlockSpec((32, 128), lambda i, lens, lyr_: (0, 0)),  # gm
            pl.BlockSpec((4, 128), lambda i, lens, lyr_: (0, 0)),   # cs
            pl.BlockSpec((128, 128), lambda i, lens, lyr_: (0, 0)),  # eye
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 14,
        out_specs=[
            pl.BlockSpec((1, dim), lambda i, lens, lyr_: (0, 0)),
            pl.BlockSpec((nH, D), lambda i, lens, lyr_: (0, 0)),
            pl.BlockSpec((nH, D), lambda i, lens, lyr_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4096, 2048), jnp.int8),        # sq stream
            pltpu.VMEM((2, 4096, 128), wqkv.es.dtype),    # ses
            pltpu.VMEM((2, 4096, 128), wqkv.em.dtype),    # sem
            pltpu.VMEM((2, bnD, Kd // 2), jnp.int8),      # db stream
            pltpu.VMEM((2, bnD, Kd // 32), wd.es.dtype),  # dbes
            pltpu.VMEM((2, bnD, Kd // 32), wd.em.dtype),  # dbem
            pltpu.VMEM((dim, 2048), jnp.int8),            # woq resident
            pltpu.VMEM((dim, 128), wo.es.dtype),          # woes
            pltpu.VMEM((dim, 128), wo.em.dtype),          # woem
            pltpu.VMEM((2, ht, bk, D), cache_dtype),      # kbuf
            pltpu.VMEM((2, ht, bk, D), cache_dtype),      # vbuf
            pltpu.VMEM((2048, 128), jnp.int8),            # eas
            pltpu.VMEM((2048, 128), jnp.int8),            # ebs
            pltpu.VMEM((4, 128), jnp.float32),            # scs
            pltpu.VMEM((Kd // 2, 128), jnp.int8),         # ead
            pltpu.VMEM((Kd // 2, 128), jnp.int8),         # ebd
            pltpu.VMEM((4, Kd // 32), jnp.float32),       # scd
            pltpu.VMEM((1, NQ), jnp.float32),             # yqkv
            pltpu.VMEM((1, Ng), jnp.float32),             # ygu
            pltpu.VMEM((nH, 128), jnp.float32),           # qt
            pltpu.VMEM((nH, 128), jnp.float32),           # m
            pltpu.VMEM((nH, 128), jnp.float32),           # l
            pltpu.VMEM((ht, 128), jnp.float32),           # acc
            pltpu.VMEM((nH, 128), jnp.float32),           # ofin
            pltpu.VMEM((32, 128), jnp.float32),           # h2 tile
            pltpu.SemaphoreType.DMA((3, 2)),              # stream sems
            pltpu.SemaphoreType.DMA((3, 2)),              # down sems
            pltpu.SemaphoreType.DMA((2, 2)),              # kv sems
            pltpu.SemaphoreType.DMA((3,)),                # wo sems
        ],
    )

    wbytes = wqkv.nbytes + wo.nbytes + wgu.nbytes + wd.nbytes
    h_next, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, dim), jnp.float32),
            jax.ShapeDtypeStruct((nH, D), cache_dtype),
            jax.ShapeDtypeStruct((nH, D), cache_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * (NQ + dim) * dim + 2 * (Ng + dim) * Kd
            + 4 * nH * S * D,
            bytes_accessed=wbytes + 2 * nH * S * D * k_cache.dtype.itemsize,
            transcendentals=nH * S + Kd),
        interpret=interpret_default(interpret),
    )(lens_incl, lyr, htile, ga, gm, cs, eye,
      wqkv.qs, wqkv.es, wqkv.em, k_cache, v_cache,
      wo.qs, wo.es, wo.em, wgu.qs, wgu.es, wgu.em,
      wd.qs, wd.es, wd.em)
    return h_next, k_new, v_new
