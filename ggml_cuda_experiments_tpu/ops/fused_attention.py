"""Whole-attention-block fused Pallas kernel for batch-1 decode.

ONE kernel launch runs: wqkv dequant-matvec -> RoPE -> KV append (splice +
staging for the cache write) -> split-KV flash decode -> W_o dequant-matvec.
The unfused decode path pays ~20 us of launch/pipeline-ramp per Pallas call
plus XLA glue between them (PERF.md "per-call wall"); at 7B that is three
launches + glue per layer on the attention side alone. This kernel is the
attention-side sibling of ``quant_matmul.mlp_fused`` and uses the same
phase-over-grid construction.

The reference splits this pipeline across three kernels + host glue
(QKV prep in the harness, `flash_attn_row` map, `fa_reduce` merge —
/root/reference/src/flash_row_float.h:4-200,415-472 and
src/kernel_test.h:107-163); the phases here mirror that structure but live
in one launch so the weight streams and the KV reads share one software
pipeline.

Phases over one 1-D grid (nQ + n_groups*n_blocks + nW steps):

  [0, nQ)            chunk8 dequant-matvec tiles of the fused wqkv weight
                     (activation operands prebuilt by the caller, selector
                     matrices built in-kernel at step 0 from int8 rows —
                     the eye-outer-product trick of mlp_fused's boundary).
                     y lands in VMEM scratch.
  step nQ-1 (tail)   RoPE boundary: q/k rows are lane-extracted from the
                     scratch, rotated with the roll-by-64 identity
                     (rotate-half == x*C + roll(x,64)*S2), the softmax
                     scale folded into q's rotation; k/v are written to the
                     kn/vn OUTPUTS (the caller appends them to the cache —
                     the kernel itself splices them into the attention
                     stream, so attention sees the current token without
                     waiting for the cache write).
  [nQ, nQ+G*B)       split-KV decode, MHA head-tiled (ht heads per step,
                     the _decode_kernel_ht design): online softmax in
                     f32 scratch, DMA-level length clamp (invalid KV
                     blocks re-reference a resident tile and issue no
                     copy), fresh-token splice via iota==pos select.
  step nQ+G*B-1      W_o boundary: finalized per-head outputs are
                     transposed via an MXU eye-dot (oT[d,h] =
                     sum_e I[d,e]*o[h,e]; the ((0,0)) contraction order
                     miscompiles on this Mosaic — probed), rearranged into
                     W_o's "wof" activation layout by pure sublane
                     slicing (see quant_matmul._perm_wof: the layout is
                     chosen so NO in-kernel lane permute exists), then
                     int8-quantized per block and turned into selector
                     matrices in scratch.
  [nQ+G*B, +nW)      chunk8 dequant-matvec tiles of W_o (wof layout) ->
                     the attention block output.

Supported shapes (gated by ``attention_fused_supported``): B == 1, MHA
(Hq == Hkv, % 8 == 0), head_dim 128, dim == 4096 (the wof layout + kb=128
selector width), q4_k weights, bf16 or int8/fp8-scale-free cache: bf16
cache first (quantized-cache variant: engine paged path keeps the
standalone kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.ops.quant_matmul import (
    QuantLinear, _block_sums, _chunk8_compute, _quant_rows_blockwise,
    _row_splits, chunk8_plan, permute_activations,
)
from ggml_cuda_experiments_tpu.utils.platform import interpret_default

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _build_selectors(eas, ebs, aq, bq, eye_f32, kh: int):
    """eas[128t + i, b] = aq[t, i] * [i == b] for t in range(kh // 128).
    ``aq``/``bq`` are [kh//128, 128] arrays or refs (int8 or f32)."""
    for t in range(kh // 128):
        sl = slice(128 * t, 128 * (t + 1))
        eas[sl, :] = (eye_f32 * aq[t:t + 1, :].astype(jnp.float32)
                      ).astype(jnp.int8)
        ebs[sl, :] = (eye_f32 * bq[t:t + 1, :].astype(jnp.float32)
                      ).astype(jnp.int8)


def _fused_attn_kernel(
    len_ref, lyr_ref,                         # scalar prefetch
    aq_ref, bq_ref, scq_ref, cs_ref, eye_ref,
    qqs_ref, qes_ref, qem_ref,
    k_ref, v_ref,
    wqs_ref, wes_ref, wem_ref,
    o_ref, kn_ref, vn_ref,
    yqkv, qt, eas, ebs, scs, m_scr, l_scr, acc_scr, ofin,
    *, nQ: int, bnQ: int, nW: int, n_blocks: int, n_groups: int,
    ht: int, bk: int, nH: int, nKV: int,
    splitsQ, splitsW, cache_dtype,
):
    i = pl.program_id(0)
    nQA = nQ + n_groups * n_blocks
    D = 128
    length = len_ref[0]                       # valid length INCLUDING new tok

    @pl.when(i == 0)
    def _build_q_selectors():
        eye = eye_ref[...].astype(jnp.float32)
        _build_selectors(eas, ebs, aq_ref, bq_ref, eye, 2048)

    @pl.when(i < nQ)
    def _qkv_phase():
        es = qes_ref[...].astype(jnp.float32)
        em = qem_ref[...].astype(jnp.float32)
        y = _chunk8_compute(eas, ebs, scq_ref[...], qqs_ref, es, em,
                            n_segs=1, splits=splitsQ)
        yqkv[0:1, pl.ds(i * bnQ, bnQ)] = y

    @pl.when(i == nQ - 1)
    def _rope_boundary():
        Cq, S2q = cs_ref[0:1, :], cs_ref[1:2, :]
        C, S2 = cs_ref[2:3, :], cs_ref[3:4, :]
        # q rows -> qt scratch, rotate-half + softmax scale folded in
        for h in range(nH):
            qt[h:h + 1, :] = yqkv[0:1, D * h:D * (h + 1)]
        qraw = qt[...]
        qt[...] = qraw * Cq + pltpu.roll(qraw, 64, 1) * S2q
        # k rows staged in ofin (free until attention finalize), roped,
        # written to the kn output (cache dtype — the splice below reads
        # it back so cache rounding matches the XLA append exactly)
        k0 = nH * D
        for h in range(nKV):
            ofin[h:h + 1, :] = yqkv[0:1, k0 + D * h:k0 + D * (h + 1)]
        kraw = ofin[...]
        kn_ref[...] = (kraw * C + pltpu.roll(kraw, 64, 1) * S2
                       ).astype(cache_dtype)
        v0 = (nH + nKV) * D
        for h in range(nKV):
            vn_ref[h:h + 1, :] = yqkv[0:1, v0 + D * h:v0 + D * (h + 1)
                                      ].astype(cache_dtype)

    @pl.when((i >= nQ) & (i < nQA))
    def _attn_phase():
        a = i - nQ
        g = a // n_blocks
        blk = a - g * n_blocks
        base = blk * bk
        row0 = g * ht

        @pl.when(blk == 0)
        def _init():
            m_scr[pl.ds(row0, ht), :] = jnp.full((ht, 128), -jnp.inf,
                                                 jnp.float32)
            l_scr[pl.ds(row0, ht), :] = jnp.zeros((ht, 128), jnp.float32)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when(base < length)
        def _compute():
            newpos = length - 1
            q = qt[pl.ds(row0, ht), :]                     # [ht, D] scaled
            k = k_ref[...].reshape(ht, bk, D)
            on_new = (base + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk, 1), 1)) == newpos
            kn = kn_ref[pl.ds(row0, ht), :]
            kf = jnp.where(on_new, kn[:, None, :], k).astype(jnp.float32)
            s = jnp.sum(q[:, None, :] * kf, axis=-1)       # [ht, bk]
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
            v = v_ref[...].reshape(ht, bk, D)
            vn = vn_ref[pl.ds(row0, ht), :]
            vf = jnp.where(on_new, vn[:, None, :], v).astype(jnp.float32)
            acc_scr[...] += jnp.sum(p[:, :, None] * vf, axis=1)

        @pl.when(blk == n_blocks - 1)
        def _finalize():
            l = l_scr[pl.ds(row0, ht), :][:, :1]
            lsafe = jnp.where(l == 0.0, 1.0, l)
            ofin[pl.ds(row0, ht), :] = acc_scr[...] / lsafe

    @pl.when(i == nQA - 1)
    def _wo_boundary():
        # oT[d, h] = sum_e I[d, e] * ofin[h, e] — MXU transpose with both
        # contractions on lanes (the ((0,),(0,)) orientation silently
        # miscompiles on this backend; probed in tools/probe_mosaic_r3.py)
        eye = eye_ref[...].astype(jnp.float32)
        oT = jax.lax.dot_general(
            eye, ofin[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # [128, nH]
        # HIGHEST: default MXU precision rounds f32 operands to bf16 —
        # measured 0.5% error on the attention output (vs 1e-7 with the
        # full-precision passes; the [128,128]x[128,32] dot is trivial)
        # wof activation tile: xp[:, c*nH:(c+1)*nH] = oT[32c:32c+32, :]
        xp = jnp.concatenate(
            [oT[32 * c:32 * (c + 1), :] for c in range(4)], axis=1)
        xl, xh = xp[:16, :], xp[16:, :]                    # [16, 128]
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
        _build_selectors(eas, ebs, aq, bq, eye, 2048)

    @pl.when(i >= nQA)
    def _wo_phase():
        es = wes_ref[...].astype(jnp.float32)
        em = wem_ref[...].astype(jnp.float32)
        o_ref[...] = _chunk8_compute(eas, ebs, scs[...], wqs_ref, es, em,
                                     n_segs=1, splits=splitsW)


def attention_fused_supported(wqkv, wo, n_heads: int, n_kv_heads: int,
                              head_dim: int, cache_dtype) -> bool:
    if not (isinstance(wqkv, QuantLinear) and isinstance(wo, QuantLinear)):
        return False
    if wqkv.fmt != "q4_k" or wo.fmt != "q4_k" or wo.layout != "wof":
        return False
    if head_dim != 128 or n_heads != n_kv_heads or n_heads % 8 != 0:
        return False
    dim = n_heads * head_dim
    if dim != 4096:                       # wof layout + kb == 128 gate
        return False
    nq, kq = wqkv.array_shape
    nw, kw = wo.array_shape
    if (nq, kq) != (3 * dim, dim) or (nw, kw) != (dim, dim):
        return False
    return cache_dtype in (jnp.bfloat16, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "rope_theta",
                     "scale", "block_k", "interpret"),
)
def attention_fused(
    x: jax.Array,                 # [1, dim] normed hidden, logical order
    wqkv: QuantLinear,
    wo: QuantLinear,              # layout="wof"
    k_cache: jax.Array,           # [L, 1, Hkv, S, D]
    v_cache: jax.Array,
    lengths: jax.Array,           # [1] int32, length BEFORE this token
    layer,
    *,
    n_heads: int, n_kv_heads: int, head_dim: int,
    rope_theta: float = 10000.0,
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool | None = None,
):
    """Returns (o [1, dim] f32 attention-block output (pre-residual),
    k_new [Hkv, D], v_new [Hkv, D] in cache dtype, for the caller's cache
    append at position ``lengths[0]``)."""
    nH, nKV, D = n_heads, n_kv_heads, head_dim
    dim = nH * D
    L, B, _, S, _ = k_cache.shape
    assert B == 1 and x.shape == (1, dim)
    if scale is None:
        scale = float(1.0 / D ** 0.5)
    bk = min(block_k, S)
    assert S % bk == 0
    n_blocks = S // bk
    ht = 8
    n_groups = nKV // ht

    NQ, KQ = wqkv.array_shape
    planQ = chunk8_plan(NQ, KQ)
    bnQ, splitsQ = planQ["bn"], planQ["splits"]
    assert NQ % bnQ == 0
    nQ = NQ // bnQ
    NW, KW = wo.array_shape
    planW = chunk8_plan(NW, KW)
    bnW, splitsW = planW["bn"], planW["splits"]
    assert NW % bnW == 0
    nW = NW // bnW
    nQA = nQ + n_groups * n_blocks
    grid = (nQA + nW,)

    # --- phase-Q activation operands (same math as _qmatmul_chunk8) ---
    xp = permute_activations(x.astype(jnp.float32))
    kh, kb = KQ // 2, KQ // 32
    xl, xh = xp[0, :kh], xp[0, kh:]
    aq, sa = _quant_rows_blockwise(xl - xh / 16.0, kb, 1)
    bq, sb = _quant_rows_blockwise(xh / 16.0, kb, 1)
    scq = jnp.stack([8.0 * _block_sums(xh, kb, 1),
                     _block_sums(xl + xh, kb, 1), sa, sb])     # [4, kb]
    aq_t = aq.reshape(kh // 128, 128)
    bq_t = bq.reshape(kh // 128, 128)
    eye = jnp.asarray(np.eye(128, dtype=np.int8))

    # --- rope C/S rows (rotate-half: out = x*C + roll(x, 64)*S2) ---
    pos = lengths[0].astype(jnp.float32)
    freqs = rope_theta ** (-jnp.arange(0, D // 2, dtype=jnp.float32)
                           / (D // 2))
    ang = pos * freqs
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    C = jnp.concatenate([cosv, cosv])
    S2 = jnp.concatenate([-sinv, sinv])
    cs = jnp.stack([C * scale, S2 * scale, C, S2])             # [4, 128]

    lens_incl = lengths.astype(jnp.int32) + 1
    lyr = jnp.atleast_1d(jnp.asarray(layer, jnp.int32))

    def cmap(i, lens, lyr_):
        return (0, 0)

    def qmap(i, lens, lyr_):
        return (jnp.minimum(i, nQ - 1), 0)

    def kvmap(i, lens, lyr_):
        a = jnp.clip(i - nQ, 0, n_groups * n_blocks - 1)
        g = a // n_blocks
        blk = a - g * n_blocks
        last_valid = jnp.maximum((lens[0] + bk - 1) // bk - 1, 0)
        blk = jnp.minimum(jnp.minimum(blk, last_valid), n_blocks - 1)
        return (lyr_[0], 0, g, blk, 0)

    def wmap(i, lens, lyr_):
        return (jnp.maximum(i - nQA, 0), 0)

    def omap(i, lens, lyr_):
        return (0, jnp.maximum(i - nQA, 0))

    cache_dtype = k_cache.dtype
    kernel = functools.partial(
        _fused_attn_kernel,
        nQ=nQ, bnQ=bnQ, nW=nW, n_blocks=n_blocks, n_groups=n_groups,
        ht=ht, bk=bk, nH=nH, nKV=nKV, splitsQ=splitsQ, splitsW=splitsW,
        cache_dtype=cache_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kh // 128, 128), cmap),        # aq
            pl.BlockSpec((kh // 128, 128), cmap),        # bq
            pl.BlockSpec((4, kb), cmap),                 # scq
            pl.BlockSpec((4, 128), cmap),                # cs
            pl.BlockSpec((128, 128), cmap),              # eye
            pl.BlockSpec((bnQ, KQ // 2), qmap),          # wqkv qs
            pl.BlockSpec((bnQ, kb), qmap),               # wqkv es
            pl.BlockSpec((bnQ, kb), qmap),               # wqkv em
            pl.BlockSpec((1, 1, ht, bk, D), kvmap),      # k cache
            pl.BlockSpec((1, 1, ht, bk, D), kvmap),      # v cache
            pl.BlockSpec((bnW, KW // 2), wmap),          # wo qs
            pl.BlockSpec((bnW, KW // 32), wmap),         # wo es
            pl.BlockSpec((bnW, KW // 32), wmap),         # wo em
        ],
        out_specs=[
            pl.BlockSpec((1, bnW), omap),                # o
            pl.BlockSpec((nKV, D), cmap),                # k_new
            pl.BlockSpec((nKV, D), cmap),                # v_new
        ],
        scratch_shapes=[
            pltpu.VMEM((1, NQ), jnp.float32),            # yqkv
            pltpu.VMEM((nH, 128), jnp.float32),          # qt
            pltpu.VMEM((kh, 128), jnp.int8),             # eas
            pltpu.VMEM((kh, 128), jnp.int8),             # ebs
            pltpu.VMEM((4, 128), jnp.float32),           # scs
            pltpu.VMEM((nH, 128), jnp.float32),          # m
            pltpu.VMEM((nH, 128), jnp.float32),          # l
            pltpu.VMEM((ht, 128), jnp.float32),          # acc
            pltpu.VMEM((nH, 128), jnp.float32),          # ofin
        ],
    )

    wbytes = (wqkv.nbytes + wo.nbytes)
    o, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, NW), jnp.float32),
            jax.ShapeDtypeStruct((nKV, D), cache_dtype),
            jax.ShapeDtypeStruct((nKV, D), cache_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * (NQ * KQ + NW * KW) + 4 * nH * S * D,
            bytes_accessed=wbytes + 2 * nKV * S * D * k_cache.dtype.itemsize,
            transcendentals=nH * S),
        interpret=interpret_default(interpret),
    )(lens_incl, lyr, aq_t, bq_t, scq, cs, eye,
      wqkv.qs, wqkv.es, wqkv.em,
      k_cache, v_cache,
      wo.qs, wo.es, wo.em)
    return o, k_new, v_new
