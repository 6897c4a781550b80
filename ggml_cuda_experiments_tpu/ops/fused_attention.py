"""Whole-attention-block fused Pallas kernel for batch-1 decode.

ONE kernel launch runs: wqkv dequant-matvec -> RoPE -> KV append (splice +
staging for the cache write) -> split-KV flash decode -> W_o dequant-matvec.
The unfused decode path pays per-call launch/pipeline-ramp for three Pallas
calls plus XLA glue between them (PERF.md "per-call wall"); this kernel is
the attention-side sibling of ``quant_matmul.mlp_fused``.

The reference splits this pipeline across three kernels + host glue
(QKV prep in the harness, `flash_attn_row` map, `fa_reduce` merge —
/root/reference/src/flash_row_float.h:4-200,415-472 and
src/kernel_test.h:107-163); the phases here mirror that structure but live
in one launch so the weight streams and the KV reads share one pipeline.

Measured design rules (tools/probe_mosaic_r3.py + marginal probes):

- Pallas per-grid-step overhead scales with the number of windowed
  operands (~4 us/step with 16 windows — measured by varying S with the
  windowed-KV variant of this kernel). So the grid is FIVE steps total:
  nQ wqkv tiles, ONE attention step with an in-kernel double-buffered
  async-DMA loop over only the VALID KV blocks (the paged_attention
  idiom), one W_o step.
- A constant-index windowed operand is fetched in the PROLOGUE and waited
  before step 0 — a serial stall for a big weight. W_o therefore streams
  via explicit ``make_async_copy`` issued at step 0 and waited at the
  last step, fully overlapped with the wqkv stream and attention.
- The ((0,),(0,)) transpose-dot orientation silently miscompiles on this
  Mosaic; the W_o boundary transposes with an eye-dot contracting lanes
  at HIGHEST precision (default MXU precision rounds f32 to bf16 — a
  measured 0.5% error on the attention output).
- W_o uses the lossless "wof" column layout (quant_matmul._perm_wof),
  chosen so the transposed attention output feeds the int8 selector
  matvec by pure sublane slicing — no in-kernel lane permute exists.

Supported shapes (``attention_fused_supported``): B == 1, head_dim 128,
dim == 4096 (wof + kb == 128 selector width), GQA ratio r = Hq/Hkv in
{1, 2, 4, 8} (each 8-q-row iteration spans 8/r KV heads; scores are
per-KV-head sub-products, so no KV bytes are replicated — covers MHA 7B
32/32 and llama3-8b 32/8), q4_k weights ("e" or "s6" scale encodings),
bf16/f32 contiguous cache (the quantized paged pool keeps the standalone
kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.ops.quant_matmul import (
    QuantLinear, _block_sums, _chunk8_compute, _dd_expand_np,
    _decode_es_em_s6, _eye_operand, _quant_rows_blockwise, _store_row,
    chunk8_plan, permute_activations, QK_K,
)
from ggml_cuda_experiments_tpu.utils.platform import interpret_default

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _build_selectors(eas, ebs, ab, eye_f32, kh: int):
    """eas[128t + i, b] = a[t, i] * [i == b]; ``ab`` holds the a-rows in
    [0, kh/128) and the b-rows in [kh/128, 2*kh/128)."""
    nt = kh // 128
    for t in range(nt):
        sl = slice(128 * t, 128 * (t + 1))
        eas[sl, :] = (eye_f32 * ab[t:t + 1, :].astype(jnp.float32)
                      ).astype(jnp.int8)
        ebs[sl, :] = (eye_f32 * ab[nt + t:nt + t + 1, :].astype(jnp.float32)
                      ).astype(jnp.int8)


def _fused_attn_kernel(
    *refs,
    nQ: int, bnQ: int, n_blocks: int, n_groups: int,
    ht: int, bk: int, nH: int, nKV: int,
    splitsQ, splitsW, cache_dtype,
    s6q: bool = False, s6w: bool = False,
):
    it = iter(refs)
    len_ref, lyr_ref = next(it), next(it)     # scalar prefetch
    ab_ref, sc2_ref, eye_ref = next(it), next(it), next(it)
    eddq_ref = next(it) if s6q else None
    eddw_ref = next(it) if s6w else None
    # one shared int8 eye for both weights' sm eye-dot (KQ == KW == dim)
    eyesm_ref = next(it) if (s6q or s6w) else None
    qem_ref = qdd_ref = wem_any = wdd_any = None
    if s6q:
        qqs_ref, qes_ref, qdd_ref = next(it), next(it), next(it)
    else:
        qqs_ref, qes_ref, qem_ref = next(it), next(it), next(it)
    k_any, v_any = next(it), next(it)
    if s6w:
        wqs_any, wes_any, wdd_any = next(it), next(it), next(it)
    else:
        wqs_any, wes_any, wem_any = next(it), next(it), next(it)
    o_ref, kn_ref, vn_ref = next(it), next(it), next(it)
    yqkv, qt, eas, ebs, scs = (next(it) for _ in range(5))
    m_scr, l_scr, acc_scr, ofin = (next(it) for _ in range(4))
    kbuf, vbuf, woq, woes = (next(it) for _ in range(4))
    woem = wodd = None
    if s6w:
        wodd = next(it)
    else:
        woem = next(it)
    kv_sem, wo_sem = it

    i = pl.program_id(0)
    D = 128
    r = nH // nKV                             # GQA broadcast ratio
    kh_pg = ht // r                           # KV heads per 8-q-row group
    length = len_ref[0]                       # valid length INCLUDING new tok
    lyr = lyr_ref[0]
    nvalid = jnp.minimum((length + bk - 1) // bk, n_blocks)

    def kv_copies(t, slot):
        g = t // nvalid
        blk = t - g * nvalid
        row0 = g * kh_pg
        base = blk * bk
        src_k = k_any.at[lyr, 0, pl.ds(row0, kh_pg), pl.ds(base, bk)]
        src_v = v_any.at[lyr, 0, pl.ds(row0, kh_pg), pl.ds(base, bk)]
        return (pltpu.make_async_copy(src_k, kbuf.at[slot], kv_sem.at[0, slot]),
                pltpu.make_async_copy(src_v, vbuf.at[slot], kv_sem.at[1, slot]))

    def wo_copies():
        third = ((wdd_any, wodd) if s6w else (wem_any, woem))
        return [pltpu.make_async_copy(wqs_any, woq, wo_sem.at[0]),
                pltpu.make_async_copy(wes_any, woes, wo_sem.at[1]),
                pltpu.make_async_copy(third[0], third[1], wo_sem.at[2])]

    @pl.when(i == 0)
    def _prologue():
        eye = eye_ref[...].astype(jnp.float32)
        _build_selectors(eas, ebs, ab_ref, eye, 2048)
        for c in wo_copies():                 # stream W_o behind everything
            c.start()
        for c in kv_copies(0, 0):             # first KV block
            c.start()

    @pl.when(i < nQ)
    def _qkv_phase():
        if s6q:
            es, em = _decode_es_em_s6(qes_ref, qdd_ref, eddq_ref,
                                      eyesm_ref)
        else:
            es = qes_ref[...].astype(jnp.float32)
            em = qem_ref[...].astype(jnp.float32)
        y = _chunk8_compute(eas, ebs, sc2_ref[0:4, :], qqs_ref, es, em,
                            n_segs=1, splits=splitsQ,
                            store=_store_row(yqkv, i * bnQ))
        if y is not None:
            yqkv[0:1, pl.ds(i * bnQ, bnQ)] = y

    @pl.when(i == nQ - 1)
    def _rope_boundary():
        Cq, S2q = sc2_ref[4:5, :], sc2_ref[5:6, :]
        C, S2 = sc2_ref[6:7, :], sc2_ref[7:8, :]
        for h in range(nH):
            qt[h:h + 1, :] = yqkv[0:1, D * h:D * (h + 1)]
        qraw = qt[...]
        qt[...] = qraw * Cq + pltpu.roll(qraw, 64, 1) * S2q
        k0 = nH * D
        for h in range(nKV):
            ofin[h:h + 1, :] = yqkv[0:1, k0 + D * h:k0 + D * (h + 1)]
        kraw = ofin[0:nKV, :]                 # ofin is [nH, 128] scratch
        kn_ref[...] = (kraw * C + pltpu.roll(kraw, 64, 1) * S2
                       ).astype(cache_dtype)
        v0 = (nH + nKV) * D
        for h in range(nKV):
            vn_ref[h:h + 1, :] = yqkv[0:1, v0 + D * h:v0 + D * (h + 1)
                                      ].astype(cache_dtype)

    @pl.when(i == nQ)
    def _attn_phase():
        total = n_groups * nvalid
        newpos = length - 1

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            g = t // nvalid
            blk = t - g * nvalid
            base = blk * bk
            row0q = g * ht                                 # q/m/l/ofin rows
            row0k = g * kh_pg                              # kv-head rows

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
                l_scr[pl.ds(row0q, ht), :] = jnp.zeros((ht, 128), jnp.float32)
                acc_scr[...] = jnp.zeros_like(acc_scr)

            q = qt[pl.ds(row0q, ht), :]                    # [ht, D] scaled
            k = kbuf[slot]                                 # [kh_pg, bk, D]
            on_new = (base + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk, 1), 1)) == newpos
            kn = kn_ref[pl.ds(row0k, kh_pg), :]
            kf = jnp.where(on_new, kn[:, None, :], k).astype(jnp.float32)
            # GQA: q rows [sub*r, (sub+1)*r) share kv-head row ``sub`` —
            # per-sub VPU products instead of replicating KV bytes r times
            # (the reference replicates the QUERY instead, burning 15/16
            # of each MMA, /root/reference/src/flash_row_float.h:21-38).
            # MHA keeps the single full-width product.
            if r == 1:
                s = jnp.sum(q[:, None, :] * kf, axis=-1)   # [ht, bk]
            else:
                s = jnp.concatenate(
                    [jnp.sum(q[sub * r:(sub + 1) * r, None, :]
                             * kf[sub][None, :, :], axis=-1)
                     for sub in range(kh_pg)], axis=0)     # [ht, bk]
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

        jax.lax.fori_loop(0, total, body, 0)

        # ---- W_o boundary: build the wof-layout selector operands ----
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
        scs[0:1, :] = 8.0 * jnp.sum(xh, axis=0, keepdims=True)
        scs[1:2, :] = jnp.sum(xl + xh, axis=0, keepdims=True)
        scs[2:3, :] = sa
        scs[3:4, :] = sb
        aq = jnp.clip(jnp.round(av / sa), -127, 127)
        bq = jnp.clip(jnp.round(bv / sb), -127, 127)
        ab = jnp.concatenate([aq, bq], axis=0)             # [32, 128]
        _build_selectors(eas, ebs, ab, eye, 2048)

    @pl.when(i == nQ + 1)
    def _wo_phase():
        for c in wo_copies():
            c.wait()
        if s6w:
            es, em = _decode_es_em_s6(woes, wodd, eddw_ref, eyesm_ref)
        else:
            es = woes[...].astype(jnp.float32)
            em = woem[...].astype(jnp.float32)
        res = _chunk8_compute(eas, ebs, scs[...], woq, es, em,
                              n_segs=1, splits=splitsW,
                              store=_store_row(o_ref))
        if res is not None:
            o_ref[...] = res


def wof_shape_supported(dim_o: int, ko: int, n_heads: int,
                        n_kv_heads: int, head_dim: int) -> bool:
    """Shape half of the fused-attention gate — the SINGLE predicate both
    the producer (llama.quantize_params deciding to emit a wof-layout W_o)
    and the consumer (attention_fused_supported) use, so a weight can
    never be quantized into a layout the kernel then rejects.

    GQA is supported when the broadcast ratio divides the 8-q-row
    iteration group (r in {1, 2, 4, 8} — covers MHA 7B 32/32 and
    llama3-8b 32/8)."""
    if n_kv_heads == 0 or n_heads % n_kv_heads != 0:
        return False
    r = n_heads // n_kv_heads
    return (head_dim == 128 and n_heads % 8 == 0 and 8 % r == 0
            and n_heads * head_dim == 4096     # wof layout + kb == 128
            and (dim_o, ko) == (4096, 4096))


def attention_fused_supported(wqkv, wo, n_heads: int, n_kv_heads: int,
                              head_dim: int, cache_dtype) -> bool:
    if not (isinstance(wqkv, QuantLinear) and isinstance(wo, QuantLinear)):
        return False
    if wqkv.fmt != "q4_k" or wo.fmt != "q4_k" or wo.layout != "wof":
        return False
    nw, kw = wo.array_shape
    if not wof_shape_supported(nw, kw, n_heads, n_kv_heads, head_dim):
        return False
    dim = n_heads * head_dim
    nq, kq = wqkv.array_shape
    if (nq, kq) != ((n_heads + 2 * n_kv_heads) * head_dim, dim):
        return False
    return cache_dtype in (jnp.bfloat16, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "rope_theta",
                     "scale", "block_k", "x_prepermuted", "interpret"),
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
    x_prepermuted: bool = False,
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
    ht = 8                                # q rows per attention iteration
    r = nH // nKV                         # GQA ratio (1 for MHA)
    assert nH % nKV == 0 and ht % r == 0
    kh_pg = ht // r                       # KV heads per iteration
    n_groups = nH // ht

    NQ, KQ = wqkv.array_shape
    planQ = chunk8_plan(NQ, KQ)
    bnQ, splitsQ = planQ["bn"], planQ["splits"]
    assert NQ % bnQ == 0
    nQ = NQ // bnQ
    NW, KW = wo.array_shape
    splitsW = chunk8_plan(NW, KW, block_n=NW)["splits"]
    grid = (nQ + 2,)

    # --- phase-Q activation operands (same math as _qmatmul_chunk8) ---
    xp = (x.astype(jnp.float32) if x_prepermuted
          else permute_activations(x.astype(jnp.float32)))
    kh, kb = KQ // 2, KQ // 32
    xl, xh = xp[0, :kh], xp[0, kh:]
    aq, sa = _quant_rows_blockwise(xl - xh / 16.0, kb, 1)
    bq, sb = _quant_rows_blockwise(xh / 16.0, kb, 1)
    scq = jnp.stack([8.0 * _block_sums(xh, kb, 1),
                     _block_sums(xl + xh, kb, 1), sa, sb])     # [4, kb]
    ab = jnp.concatenate([aq.reshape(kh // 128, 128),
                          bq.reshape(kh // 128, 128)])         # [32, 128]
    eye = jnp.asarray(np.eye(128, dtype=np.int8))

    # --- rope C/S rows (rotate-half: out = x*C + roll(x, 64)*S2) ---
    pos = lengths[0].astype(jnp.float32)
    freqs = rope_theta ** (-jnp.arange(0, D // 2, dtype=jnp.float32)
                           / (D // 2))
    ang = pos * freqs
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    C = jnp.concatenate([cosv, cosv])
    S2 = jnp.concatenate([-sinv, sinv])
    sc2 = jnp.concatenate(
        [scq, jnp.stack([C * scale, S2 * scale, C, S2])])      # [8, 128]

    lens_incl = lengths.astype(jnp.int32) + 1
    lyr = jnp.atleast_1d(jnp.asarray(layer, jnp.int32))

    cmap = lambda i, lens, lyr_: (0, 0)
    qmap = lambda i, lens, lyr_: (jnp.minimum(i, nQ - 1), 0)

    cache_dtype = k_cache.dtype
    s6q = wqkv.enc == "s6"
    s6w = wo.enc == "s6"
    kernel = functools.partial(
        _fused_attn_kernel,
        nQ=nQ, bnQ=bnQ, n_blocks=n_blocks, n_groups=n_groups,
        ht=ht, bk=bk, nH=nH, nKV=nKV, splitsQ=splitsQ, splitsW=splitsW,
        cache_dtype=cache_dtype, s6q=s6q, s6w=s6w)

    in_specs = [
        pl.BlockSpec((32, 128), cmap),               # ab
        pl.BlockSpec((8, 128), cmap),                # sc2
        pl.BlockSpec((128, 128), cmap),              # eye
    ]
    operands = [ab, sc2, eye]
    if s6q:
        eddq = jnp.asarray(_dd_expand_np(KQ, wqkv.layout))
        in_specs.append(pl.BlockSpec(eddq.shape, cmap))
        operands.append(eddq)
    if s6w:
        eddw = jnp.asarray(_dd_expand_np(KW, wo.layout))
        in_specs.append(pl.BlockSpec(eddw.shape, cmap))
        operands.append(eddw)
    if s6q or s6w:
        assert KQ == KW
        eyesm = jnp.asarray(_eye_operand(2 * kb))
        in_specs.append(pl.BlockSpec(eyesm.shape, cmap))
        operands.append(eyesm)
    if s6q:
        in_specs += [
            pl.BlockSpec((bnQ, KQ // 2), qmap),      # wqkv qs
            pl.BlockSpec((bnQ, 2 * kb), qmap),       # wqkv sm (sc|mn)
            pl.BlockSpec((bnQ, KQ // QK_K * 2), qmap),   # wqkv dd
        ]
        operands += [wqkv.qs, wqkv.es, wqkv.d]
    else:
        in_specs += [
            pl.BlockSpec((bnQ, KQ // 2), qmap),      # wqkv qs
            pl.BlockSpec((bnQ, kb), qmap),           # wqkv es
            pl.BlockSpec((bnQ, kb), qmap),           # wqkv em
        ]
        operands += [wqkv.qs, wqkv.es, wqkv.em]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 5
    operands += [k_cache, v_cache, wo.qs, wo.es,
                 wo.d if s6w else wo.em]

    scratch = [
        pltpu.VMEM((1, NQ), jnp.float32),            # yqkv
        pltpu.VMEM((nH, 128), jnp.float32),          # qt
        pltpu.VMEM((KQ // 2, 128), jnp.int8),        # eas
        pltpu.VMEM((KQ // 2, 128), jnp.int8),        # ebs
        pltpu.VMEM((4, 128), jnp.float32),           # scs
        pltpu.VMEM((nH, 128), jnp.float32),          # m
        pltpu.VMEM((nH, 128), jnp.float32),          # l
        pltpu.VMEM((ht, 128), jnp.float32),          # acc
        pltpu.VMEM((nH, 128), jnp.float32),          # ofin
        pltpu.VMEM((2, kh_pg, bk, D), cache_dtype),  # kbuf
        pltpu.VMEM((2, kh_pg, bk, D), cache_dtype),  # vbuf
        pltpu.VMEM((NW, KW // 2), jnp.int8),         # wo qs resident
    ]
    if s6w:
        scratch += [
            pltpu.VMEM((NW, 2 * (KW // 32)), jnp.int8),      # wo sm
            pltpu.VMEM((NW, KW // QK_K * 2), wo.d.dtype),    # wo dd
        ]
    else:
        scratch += [
            pltpu.VMEM((NW, KW // 32), wo.es.dtype),         # wo es
            pltpu.VMEM((NW, KW // 32), wo.em.dtype),         # wo em
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((2, 2)),             # kv sems
        pltpu.SemaphoreType.DMA((3,)),               # wo sems
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, NW), cmap),                 # o
            pl.BlockSpec((nKV, D), cmap),                # k_new
            pl.BlockSpec((nKV, D), cmap),                # v_new
        ],
        scratch_shapes=scratch,
    )

    wbytes = wqkv.nbytes + wo.nbytes
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
    )(lens_incl, lyr, *operands)
    return o, k_new, v_new
