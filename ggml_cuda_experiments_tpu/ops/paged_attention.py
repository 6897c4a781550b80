"""Paged-KV flash decode: non-contiguous KV pages gathered by async DMA.

The serving-time form of the split-KV decode (ops/flash_decode.py): the KV
cache lives in a shared page pool in HBM, each sequence owns a list of page
indices, and the kernel streams its pages through a double-buffered VMEM
window — one DMA per page, all started concurrently, next block prefetched
while the current one computes (boom guide §§8-13; the VMEM staging +
async-copy discipline is the analog of the reference's
cooperative_groups::memcpy_async shared-memory staging,
/root/reference/src/flash_row_float.h:241-252 and
/root/reference/src/flash-matrix.cu:18-65, done with Pallas DMA).

Supports bf16 pages and int8/fp8 pages with per-token scales (scales applied
to score/probability rows, not the D-wide tiles — see flash_decode).
NOTE: quantized pools need ``page_size`` to be a multiple of 128 on real
TPUs — the per-page scale DMA is a [page_size]-lane slice and Mosaic
requires lane slices aligned to the 128 tiling ("Slice shape along
dimension 3 must be aligned to tiling (128)"); bf16 pools take any
page_size (their [page_size, D] tiles slice sublanes, aligned to 8).

Layout: pages are [Hkv, n_pages, page_size, D] so one (head, page) DMA is a
contiguous [page_size, D] tile with D on lanes — both QK^T and P·V contract
on a native dimension, no transposes (SURVEY §7 "layout constraints").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.utils.platform import interpret_default

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _paged_kernel(
    # scalar prefetch
    len_ref, pages_ref, *rest,
    scale: float, page_size: int, ppcb: int, n_blocks: int, n_kv_heads: int,
    batch: int, quantized: bool, layered: bool,
):
    if layered:
        # the pools carry a leading layer dim; DMAs index the prefetched
        # layer scalar, so the caller never materializes a layer slice of
        # the (large) page pool to feed the kernel
        layer_ref, rest = rest[0], rest[1:]
        lyr = (layer_ref[0],)
    else:
        lyr = ()
    q_ref, k_pages, v_pages, rest = rest[0], rest[1], rest[2], rest[3:]
    if quantized:
        (ks_pages, vs_pages, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sems, state,
         m_scr, l_scr, acc_scr) = rest
    else:
        (o_ref, k_buf, v_buf, sems, state,
         m_scr, l_scr, acc_scr) = rest
        ks_pages = vs_pages = ks_buf = vs_buf = None

    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g, d = q_ref.shape[2], q_ref.shape[3]
    bk = ppcb * page_size
    n_pages_total = k_pages.shape[-3]

    def nblocks_of(bb):
        return pl.cdiv(len_ref[bb], bk)

    def block_dmas(bb, hh, ii, slot):
        """Descriptors for the per-page DMAs of block ii of sequence bb.

        Rebuilt identically at start and wait time (the wait must reference
        the same src/dst — the interpreter executes the copy at wait)."""
        dmas = []
        for p in range(ppcb):
            page = jnp.minimum(pages_ref[bb, ii * ppcb + p],
                               n_pages_total - 1)
            idx = lyr + (hh, page)
            dmas.append(pltpu.make_async_copy(
                k_pages.at[idx], k_buf.at[slot, p],
                sems.at[0, slot, p]))
            dmas.append(pltpu.make_async_copy(
                v_pages.at[idx], v_buf.at[slot, p],
                sems.at[1, slot, p]))
            if quantized:
                # scales land in a FLAT [bk]-lane row (page p at lane
                # offset p*page_size): a [ppcb, ps] -> [1, bk] reshape at
                # use time is a sublane->lane cast Mosaic cannot lower
                dmas.append(pltpu.make_async_copy(
                    ks_pages.at[idx],
                    ks_buf.at[slot, pl.ds(p * page_size, page_size)],
                    sems.at[2, slot, p]))
                dmas.append(pltpu.make_async_copy(
                    vs_pages.at[idx],
                    vs_buf.at[slot, pl.ds(p * page_size, page_size)],
                    sems.at[3, slot, p]))
        return dmas

    def start_block(bb, hh, ii, slot):
        for dma in block_dmas(bb, hh, ii, slot):
            dma.start()

    def wait_block(bb, hh, ii, slot):
        for dma in block_dmas(bb, hh, ii, slot):
            dma.wait()

    def next_block(bb, hh, ii):
        """Lexicographic successor skipping each sequence's empty tail."""
        ii = ii + 1
        roll_h = ii >= nblocks_of(bb)
        hh = jnp.where(roll_h, hh + 1, hh)
        ii = jnp.where(roll_h, 0, ii)
        roll_b = hh >= n_kv_heads
        bb = jnp.where(roll_b, bb + 1, bb)
        hh = jnp.where(roll_b, 0, hh)
        return bb, hh, ii

    length = len_ref[b]
    base = i * bk

    # SMEM scratch is not zero-initialized: reset the DMA state machine on
    # the global first step (always active since lengths >= 1)
    @pl.when((b == 0) & (h == 0) & (i == 0))
    def _reset():
        state[1] = 0

    @pl.when(base < length)
    def _active():
        # state[0]: buffer slot of the *current* block
        # state[1]: 0 until the very first DMA has been issued
        @pl.when(state[1] == 0)
        def _first():
            start_block(b, h, i, 0)
            state[0] = 0
            state[1] = 1

        slot = state[0]

        # prefetch the next real block into the other slot
        nb, nh, ni = next_block(b, h, i)

        @pl.when(nb < batch)
        def _prefetch():
            start_block(nb, nh, ni, 1 - slot)
        state[0] = 1 - slot

        @pl.when(i == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        wait_block(b, h, i, slot)
        q = q_ref[0, 0]                                     # [G, D]
        k = k_buf[slot].reshape(bk, d)
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        if quantized:
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * (ks_buf[slot][None, :] * scale)
        else:
            s = jax.lax.dot_general(
                q.astype(k.dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec) * scale
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1)
        s = jnp.where(kpos < length, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next
        acc_scr[...] *= alpha[:, :1]
        v = v_buf[slot].reshape(bk, d)
        if quantized:
            pv = (p * vs_buf[slot][None, :]).astype(jnp.bfloat16)
            acc_scr[...] += jax.lax.dot(
                pv, v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            acc_scr[...] += jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                precision=prec)

        @pl.when(i == nblocks_of(b) - 1)
        def _emit():
            l = l_scr[:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "pages_per_compute_block", "interpret"),
)
def paged_decode(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    *,
    k_scale_pages: jax.Array | None = None,
    v_scale_pages: jax.Array | None = None,
    scale: float | None = None,
    pages_per_compute_block: int = 4,
    layer: jax.Array | int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-token attention over a paged KV cache.

    q:            [B, Hq, D]
    k/v_pages:    [Hkv, n_pages, page_size, D] shared page pool, OR the
                  full per-layer pool [L, Hkv, n_pages, page_size, D]
                  together with ``layer`` — the layer is selected by the
                  in-kernel DMAs (scalar prefetch), so no layer slice of
                  the pool is ever materialized (an XLA slice feeding the
                  custom call would copy the whole layer's pool per call)
    lengths:      [B] int32 valid tokens per sequence (>= 1)
    page_indices: [B, pages_per_seq] int32 logical->physical page map
    k/v_scale_pages: [(L,) Hkv, n_pages, page_size] f32 for int8 pages
    layer: scalar int selecting the pool layer when pages are 5-D
    Returns O [B, Hq, D] in q's dtype.
    """
    B, Hq, D = q.shape
    layered = k_pages.ndim == 5
    assert layered == (layer is not None), \
        "pass `layer` iff the page pools carry a leading layer dimension"
    Hkv, n_pages, page_size, _ = k_pages.shape[1:] if layered \
        else k_pages.shape
    pages_per_seq = page_indices.shape[1]
    assert Hq % Hkv == 0
    G = Hq // Hkv
    if scale is None:
        scale = float(1.0 / D ** 0.5)
    ppcb = min(pages_per_compute_block, pages_per_seq)
    assert pages_per_seq % ppcb == 0, (
        f"pages_per_seq {pages_per_seq} % {ppcb} != 0")
    n_blocks = pages_per_seq // ppcb
    quantized = k_scale_pages is not None
    assert (v_scale_pages is not None) == quantized

    qg = q.reshape(B, Hkv, G, D)

    tensor_in_specs = [
        pl.BlockSpec((1, 1, G, D),
                     lambda b, h, i, *refs: (b, h, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),       # k_pages (manual DMA)
        pl.BlockSpec(memory_space=pl.ANY),       # v_pages
    ]
    args = [qg, k_pages, v_pages]
    n_sem_kinds = 2
    scratch = [
        pltpu.VMEM((2, ppcb, page_size, D), k_pages.dtype),   # k window
        pltpu.VMEM((2, ppcb, page_size, D), v_pages.dtype),   # v window
    ]
    if quantized:
        tensor_in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        args += [k_scale_pages, v_scale_pages]
        scratch += [
            pltpu.VMEM((2, ppcb * page_size), jnp.float32),
            pltpu.VMEM((2, ppcb * page_size), jnp.float32),
        ]
        n_sem_kinds = 4
    scratch += [
        pltpu.SemaphoreType.DMA((n_sem_kinds, 2, ppcb)),
        pltpu.SMEM((2,), jnp.int32),                 # [buffer slot, started]
        pltpu.VMEM((G, 128), jnp.float32),           # m
        pltpu.VMEM((G, 128), jnp.float32),           # l
        pltpu.VMEM((G, D), jnp.float32),             # acc
    ]

    prefetch = [lengths.astype(jnp.int32), page_indices.astype(jnp.int32)]
    if layered:
        prefetch.append(jnp.atleast_1d(jnp.asarray(layer, jnp.int32)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + layered,
        grid=(B, Hkv, n_blocks),
        in_specs=tensor_in_specs,
        out_specs=pl.BlockSpec((1, 1, G, D),
                               lambda b, h, i, *refs: (b, h, 0, 0)),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, scale=scale, page_size=page_size, ppcb=ppcb,
            n_blocks=n_blocks, n_kv_heads=Hkv, batch=B, quantized=quantized,
            layered=layered),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret_default(interpret),
    )(*prefetch, *args)

    return out.reshape(B, Hq, D)
