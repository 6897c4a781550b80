"""Fused flash-attention forward Pallas kernel with online softmax + GQA.

The TPU-native re-design of the reference's ``flash_attn_ext_f16``
(/root/reference/src/flash-llama.h:5-437). Feature-parity map:

reference (CUDA/WMMA)                        -> here (Pallas/MXU)
- grid (⌈batch/Q⌉, heads, seq)                 -> grid (B, Hq, Sq/bq, Sk/bk)
- per-warp KV loop, C cols/iter (:162-167)     -> sequential kv grid dim with
                                                  VMEM (m, l, acc) scratch
- QK^T via WMMA, K "transposed" (:169-205)     -> one MXU dot_general per tile,
                                                  contracting on head_dim
- diag(scale) MMA trick + mask add (:153-204)  -> scale/mask fused on the VPU
                                                  into the score tile
- online softmax M/S recurrence (:211-267)     -> identical recurrence, fp32
- skip all-(-INF) mask blocks (:276-278)       -> predicated tile skip on the
                                                  mask tile max (pl.when)
- O rescale by diag(ms) via MMA (:294-317)     -> acc *= alpha broadcast (VPU)
- cross-warp (S,M) LSE merge (:351-410)        -> not needed: one sequential
                                                  accumulator per (b,h,iq) —
                                                  the merge lives in
                                                  ops/lse.py for split-KV and
                                                  cross-chip use
- GQA broadcast ne02/ne12 (:127-140)           -> kv head = q head // r in the
                                                  K/V BlockSpec index maps
- fp16 compute, fp32-ish accum                 -> bf16 operands, fp32 MXU
                                                  accumulation + fp32 softmax
                                                  state (SURVEY §7 numerics)

Causality follows the decode convention: the Sq queries are the *last* Sq
positions of the Sk-long context (query i attends kv j iff j <= i + Sk - Sq).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.utils.platform import interpret_default

# Finite stand-in for -inf: avoids exp(-inf - -inf) NaNs while still
# underflowing to 0 against any real score (see boom guide §4 / flash-llama.h
# NaN guard :258).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_SKIP_THRESHOLD = 0.5 * DEFAULT_MASK_VALUE  # tile max below this => all masked


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                  m_ref, l_ref, acc_ref, *,
                  scale: float, causal: bool, n_kv: int, sq: int, sk: int,
                  has_mask: bool):
    iq, ik = pl.program_id(2), pl.program_id(3)
    bq, d = q_ref.shape[2], q_ref.shape[3]
    bk = k_ref.shape[2]

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # causal tile skip: queries occupy the last sq positions of the context
    offset = sk - sq
    if causal:
        run = (iq * bq + bq - 1 + offset) >= ik * bk
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]                                      # [bq, d]
        k = k_ref[0, 0]                                      # [bk, d]
        # f32 inputs get full-precision MXU passes (default silently rounds
        # to bf16); bf16 inputs use the native path
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        s *= scale

        if has_mask:
            s += mask_ref[0, 0].astype(jnp.float32)
        if causal:
            qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            kpos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(kpos <= qpos + offset, s, DEFAULT_MASK_VALUE)

        def _tile():
            m_prev = m_ref[...]                              # [bq, 128]
            l_prev = l_ref[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)       # [bq, 1]
            m_next = jnp.maximum(m_prev, m_curr)             # [bq, 128]
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])                   # [bq, bk]
            l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[...] = m_next
            l_ref[...] = l_next
            acc_ref[...] *= alpha[:, :1]
            v = v_ref[0, 0]                                  # [bk, d]
            acc_ref[...] += jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                precision=prec,
            )

        if has_mask:
            # all-(-inf) mask block skip (flash-llama.h:276-278 analog)
            @pl.when(jnp.max(s) > _SKIP_THRESHOLD)
            def _():
                _tile()
        else:
            _tile()

    @pl.when(ik == n_kv - 1)
    def _store():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_ref[:, :1]
            lse = jnp.where(
                l == 0.0, -jnp.inf, m + jnp.log(jnp.where(l == 0.0, 1.0, l))
            )
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k",
                     "return_residuals", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    return_residuals: bool = False,
    interpret: bool | None = None,
):
    """O = softmax(Q K^T * scale + mask) V, never materializing the scores.

    q: [B, Hq, Sq, D]; k, v: [B, Hkv, Sk, D] with Hq % Hkv == 0 (GQA).
    mask: optional additive mask broadcastable from [B|1, Hq|1, Sq, Sk]
    (use -inf / very negative for masked positions).
    Returns O [B, Hq, Sq, D]; with ``return_residuals`` also the log-sum-exp
    lse = m + log(l) [B, Hq, Sq] (fp32) for cross-shard merging.
    """
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    assert Hq % Hkv == 0, f"GQA needs Hq % Hkv == 0 ({Hq} vs {Hkv})"
    r = Hq // Hkv
    if scale is None:
        scale = float(1.0 / D ** 0.5)

    bq = min(block_q, Sq)
    bk = min(block_k, Sk)
    assert Sq % bq == 0 and Sk % bk == 0, (
        f"Sq {Sq} / Sk {Sk} must be multiples of block sizes {bq}/{bk}; "
        "pad upstream")
    n_kv = Sk // bk
    has_mask = mask is not None

    # DMA-level causal skip: tiles past the causal frontier clamp their KV
    # block index to the last valid tile for this query row — the index map
    # then repeats the previous grid step's block, so Pallas issues NO new
    # DMA and KV bytes scale with the causal triangle, not the rectangle.
    # (Beats the reference's compute-only -INF skip, flash-llama.h:276-278;
    # same trick as the length clamp in ops/flash_decode.py.)
    offset = Sk - Sq
    if causal:
        def _ik_eff(iq, ik):
            return jnp.minimum(ik, (iq * bq + bq - 1 + offset) // bk)
    else:
        def _ik_eff(iq, ik):
            return ik

    grid = (B, Hq, Sq // bq, n_kv)
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, iq, ik: (b, h // r, _ik_eff(iq, ik), 0)),
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, iq, ik: (b, h // r, _ik_eff(iq, ik), 0)),
    ]
    args = [q, k, v]
    if has_mask:
        mask = jnp.broadcast_to(mask, (*mask.shape[:-2], Sq, Sk))
        mb, mh = mask.shape[0], mask.shape[1]
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, bk),
            lambda b, h, iq, ik: (b if mb > 1 else 0, h if mh > 1 else 0,
                                  iq, _ik_eff(iq, ik)),
        ))
        args.append(mask)
    else:
        in_specs.append(None)
        args.append(None)

    out_shapes = [jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0))]
    if return_residuals:
        out_shapes.append(jax.ShapeDtypeStruct((B, Hq, Sq, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, iq, ik: (b, h, iq, 0)))

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, n_kv=n_kv, sq=Sq, sk=Sk,
        has_mask=has_mask,
    )

    def kernel_entry(*refs):
        if has_mask:
            q_ref, k_ref, v_ref, mask_ref = refs[:4]
            rest = refs[4:]
        else:
            q_ref, k_ref, v_ref = refs[:3]
            mask_ref = None
            rest = refs[3:]
        if return_residuals:
            o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
        else:
            (o_ref, m_ref, l_ref, acc_ref) = rest
            lse_ref = None
        kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
               m_ref, l_ref, acc_ref)

    outs = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[s for s in in_specs if s is not None],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # m
            pltpu.VMEM((bq, 128), jnp.float32),   # l
            pltpu.VMEM((bq, D), jnp.float32),     # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * Sq * Sk * D // (2 if causal else 1),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=B * Hq * Sq * Sk,
        ),
        interpret=interpret_default(interpret),
    )(*(a for a in args if a is not None))

    if return_residuals:
        o, lse = outs
        return o, lse[..., 0]
    return outs[0]
