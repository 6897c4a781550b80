"""Non-MXU (VPU) prefill attention for MMA-hostile shapes, packaged as a
differentiable custom op.

The TPU answer to the reference's vendored xformers memory-efficient
attention (/root/reference/src/misc/attention.cu): that kernel runs
register-tiled online-softmax attention entirely on CUDA-core float4
vector math — no tensor cores — because its target shapes (small
per-thread query tiles, head dims like 40/64/80 with float4/float2/float
dispatch, :534-585) tile the MMA units badly, and it is *packaged* as a
PyTorch custom op (``TORCH_LIBRARY_IMPL(xformers, CUDA, ...)``,
:592-596) so a framework can call it like a native function.

The TPU translation of each half:

- **non-MXU compute**: the MXU wants 128x128 operands; a prefill with a
  handful of queries (speculative verify windows, tiny drafts) or an
  unpadded head_dim (< 128, not a lane multiple) wastes almost all of
  every pass. This kernel keeps QK^T and P.V on the VPU as broadcast
  multiply + axis reductions over [T, bk, D] tiles — the same
  shape-class of work the reference's compute_loop does with float4 FMAs
  (:217-243) — with fp32 online-softmax state (m, l, acc) carried across
  KV blocks exactly like ``aggregate_coeffs``'s (m_prime, s_prime)
  recurrence (:251-272).
- **custom-op packaging**: a ``jax.custom_vjp`` wrapper. In JAX the
  custom-op boundary is not a dispatcher registration but a function
  whose forward and backward rules are both opaque to tracing: autodiff
  of a Pallas kernel would fail (no transpose rule through the scratch
  accumulators), so the VJP recomputes attention from the saved
  (q, k, v, lse) with the standard flash-attention backward algebra.
  This makes the kernel a drop-in differentiable op — the same "framework
  can call it natively" property the ATen wrapper provides.

Shape support: any head_dim <= 128 (lane-padded in VMEM, zero-padding is
exact: padded lanes contribute 0 to every dot), any T (query count), KV
length padded to the block size by the caller's mask/length argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.utils.platform import interpret_default

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _vpu_attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                     m_scr, l_scr, acc_scr, *,
                     bk: int, causal: bool, scale: float, q0_pos: int):
    """Grid: (batch*heads, n_kv_blocks). One (b, h) slice per grid row;
    KV blocks stream along the second grid axis with fp32 (m, l, acc)
    online-softmax scratch carried across steps — the reference's
    UnrollLoop/compute_loop + aggregate_coeffs recurrence
    (/root/reference/src/misc/attention.cu:217-272) expressed as Pallas
    grid steps instead of per-thread register tiles."""
    j = pl.program_id(1)
    length = len_ref[pl.program_id(0)]        # scalar-prefetch [B*H]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale          # [T, D]
    k = k_ref[0].astype(jnp.float32)                  # [bk, D]
    v = v_ref[0].astype(jnp.float32)
    T = q.shape[0]

    # VPU dot: broadcast-multiply + lane reduction (no MXU pass)
    s = jnp.sum(q[:, None, :] * k[None, :, :], axis=-1)   # [T, bk]
    kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (T, bk), 1)
    valid = kpos < length
    if causal:
        qpos = q0_pos + jax.lax.broadcasted_iota(jnp.int32, (T, bk), 0)
        valid = jnp.logical_and(valid, kpos <= qpos)
    s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[...]                               # [T, 128] (col 0 used)
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next
    acc_scr[...] *= alpha[:, :1]
    acc_scr[...] += jnp.sum(p[:, :, None] * v[None, :, :], axis=1)

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        l = l_scr[...][:, :1]
        lsafe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / lsafe).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[...] + jnp.log(lsafe)).astype(jnp.float32)


def _vpu_attention_fwd_impl(q, k, v, lengths, *, causal, scale, block_k,
                            q0_pos, interpret):
    B, H, T, D = q.shape
    S = k.shape[2]
    Dp = 128                                          # lane-pad head dim
    bk = min(block_k, S)
    assert S % bk == 0, (S, bk)

    def pad_d(a):
        return (jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, Dp - D),))
                if D != Dp else a)

    qf = pad_d(q).reshape(B * H, T, Dp)
    kf = pad_d(k).reshape(B * H, S, Dp)
    vf = pad_d(v).reshape(B * H, S, Dp)
    lens = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None],
                            (B, H)).reshape(B * H)

    grid = (B * H, S // bk)
    o, lse = pl.pallas_call(
        functools.partial(_vpu_attn_kernel, bk=bk, causal=causal,
                          scale=scale, q0_pos=q0_pos),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, T, Dp), lambda i, j, lens: (i, 0, 0)),
                pl.BlockSpec((1, bk, Dp), lambda i, j, lens: (i, j, 0)),
                pl.BlockSpec((1, bk, Dp), lambda i, j, lens: (i, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, T, Dp), lambda i, j, lens: (i, 0, 0)),
                pl.BlockSpec((1, T, 128), lambda i, j, lens: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((T, 128), jnp.float32),    # m
                pltpu.VMEM((T, 128), jnp.float32),    # l
                pltpu.VMEM((T, Dp), jnp.float32),     # acc
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret_default(interpret),
    )(lens, qf, kf, vf)
    o = o.reshape(B, H, T, Dp)[..., :D]
    lse = lse.reshape(B, H, T, 128)[..., 0]
    return o, lse


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8))
def vpu_attention(q, k, v, lengths, causal=True, scale=None, block_k=256,
                  q0_pos=0, interpret=None):
    """o = softmax(scale * q k^T + mask) v computed entirely on the VPU.

    q [B, H, T, D], k/v [B, H, S, D], lengths [B] valid KV prefix.
    ``q0_pos``: absolute position of q's first row (causal masking for
    suffix windows). Differentiable (custom VJP below).
    """
    if scale is None:
        scale = float(1.0 / np.sqrt(q.shape[-1]))
    o, _ = _vpu_attention_fwd_impl(q, k, v, lengths, causal=causal,
                                   scale=scale, block_k=block_k,
                                   q0_pos=q0_pos, interpret=interpret)
    return o


def _vpu_attention_fwd(q, k, v, lengths, causal, scale, block_k, q0_pos,
                       interpret):
    if scale is None:
        scale = float(1.0 / np.sqrt(q.shape[-1]))
    o, lse = _vpu_attention_fwd_impl(q, k, v, lengths, causal=causal,
                                     scale=scale, block_k=block_k,
                                     q0_pos=q0_pos, interpret=interpret)
    return o, (q, k, v, lengths, o, lse)


def _vpu_attention_bwd(causal, scale, block_k, q0_pos, interpret, res, do):
    """Flash-attention backward from saved (q, k, v, o, lse): standard
    recompute algebra — dS = P * (dO V^T - rowsum(dO * O)) — in plain jnp
    (XLA fuses it; the backward is off the serving hot path, it exists so
    the op is a complete differentiable custom op like the reference's
    ATen registration makes attention() a complete torch op)."""
    q, k, v, lengths, o, lse = res
    if scale is None:
        scale = float(1.0 / np.sqrt(q.shape[-1]))
    B, H, T, D = q.shape
    S = k.shape[2]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    s = jnp.einsum("bhtd,bhsd->bhts", qf, kf) * scale
    kpos = jnp.arange(S)[None, None, None, :]
    valid = kpos < lengths[:, None, None, None]
    if causal:
        qpos = (q0_pos + jnp.arange(T))[None, None, :, None]
        valid = jnp.logical_and(valid, kpos <= qpos)
    s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse[..., None])                   # [B,H,T,S]
    dv = jnp.einsum("bhts,bhtd->bhsd", p, dof)
    dp = jnp.einsum("bhtd,bhsd->bhts", dof, vf)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    ds = jnp.where(valid, ds, 0.0)
    dq = jnp.einsum("bhts,bhsd->bhtd", ds, kf).astype(q.dtype)
    dk = jnp.einsum("bhts,bhtd->bhsd", ds, qf).astype(k.dtype)
    # lengths is integer-valued: its cotangent type is float0
    dlen = np.zeros(lengths.shape, jax.dtypes.float0)
    return dq, dk, dv.astype(v.dtype), dlen


vpu_attention.defvjp(_vpu_attention_fwd, _vpu_attention_bwd)
