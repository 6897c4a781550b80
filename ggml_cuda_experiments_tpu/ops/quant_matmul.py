"""Fused block-dequant matmul/matvec Pallas kernels (Q8_0 / Q4_0 / Q4_K).

The BASELINE.json north-star subsystem: GGML-style weight-only block
quantization dequantized *inside* the matmul kernel, so decode-time matvecs
stream quantized bytes from HBM at (near-)roofline bandwidth instead of
materializing f32/bf16 weights. The reference repo has no quant path — this
is the driver-mandated extension (SURVEY.md §7 R8) — but the kernel shape
follows the reference's WMMA GEMM structure (one output tile per grid step,
operands pipelined HBM→VMEM, /root/reference/src/misc/tensor-core.cu:87-178)
re-expressed for the MXU.

Design (TPU-first):
- Weights are stored output-major [N, K] (as GGML does) in *planar* device
  arrays: 4-bit payloads use the native ``jnp.uint4`` dtype (XLA packs two
  per byte in HBM), scales/mins are separate small arrays. No interleaved
  structs, no nibble shuffles: ``uint4 -> f32`` is a hardware-supported cast.
- Decode matvec (B ≤ 32): the whole K dimension is one block — a single
  MXU dot per output tile; the grid runs over N only, so Mosaic's automatic
  double-buffering streams the weight tiles at full HBM bandwidth while the
  (tiny) activation stays resident in VMEM.
- Per-32-block scales are expanded in-kernel on the VPU via a
  [bn, K/32, 32]-shaped broadcast (reshape of the lane dimension), the
  direct analog of the reference's diagonal-scale-matrix trick for fusing
  the softmax scale (/root/reference/src/flash-llama.h:153-158) — fuse the
  cheap elementwise work into the operand stream, never a second pass.
- Large-batch prefill: ``qmatmul_xla`` dequantizes via XLA (one fused
  dequant+matmul, compute-bound on the MXU) — at large B the matmul is
  FLOP-bound and the Pallas streaming design buys nothing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.oracle import quant as quant_ref
from ggml_cuda_experiments_tpu.utils.platform import interpret_default

QK = quant_ref.QK
QK_K = quant_ref.QK_K


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantLinear:
    """Device-side quantized weight W [N, K] (output-major, like GGML).

    fields present per format:
      q8_0: qs int8  [N, K],     d f32 [N, K/32]
      q4_0: qs uint4 [N, K],     d f32 [N, K/32]          (q - 8 at dequant)
      q4_k: qs uint4 [N, K],     sc u8 [N, K/32], mn u8 [N, K/32],
            d f32 [N, K/256], dmin f32 [N, K/256]
    """

    fmt: str = dataclasses.field(metadata=dict(static=True))
    shape: tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    qs: jax.Array = None
    d: jax.Array = None
    sc: jax.Array | None = None
    mn: jax.Array | None = None
    dmin: jax.Array | None = None

    @property
    def nbytes(self) -> int:
        total = 0
        for f in (self.qs, self.d, self.sc, self.mn, self.dmin):
            if f is not None:
                bits = 4 if f.dtype in (jnp.int4, jnp.uint4) else f.dtype.itemsize * 8
                total += f.size * bits // 8
        return total


def from_oracle(t) -> QuantLinear:
    """Convert an oracle-quantized tensor (NumPy planar) to device arrays."""
    n, k = t.shape
    if isinstance(t, quant_ref.Q8_0):
        return QuantLinear(fmt="q8_0", shape=(n, k),
                           qs=jnp.asarray(t.qs), d=jnp.asarray(t.d))
    if isinstance(t, quant_ref.Q4_0):
        q = quant_ref.unpack_nibbles(t.qs.reshape(n, k // QK, QK // 2))
        return QuantLinear(fmt="q4_0", shape=(n, k),
                           qs=jnp.asarray(q.reshape(n, k), jnp.uint4),
                           d=jnp.asarray(t.d))
    if isinstance(t, quant_ref.Q4_K):
        q = quant_ref.unpack_nibbles(t.qs.reshape(n, k // QK, QK // 2))
        return QuantLinear(fmt="q4_k", shape=(n, k),
                           qs=jnp.asarray(q.reshape(n, k), jnp.uint4),
                           d=jnp.asarray(t.d), sc=jnp.asarray(t.sc),
                           mn=jnp.asarray(t.mn), dmin=jnp.asarray(t.dmin))
    raise TypeError(f"unsupported oracle tensor {type(t)}")


def quantize(w: np.ndarray, fmt: str) -> QuantLinear:
    """Quantize a float [N, K] weight to device arrays via the oracle."""
    return from_oracle(quant_ref.FORMATS[fmt][0](np.asarray(w)))


# ---------------------------------------------------------------------------
# scale expansion (shared between XLA path and kernels)
# ---------------------------------------------------------------------------

def _expand_blockwise(v: jax.Array, n: int, k: int, block: int) -> jax.Array:
    """[n, k/block] -> [n, k] by repeating each entry `block` times on lanes."""
    return jnp.broadcast_to(v[:, :, None], (n, k // block, block)).reshape(n, k)


def _dequant_tile(fmt: str, refs: dict[str, Any], out_dtype) -> jax.Array:
    """Dequantize one [bn, bk] weight tile from its planar refs/arrays."""
    qs = refs["qs"][...]
    bn, bk = qs.shape
    if fmt == "q8_0":
        w = qs.astype(jnp.float32) * _expand_blockwise(refs["d"][...], bn, bk, QK)
    elif fmt == "q4_0":
        w = (qs.astype(jnp.float32) - 8.0) * _expand_blockwise(
            refs["d"][...], bn, bk, QK)
    elif fmt == "q4_k":
        d = refs["d"][...]
        dmin = refs["dmin"][...]
        sc = refs["sc"][...].astype(jnp.float32)
        mn = refs["mn"][...].astype(jnp.float32)
        eff_scale = _expand_blockwise(d, bn, bk // QK, QK_K // QK) * sc
        eff_min = _expand_blockwise(dmin, bn, bk // QK, QK_K // QK) * mn
        w = (qs.astype(jnp.float32) * _expand_blockwise(eff_scale, bn, bk, QK)
             - _expand_blockwise(eff_min, bn, bk, QK))
    else:
        raise ValueError(fmt)
    return w.astype(out_dtype)


_FIELDS = {
    "q8_0": ("qs", "d"),
    "q4_0": ("qs", "d"),
    "q4_k": ("qs", "d", "sc", "mn", "dmin"),
}


def dequantize_jnp(ql: QuantLinear, dtype=jnp.float32) -> jax.Array:
    """XLA-only dequantization to a dense [N, K] array (baseline/oracle)."""
    refs = {f: getattr(ql, f) for f in _FIELDS[ql.fmt]}
    return _dequant_tile(ql.fmt, refs, dtype)


# ---------------------------------------------------------------------------
# fused Pallas kernel
# ---------------------------------------------------------------------------

def _qmatmul_kernel(*refs, fmt: str, compute_dtype):
    """Grid (n,): out[:, n] = x @ dequant(W[n])^T — one MXU dot per tile."""
    field_names = _FIELDS[fmt]
    x_ref = refs[0]
    w_refs = dict(zip(field_names, refs[1:1 + len(field_names)]))
    o_ref = refs[1 + len(field_names)]

    w = _dequant_tile(fmt, w_refs, compute_dtype)          # [bn, K]
    x = x_ref[...].astype(compute_dtype)                   # [B, K]
    o_ref[...] = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


# per-format scale granularities for BlockSpec construction
_GRAN = {
    "qs": 1, "d": None, "sc": QK, "mn": QK, "dmin": None,
}


def _field_granularity(fmt: str, field: str) -> int:
    if field == "qs":
        return 1
    if field in ("sc", "mn"):
        return QK
    # d / dmin
    return QK if fmt in ("q8_0", "q4_0") else QK_K


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "compute_dtype", "out_dtype", "interpret"),
)
def qmatmul(
    x: jax.Array,
    ql: QuantLinear,
    *,
    block_n: int = 512,
    compute_dtype=jnp.float32,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """y[B, N] = x[B, K] @ dequant(W[N, K])^T, dequant fused in-kernel.

    The memory-bound decode path: weights stream HBM→VMEM once, activations
    stay resident. B is padded to the f32 sublane minimum (8).
    """
    N, K = ql.shape
    B = x.shape[0]
    assert x.shape[1] == K, f"x K={x.shape[1]} vs weight K={K}"
    if out_dtype is None:
        out_dtype = x.dtype

    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    bn = min(block_n, N)
    Np = -(-N // bn) * bn
    fields = _FIELDS[ql.fmt]

    def pad_rows(a, rows):
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0))) if a.shape[0] != rows else a

    arrays = []
    in_specs = [pl.BlockSpec((Bp, K), lambda n: (0, 0))]          # x
    for f in fields:
        a = pad_rows(getattr(ql, f), Np)
        gran = _field_granularity(ql.fmt, f)
        arrays.append(a)
        in_specs.append(
            pl.BlockSpec((bn, K // gran), lambda n: (n, 0))
        )

    out = pl.pallas_call(
        functools.partial(_qmatmul_kernel, fmt=ql.fmt,
                          compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), out_dtype),
        grid=(Np // bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bp, bn), lambda n: (0, n)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * K,
            bytes_accessed=sum(a.size * (4 if a.dtype in (jnp.int4, jnp.uint4)
                                         else a.dtype.itemsize * 8) // 8
                               for a in arrays) + Bp * K * 4 + Bp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret_default(interpret),
    )(x, *arrays)
    return out[:B, :N]


def qmatmul_xla(x: jax.Array, ql: QuantLinear, compute_dtype=jnp.float32
                ) -> jax.Array:
    """XLA-fused baseline: dequantize then matmul (prefill / comparison)."""
    w = dequantize_jnp(ql, compute_dtype)
    return jax.lax.dot_general(
        x.astype(compute_dtype), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
