"""MXU-tiled matmul Pallas kernels — the TPU-native analog of the reference's
WMMA tensor-core layer.

Replaces, idiomatically (not by translation):
- the 16x16x16 WMMA fragment typedefs (/root/reference/src/tensor-mma.h:4-13)
  -> 128x128 MXU tiles expressed as Pallas BlockSpecs;
- the WMMA GEMM benchmark kernels, fp16 HMMA and int8 IMMA paths
  (/root/reference/src/misc/tensor-core.cu:87-254, :513-589) -> one kernel,
  dtype-dispatched: bf16/f16/f32 inputs accumulate in f32, int8 in int32;
- the CTA-tiled shared-memory-staged GEMM
  (/root/reference/src/misc/cudaTensorCoreGemm.cu:156-328) -> Pallas's
  automatic HBM->VMEM pipeline over the grid (double-buffered by Mosaic),
  with the K dimension as a sequential ("arbitrary") reduction axis and a
  VMEM accumulator scratch, exactly the role the CTA's fragment accumulators
  play.

All four transpose combos of the reference GEMM (tensor-core.cu:215-254) are
covered by ``transpose_a``/``transpose_b`` flags that adjust the BlockSpecs —
layout is a compile-time index-map change on TPU, not a separate kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.utils.platform import interpret_default


def _acc_dtype(dtype) -> jnp.dtype:
    if dtype in (jnp.int8, jnp.int4, jnp.uint8, jnp.uint4, jnp.int32):
        return jnp.int32
    return jnp.float32


def _matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k: int):
    """Grid (i, j, k): o[i, j] += x[i, k] @ w[k, j], acc in VMEM scratch."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=acc_ref.dtype
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pad_to(x: jax.Array, mults: tuple[int, ...]) -> jax.Array:
    pads = [(0, -d % m) for d, m in zip(x.shape, mults)]
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads)
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_m", "block_n", "block_k", "out_dtype", "transpose_a",
        "transpose_b", "interpret",
    ),
)
def matmul(
    x: jax.Array,
    w: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    out_dtype=None,
    transpose_a: bool = False,
    transpose_b: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """C = op(x) @ op(w) with fp32 (or int32) accumulation.

    x: [M, K] (or [K, M] if transpose_a), w: [K, N] (or [N, K] if
    transpose_b). Shapes need not be tile-aligned; inputs are zero-padded to
    block multiples (zeros contribute nothing to the accumulation).
    """
    if transpose_a:
        x = x.T  # XLA fuses the relayout into the pipeline copy
    if transpose_b:
        w = w.T
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, f"contraction mismatch {K} vs {K2}"
    if out_dtype is None:
        out_dtype = _acc_dtype(x.dtype) if x.dtype == jnp.int8 else x.dtype

    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    # respect minimum tile granularity (sublane x lane)
    bm = max(8, bm)
    bn = max(128, min(bn, _round_up(N, 128)))
    bk = max(128, min(bk, _round_up(K, 128)))

    xp = _pad_to(x, (bm, bk))
    wp = _pad_to(w, (bk, bn))
    Mp, Kp = xp.shape
    _, Np = wp.shape
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), _acc_dtype(x.dtype))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=(Mp * Kp + Kp * Np) * xp.dtype.itemsize
            + Mp * Np * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret_default(interpret),
    )(xp, wp)
    return out[:M, :N]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
