"""Fused prefill RoPE + head-major repack (batch-1 prompt processing).

The XLA prefill path between the wqkv GEMM and flash attention runs
reshape -> rope(q) -> rope(k) -> three [T, H, D] -> [H, T, D] transposes,
each materializing ~4-8 MB per layer in HBM (PERF.md "TTFT": ~0.45
ms/layer of glue vs the 37 ms MXU bound). This kernel reads the GEMM
output ONCE and emits q/k/v directly in the head-major layout flash
attention and the cache want, with RoPE applied on the fly:

    y [T, (Hq+2*Hkv)*D]  ->  qT [Hq, T, D], kT [Hkv, T, D], vT [Hkv, T, D]

The reference pays the same tax in its harness (explicit V-transpose +
contiguize before the kernel, /root/reference/src/flash-matrix.cu:129-152)
— on TPU the repack rides the same HBM pass as the rotation.

RoPE convention: rotate-half (HF Llama), computed in f32 exactly like
models/llama.rope (x*C + roll(x, 64)*S2 with C = [cos|cos],
S2 = [-sin|sin]) — bit-identical operand math, so the fused and unfused
prefills agree to cast tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.utils.platform import interpret_default


def _rope_pack_kernel(y_ref, c_ref, s_ref, qo_ref, ko_ref, vo_ref, *,
                      nH: int, nKV: int, D: int):
    c = c_ref[...].astype(jnp.float32)               # [Tb, D]
    s = s_ref[...].astype(jnp.float32)

    def rot(x):
        return x * c + pltpu.roll(x, D // 2, 1) * s

    for h in range(nH):
        x = y_ref[:, D * h:D * (h + 1)].astype(jnp.float32)
        qo_ref[h] = rot(x).astype(qo_ref.dtype)
    k0 = nH * D
    for h in range(nKV):
        x = y_ref[:, k0 + D * h:k0 + D * (h + 1)].astype(jnp.float32)
        ko_ref[h] = rot(x).astype(ko_ref.dtype)
    v0 = (nH + nKV) * D
    for h in range(nKV):
        vo_ref[h] = y_ref[:, v0 + D * h:v0 + D * (h + 1)
                          ].astype(vo_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "rope_theta",
                     "block_t", "interpret"),
)
def rope_pack_prefill(
    y: jax.Array,                 # [T, (Hq + 2*Hkv) * D] wqkv GEMM output
    positions: jax.Array,         # [T] int32
    *,
    n_heads: int, n_kv_heads: int, head_dim: int,
    rope_theta: float = 10000.0,
    block_t: int = 128,
    interpret: bool | None = None,
):
    """Returns (qT [Hq, T, D] roped, kT [Hkv, T, D] roped,
    vT [Hkv, T, D]) in bf16 — flash attention's and the cache's layout."""
    nH, nKV, D = n_heads, n_kv_heads, head_dim
    T = y.shape[0]
    assert y.shape[1] == (nH + 2 * nKV) * D and T % block_t == 0
    freqs = rope_theta ** (-jnp.arange(0, D // 2, dtype=jnp.float32)
                           / (D // 2))
    ang = positions.astype(jnp.float32)[:, None] * freqs   # [T, D/2]
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    C = jnp.concatenate([cosv, cosv], axis=1)              # [T, D]
    S2 = jnp.concatenate([-sinv, sinv], axis=1)

    tmap = lambda t: (t, 0)
    hmap = lambda t: (0, t, 0)
    out_dtype = jnp.bfloat16
    qT, kT, vT = pl.pallas_call(
        functools.partial(_rope_pack_kernel, nH=nH, nKV=nKV, D=D),
        grid=(T // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, (nH + 2 * nKV) * D), tmap),
            pl.BlockSpec((block_t, D), tmap),
            pl.BlockSpec((block_t, D), tmap),
        ],
        out_specs=[
            pl.BlockSpec((nH, block_t, D), hmap),
            pl.BlockSpec((nKV, block_t, D), hmap),
            pl.BlockSpec((nKV, block_t, D), hmap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nH, T, D), out_dtype),
            jax.ShapeDtypeStruct((nKV, T, D), out_dtype),
            jax.ShapeDtypeStruct((nKV, T, D), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * (nH + nKV) * D,
            bytes_accessed=y.nbytes + 2 * T * (nH + 2 * nKV) * D,
            transcendentals=0),
        interpret=interpret_default(interpret),
    )(y, C, S2)
    return qT, kT, vT
