"""Fused block-dequant matmul/matvec Pallas kernels (Q8_0 / Q4_0 / Q4_K).

The BASELINE.json north-star subsystem: GGML-style weight-only block
quantization dequantized *inside* the matmul kernel, so decode-time matvecs
stream quantized bytes from HBM at (near-)roofline bandwidth instead of
materializing f32/bf16 weights. The reference repo has no quant path — this
is the driver-mandated extension (SURVEY.md §7 R8) — but the kernel shape
follows the reference's WMMA GEMM structure (one output tile per grid step,
operands pipelined HBM→VMEM, /root/reference/src/misc/tensor-core.cu:87-178)
re-expressed for the MXU.

TPU-first layout: the "interleaved" column order
------------------------------------------------
Mosaic (the Pallas TPU compiler) has no consecutive-element expand — you
cannot broadcast a per-32-block scale row [K/32] to [K] in-kernel (verified:
``broadcast_to + reshape`` and ``jnp.repeat`` both fail to lower). What it
*does* have is ``pltpu.repeat`` — a cheap whole-row **tile**-repeat
(``[a b c] -> [a b c a b c]``). So the weight columns are stored permuted so
that tile-repeat IS the correct scale expansion:

    device lane j  <->  logical element e = super*256 + pos8*32 + pos32
    where  pos32 = j // (K/32),  pos8 = (j % (K/32)) // (K/256),
           super = j % (K/256)

i.e. a hierarchical (K/256, 8, 32) -> (32, 8, K/256) transpose. Under this
order, the scale of device lane j is ``d_dev[j mod K/32]`` — exactly the
pattern ``pltpu.repeat(d_dev, 32)`` produces — and Q4_K's superblock scale
is ``d[j mod K/256]`` — exactly ``pltpu.repeat(d, 8)`` at the scale level.
The contraction is permutation-invariant, so activations are permuted with
one reshape/transpose (``permute_activations``) before the kernel — a few KB
for decode batches, fused by XLA.

Q4 nibble packing: byte i holds device lanes i (low nibble) and i + K/2
(high nibble). The two lanes differ only in pos32 (by 16), so they share a
scale block, and the matvec needs **no unpack interleave at all**:

    y = x_lo @ (lo * s).T + x_hi @ (hi * s).T      (two MXU dots)

where lo/hi are two bitwise ops on the streamed bytes (the analog of the
reference keeping V transposed-contiguous so the hot loop needs no layout
fixups, /root/reference/src/flash_row_float.h:176-177 — pick the storage
layout the kernel wants, once, at load time).

Decode matvec (B ≤ 32): the whole K dimension is one block — a single MXU
dot per output tile; the grid runs over N only, so Mosaic's automatic
double-buffering streams the weight tiles at full HBM bandwidth while the
(tiny) activation stays resident in VMEM. Large-batch prefill uses
``qmatmul_xla`` (XLA dequant+matmul, MXU-bound — streaming buys nothing
there).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_cuda_experiments_tpu.oracle import quant as quant_ref
from ggml_cuda_experiments_tpu.utils.platform import interpret_default

QK = quant_ref.QK            # 32
QK_K = quant_ref.QK_K        # 256


# ---------------------------------------------------------------------------
# interleaved column order
# ---------------------------------------------------------------------------

@functools.cache
def _perm(k: int) -> np.ndarray:
    """perm[j] = logical element index stored at device lane j.

    K % 256 == 0: 3-level (super, pos8, pos32) transpose — supports Q4_K's
    superblock scales. Otherwise (K % 32 == 0, e.g. row-parallel shards of
    small models): 2-level (block, pos32) transpose — Q8_0/Q4_0 only.
    """
    assert k % QK == 0, f"K={k} must be a multiple of {QK}"
    if k % QK_K == 0:
        ks = k // QK_K
        return (np.arange(k).reshape(ks, 8, QK)   # [super, pos8, pos32]
                .transpose(2, 1, 0).reshape(k))   # j = pos32, pos8, super
    kb = k // QK
    return (np.arange(k).reshape(kb, QK)          # [block, pos32]
            .transpose(1, 0).reshape(k))


@functools.cache
def _perm32(k: int) -> np.ndarray:
    """Per-32-block scale lane order: perm32[r] = logical block index."""
    if k % QK_K == 0:
        ks = k // QK_K
        return (np.arange(k // QK).reshape(ks, 8)  # [super, pos8]
                .transpose(1, 0).reshape(k // QK))
    return np.arange(k // QK)                      # 2-level: natural order


@functools.cache
def _inv_perm(k: int) -> np.ndarray:
    return np.argsort(_perm(k))


def permute_activations(x: jax.Array) -> jax.Array:
    """Reorder x [..., K] into the interleaved column order (one transpose)."""
    *lead, k = x.shape
    nl = len(lead)
    if k % QK_K == 0:
        return (x.reshape(*lead, k // QK_K, 8, QK)
                .transpose(*range(nl), nl + 2, nl + 1, nl)
                .reshape(*lead, k))
    return (x.reshape(*lead, k // QK, QK)
            .transpose(*range(nl), nl + 1, nl)
            .reshape(*lead, k))


# ---------------------------------------------------------------------------
# device container
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantLinear:
    """Device-side quantized weight W [N, K] (output-major, like GGML),
    stored in the interleaved column order.

    fields per format (all column-permuted):
      q8_0: qs int8  [N, K],    d f32 [N, K/32]
      q4_0: qs uint8 [N, K/2],  d f32 [N, K/32]            (q - 8 at dequant)
      q4_k: qs uint8 [N, K/2],  sc u8 [N, K/32], mn u8 [N, K/32],
            d f32 [N, K/256], dmin f32 [N, K/256]
    """

    fmt: str = dataclasses.field(metadata=dict(static=True))
    # logical (pre-shard) shape; informational only — kernels derive their
    # dimensions from the arrays so shard_map-local shards work unchanged
    shape: tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    qs: jax.Array = None
    d: jax.Array = None
    sc: jax.Array | None = None
    mn: jax.Array | None = None
    dmin: jax.Array | None = None

    @property
    def array_shape(self) -> tuple[int, int]:
        """[N, K] as implied by the (possibly shard-local) arrays."""
        n, kq = self.qs.shape
        return n, kq * (1 if self.fmt == "q8_0" else 2)

    @property
    def nbytes(self) -> int:
        return sum(f.size * f.dtype.itemsize
                   for f in (self.qs, self.d, self.sc, self.mn, self.dmin)
                   if f is not None)


def _pack_halves(q_dev: np.ndarray) -> np.ndarray:
    """[N, K] nibble values (0..15) -> [N, K/2] bytes: lane i | lane i+K/2."""
    k = q_dev.shape[-1]
    lo = q_dev[:, : k // 2].astype(np.uint8)
    hi = q_dev[:, k // 2:].astype(np.uint8)
    return lo | (hi << 4)


def from_oracle(t) -> QuantLinear:
    """Convert an oracle-quantized tensor (logical planar NumPy layout) to
    interleaved device arrays."""
    n, k = t.shape
    p, p32 = _perm(k), _perm32(k)
    if isinstance(t, quant_ref.Q8_0):
        return QuantLinear(
            fmt="q8_0", shape=(n, k),
            qs=jnp.asarray(t.qs[:, p]),
            d=jnp.asarray(t.d[:, p32]))
    if isinstance(t, quant_ref.Q4_0):
        q = quant_ref.unpack_nibbles(
            t.qs.reshape(n, k // QK, QK // 2)).reshape(n, k)
        return QuantLinear(
            fmt="q4_0", shape=(n, k),
            qs=jnp.asarray(_pack_halves(q[:, p])),
            d=jnp.asarray(t.d[:, p32]))
    if isinstance(t, quant_ref.Q4_K):
        q = quant_ref.unpack_nibbles(
            t.qs.reshape(n, k // QK, QK // 2)).reshape(n, k)
        return QuantLinear(
            fmt="q4_k", shape=(n, k),
            qs=jnp.asarray(_pack_halves(q[:, p])),
            sc=jnp.asarray(t.sc[:, p32]),
            mn=jnp.asarray(t.mn[:, p32]),
            d=jnp.asarray(t.d),               # per-256: natural order
            dmin=jnp.asarray(t.dmin))
    raise TypeError(f"unsupported oracle tensor {type(t)}")


def quantize(w: np.ndarray, fmt: str) -> QuantLinear:
    """Quantize a float [N, K] weight via the oracle into device arrays."""
    return from_oracle(quant_ref.FORMATS[fmt][0](np.asarray(w)))


# ---------------------------------------------------------------------------
# in-kernel dequant (permuted space); `rep` = tile-repeat implementation
# ---------------------------------------------------------------------------

def _dequant_halves(fmt: str, refs, rep):
    """Return (w_lo, w_hi) [bn, K/2] f32 dequantized weight halves (q4_*),
    or (w, None) for q8_0."""
    if fmt == "q8_0":
        qs = refs["qs"][...]
        bn, k = qs.shape
        w = qs.astype(jnp.float32) * rep(refs["d"][...], QK)
        return w, None

    packed = refs["qs"][...].astype(jnp.int32)        # [bn, K/2]
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    if fmt == "q4_0":
        s_half = rep(refs["d"][...], QK // 2)         # [bn, K/2]
        return (lo - 8.0) * s_half, (hi - 8.0) * s_half
    if fmt == "q4_k":
        # uint8 -> f32 is not a supported Mosaic cast; go through int32
        sc = refs["sc"][...].astype(jnp.int32).astype(jnp.float32)
        mn = refs["mn"][...].astype(jnp.int32).astype(jnp.float32)
        eff_s = rep(refs["d"][...], 8) * sc           # [bn, K/32]
        eff_m = rep(refs["dmin"][...], 8) * mn
        s_half = rep(eff_s, QK // 2)                  # [bn, K/2]
        m_half = rep(eff_m, QK // 2)
        return lo * s_half - m_half, hi * s_half - m_half
    raise ValueError(fmt)


_FIELDS = {
    "q8_0": ("qs", "d"),
    "q4_0": ("qs", "d"),
    "q4_k": ("qs", "sc", "mn", "d", "dmin"),
}

# lanes per row of each field, as a divisor of K
_LANE_DIV = {
    "q8_0": {"qs": 1, "d": QK},
    "q4_0": {"qs": 2, "d": QK},
    "q4_k": {"qs": 2, "sc": QK, "mn": QK, "d": QK_K, "dmin": QK_K},
}


def _mosaic_rep(v, times):
    return pltpu.repeat(v, times, axis=1)


def _xla_rep(v, times):
    return jnp.tile(v, (1, times))


def _qmatvec_seg_kernel(x_ref, xs_ref, *refs, fmt: str):
    """B=1 q4 matvec with *deferred* block scales (the speed-of-light path).

    In the interleaved order with Kb = K/32 a multiple of 128, the scale
    block of lane j is simply ``j mod Kb`` — so the 16 nibble-pair
    sub-rows of every block live at aligned lane offsets {i*Kb}. The kernel
    therefore multiplies raw nibbles by x, folds the 16 sub-rows into a
    [bn, Kb] partial (slice-accumulate, all 128-aligned), and only then
    applies scales at block granularity — O(K/32) scale work instead of
    O(K). Mins (and Q4_0's -8 offset) never touch the weights: they
    contribute ``sum_b m_eff[n,b] * xs[b]`` where xs are per-block sums of
    x, computed once outside the kernel.
    """
    names = _FIELDS[fmt]
    w_refs = dict(zip(names, refs[:len(names)]))
    o_ref = refs[len(names)]

    packed = w_refs["qs"][...]                       # [bn, K/2] uint8
    bn, k2 = packed.shape
    kb = k2 // 16                                    # = K/32 lanes per seg
    # low nibble: int8 ops avoid the 4x widening; high nibble needs a shift,
    # which int8 lacks -> int32 route
    lo = (pltpu.bitcast(packed, jnp.int8) & jnp.int8(0xF)).astype(jnp.float32)
    hi = ((packed.astype(jnp.int32) >> 4) & 0xF).astype(jnp.float32)

    x = x_ref[...]                                   # [1, K] f32 (permuted)
    t = lo * x[:, :k2] + hi * x[:, k2:]              # [bn, K/2]

    z = t[:, :kb]
    for i in range(1, 16):
        z = z + t[:, i * kb:(i + 1) * kb]            # [bn, Kb]

    xs = xs_ref[...]                                 # [1, Kb] block sums of x
    if fmt == "q4_0":
        d = w_refs["d"][...]                         # [bn, Kb]
        y = jnp.sum(d * z - (8.0 * d) * xs, axis=1)
    else:  # q4_k
        sc = w_refs["sc"][...].astype(jnp.int32).astype(jnp.float32)
        mn = w_refs["mn"][...].astype(jnp.int32).astype(jnp.float32)
        eff_s = _mosaic_rep(w_refs["d"][...], 8) * sc
        eff_m = _mosaic_rep(w_refs["dmin"][...], 8) * mn
        y = jnp.sum(eff_s * z - eff_m * xs, axis=1)
    o_ref[...] = y[None, :].astype(o_ref.dtype)


def _qmatmul_kernel(*refs, fmt: str, compute_dtype, vpu: bool):
    """Grid (n,): out = x_perm @ dequant(W_tile)^T.

    vpu=False: 1-2 MXU dots per tile (best for B >= ~8).
    vpu=True:  broadcast-multiply + lane-reduce on the VPU (B == 1): a
               matvec puts only B of 128 MXU sublanes to work, so for
               single-token decode the VPU's full-width elementwise path is
               faster and overlaps the weight-stream DMA.
    """
    names = _FIELDS[fmt]
    x_ref = refs[0]
    w_refs = dict(zip(names, refs[1:1 + len(names)]))
    o_ref = refs[1 + len(names)]

    if vpu:
        w_lo, w_hi = _dequant_halves(fmt, w_refs, _mosaic_rep)
        x = x_ref[...]                                       # [1, K] f32
        if w_hi is None:
            acc = jnp.sum(w_lo * x, axis=1)                  # [bn]
        else:
            kh = w_lo.shape[1]
            acc = jnp.sum(w_lo * x[:, :kh] + w_hi * x[:, kh:], axis=1)
        o_ref[...] = acc[None, :].astype(o_ref.dtype)
        return

    w_lo, w_hi = _dequant_halves(fmt, w_refs, _mosaic_rep)
    x = x_ref[...].astype(compute_dtype)                     # [B, K]
    dims = (((1,), (1,)), ((), ()))
    # full f32 MXU passes when compute is f32 (default would silently round
    # operands to bf16); the extra passes hide under the weight-stream DMA
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if w_hi is None:
        acc = jax.lax.dot_general(
            x, w_lo.astype(compute_dtype), dims,
            preferred_element_type=jnp.float32, precision=prec)
    else:
        kh = w_lo.shape[1]
        acc = jax.lax.dot_general(
            x[:, :kh], w_lo.astype(compute_dtype), dims,
            preferred_element_type=jnp.float32, precision=prec)
        acc += jax.lax.dot_general(
            x[:, kh:], w_hi.astype(compute_dtype), dims,
            preferred_element_type=jnp.float32, precision=prec)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "compute_dtype", "out_dtype", "use_vpu",
                     "segmented", "interpret"),
)
def qmatmul(
    x: jax.Array,
    ql: QuantLinear,
    *,
    block_n: int | None = None,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    use_vpu: bool | None = None,
    segmented: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """y[B, N] = x[B, K] @ dequant(W[N, K])^T, dequant fused in-kernel.

    The memory-bound decode path: weights stream HBM→VMEM once, activations
    stay resident. x is in *logical* order (permutation handled here).
    compute_dtype bf16 keeps the MXU single-pass (f16-compute-level accuracy,
    like the reference's fp16 WMMA dequant path); pass f32 for full accuracy.
    """
    N, K = ql.array_shape
    B = x.shape[0]
    assert x.shape[1] == K, f"x K={x.shape[1]} vs weight K={K}"
    if out_dtype is None:
        out_dtype = x.dtype
    if use_vpu is None:
        # measured on v5e: 4-bit formats are dequant-bound and the VPU path
        # wins at B=1 (~56% vs ~35% roofline); q8_0's trivial dequant keeps
        # the MXU path ahead (~90%) even at B=1
        use_vpu = B == 1 and ql.fmt != "q8_0"

    xp = permute_activations(x.astype(jnp.float32))
    if use_vpu and B == 1:
        Bp = 1
    else:
        use_vpu = False
        Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        xp = jnp.pad(xp, ((0, Bp - B), (0, 0)))
    if block_n is None:
        block_n = 1024 if use_vpu else 512   # measured optima on v5e
    bn = min(block_n, N)
    Np = -(-N // bn) * bn
    fields = _FIELDS[ql.fmt]

    def pad_rows(a):
        return (jnp.pad(a, ((0, Np - a.shape[0]), (0, 0)))
                if a.shape[0] != Np else a)

    arrays = [pad_rows(getattr(ql, f)) for f in fields]
    in_specs = [pl.BlockSpec((Bp, K), lambda n: (0, 0))]
    for f in fields:
        div = _LANE_DIV[ql.fmt][f]
        in_specs.append(pl.BlockSpec((bn, K // div), lambda n: (n, 0)))

    kb = K // QK
    # deferred-scale segmented variant: kept selectable for tuning, but the
    # plain VPU path measured faster on v5e (56% vs 42% roofline) — the
    # nibble unpack, not the scale expand, is the VPU bottleneck
    seg = (segmented and use_vpu and ql.fmt in ("q4_0", "q4_k")
           and kb % 128 == 0)
    if seg:
        # per-block sums of x for the deferred min/offset terms, in the
        # same permuted block order as the scale arrays
        xs = x.astype(jnp.float32).reshape(B, kb, QK).sum(-1)[:, _perm32(K)]
        kernel = functools.partial(_qmatvec_seg_kernel, fmt=ql.fmt)
        inputs = (xp, xs, *arrays)
        in_specs.insert(1, pl.BlockSpec((Bp, kb), lambda n: (0, 0)))
    else:
        kernel = functools.partial(_qmatmul_kernel, fmt=ql.fmt,
                                   compute_dtype=compute_dtype, vpu=use_vpu)
        inputs = (xp, *arrays)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Np), out_dtype),
        grid=(Np // bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bp, bn), lambda n: (0, n)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * K,
            bytes_accessed=sum(a.size * a.dtype.itemsize for a in arrays)
            + Bp * K * 4 + Bp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret_default(interpret),
    )(*inputs)
    return out[:B, :N]


# ---------------------------------------------------------------------------
# XLA baselines
# ---------------------------------------------------------------------------

def dequantize_jnp(ql: QuantLinear, dtype=jnp.float32) -> jax.Array:
    """XLA-only dequantization to a dense *logical-order* [N, K] array."""
    refs = {f: getattr(ql, f) for f in _FIELDS[ql.fmt]}

    class _A:  # adapt arrays to the ref[...] protocol used by the kernel
        def __init__(self, a): self.a = a
        def __getitem__(self, idx): return self.a

    w_lo, w_hi = _dequant_halves(ql.fmt, {k: _A(v) for k, v in refs.items()},
                                 _xla_rep)
    wp = w_lo if w_hi is None else jnp.concatenate([w_lo, w_hi], axis=1)
    inv = jnp.asarray(_inv_perm(ql.array_shape[1]))
    return wp[:, inv].astype(dtype)


def qmatmul_xla(x: jax.Array, ql: QuantLinear, compute_dtype=jnp.float32
                ) -> jax.Array:
    """XLA-fused baseline: dequantize then matmul (prefill / comparison)."""
    w = dequantize_jnp(ql, compute_dtype)
    return jax.lax.dot_general(
        x.astype(compute_dtype), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
