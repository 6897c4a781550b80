"""Hierarchical-reduction primitives — the analog of the reference's
warp/block reductions: butterfly ``warp_reduce_max/sum``
(/root/reference/src/cuda_info.h:46-85) and the cooperative-groups
block+tile sum (/root/reference/src/misc/simpleCooperativeGroups.cu:37-137).

On TPU the warp disappears: lane/sublane-axis reductions inside a Pallas
kernel replace shuffles, and cross-block combination becomes grid-step
accumulation into a revisited output tile (``dimension_semantics
"arbitrary"`` guarantees sequential grid order)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- grid-accumulated sum (cooperative-groups block-reduction analog) ----

def _gridsum_kernel(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    # per-step partial (the "block" partial), folded into the running
    # output exactly like the reference's per-block partials + final merge
    o_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def grid_sum(x, interpret=True):
    n, d = x.shape
    bn = 8
    partial_rows = pl.pallas_call(
        _gridsum_kernel,
        out_shape=jax.ShapeDtypeStruct((1, d), x.dtype),
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((bn, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, d), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x)
    return jnp.sum(partial_rows)


def test_grid_sum_int_exact(rng):
    """Integer sum must be exact (the reference asserts the summed total,
    simpleCooperativeGroups.cu:64-71)."""
    x = rng.integers(-1000, 1000, size=(64, 128)).astype(np.int32)
    assert int(grid_sum(jnp.asarray(x))) == int(x.sum())


# --- lane-axis max/sum (warp_reduce butterfly analog) --------------------

def _lane_reduce_kernel(x_ref, mx_ref, sm_ref):
    x = x_ref[...]
    mx_ref[...] = jnp.max(x, axis=1, keepdims=True)
    sm_ref[...] = jnp.sum(x, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_reduce(x, interpret=True):
    n, d = x.shape
    return pl.pallas_call(
        _lane_reduce_kernel,
        out_shape=[jax.ShapeDtypeStruct((n, 1), x.dtype)] * 2,
        in_specs=[pl.BlockSpec((n, d), lambda: (0, 0))],
        out_specs=[pl.BlockSpec((n, 1), lambda: (0, 0))] * 2,
        interpret=interpret,
    )(x)


def test_lane_max_sum(rng):
    x = rng.normal(size=(8, 128)).astype(np.float32)
    mx, sm = lane_reduce(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(mx)[:, 0], x.max(axis=1))
    np.testing.assert_allclose(np.asarray(sm)[:, 0], x.sum(axis=1),
                               rtol=1e-6)
