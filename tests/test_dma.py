"""Async-DMA staging microtest — the analog of the reference's
``test_memasync``/``mem_copy`` (/root/reference/src/flash-matrix.cu:18-65):
copy head_dim=80 rows into 128-padded rows through on-chip memory via an
async copy, then exact-compare. On TPU the shared-memory ``memcpy_async``
staging becomes a ``pltpu.make_async_copy`` HBM->VMEM DMA into a scratch
buffer (the same primitive the paged-KV kernel pipelines,
ops/paged_attention.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, D, DPAD = 16, 80, 128


def _stage_kernel(x_hbm, o_ref, buf, sem):
    copy = pltpu.make_async_copy(x_hbm, buf, sem)
    copy.start()
    copy.wait()
    o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[:, :D] = buf[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stage(x, interpret=True):
    return pl.pallas_call(
        _stage_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, DPAD), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, DPAD), lambda: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((ROWS, D), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)


def test_async_copy_pad_exact(rng):
    """Element-exact staging, like the reference's == compare
    (flash-matrix.cu:57-64)."""
    x = rng.normal(size=(ROWS, D)).astype(np.float32)
    out = np.asarray(_stage(jnp.asarray(x)))
    np.testing.assert_array_equal(out[:, :D], x)
    np.testing.assert_array_equal(out[:, D:], 0.0)
