"""Probe Mosaic support for the ops the fused attention kernel needs.

Run on TPU (remote Mosaic hides diagnostics; we learn by trying):
  python tools/probe_mosaic_r3.py
Each probe compiles + runs a tiny kernel and checks numerics vs numpy.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import functools
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() == "cpu"


def run(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {msg}")


def probe_transpose_dot():
    # accT = fin^T via dot_general(fin, eye, contract (0,0))
    def kern(x_ref, e_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[...], e_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = acc

    x = np.arange(32 * 128, dtype=np.float32).reshape(32, 128)
    e = np.eye(32, dtype=np.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 32), jnp.float32),
        interpret=INTERPRET)(jnp.asarray(x), jnp.asarray(e))
    return np.array_equal(np.asarray(out), x.T)


def probe_lane_concat():
    def kern(x_ref, o_ref):
        x = x_ref[...]
        parts = [x[32 * c:32 * (c + 1), :32] for c in range(4)]
        o_ref[...] = jnp.concatenate(parts, axis=1)

    x = np.arange(128 * 32, dtype=np.float32).reshape(128, 32)
    xpad = np.zeros((128, 128), np.float32)
    xpad[:, :32] = x
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        interpret=INTERPRET)(jnp.asarray(xpad))
    ref = np.concatenate([x[32 * c:32 * (c + 1)] for c in range(4)], axis=1)
    return np.array_equal(np.asarray(out), ref)


def probe_roll64():
    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 64, 1)

    x = np.arange(32 * 128, dtype=np.float32).reshape(32, 128)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        interpret=INTERPRET)(jnp.asarray(x))
    return np.array_equal(np.asarray(out), np.roll(x, 64, axis=1))


def probe_dyn_sublane():
    # dynamic sublane slice read+write driven by a grid index
    def kern(x_ref, o_ref):
        i = pl.program_id(0)
        r0 = i * 8
        o_ref[pl.ds(r0, 8), :] = x_ref[pl.ds(r0, 8), :] * 2.0

    x = np.arange(32 * 128, dtype=np.float32).reshape(32, 128)
    out = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec((32, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((32, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        interpret=INTERPRET)(jnp.asarray(x))
    return np.array_equal(np.asarray(out), x * 2.0)


def probe_lane_extract():
    # [1,128] lane slices of a [1, 4096] ref written as rows of [32, 128]
    def kern(x_ref, o_ref):
        for h in range(32):
            o_ref[h:h + 1, :] = x_ref[0:1, 128 * h:128 * (h + 1)]

    x = np.arange(4096, dtype=np.float32).reshape(1, 4096)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        interpret=INTERPRET)(jnp.asarray(x))
    return np.array_equal(np.asarray(out), x.reshape(32, 128))


def probe_read_output_ref():
    # write an output ref at step 0, read it back at step 1
    def kern(x_ref, o_ref, s_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_ref[...] = x_ref[...] * 3.0

        @pl.when(i == 1)
        def _():
            o_ref[...] = s_ref[...] + 1.0

    x = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
    out, _ = pl.pallas_call(
        kern, grid=(2,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0)),
                   pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=INTERPRET)(jnp.asarray(x))
    return np.array_equal(np.asarray(out), x * 3.0 + 1.0)


def probe_call_overhead():
    """Marginal cost of one extra tiny Pallas call in a chained loop."""
    if INTERPRET:
        return True
    import time

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0001

    tiny = functools.partial(
        pl.pallas_call, kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))

    def chained(n):
        @jax.jit
        def f(x):
            def body(_, x):
                return tiny()(x)
            return jax.lax.fori_loop(0, n, body, x, unroll=True)
        return f

    x = jnp.ones((8, 128), jnp.float32)
    fa, fb = chained(64), chained(256)
    np.asarray(fa(x)); np.asarray(fb(x))
    times = {}
    for name, f in (("a", fa), ("b", fb)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        times[name] = min(ts)
    per_call = (times["b"] - times["a"]) / (256 - 64)
    print(f"  tiny-call marginal cost: {per_call*1e6:.2f} us")
    return True


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} interpret={INTERPRET}")
    run("transpose_dot (0,0)", probe_transpose_dot)
    run("lane_concat 32x4", probe_lane_concat)
    run("pltpu.roll axis=1", probe_roll64)
    run("dyn sublane slice", probe_dyn_sublane)
    run("lane extract 128h", probe_lane_extract)
    run("read output ref across steps", probe_read_output_ref)
    run("tiny-call overhead", probe_call_overhead)
