"""Collective matmul (overlapped ring AG/RS GEMM) vs monolithic
collectives — must be numerically identical up to f32 dot tolerance."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggml_cuda_experiments_tpu.parallel import collective_matmul as cm

B, K, N = 32, 64, 48     # per-device Bs = 4, N_loc = 6


def _mesh():
    return Mesh(np.array(jax.devices()), ("model",))


def _data(rng):
    x = rng.normal(size=(B, K)).astype(np.float32)
    w = rng.normal(size=(N, K)).astype(np.float32)
    return x, w


def test_matmul_ag_matches_gather_then_dot(rng):
    mesh = _mesh()
    n = len(jax.devices())
    x, w = _data(rng)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("model"), P("model")),
                       out_specs=P(None, "model"))
    def ring(xs, ws):
        return cm.matmul_ag(xs, ws, "model")

    got = np.asarray(ring(x, w))
    want = x @ w.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matmul_ag_vs_monolithic_allgather(rng):
    mesh = _mesh()
    x, w = _data(rng)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("model"), P("model")),
                       out_specs=P(None, "model"))
    def mono(xs, ws):
        xg = jax.lax.all_gather(xs, "model", tiled=True)
        return jax.lax.dot_general(
            xg, ws, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("model"), P("model")),
                       out_specs=P(None, "model"))
    def ring(xs, ws):
        return cm.matmul_ag(xs, ws, "model")

    np.testing.assert_allclose(np.asarray(ring(x, w)),
                               np.asarray(mono(x, w)),
                               rtol=1e-6, atol=1e-6)


def test_matmul_rs_matches_dot_then_reduce(rng):
    mesh = _mesh()
    x, w = _data(rng)

    # K-sharded x and W (row-parallel): logical y = x @ w^T, row-scattered
    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, "model"), P(None, "model")),
                       out_specs=P("model", None))
    def ring(xs, ws):
        return cm.matmul_rs(xs, ws, "model")

    got = np.asarray(ring(x, w))
    want = x @ w.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_matmul_rs_vs_monolithic_psum_scatter(rng):
    mesh = _mesh()
    x, w = _data(rng)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, "model"), P(None, "model")),
                       out_specs=P("model", None))
    def mono(xs, ws):
        part = jax.lax.dot_general(
            xs, ws, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.psum_scatter(part, "model", scatter_dimension=0,
                                    tiled=True)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, "model"), P(None, "model")),
                       out_specs=P("model", None))
    def ring(xs, ws):
        return cm.matmul_rs(xs, ws, "model")

    np.testing.assert_allclose(np.asarray(ring(x, w)),
                               np.asarray(mono(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_sp_mlp_matches_replicated_psum(rng):
    mesh = _mesh()
    d, inter, T = 32, 64, 16
    x = rng.normal(size=(T, d)).astype(np.float32)
    wg = rng.normal(size=(inter, d)).astype(np.float32) / np.sqrt(d)
    wu = rng.normal(size=(inter, d)).astype(np.float32) / np.sqrt(d)
    wd = rng.normal(size=(d, inter)).astype(np.float32) / np.sqrt(inter)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("model"), P("model", None),
                                 P("model", None), P(None, "model")),
                       out_specs=P("model"))
    def sp(xs, wgs, wus, wds):
        return cm.sp_mlp_block(xs, wgs, wus, wds, "model")

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None), P("model", None),
                                 P("model", None), P(None, "model")),
                       out_specs=P(None))
    def rep(xf, wgs, wus, wds):
        g = xf @ wgs.T
        u = xf @ wus.T
        h = (jax.nn.silu(g) * u).astype(xf.dtype)
        return jax.lax.psum(h @ wds.T, "model")

    got = np.asarray(sp(x, wg, wu, wd))
    want = np.asarray(rep(x, wg, wu, wd))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
