"""TPU smoke test: compile+run each Pallas kernel on the real chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices(), flush=True)

def run(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[OK] {name:24s} {time.time()-t0:6.1f}s", flush=True)
        return out
    except Exception as e:
        print(f"[FAIL] {name:24s} {time.time()-t0:6.1f}s {type(e).__name__}: {str(e)[:500]}", flush=True)
        return None

rng = np.random.default_rng(0)

from ggml_cuda_experiments_tpu.ops.matmul import matmul
a = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
o = run("matmul f32", lambda: matmul(a, b))
if o is not None:
    print("   err", float(jnp.max(jnp.abs(o - a @ b))), flush=True)

from ggml_cuda_experiments_tpu.ops import quant_matmul as qm
w = rng.normal(size=(1024, 2048)).astype(np.float32)
x = jnp.asarray(rng.normal(size=(1, 2048)).astype(np.float32))
for fmt in ("q8_0", "q4_0", "q4_k"):
    ql = qm.quantize(w, fmt)
    o = run(f"qmatmul {fmt}", lambda: qm.qmatmul(x, ql, block_n=256))
    if o is not None:
        want = np.asarray(x) @ np.asarray(qm.dequantize_jnp(ql)).T
        print("   err", float(np.abs(np.asarray(o) - want).max()), flush=True)

from ggml_cuda_experiments_tpu.ops.flash_attention import flash_attention
q4 = jnp.asarray(rng.normal(size=(1, 8, 256, 128)).astype(np.float32))
k4 = jnp.asarray(rng.normal(size=(1, 2, 512, 128)).astype(np.float32))
v4 = jnp.asarray(rng.normal(size=(1, 2, 512, 128)).astype(np.float32))
o = run("flash_attention", lambda: flash_attention(q4, k4, v4, causal=True))

from ggml_cuda_experiments_tpu.ops.flash_decode import flash_decode
qd = jnp.asarray(rng.normal(size=(1, 32, 128)).astype(np.float32))
kd = jnp.asarray(rng.normal(size=(1, 8, 1024, 128)).astype(np.float32))
vd = jnp.asarray(rng.normal(size=(1, 8, 1024, 128)).astype(np.float32))
o = run("flash_decode s1", lambda: flash_decode(qd, kd, vd))
o = run("flash_decode s4", lambda: flash_decode(qd, kd, vd, kv_splits=4))
print("done", flush=True)

# fp8 + int8 paged decode on the real chip (VERDICT r1 item 6: establish
# the fp8 scale-DMA constraint table on real Mosaic, not just interpret)
from ggml_cuda_experiments_tpu.ops.paged_attention import paged_decode
from ggml_cuda_experiments_tpu.ops.flash_decode import flash_decode
from ggml_cuda_experiments_tpu.oracle import quant as oq

B, Hq, Hkv, D, ps, pps = 2, 8, 4, 128, 128, 4
S = ps * pps
kc = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
vc = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
qv = rng.normal(size=(B, Hq, D)).astype(np.float32)
lens = np.array([300, 512], np.int32)
npg = B * pps + 2
pidx = rng.permutation(npg)[:B * pps].reshape(B, pps).astype(np.int32)
kp = np.zeros((Hkv, npg, ps, D), np.float32)
vp = np.zeros((Hkv, npg, ps, D), np.float32)
for b in range(B):
    for pi in range(pps):
        kp[:, pidx[b, pi]] = kc[b, :, pi * ps:(pi + 1) * ps]
        vp[:, pidx[b, pi]] = vc[b, :, pi * ps:(pi + 1) * ps]

for fmt, quant, dequant in (
        ("int8", oq.quantize_int8_rowwise, oq.dequantize_int8_rowwise),
        ("fp8", oq.quantize_fp8_rowwise, oq.dequantize_fp8_rowwise)):
    kq, ks = quant(kp)
    vq, vs = quant(vp)
    o = run(f"paged_decode {fmt}", lambda: paged_decode(
        jnp.asarray(qv), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(lens), jnp.asarray(pidx),
        k_scale_pages=jnp.asarray(ks[..., 0]),
        v_scale_pages=jnp.asarray(vs[..., 0]),
        pages_per_compute_block=2))
    if o is not None:
        kd, vd = dequant(kq, ks), dequant(vq, vs)
        kc2, vc2 = np.zeros_like(kc), np.zeros_like(vc)
        for b in range(B):
            for pi in range(pps):
                kc2[b, :, pi * ps:(pi + 1) * ps] = kd[:, pidx[b, pi]]
                vc2[b, :, pi * ps:(pi + 1) * ps] = vd[:, pidx[b, pi]]
        want = flash_decode(jnp.asarray(qv), jnp.asarray(kc2),
                            jnp.asarray(vc2), jnp.asarray(lens))
        print("   err", float(np.abs(np.asarray(o) - np.asarray(want)).max()),
              flush=True)

# fused MLP kernel on the real chip
wg2 = (rng.normal(size=(4096, 4096)) / 64).astype(np.float32)
wu2 = (rng.normal(size=(4096, 4096)) / 64).astype(np.float32)
wd2 = (rng.normal(size=(512, 4096)) / 64).astype(np.float32)
w_guf = qm.quantize(qm.reorder_gu_rows(wg2, wu2), "q4_k")
w_dn = qm.quantize(wd2, "q4_k")
x4 = jnp.asarray(rng.normal(size=(1, 4096)).astype(np.float32))
o = run("mlp_fused q4_k", lambda: qm.mlp_fused(
    qm.permute_activations(x4), w_guf, w_dn))
if o is not None:
    y = np.asarray(qm.qmatmul(x4, w_guf, use_vpu=True, x_quant8=True))
    mp = y[:, :4096] / (1 + np.exp(-y[:, :4096])) * y[:, 4096:]
    m = mp[:, qm._inv_perm(4096)]
    want = np.asarray(qm.qmatmul(jnp.asarray(m), w_dn,
                                 use_vpu=True, x_quant8=True))
    print("   err vs unfused",
          float(np.abs(np.asarray(o) - want).max()), flush=True)
