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
