#!/usr/bin/env python
"""Host<->device dispatch-cost anatomy of the current rig.

The engine's full-stack gap (220 vs 594 tok/s device-side, PERF.md) is
attributed to per-scheduler-pass host work: small-array uploads
(lengths/page_table/active), jitted-call dispatch, and result fetches —
all multiplied by the tunnel RTT on this rig. This probe measures each
primitive directly so engine changes chase the right line item:

  upload    jnp.asarray of a tiny host numpy array (is it synchronous?)
  dispatch  jitted trivial fn on device-resident args (enqueue cost)
  disp+up   same fn with one tiny host-numpy arg per call
  fetch     np.asarray of a tiny device result (full RTT by definition)
  chain     N dependent dispatches then one fetch (pipeline depth check)

Usage: python tools/rig_probe.py [--n 30]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp


def t(fn, n):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()
    n = args.n

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    host8 = np.arange(8, dtype=np.int32)

    @jax.jit
    def f(x):
        return x + 1

    xdev = jax.device_put(jnp.arange(8, dtype=jnp.int32))
    np.asarray(f(xdev))

    up = t(lambda: jax.block_until_ready(jnp.asarray(host8)), n)
    print(f"upload tiny [8] (block_until_ready): {up*1e3:8.2f} ms", flush=True)
    up2 = t(lambda: jnp.asarray(np.arange(8, dtype=np.int32)), n)
    print(f"upload tiny [8] (no wait):           {up2*1e3:8.2f} ms", flush=True)

    disp = t(lambda: f(xdev), n)
    print(f"dispatch dev-resident (no wait):     {disp*1e3:8.2f} ms", flush=True)

    dispu = t(lambda: f(host8), n)
    print(f"dispatch w/ tiny host arg (no wait): {dispu*1e3:8.2f} ms", flush=True)

    fetch = t(lambda: np.asarray(f(xdev)), n)
    print(f"dispatch + fetch:                    {fetch*1e3:8.2f} ms", flush=True)

    def chain(k):
        y = xdev
        for _ in range(k):
            y = f(y)
        return np.asarray(y)

    c1 = t(lambda: chain(1), max(3, n // 3))
    c16 = t(lambda: chain(16), max(3, n // 3))
    print(f"chain 1 + fetch:                     {c1*1e3:8.2f} ms")
    print(f"chain 16 + fetch:                    {c16*1e3:8.2f} ms "
          f"(per extra dispatch {max(c16-c1, 0)/15*1e3:6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
