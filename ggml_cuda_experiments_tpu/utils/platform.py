"""Platform detection: run Pallas kernels compiled on TPU, interpreted on CPU.

The reference's CPU-runnable gate (BASELINE.json config 1) maps to Pallas
``interpret=True`` — the same kernel source runs on the CPU interpreter for
correctness tests and compiled via Mosaic on real TPU hardware. Every kernel
entry point takes ``interpret: bool | None`` and resolves ``None`` through
``interpret_default()``.
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_default(interpret: bool | None = None) -> bool:
    """Resolve an ``interpret`` flag: explicit value wins, else CPU→True."""
    if interpret is not None:
        return interpret
    return not on_tpu()
