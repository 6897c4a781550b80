"""Token sampling: greedy / temperature / top-k / top-p (nucleus).

All jit-compatible (static-shape masking, no data-dependent control flow)
so samplers live INSIDE the compiled decode step — sampling on-device
avoids a logits [B, vocab] device->host fetch per token, which at 7B decode
speed would cost more than the forward pass. The reference has no sampling
(it stops at kernel outputs); this is part of the serving surface.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0     # 0 => greedy
    top_k: int = 0               # 0 => disabled
    top_p: float = 1.0           # 1 => disabled
    # a repetition penalty would need the token history; the engine applies
    # it host-side if configured


def _mask_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits, -inf the rest (ties keep all tied)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= kth, logits, -jnp.inf)


def _mask_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus: keep the smallest prefix of descending-prob tokens whose
    cumulative probability exceeds p (the first token is always kept)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep while the mass BEFORE this token is < p
    keep = (cum - probs) < p
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits >= thresh, logits, -jnp.inf)


def sample(logits: jax.Array, key: jax.Array,
           params: SamplingParams = SamplingParams()) -> jax.Array:
    """logits [..., vocab] -> token ids [...]. Greedy when temperature==0
    (the key is then unused)."""
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / params.temperature
    if params.top_k and params.top_k > 0:
        x = _mask_top_k(x, params.top_k)
    if params.top_p < 1.0:
        x = _mask_top_p(x, params.top_p)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
