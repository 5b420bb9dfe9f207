"""Sampling: greedy / temperature / top-k / top-p / min-p, fully jittable.

Capability parity with the reference Sampler
(/root/reference/src/engine/Sampler.{h,cpp}): greedy argmax when no knob
is set; otherwise temperature-scale → top-k → top-p (always keeping the
top-1 token) → min-p (threshold = max_prob · min_p) → categorical draw.

TPU-first: the whole chain is masking on the [B, V] logits array followed
by jax.random.categorical (Gumbel trick) — no host sync, no sort-scatter
round trips; it fuses into the tail of the decode step under jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class SamplerConfig:
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None

    @property
    def is_greedy(self) -> bool:
        """No knob set → greedy argmax (reference: Sampler.cpp:23-27).
        temperature == 0 is also greedy."""
        return (
            (self.temperature is None or self.temperature == 0.0)
            and self.top_k is None
            and self.top_p is None
            and self.min_p is None
        ) or self.temperature == 0.0


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask everything below the k-th largest logit."""
    k = max(1, min(k, logits.shape[-1]))
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus: keep the smallest prefix of descending-prob tokens whose
    cumulative probability reaches p; the top-1 token always survives."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # drop a token if the cumulative mass BEFORE it already reached p
    keep_sorted = (cum - probs) < p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # threshold logit = smallest kept logit
    kth = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    threshold = jnp.max(probs, axis=-1, keepdims=True) * min_p
    return jnp.where(probs < threshold, NEG_INF, logits)


def sample_batched(
    logits: jnp.ndarray,       # [B, V] fp32
    temperature: jnp.ndarray,  # [B] — 0 ⇒ greedy for that row
    top_k: jnp.ndarray,        # [B] int32 — 0 ⇒ disabled
    top_p: jnp.ndarray,        # [B] — 1.0 ⇒ disabled
    min_p: jnp.ndarray,        # [B] — 0.0 ⇒ disabled
    key: jax.Array,
) -> jnp.ndarray:
    """Per-row sampling knobs in one jitted op — continuous batching mixes
    requests with different sampler settings in a single decode step.
    Returns token ids [B]."""
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    masked = masked_logits_batched(logits, temperature, top_k, top_p,
                                   min_p)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0, greedy_tok, sampled)


def masked_logits_batched(
    logits: jnp.ndarray,       # [B, V] fp32
    temperature: jnp.ndarray,  # [B] — <= 0 treated as 1.0 here (caller
                               # routes greedy rows to argmax separately)
    top_k: jnp.ndarray,        # [B] int32 — 0 ⇒ disabled
    top_p: jnp.ndarray,        # [B] — 1.0 ⇒ disabled
    min_p: jnp.ndarray,        # [B] — 0.0 ⇒ disabled
) -> jnp.ndarray:
    """The processed per-row sampling distribution as masked logits:
    temperature-scaled with top-k/top-p/min-p losers at NEG_INF.
    softmax of the result IS each row's actual sampling distribution —
    speculative rejection-sampling verification needs it explicitly
    (causal_lm.decode_paged_spec_steps), sample_batched feeds it to
    categorical."""
    B, V = logits.shape

    t = jnp.where(temperature <= 0, 1.0, temperature)[:, None]
    scaled = logits / t

    # ONE descending sort; every knob reduces to a VALUE threshold on it
    # (same tie semantics as the single-config apply_top_k/apply_top_p).
    # The previous rank-based formulation used two extra argsorts plus a
    # [B, V] gather — profiled at >10 ms/step at a 128k vocab, >half the
    # whole serving decode step.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]

    # top-k threshold: the k-th largest value (k == 0 disables)
    k_eff = jnp.clip(jnp.where(top_k <= 0, V, top_k), 1, V)
    kth_k = jnp.take_along_axis(
        sorted_desc, (k_eff - 1)[:, None].astype(jnp.int32), axis=-1
    )

    # top-p threshold: smallest logit whose preceding cumulative mass is
    # still below p (rank 0 always kept)
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < top_p[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)
    kth_p = jnp.min(
        jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1,
        keepdims=True,
    )

    # min-p threshold in probability space
    probs = jax.nn.softmax(scaled, axis=-1)
    thr_min = jnp.max(probs, axis=-1, keepdims=True) * min_p[:, None]

    keep = (scaled >= kth_k) & (scaled >= kth_p) & (probs >= thr_min)
    return jnp.where(keep, scaled, NEG_INF)


def sample(
    logits: jnp.ndarray,  # [B, V] fp32
    cfg: SamplerConfig,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Returns sampled token ids [B] (int32)."""
    if cfg.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if cfg.temperature is not None and cfg.temperature > 0:
        logits = logits / cfg.temperature
    if cfg.top_k is not None and cfg.top_k > 0:
        logits = apply_top_k(logits, cfg.top_k)
    if cfg.top_p is not None and 0 < cfg.top_p < 1.0:
        logits = apply_top_p(logits, cfg.top_p)
    if cfg.min_p is not None and cfg.min_p > 0:
        logits = apply_min_p(logits, cfg.min_p)
    assert key is not None, "stochastic sampling requires a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
