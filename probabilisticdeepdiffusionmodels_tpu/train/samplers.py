"""Timestep samplers as device-resident state (no host syncs).

TPU-native redesign of the reference's samplers
(reference: src/sampling/uniform_sampler.py:1-10,
src/sampling/importance_sampler.py:1-41, src/modules/stepwise_log.py:4-37).

The reference keeps a Python-side per-timestep loss history and syncs
GPU->CPU after every training step (src/engine.py:268-271) to feed it.  Here
the history ring, counts and RMS live on device as fixed-shape arrays inside
the train state; updates are scatter-adds inside the jitted train step, and
the warmed-up predicate + categorical draw are lax ops — zero host traffic.

Semantics preserved:
  * t is 1-indexed, drawn from [1, T]            (uniform_sampler.py:8)
  * importance sampling activates only once every t has >= min_counts
    observations                                  (importance_sampler.py:16-24)
  * p_t ∝ RMS of the last `history` (=10) losses at t, + 1e-6
                                                  (importance_sampler.py:28-29)
  * weights = 1 / (p_t[t] * batch_size)           (importance_sampler.py:31)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LossHistory", "sample_uniform", "sample_importance", "importance_probs"]


class LossHistory(NamedTuple):
    """Per-timestep ring buffer of recent losses + totals, all on device.

    Device-side replacement for StepwiseLog (reference
    src/modules/stepwise_log.py:4-37).  ``ring`` is [T, history]; ``count``
    is total observations per t; ``epoch_sum``/``epoch_count`` accumulate the
    running per-epoch average the reference logs per epoch
    (src/engine.py:184-215).
    """

    ring: jax.Array        # [T, H] most recent losses per timestep
    ring_pos: jax.Array    # [T] next write slot per timestep
    count: jax.Array       # [T] total number of observations
    epoch_sum: jax.Array   # [T] sum of losses this epoch
    epoch_count: jax.Array # [T] observations this epoch

    @classmethod
    def create(cls, diffusion_steps: int, history: int = 10) -> "LossHistory":
        return cls(
            ring=jnp.zeros((diffusion_steps, history), jnp.float32),
            ring_pos=jnp.zeros((diffusion_steps,), jnp.int32),
            count=jnp.zeros((diffusion_steps,), jnp.int32),
            epoch_sum=jnp.zeros((diffusion_steps,), jnp.float32),
            epoch_count=jnp.zeros((diffusion_steps,), jnp.int32),
        )

    def update(self, t: jax.Array, losses: jax.Array) -> "LossHistory":
        """Record a batch of (t, loss) pairs. t is 1-indexed [B]; loss [B].

        Batch items hitting the same t land in consecutive ring slots
        (slot = pos[t] + rank-within-t), matching the sequential appends of
        the reference (stepwise_log.py:16-26).  Non-finite losses are
        dropped, as in the reference (stepwise_log.py:15).
        """
        tl = t - 1
        finite = jnp.isfinite(losses)
        # rank of each element among same-t elements before it
        same = tl[None, :] == tl[:, None]
        before = jnp.tril(same, k=-1) & finite[None, :]
        rank = jnp.sum(before, axis=1)
        slot = (self.ring_pos[tl] + rank) % self.ring.shape[1]

        safe_losses = jnp.where(finite, losses, 0.0)
        ring = self.ring.at[tl, slot].set(
            jnp.where(finite, safe_losses, self.ring[tl, slot])
        )
        upd = finite.astype(jnp.int32)
        ring_pos = self.ring_pos.at[tl].add(upd) % self.ring.shape[1]
        count = self.count.at[tl].add(upd)
        epoch_sum = self.epoch_sum.at[tl].add(jnp.where(finite, safe_losses, 0.0))
        epoch_count = self.epoch_count.at[tl].add(upd)
        return LossHistory(ring, ring_pos, count, epoch_sum, epoch_count)

    def rms_per_step(self) -> jax.Array:
        """sqrt(mean of squared recent losses) per t over the filled part of
        the ring (reference avg_sq_per_step, stepwise_log.py:22-24)."""
        h = self.ring.shape[1]
        filled = jnp.minimum(self.count, h)
        mask = (
            jnp.arange(h)[None, :] < filled[:, None]
        ).astype(jnp.float32)
        denom = jnp.maximum(filled.astype(jnp.float32), 1.0)
        return jnp.sqrt(jnp.sum(self.ring**2 * mask, axis=1) / denom)

    def avg_per_step_epoch(self) -> jax.Array:
        return self.epoch_sum / jnp.maximum(self.epoch_count.astype(jnp.float32), 1.0)

    def reset_epoch(self) -> "LossHistory":
        return self._replace(
            epoch_sum=jnp.zeros_like(self.epoch_sum),
            epoch_count=jnp.zeros_like(self.epoch_count),
        )

    def is_warmed_up(self, min_counts: int) -> jax.Array:
        """Every timestep observed >= min_counts times
        (reference importance_sampler.py:16-24)."""
        return jnp.all(self.count >= min_counts)


def sample_uniform(
    key: jax.Array, batch_size: int, diffusion_steps: int
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """t ~ U{1..T}, no weights (reference src/sampling/uniform_sampler.py:4-10)."""
    t = jax.random.randint(key, (batch_size,), 1, diffusion_steps + 1)
    return t, None


def importance_probs(history: LossHistory) -> jax.Array:
    """p_t ∝ RMS(last losses at t) + 1e-6 (reference importance_sampler.py:28-29)."""
    p = history.rms_per_step() + 1e-6
    return p / jnp.sum(p)


def sample_importance(
    key: jax.Array,
    batch_size: int,
    history: LossHistory,
    min_counts: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Importance-sample timesteps; falls back to uniform until warmed up.

    Returns (t [B] 1-indexed, weights [B]).  During warmup weights are 1/B so
    that sum(w * loss) == mean(loss), reproducing the reference's
    weights=None uniform-mean path (engine.py:274-277) with a single fused
    code path (no host-side branch).
    """
    T = history.count.shape[0]
    ready = history.is_warmed_up(min_counts)
    p = importance_probs(history)

    key_imp, key_uni = jax.random.split(key)
    idx = jax.random.categorical(key_imp, jnp.log(p), shape=(batch_size,))
    t_imp = (idx + 1).astype(jnp.int32)
    w_imp = 1.0 / (p[idx] * batch_size)

    t_uni, _ = sample_uniform(key_uni, batch_size, T)
    w_uni = jnp.full((batch_size,), 1.0 / batch_size, jnp.float32)

    t = jnp.where(ready, t_imp, t_uni)
    w = jnp.where(ready, w_imp, w_uni)
    return t, w
