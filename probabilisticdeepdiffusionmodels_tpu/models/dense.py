"""MLP baseline model (reference: src/modules/dense.py:27-56).

Time-embed MLP + flattened image concat + Linear/ReLU stack, reshaped back
to an image.  Kept for capability parity; the reference's factory actually
rejects it (src/modules/__init__.py:9-10) — ours accepts it (documented
divergence: the import-then-reject in the reference is a bug-shaped quirk).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.diffusion import timestep_embedding
from .layers import Linear, silu


class DenseModel(nn.Module):
    resolution: int = 32
    in_channels: int = 3
    num_hidden: Sequence[int] = (256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, *, train: bool = False):
        time_embed_dim = self.num_hidden[0]
        emb = timestep_embedding(timesteps, time_embed_dim)
        emb = Linear(time_embed_dim, dtype=self.dtype, name="time_embed_1")(emb)
        emb = Linear(time_embed_dim, dtype=self.dtype, name="time_embed_2")(silu(emb))

        b = x.shape[0]
        flat = x.reshape(b, -1)
        h = jnp.concatenate([emb.astype(flat.dtype), flat], axis=-1)
        for i, n in enumerate(self.num_hidden):
            h = Linear(n, dtype=self.dtype, name=f"dense_{i}")(h)
            h = jax.nn.relu(h)
        out_dim = self.resolution * self.resolution * self.in_channels
        h = Linear(out_dim, dtype=self.dtype, name="dense_out")(h)
        return h.reshape(b, self.resolution, self.resolution, self.in_channels)
