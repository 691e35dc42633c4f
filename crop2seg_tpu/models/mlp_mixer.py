"""MLP-Mixer over temporal tokens (experimental in the reference, not wired
into its model factory — /root/reference/src/backbones/mlp_mixer.py:9-81).

Kept for component parity: token-mixing MLP over T and channel-mixing MLP
over C with pre-LayerNorm and residuals, applied per pixel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPMixerLayer(nn.Module):
    num_tokens: int
    hidden_dim: int
    token_mlp_dim: int
    channel_mlp_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (N, T, C)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = jnp.swapaxes(h, -1, -2)
        h = nn.Dense(self.token_mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU = exact erf
        h = nn.Dense(self.num_tokens, dtype=self.dtype)(h)
        x = x + jnp.swapaxes(h, -1, -2)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.channel_mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
        return x + h


class MLPMixer(nn.Module):
    num_tokens: int
    hidden_dim: int
    num_layers: int = 4
    token_mlp_dim: int = 64
    channel_mlp_dim: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # NOTE: no trailing norm — the reference is a bare Sequential of
        # mixer layers (mlp_mixer.py:54-81).
        for i in range(self.num_layers):
            x = MLPMixerLayer(self.num_tokens, self.hidden_dim,
                              self.token_mlp_dim, self.channel_mlp_dim,
                              dtype=self.dtype, name=f"layer_{i}")(x)
        return x
