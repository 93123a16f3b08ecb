"""CLIP text encoder in Flax (SD1.x: ViT-L/14 12-layer quick-gelu 768;
SD2.x: OpenCLIP ViT-H 23-layer gelu 1024).

Owned implementation of the text conditioning model the reference loads
from HuggingFace (`invert.py:70-81`: ``text_encoder(input_ids)[0]`` — the
last hidden state feeds the UNet cross-attention).  Pre-LayerNorm
transformer with causal masking over 77 tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    hidden_act: str = "quick_gelu"   # SD2.x OpenCLIP: "gelu"
    layer_norm_eps: float = 1e-5
    # SDXL conditioning options:
    clip_skip: int = 0               # take hidden states k layers before the
                                     # end (SDXL uses the penultimate layer,
                                     # clip_skip=1, WITHOUT the final LN)
    projection_dim: int = 0          # >0: also return the EOS-pooled text
                                     # projection (SDXL text_encoder_2)


SD15_TEXT = CLIPTextConfig()
SD21_TEXT = CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                           intermediate_size=4096, hidden_act="gelu")
# SDXL dual encoders: CLIP ViT-L (penultimate states) + OpenCLIP bigG
# (penultimate states + pooled projection).
SDXL_TEXT_1 = CLIPTextConfig(clip_skip=1)
SDXL_TEXT_2 = CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                             intermediate_size=5120, hidden_act="gelu",
                             clip_skip=1, projection_dim=1280)

TINY_TEXT = CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                           num_heads=2, intermediate_size=64,
                           max_positions=16)
TINY_TEXT_2 = CLIPTextConfig(vocab_size=1000, hidden_size=16, num_layers=2,
                             num_heads=2, intermediate_size=32,
                             max_positions=16, clip_skip=1,
                             projection_dim=16)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        # exact (erf) gelu — transformers' ACT2FN["gelu"], not tanh-approx
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, S, _ = x.shape

        def proj(name):
            return nn.Dense(c.hidden_size, dtype=self.dtype, name=name)(x)

        def split(t):
            return t.reshape(B, S, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(proj("q_proj")) * (head_dim ** -0.5)
        k = split(proj("k_proj"))
        v = split(proj("v_proj"))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        p = nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = SD15_TEXT
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, eos_token_id: int | None = None):
        """[B, S] int32 ids -> [B, S, hidden] hidden states.

        Default (clip_skip=0): final-LN'd last hidden state (SD1.x/2.x).
        clip_skip=k: the hidden state k layers before the end, WITHOUT the
        final LN (SDXL convention).  With projection_dim > 0 also returns
        the EOS-pooled text projection as a second output (pooled from the
        final-LN'd last layer at the first EOS position)."""
        c = self.cfg
        B, S = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01), (c.max_positions, c.hidden_size),
        ).astype(self.dtype)
        x = tok + pos[None, :S]
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        hidden_states = []
        for i in range(c.num_layers):
            x = CLIPLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)
            hidden_states.append(x)
        final = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                             name="final_layer_norm")(x)
        out = final if c.clip_skip == 0 else hidden_states[-1 - c.clip_skip]

        if c.projection_dim:
            if eos_token_id is None:
                eos_token_id = c.vocab_size - 1
            eos_pos = jnp.argmax(
                (input_ids == eos_token_id).astype(jnp.int32), axis=1)
            pooled = jnp.take_along_axis(
                final, eos_pos[:, None, None], axis=1)[:, 0]
            pooled = nn.Dense(c.projection_dim, use_bias=False,
                              dtype=self.dtype,
                              name="text_projection")(pooled)
            return out, pooled
        return out
