"""Multi-head attention blocks — inventory-parity dead code.

The reference (``mopa/models/attention.py:10-79``) ships these but never
imports them from any train/test path; this port mirrors that surface.
Nothing in this repo uses them either (``models/sam.py`` defines its own
windowed/decoder attention)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ScaledDotProductAttention(nn.Module):
    temperature: float
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, train: bool = False):
        attn = jnp.einsum("...qd,...kd->...qk", q, k) / self.temperature
        if mask is not None:
            attn = jnp.where(mask, attn, -1e9)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("...qk,...kd->...qd", attn, v)
        return out, attn


class MultiHeadAttention(nn.Module):
    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, train: bool = False):
        residual = q
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        qh = nn.Dense(self.n_head * self.d_k, name="w_qs")(q)
        kh = nn.Dense(self.n_head * self.d_k, name="w_ks")(k)
        vh = nn.Dense(self.n_head * self.d_v, name="w_vs")(v)
        qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, lk, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, lk, self.n_head, self.d_v).transpose(0, 2, 1, 3)
        out, attn = ScaledDotProductAttention(self.d_k ** 0.5, self.dropout)(
            qh, kh, vh, mask=mask, train=train)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
        out = nn.Dense(self.d_model, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.LayerNorm(epsilon=1e-6)(out + residual)
        return out, attn
