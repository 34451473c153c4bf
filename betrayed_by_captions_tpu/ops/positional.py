"""Positional encodings (pure JAX, static shapes).

TPU-native equivalents of:
- mmdet ``SinePositionalEncoding`` (2-D sine embedding for pixel tokens;
  reference config /root/reference/configs/instance/coco_b48n17.py:68-73,
  used at open_set/models/mask2former_head.py:801-804),
- the caption decoder's 1-D sinusoidal table
  (open_set/models/transformers/transformers.py:9-25).

Because shapes are static under jit we compute the encodings from iota
instead of runtime cumsums over a padding mask (the reference always passes
an all-valid mask, mask2former_head.py:798-800, so the cumsum degenerates
to an iota anyway).
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp
import numpy as np


def sine_positional_encoding_2d(
    h: int,
    w: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """2-D sine positional embedding of shape (2*num_feats, h, w).

    Matches mmdet's SinePositionalEncoding for an all-valid mask: row/col
    ids are 1-based cumsum positions, optionally normalized to [0, scale].
    Channel layout: [y sin/cos interleaved (num_feats), x interleaved].
    """
    y = jnp.arange(1, h + 1, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    x = jnp.arange(1, w + 1, dtype=dtype)[None, :] * jnp.ones((h, 1), dtype)
    if normalize:
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=dtype)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_y = y[:, :, None] / dim_t  # (h, w, num_feats)
    pos_x = x[:, :, None] / dim_t
    # interleave sin on even channels, cos on odd channels
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3)
    pos_y = pos_y.reshape(h, w, num_feats)
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, num_feats)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)  # (h, w, 2*num_feats)
    return jnp.transpose(pos, (2, 0, 1))


def sinusoidal_table_1d(seq_length: int, dim: int) -> np.ndarray:
    """1-D sinusoidal table (seq_length, dim): sin on even dims, cos on odd.

    Equivalent to the reference caption decoder's PositionalEncoding buffer
    (transformers.py:9-25): angle = pos / 10000**((j - j%2)/dim).
    Returned as numpy so callers can bake it into a module constant.
    """
    pos = np.arange(seq_length, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, (j - j % 2) / dim)
    table = np.where(j % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)
