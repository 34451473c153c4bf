"""Uncertainty-based point sampling for mask losses (pure JAX).

TPU-native equivalent of mmdet's
``get_uncertain_point_coords_with_randomness`` (used at
open_set/models/mask2former_head.py:604-607): oversample random points by
``oversample_ratio``, keep the top ``importance_sample_ratio`` fraction by
uncertainty (-|logit|), fill the rest with fresh random points.

Shapes are static: returns exactly ``num_points`` coords per mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .point_sample import point_sample


def get_uncertain_point_coords_with_randomness(
    rng: jax.Array,
    mask_logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Sample (N, num_points, 2) normalized (x, y) coords per mask.

    Args:
        rng: PRNG key.
        mask_logits: (N, H, W) predicted mask logits.
    """
    n = mask_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain

    k_over, k_rand = jax.random.split(rng)
    coords = jax.random.uniform(k_over, (n, num_sampled, 2))
    logits = point_sample(mask_logits, coords)  # (N, num_sampled)
    uncertainty = -jnp.abs(logits)
    _, top_idx = jax.lax.top_k(uncertainty, num_uncertain)  # (N, num_uncertain)
    picked = jnp.take_along_axis(coords, top_idx[:, :, None], axis=1)
    if num_random > 0:
        rand_coords = jax.random.uniform(k_rand, (n, num_random, 2))
        picked = jnp.concatenate([picked, rand_coords], axis=1)
    return picked
