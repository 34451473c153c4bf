"""Pallas deformable-attention kernel vs the XLA reference composition.

These tests run in interpret mode on the CPU mesh; the COMPILED kernel is
validated on real TPU hardware by ``tools/check_pallas_tpu.py`` (numerics
vs the XLA composition) and exercised by ``bench.py --pallas``."""

import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.ops.deform_attn import ms_deform_attn
from betrayed_by_captions_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas


class TestPallasDeformAttn:
    @pytest.mark.parametrize("q,qblock", [(16, 8), (10, 8)])  # incl. padding
    def test_matches_xla_composition(self, rng, q, qblock):
        b, nh, d, npts = 2, 2, 8, 4
        shapes = [(8, 12), (4, 6), (2, 3)]
        s = sum(h * w for h, w in shapes)
        value = rng.randn(b, s, nh, d).astype(np.float32)
        locs = rng.uniform(-0.1, 1.1, size=(b, q, nh, 3, npts, 2)).astype(
            np.float32
        )
        wraw = rng.rand(b, q, nh, 3, npts).astype(np.float32)
        w = wraw / wraw.reshape(b, q, nh, -1).sum(-1).reshape(b, q, nh, 1, 1)

        want = np.asarray(
            ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
        )
        got = np.asarray(
            ms_deform_attn_pallas(
                jnp.asarray(value),
                shapes,
                jnp.asarray(locs),
                jnp.asarray(w),
                query_block=qblock,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
