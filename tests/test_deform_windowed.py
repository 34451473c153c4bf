"""Windowed (gather-free) deformable attention vs the exact gather op.

The windowed op must match ops.deform_attn.ms_deform_attn bit-for-fp-bit
whenever every sampling offset stays inside the window; with offsets
beyond the window it must clamp (finite, no NaN) rather than sample."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.models.deformable import make_reference_points
from betrayed_by_captions_tpu.ops.deform_attn import ms_deform_attn
from betrayed_by_captions_tpu.ops.deform_attn_windowed import (
    windowed_ms_deform_attn,
)

# level shapes with exact x2 ratios (stride 32/16/8 of a 64x96 image)
SHAPES = [(2, 3), (4, 6), (8, 12)]
NH, D, P = 2, 8, 4


def build_inputs(rng, shapes, max_offset_cells, b=2):
    s = sum(h * w for h, w in shapes)
    nl = len(shapes)
    value = rng.randn(b, s, NH, D).astype(np.float32)
    ref = make_reference_points(shapes)  # (S, 2) normalized
    offsets = rng.uniform(
        -max_offset_cells, max_offset_cells, size=(b, s, NH, nl, P, 2)
    ).astype(np.float32)
    normalizer = np.array([[w, h] for (h, w) in shapes], np.float32)
    locs = ref[None, :, None, None, None, :] + offsets / normalizer[
        None, None, None, :, None, :
    ]
    wgts = rng.rand(b, s, NH, nl, P).astype(np.float32)
    wgts = wgts / wgts.sum(axis=(3, 4), keepdims=True)
    return jnp.asarray(value), jnp.asarray(locs), jnp.asarray(wgts)


class TestWindowedPallas:
    """Fused kernel (interpret mode on CPU) vs the XLA windowed
    composition; the compiled path is validated on real TPU by
    tools/check_pallas_tpu.py."""

    @pytest.mark.slow  # interpret-mode kernel, ~100 s on CPU
    def test_matches_windowed_xla(self, rng):
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=2.5)
        want = windowed_ms_deform_attn(value, SHAPES, locs, wgts, window=8)
        got = windowed_ms_deform_attn_pallas(
            value, SHAPES, locs, wgts, window=8, interpret=True
        )
        # kernel multiplies in bf16 (by design): bf16-level tolerance
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            rtol=0.05,
            atol=0.05,
        )

    @pytest.mark.slow  # interpret-mode kernel, ~60 s per variant on CPU;
    # test_single_level keeps the default variant on the fast path
    @pytest.mark.parametrize("variant", ["cell", "packed"])
    def test_matches_exact_op(self, rng, variant):
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=2.0)
        want = ms_deform_attn(value, SHAPES, locs, wgts)
        got = windowed_ms_deform_attn_pallas(
            value, SHAPES, locs, wgts, window=8, interpret=True,
            variant=variant,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            rtol=0.05,
            atol=0.05,
        )

    def test_single_level(self, rng):
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        shapes = [(8, 12)]
        value, locs, wgts = build_inputs(rng, shapes, max_offset_cells=2.0)
        want = windowed_ms_deform_attn(value, shapes, locs, wgts, window=8)
        got = windowed_ms_deform_attn_pallas(
            value, shapes, locs, wgts, window=8, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            rtol=0.05,
            atol=0.05,
        )

    @pytest.mark.slow  # interpret-mode backward kernels, minutes on CPU
    @pytest.mark.parametrize("shapes", [[(8, 12)], SHAPES])
    def test_gradients_match_exact_op(self, rng, shapes):
        """The custom-VJP backward kernels must reproduce the exact
        gather op's gradients for value, locations and attention weights
        (in-window offsets; bf16-level tolerance)."""
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        value, locs, wgts = build_inputs(rng, shapes, max_offset_cells=2.0)
        # keep sampling points off tent/cell boundaries: the subgradient
        # at |fx - c| in {0, 1} is convention-dependent
        probe = jax.random.normal(
            jax.random.PRNGKey(0), value.shape[:2] + (value.shape[2] * value.shape[3],)
        )

        def loss(op):
            def f(v, l, w):
                out = op(v, shapes, l, w)
                return (out.astype(jnp.float32) * probe).sum()
            return f

        want = jax.grad(loss(ms_deform_attn), argnums=(0, 1, 2))(
            value, locs, wgts
        )
        got = jax.grad(
            loss(
                lambda v, s, l, w: windowed_ms_deform_attn_pallas(
                    v, s, l, w, window=8, interpret=True
                )
            ),
            argnums=(0, 1, 2),
        )(value, locs, wgts)

        for name, gw, gg in zip(("value", "locs", "wgts"), want, got):
            gw = np.asarray(gw, np.float32)
            gg = np.asarray(gg, np.float32)
            scale = max(np.abs(gw).max(), 1e-6)
            np.testing.assert_allclose(
                gg / scale, gw / scale, rtol=0.0, atol=0.08,
                err_msg=f"grad wrt {name} diverges",
            )


class TestWindowedDeformAttn:
    def test_matches_exact_op_in_window(self, rng):
        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=2.5)
        want = ms_deform_attn(value, SHAPES, locs, wgts)
        got = windowed_ms_deform_attn(value, SHAPES, locs, wgts, window=8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_matches_exact_op_default_window(self, rng):
        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=4.0)
        want = ms_deform_attn(value, SHAPES, locs, wgts)
        got = windowed_ms_deform_attn(value, SHAPES, locs, wgts)  # W=12
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_single_level(self, rng):
        shapes = [(8, 12)]
        value, locs, wgts = build_inputs(rng, shapes, max_offset_cells=2.0)
        want = ms_deform_attn(value, shapes, locs, wgts)
        got = windowed_ms_deform_attn(value, shapes, locs, wgts, window=8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_out_of_window_clamps_finite(self, rng):
        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=30.0)
        got = windowed_ms_deform_attn(value, SHAPES, locs, wgts, window=8)
        assert np.isfinite(np.asarray(got)).all()

    def test_edge_queries_zero_padding(self, rng):
        """Samples falling off the image edge contribute zero, exactly as
        the gather op's inside-mask does."""
        shapes = [(4, 4)]
        s = 16
        value = jnp.asarray(rng.randn(1, s, 1, 4).astype(np.float32))
        ref = make_reference_points(shapes)
        # push every sample 2 cells off the left edge for corner queries
        offs = np.full((1, s, 1, 1, P, 2), -2.0, np.float32)
        locs = jnp.asarray(
            ref[None, :, None, None, None, :] + offs / 4.0
        )
        wgts = jnp.full((1, s, 1, 1, P), 1.0 / P, jnp.float32)
        want = ms_deform_attn(value, shapes, locs, wgts)
        got = windowed_ms_deform_attn(value, shapes, locs, wgts, window=8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grad_flows(self, rng):
        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=2.0)

        def loss(v, l, w):
            return windowed_ms_deform_attn(v, SHAPES, l, w, window=8).sum()

        gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(value, locs, wgts)
        for g in (gv, gl, gw):
            arr = np.asarray(g)
            assert np.isfinite(arr).all()
            assert np.abs(arr).sum() > 0

    def test_bf16_value(self, rng):
        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=2.0)
        got16 = windowed_ms_deform_attn(
            value.astype(jnp.bfloat16), SHAPES, locs,
            wgts.astype(jnp.bfloat16), window=8,
        )
        want = windowed_ms_deform_attn(value, SHAPES, locs, wgts, window=8)
        assert got16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got16, np.float32), want, rtol=0.05, atol=0.05
        )
