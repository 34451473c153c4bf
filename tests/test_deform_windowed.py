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

    def test_sparse_masks_bit_identical(self, rng, monkeypatch):
        """DEFORM_SPARSE cell-liveness skipping must be BIT-identical to
        the dense loop: the rectangle masks only skip cells whose tent
        weight is exactly zero for every (query, head, point) in the row
        block, so the skipped FMAs contribute exact bf16 zeros."""
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        shapes = [(8, 12)]
        value, locs, wgts = build_inputs(rng, shapes, max_offset_cells=1.0)
        monkeypatch.setenv("DEFORM_SPARSE", "0")
        dense = windowed_ms_deform_attn_pallas(
            value, shapes, locs, wgts, window=4, interpret=True
        )
        monkeypatch.setenv("DEFORM_SPARSE", "1")
        sparse = windowed_ms_deform_attn_pallas(
            value, shapes, locs, wgts, window=4, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(sparse), np.asarray(dense))

    @pytest.mark.slow  # interpret-mode W=8 multi-level traces, ~2 min
    def test_sparse_masks_multilevel(self, rng, monkeypatch):
        """Sparse == dense across all prep modes (same/coarser/finer) and
        mixed per-level windows. The skip itself is exact (masked cells
        carry zero tent weight for every query in the block), but the
        XLA CPU backend fuses the bf16 multiply-add differently inside a
        lax.cond region, so interpret-mode outputs can differ by one
        bf16 ulp — hence allclose, not array_equal (the single-level
        fast test above pins bit-identity where no cond region forms)."""
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        value, locs, wgts = build_inputs(rng, SHAPES, max_offset_cells=1.0)
        for w in (8, (8, 6, 4)):
            monkeypatch.setenv("DEFORM_SPARSE", "0")
            dense = windowed_ms_deform_attn_pallas(
                value, SHAPES, locs, wgts, window=w, interpret=True
            )
            monkeypatch.setenv("DEFORM_SPARSE", "1")
            sparse = windowed_ms_deform_attn_pallas(
                value, SHAPES, locs, wgts, window=w, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(sparse, np.float32),
                np.asarray(dense, np.float32),
                rtol=0.01,
                atol=0.005,
            )

    def test_sparse_mask_words_cover_all_support(self, rng):
        """Property check on the mask builder itself: every cell with
        bilinear tent support (|fy-r| < 1 and |fx-c| < 1 for ANY sample
        in the row block) must have its bit set — skipped cells are then
        provably zero-weight for every query. Exactness of the skip
        follows from this; it is the invariant the sparse kernel relies
        on."""
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            _mask_words,
        )

        b, grp, rb, hpp, qw, wl = 2, 2, 4, 8, 11, 8
        ha_pad = 3 * rb
        fx = jnp.asarray(
            rng.uniform(0, wl - 1, (b, grp, ha_pad, hpp, 16)).astype(
                np.float32
            )
        )
        fy = jnp.asarray(
            rng.uniform(0, wl - 1, (b, grp, ha_pad, hpp, 16)).astype(
                np.float32
            )
        )
        words = np.asarray(_mask_words(fx, fy, wl, rb, qw))
        fxn = np.asarray(fx)[..., :qw]
        fyn = np.asarray(fy)[..., :qw]
        live_frac = []
        for bb in range(b):
            for gg in range(grp):
                for ib in range(ha_pad // rb):
                    FX = fxn[bb, gg, ib * rb : (ib + 1) * rb]
                    FY = fyn[bb, gg, ib * rb : (ib + 1) * rb]
                    for r in range(wl):
                        for c in range(wl):
                            got = (words[bb, gg, ib, c] >> r) & 1
                            if np.any(
                                (np.abs(FY - r) < 1) & (np.abs(FX - c) < 1)
                            ):
                                assert got, (bb, gg, ib, r, c)
                            live_frac.append(got)
        # masks must also DO something: not everything live
        assert 0 < np.mean(live_frac) <= 1.0

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


class TestMergedVariantFast:
    def test_multi_level_merged_interpret(self, rng):
        """Fast-path coverage for the default 'merged' variant's
        level-merge/repack logic (tiny shapes, interpret mode); the full
        sizes run under the slow marker / on-TPU tool."""
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        # three levels: exercises the compact coarser path at BOTH level
        # ratios (k=2 and k=4 — in-kernel MXU lane expand + static row
        # repeat pattern) plus finer k-phase pairs
        shapes = [(2, 3), (4, 6), (8, 12)]
        value, locs, wgts = build_inputs(rng, shapes, max_offset_cells=1.5, b=1)
        want = windowed_ms_deform_attn(value, shapes, locs, wgts, window=4)
        got = windowed_ms_deform_attn_pallas(
            value, shapes, locs, wgts, window=4, interpret=True,
            variant="merged",
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            rtol=0.05,
            atol=0.05,
        )


class TestHeadsPerStep:
    def test_hp4_matches_hp2(self, rng, monkeypatch):
        """DEFORM_HP=4 packs 4 heads per grid step; outputs must match
        the default packing bit-for-bf16 (NH=4 so hp actually divides)."""
        from betrayed_by_captions_tpu.ops import (
            deform_attn_windowed_pallas as mod,
        )

        shapes = [(2, 3), (4, 6)]
        s = sum(h * w for h, w in shapes)
        b, nh, d, p = 1, 4, 8, 4
        value = jnp.asarray(rng.randn(b, s, nh, d).astype(np.float32))
        ref = make_reference_points(shapes)
        offsets = rng.uniform(-1.0, 1.0, size=(b, s, nh, 2, p, 2)).astype(
            np.float32
        )
        norm = np.array([[w, h] for (h, w) in shapes], np.float32)
        locs = jnp.asarray(
            ref[None, :, None, None, None, :]
            + offsets / norm[None, None, None, :, None, :]
        )
        wgts = rng.rand(b, s, nh, 2, p).astype(np.float32)
        wgts = jnp.asarray(wgts / wgts.sum(axis=(3, 4), keepdims=True))

        def run():
            return np.asarray(
                mod.windowed_ms_deform_attn_pallas(
                    value, shapes, locs, wgts, window=4, interpret=True
                ),
                np.float32,
            )

        monkeypatch.setenv("DEFORM_HP", "2")
        want = run()
        monkeypatch.setenv("DEFORM_HP", "4")
        got = run()
        np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)

        # per-QUERY-level packing ("finest first", short list extends
        # with its last entry): query level 0 at hp=2, level 1 at hp=4
        monkeypatch.setenv("DEFORM_HP", "2,4")
        got_mixed = run()
        np.testing.assert_allclose(got_mixed, want, rtol=0.02, atol=0.02)


class TestModuleWindowSemantics:
    """MSDeformAttention's window/clamp contract (models/deformable.py):
    window=None must be reference-faithful — NO offset clamp, mmcv compass
    init radii 1..4 — so ported reference checkpoints sample exactly as
    mmcv's MultiScaleDeformableAttention (which never clamps)."""

    def _apply(self, window, attn_impl, offset_bias_cells, rng):
        from betrayed_by_captions_tpu.models.deformable import MSDeformAttention

        shapes = [(8, 12)]
        s = sum(h * w for h, w in shapes)
        b = 1
        mod = MSDeformAttention(
            embed_dim=16, num_heads=2, num_levels=1, num_points=P,
            attn_impl=attn_impl, window=window,
        )
        query = jnp.asarray(rng.randn(b, s, 16).astype(np.float32))
        value = jnp.asarray(rng.randn(b, s, 16).astype(np.float32))
        ref = jnp.asarray(make_reference_points(shapes))
        params = mod.init(jax.random.PRNGKey(0), query, value, ref, shapes)
        # force every sampling offset to a constant (cells); with
        # zero-init kernels the Dense output equals its bias
        bias = np.full(
            params["params"]["sampling_offsets"]["bias"].shape,
            offset_bias_cells, np.float32,
        )
        params["params"]["sampling_offsets"]["bias"] = jnp.asarray(bias)
        out = mod.apply(params, query, value, ref, shapes)
        return out, params, (query, value, ref, shapes)

    def test_window_none_is_unclamped(self, rng):
        """With a 5-cell offset (beyond window-8's clamp of 3), the
        unclamped module must reproduce the raw gather math at 5 cells,
        and differ from the clamped module."""
        off = 5.0
        out_none, params, (query, value, ref, shapes) = self._apply(
            None, "exact", off, rng
        )
        out_clamped, _, _ = self._apply(8, "exact", off, rng)

        # manual unclamped computation through the same projections
        p = params["params"]
        v = value @ p["value_proj"]["kernel"] + p["value_proj"]["bias"]
        v = v.reshape(1, -1, 2, 8)
        normalizer = np.array([[w, h] for (h, w) in shapes], np.float32)
        locs = ref[None, :, None, None, None, :] + np.full(
            (1, ref.shape[0], 2, 1, P, 2), off, np.float32
        ) / normalizer[None, None, None, :, None, :]
        attn_logits = query @ p["attention_weights"]["kernel"] + (
            p["attention_weights"]["bias"]
        )
        attn = jax.nn.softmax(
            attn_logits.reshape(1, -1, 2, 1 * P), axis=-1
        ).reshape(1, -1, 2, 1, P)
        want = ms_deform_attn(v, shapes, jnp.asarray(locs), attn)
        want = want @ p["output_proj"]["kernel"] + p["output_proj"]["bias"]
        np.testing.assert_allclose(
            np.asarray(out_none), np.asarray(want), rtol=1e-4, atol=1e-4
        )
        assert np.abs(np.asarray(out_none) - np.asarray(out_clamped)).max() > 1e-3

    def test_window_none_requires_exact(self, rng):
        with pytest.raises(ValueError, match="window=None"):
            self._apply(None, "windowed_pallas", 0.0, rng)

    def test_compass_init_radii(self):
        """window=None bias init must be the exact mmcv ladder: per-head
        unit compass direction scaled by point index+1 (radii 1..4)."""
        from betrayed_by_captions_tpu.models.deformable import (
            _compass_offset_init,
        )

        init = _compass_offset_init(8, 3, 4, max_offset=None)
        bias = np.asarray(
            init(None, (8 * 3 * 4 * 2,))
        ).reshape(8, 3, 4, 2)
        # mmcv: thetas = 2*pi*h/8; grid normalized by max-abs; scaled by i+1
        thetas = np.arange(8) * (2 * np.pi / 8)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        want = np.tile(grid[:, None, None, :], (1, 3, 4, 1)) * np.arange(
            1, 5
        )[None, None, :, None]
        np.testing.assert_allclose(bias, want.astype(np.float32), atol=1e-6)

    def test_deform_rb_validation(self, rng, monkeypatch):
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        shapes = [(2, 3)]
        value, locs, wgts = build_inputs(rng, shapes, max_offset_cells=1.0, b=1)
        monkeypatch.setenv("DEFORM_RB", "5")
        with pytest.raises(ValueError, match="power of two"):
            windowed_ms_deform_attn_pallas(
                value, shapes, locs, wgts, window=4, interpret=True
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
