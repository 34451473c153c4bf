"""Golden-value unit tests for core ops against independent references.

The reference ships zero tests (SURVEY.md §4); we test every op against
scipy / torch-free numpy reimplementations of the original semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from betrayed_by_captions_tpu.ops import (
    batched_hungarian,
    bilinear_resize,
    get_uncertain_point_coords_with_randomness,
    hungarian_assign,
    mask2bbox,
    ms_deform_attn,
    point_sample,
    sine_positional_encoding_2d,
    sinusoidal_table_1d,
)


def np_grid_sample(img, pts):
    """Reference bilinear sampler: align_corners=False, zero padding."""
    h, w = img.shape
    out = np.zeros(len(pts), dtype=np.float64)
    for i, (x, y) in enumerate(pts):
        px, py = x * w - 0.5, y * h - 0.5
        x0, y0 = int(np.floor(px)), int(np.floor(py))
        dx, dy = px - x0, py - y0
        acc = 0.0
        for xi, yi, wt in [
            (x0, y0, (1 - dx) * (1 - dy)),
            (x0 + 1, y0, dx * (1 - dy)),
            (x0, y0 + 1, (1 - dx) * dy),
            (x0 + 1, y0 + 1, dx * dy),
        ]:
            if 0 <= xi < w and 0 <= yi < h:
                acc += wt * img[yi, xi]
        out[i] = acc
    return out


class TestPointSample:
    def test_matches_reference_bilinear(self, rng):
        img = rng.randn(7, 11).astype(np.float32)
        pts = rng.uniform(0, 1, size=(50, 2)).astype(np.float32)
        got = point_sample(jnp.asarray(img[None]), jnp.asarray(pts))[0]
        want = np_grid_sample(img, pts)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_center_of_pixel_exact(self):
        img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
        # center of pixel (row 1, col 2): x=(2+0.5)/4, y=(1+0.5)/3
        pts = jnp.array([[2.5 / 4, 1.5 / 3]])
        got = point_sample(img[None], pts)
        np.testing.assert_allclose(got, [[6.0]], atol=1e-6)

    def test_outside_is_zero(self):
        img = jnp.ones((4, 4))
        # far outside → fully padded
        pts = jnp.array([[-1.0, -1.0], [2.0, 2.0]])
        got = point_sample(img[None], pts)
        np.testing.assert_allclose(got, [[0.0, 0.0]], atol=1e-6)

    def test_per_mask_points(self, rng):
        imgs = rng.randn(3, 5, 5).astype(np.float32)
        pts = rng.uniform(0, 1, size=(3, 7, 2)).astype(np.float32)
        got = point_sample(jnp.asarray(imgs), jnp.asarray(pts))
        for i in range(3):
            want = np_grid_sample(imgs[i], pts[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


class TestHungarian:
    @pytest.mark.parametrize("r,c", [(5, 5), (7, 10), (1, 4), (100, 100)])
    def test_optimal_cost_matches_scipy(self, rng, r, c):
        cost = rng.randn(r, c).astype(np.float32) * 10
        assign = hungarian_assign(jnp.asarray(cost), jnp.int32(r))
        assign = np.asarray(assign)
        rows, cols = linear_sum_assignment(cost)
        want = cost[rows, cols].sum()
        matched_cols = np.nonzero(assign >= 0)[0]
        got = cost[assign[matched_cols], matched_cols].sum()
        # every valid row matched exactly once
        assert sorted(assign[matched_cols]) == list(range(r))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_padded_rows_ignored(self, rng):
        cost = rng.randn(10, 12).astype(np.float32)
        num_valid = 4
        assign = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.int32(num_valid)))
        matched = assign[assign >= 0]
        assert len(matched) == num_valid
        assert matched.max() < num_valid
        rows, cols = linear_sum_assignment(cost[:num_valid])
        want = cost[rows, cols].sum()
        matched_cols = np.nonzero(assign >= 0)[0]
        got = cost[assign[matched_cols], matched_cols].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_zero_valid_rows(self, rng):
        cost = rng.randn(5, 8).astype(np.float32)
        assign = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.int32(0)))
        assert (assign == -1).all()

    def test_batched(self, rng):
        costs = rng.randn(6, 8, 10).astype(np.float32)
        nums = np.array([0, 1, 3, 8, 8, 5], dtype=np.int32)
        assigns = np.asarray(batched_hungarian(jnp.asarray(costs), jnp.asarray(nums)))
        for b in range(6):
            n = nums[b]
            a = assigns[b]
            if n == 0:
                assert (a == -1).all()
                continue
            rows, cols = linear_sum_assignment(costs[b, :n])
            want = costs[b, :n][rows, cols].sum()
            mc = np.nonzero(a >= 0)[0]
            got = costs[b][a[mc], mc].sum()
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


class TestDeformAttn:
    def test_matches_naive_reference(self, rng):
        b, nh, d, q, npts = 2, 4, 8, 6, 4
        shapes = [(6, 8), (3, 4), (2, 2)]
        s = sum(h * w for h, w in shapes)
        value = rng.randn(b, s, nh, d).astype(np.float32)
        locs = rng.uniform(-0.1, 1.1, size=(b, q, nh, len(shapes), npts, 2)).astype(
            np.float32
        )
        wraw = rng.rand(b, q, nh, len(shapes), npts).astype(np.float32)
        w = wraw / wraw.reshape(b, q, nh, -1).sum(-1).reshape(b, q, nh, 1, 1)

        got = np.asarray(
            ms_deform_attn(
                jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
            )
        )

        # naive reference: loop over every sampling point
        want = np.zeros((b, q, nh * d), dtype=np.float64)
        offs = np.cumsum([0] + [h * ww for h, ww in shapes])
        for bi in range(b):
            for qi in range(q):
                for hi in range(nh):
                    acc = np.zeros(d)
                    for li, (hh, ww) in enumerate(shapes):
                        vmap_l = value[bi, offs[li] : offs[li + 1], hi].reshape(
                            hh, ww, d
                        )
                        for pi in range(npts):
                            x, y = locs[bi, qi, hi, li, pi]
                            sampled = np.stack(
                                [
                                    np_grid_sample(vmap_l[:, :, di], [(x, y)])[0]
                                    for di in range(d)
                                ]
                            )
                            acc += w[bi, qi, hi, li, pi] * sampled
                    want[bi, qi, hi * d : (hi + 1) * d] = acc
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestResize:
    def test_upsample_matches_torch_semantics(self):
        # F.interpolate(align_corners=False) golden values, computed by hand:
        # input [[0, 1], [2, 3]] -> 4x4 half-pixel-center bilinear
        x = jnp.array([[[0.0, 1.0], [2.0, 3.0]]])
        got = np.asarray(bilinear_resize(x, 4, 4))[0]
        import torch
        import torch.nn.functional as F

        want = (
            F.interpolate(
                torch.tensor([[[[0.0, 1.0], [2.0, 3.0]]]]),
                size=(4, 4),
                mode="bilinear",
                align_corners=False,
            )[0, 0]
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_downsample_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.randn(2, 3, 16, 20).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), 5, 7))
        want = F.interpolate(
            torch.from_numpy(x), size=(5, 7), mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSinePositional:
    def test_matches_mmdet_formula(self):
        # independent numpy recomputation of the mmdet formula
        h, w, nf = 5, 7, 8
        import math

        got = np.asarray(sine_positional_encoding_2d(h, w, num_feats=nf))
        eps, scale, temp = 1e-6, 2 * math.pi, 10000.0
        y = np.cumsum(np.ones((h, w)), axis=0)
        x = np.cumsum(np.ones((h, w)), axis=1)
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
        dim_t = temp ** (2 * (np.arange(nf) // 2) / nf)
        pos_x = x[:, :, None] / dim_t
        pos_y = y[:, :, None] / dim_t
        pos_x = np.stack(
            [np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
        ).reshape(h, w, nf)
        pos_y = np.stack(
            [np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
        ).reshape(h, w, nf)
        want = np.concatenate([pos_y, pos_x], axis=2).transpose(2, 0, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_table_1d(self):
        tab = sinusoidal_table_1d(10, 6)
        assert tab.shape == (10, 6)
        np.testing.assert_allclose(tab[0, 0::2], 0.0, atol=1e-7)  # sin(0)
        np.testing.assert_allclose(tab[0, 1::2], 1.0, atol=1e-7)  # cos(0)


class TestUncertainty:
    def test_shapes_and_determinism(self, rng):
        logits = jnp.asarray(rng.randn(4, 16, 16).astype(np.float32))
        key = jax.random.PRNGKey(0)
        pts = get_uncertain_point_coords_with_randomness(key, logits, 64)
        assert pts.shape == (4, 64, 2)
        assert (np.asarray(pts) >= 0).all() and (np.asarray(pts) <= 1).all()
        pts2 = get_uncertain_point_coords_with_randomness(key, logits, 64)
        np.testing.assert_array_equal(np.asarray(pts), np.asarray(pts2))

    def test_prefers_uncertain_points(self):
        # sharp logits everywhere except a low-|logit| stripe
        logits = jnp.full((1, 32, 32), 20.0)
        logits = logits.at[:, 8:24, :].set(0.05)
        pts = get_uncertain_point_coords_with_randomness(
            jax.random.PRNGKey(1), logits, 128
        )
        ys = np.asarray(pts)[0, :96, 1]  # importance-sampled 75%
        # stripe covers half the image but should dominate the top-96
        frac_in_stripe = ((ys > 8 / 32) & (ys < 24 / 32)).mean()
        assert frac_in_stripe > 0.8


class TestMask2Bbox:
    def test_boxes(self):
        m = np.zeros((3, 8, 10), dtype=bool)
        m[0, 2:5, 3:7] = True
        m[1, 0, 0] = True
        got = np.asarray(mask2bbox(jnp.asarray(m)))
        np.testing.assert_allclose(got[0], [3, 2, 7, 5])
        np.testing.assert_allclose(got[1], [0, 0, 1, 1])
        np.testing.assert_allclose(got[2], [0, 0, 0, 0])
