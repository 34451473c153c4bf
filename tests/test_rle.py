"""Property + golden tests for the RLE codec and IoU (SURVEY.md §4)."""

import numpy as np
import pytest

from betrayed_by_captions_tpu.evaluation import rle


class TestRoundTrip:
    @pytest.mark.parametrize("seed", range(5))
    def test_encode_decode_roundtrip(self, seed):
        rs = np.random.RandomState(seed)
        mask = (rs.rand(37, 53) > 0.6).astype(np.uint8)
        np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)

    def test_empty_and_full(self):
        for mask in (np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8)):
            np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)

    def test_string_codec_roundtrip(self):
        rs = np.random.RandomState(1)
        counts = rs.randint(0, 10000, 101).astype(np.uint32)
        s = rle.counts_to_string(counts)
        back = rle.string_to_counts(s)
        np.testing.assert_array_equal(back, counts)

    def test_area(self):
        mask = np.zeros((10, 10), np.uint8)
        mask[2:5, 3:9] = 1
        assert rle.area(rle.encode(mask)) == 18


class TestIoU:
    def test_mask_iou_matches_dense(self):
        rs = np.random.RandomState(0)
        dts = [(rs.rand(20, 30) > 0.5).astype(np.uint8) for _ in range(4)]
        gts = [(rs.rand(20, 30) > 0.5).astype(np.uint8) for _ in range(3)]
        got = rle.iou([rle.encode(m) for m in dts], [rle.encode(m) for m in gts])
        want = np.zeros((4, 3))
        for d in range(4):
            for g in range(3):
                i = np.logical_and(dts[d], gts[g]).sum()
                u = np.logical_or(dts[d], gts[g]).sum()
                want[d, g] = i / u
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_crowd_semantics(self):
        dt = np.zeros((10, 10), np.uint8)
        dt[0:5, 0:10] = 1  # area 50
        gt = np.ones((10, 10), np.uint8)  # area 100, fully contains dt
        got = rle.iou([rle.encode(dt)], [rle.encode(gt)], iscrowd=[1])
        np.testing.assert_allclose(got, [[1.0]])  # I/area(dt) = 50/50
        got2 = rle.iou([rle.encode(dt)], [rle.encode(gt)], iscrowd=[0])
        np.testing.assert_allclose(got2, [[0.5]])

    def test_bbox_iou(self):
        dt = np.array([[0, 0, 10, 10]], np.float64)
        gt = np.array([[5, 5, 10, 10], [0, 0, 10, 10]], np.float64)
        got = rle.iou(dt, gt)
        np.testing.assert_allclose(got[0, 1], 1.0)
        np.testing.assert_allclose(got[0, 0], 25 / 175)


class TestPolygons:
    def test_rectangle_polygon(self):
        # rectangle covering x in [2,6], y in [3,8]
        poly = [[2, 3, 6, 3, 6, 8, 2, 8]]
        mask = rle.polygons_to_mask(poly, 12, 10)
        assert mask[5, 4] == 1
        assert mask[0, 0] == 0
        assert mask.sum() >= 20  # filled interior

    def test_merge(self):
        a = np.zeros((6, 6), np.uint8)
        a[:3] = 1
        b = np.zeros((6, 6), np.uint8)
        b[3:] = 1
        merged = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
        assert merged.all()
