"""Panoptic PNG id codec (numpy port of the panopticapi convention).

The COCO panoptic format stores segment ids in RGB pngs as
``id = R + 256*G + 256^2*B`` with VOID = 0 (referenced at
open_set/datasets/pipelines/loading.py:13-16 and
open_set/datasets/coco_panoptic_open.py:25-32; panopticapi is not
available in this environment).
"""

from __future__ import annotations

import numpy as np

VOID = 0
OFFSET = 256 ** 3


def rgb2id(color: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) int64 segment ids."""
    color = color.astype(np.uint32)
    return (
        color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]
    ).astype(np.int64)


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    """(H, W) int -> (H, W, 3) uint8."""
    id_map = id_map.astype(np.uint32)
    rgb = np.zeros(id_map.shape + (3,), np.uint8)
    rgb[..., 0] = id_map % 256
    rgb[..., 1] = (id_map // 256) % 256
    rgb[..., 2] = (id_map // (256 * 256)) % 256
    return rgb
