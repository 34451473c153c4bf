"""COCO RLE mask utilities: native C++ codec with a numpy fallback.

TPU-framework replacement for pycocotools ``maskUtils`` (reference
open_set/datasets/pipelines/loading.py:118-130, cocoeval.py:7; pycocotools
is not available in this environment). Provides:

- encode/decode between binary masks and COCO RLE dicts
  ({'size': [h, w], 'counts': <LEB128-ish string>}),
- polygon -> binary mask rasterization (cv2.fillPoly),
- area, bbox, pairwise IoU with crowd semantics, merge,
- the COCO compressed-counts string codec (delta + 6-bit varint).

The hot paths (run codec, pairwise IoU) call native/librle.so via ctypes;
``make -C native`` builds it. A pure-numpy fallback keeps everything
working without the native build (slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

RLE = Dict[str, object]  # {'size': [h, w], 'counts': str | list[int]}

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "librle.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
    lib.rle_iou.restype = None
    lib.rle_iou.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


# ---------------------------------------------------------------- counts


def counts_from_mask(mask: np.ndarray) -> np.ndarray:
    """Binary mask (h, w) -> run counts (column-major, zeros first)."""
    flat = np.asfortranarray(mask.astype(np.uint8)).ravel(order="F")
    lib = _load_native()
    if lib is not None:
        out = np.empty(flat.size + 1, dtype=np.uint32)
        m = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            flat.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return out[:m].copy()
    # numpy fallback
    changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(boundaries).astype(np.uint32)
    if flat.size and flat[0] == 1:
        runs = np.concatenate([[np.uint32(0)], runs])
    return runs


def mask_from_counts(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.asarray(counts, dtype=np.uint32)
    n = h * w
    lib = _load_native()
    if lib is not None:
        out = np.empty(n, dtype=np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            counts.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
        )
        return out.reshape((h, w), order="F")
    vals = np.zeros(counts.size, dtype=np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size < n:
        flat = np.concatenate([flat, np.zeros(n - flat.size, np.uint8)])
    return flat[:n].reshape((h, w), order="F")


# ----------------------------------------------------------- string codec


def counts_to_string(counts: Sequence[int]) -> str:
    """COCO compressed counts: delta (from i-2) + 6-bit signed varint."""
    chars: List[str] = []
    counts = list(int(c) for c in counts)
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            chars.append(chr(c + 48))
    return "".join(chars)


def string_to_counts(s: Union[str, bytes]) -> np.ndarray:
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, dtype=np.uint32)


# ------------------------------------------------------------- public API


def encode(mask: np.ndarray) -> RLE:
    """Binary (h, w) mask -> RLE dict with compressed string counts."""
    h, w = mask.shape
    return {
        "size": [int(h), int(w)],
        "counts": counts_to_string(counts_from_mask(mask)),
    }


def decode(rle: RLE) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(counts)
    return mask_from_counts(np.asarray(counts, np.uint32), int(h), int(w))


def area(rle: RLE) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(counts)
    counts = np.asarray(counts, np.uint32)
    return int(counts[1::2].sum())


def to_bbox(rle: RLE) -> np.ndarray:
    """RLE -> (x, y, w, h)."""
    mask = decode(rle)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4, np.float64)
    return np.array(
        [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1],
        np.float64,
    )


def merge(rles: Sequence[RLE], intersect: bool = False) -> RLE:
    if not rles:
        raise ValueError("empty merge")
    acc = decode(rles[0]).astype(bool)
    for r in rles[1:]:
        m = decode(r).astype(bool)
        acc = acc & m if intersect else acc | m
    return encode(acc.astype(np.uint8))


def iou(
    dts: Sequence[Union[RLE, np.ndarray]],
    gts: Sequence[Union[RLE, np.ndarray]],
    iscrowd: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Pairwise IoU (n_dt, n_gt). Accepts RLE dicts or (n,4) xywh boxes."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    if isinstance(dts[0], (list, tuple, np.ndarray)):
        return _bbox_iou(np.asarray(dts), np.asarray(gts), iscrowd)

    def to_counts(r):
        c = r["counts"]
        if isinstance(c, (str, bytes)):
            c = string_to_counts(c)
        return np.asarray(c, np.uint32)

    dt_counts = [to_counts(r) for r in dts]
    gt_counts = [to_counts(r) for r in gts]
    crowd = np.asarray(
        iscrowd if iscrowd is not None else [0] * len(gts), np.uint8
    )

    lib = _load_native()
    if lib is not None:
        dcat = np.concatenate(dt_counts).astype(np.uint32)
        gcat = np.concatenate(gt_counts).astype(np.uint32)
        doff = np.cumsum([0] + [c.size for c in dt_counts[:-1]]).astype(np.int64)
        goff = np.cumsum([0] + [c.size for c in gt_counts[:-1]]).astype(np.int64)
        dlen = np.array([c.size for c in dt_counts], np.int64)
        glen = np.array([c.size for c in gt_counts], np.int64)
        out = np.zeros(len(dts) * len(gts), np.float64)
        lib.rle_iou(
            dcat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            doff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dlen.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(dts),
            gcat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            goff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            glen.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(gts),
            crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.reshape(len(dts), len(gts))

    # numpy fallback via decode
    out = np.zeros((len(dts), len(gts)))
    dms = [decode(r).astype(bool) for r in dts]
    gms = [decode(r).astype(bool) for r in gts]
    for d, dm in enumerate(dms):
        for g, gm in enumerate(gms):
            inter = np.logical_and(dm, gm).sum()
            if crowd[g]:
                denom = dm.sum()
            else:
                denom = np.logical_or(dm, gm).sum()
            out[d, g] = inter / denom if denom > 0 else 0.0
    return out


def _bbox_iou(dt: np.ndarray, gt: np.ndarray, iscrowd) -> np.ndarray:
    """xywh box IoU with crowd semantics (pycocotools bbIou contract)."""
    crowd = np.asarray(iscrowd if iscrowd is not None else [0] * len(gt), bool)
    out = np.zeros((len(dt), len(gt)))
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    darea = dt[:, 2] * dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    garea = gt[:, 2] * gt[:, 3]
    for g in range(len(gt)):
        iw = np.minimum(dx2, gx2[g]) - np.maximum(dx1, gx1[g])
        ih = np.minimum(dy2, gy2[g]) - np.maximum(dy1, gy1[g])
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        denom = darea if crowd[g] else darea + garea[g] - inter
        out[:, g] = np.where(denom > 0, inter / denom, 0.0)
    return out


def polygons_to_mask(polygons: Sequence[Sequence[float]], h: int, w: int) -> np.ndarray:
    """Rasterize COCO polygon segmentation to a binary (h, w) mask."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def segmentation_to_mask(seg, h: int, w: int) -> np.ndarray:
    """Any COCO segmentation (polygons / RLE dict / uncompressed) -> mask."""
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    if isinstance(seg, dict):
        if isinstance(seg.get("counts"), list):  # uncompressed RLE
            return mask_from_counts(
                np.asarray(seg["counts"], np.uint32), h, w
            )
        return decode(seg)
    raise TypeError(f"unsupported segmentation type {type(seg)}")
