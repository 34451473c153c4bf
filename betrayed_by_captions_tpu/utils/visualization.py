"""Detection/segmentation visualization (host-side, cv2-based).

TPU-framework equivalent of the reference's visualization module
(open_set/core/visualization/image.py:25-565: imshow_det_bboxes,
draw_masks/bboxes/labels and the detector's show_result,
maskformer.py:228-382). cv2 drawing instead of matplotlib patches keeps
it dependency-light; panoptic maps get a stable per-segment palette.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

EPS = 1e-2


def _palette(n: int, seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.randint(0, 255, size=(max(n, 1), 3)).astype(np.uint8)


def draw_instances(
    image: np.ndarray,  # (H, W, 3) RGB uint8
    boxes: Optional[np.ndarray] = None,  # (N, 4) xyxy
    labels: Optional[np.ndarray] = None,  # (N,)
    scores: Optional[np.ndarray] = None,  # (N,)
    masks: Optional[np.ndarray] = None,  # (N, H, W) bool
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.3,
    alpha: float = 0.5,
    thickness: int = 2,
) -> np.ndarray:
    """Draw instance results on a copy of the image."""
    import cv2

    out = image.copy()
    n = len(boxes) if boxes is not None else len(masks)
    keep = np.arange(n)
    if scores is not None:
        keep = keep[np.asarray(scores)[keep] >= score_thr]
    colors = _palette(int(np.max(labels)) + 1 if labels is not None else n)

    for i in keep:
        color = tuple(
            int(c) for c in colors[int(labels[i]) if labels is not None else i]
        )
        if masks is not None:
            m = np.asarray(masks[i]).astype(bool)
            overlay = out.copy()
            overlay[m] = color
            out = cv2.addWeighted(out, 1 - alpha, overlay, alpha, 0)
        if boxes is not None:
            x1, y1, x2, y2 = [int(v) for v in boxes[i]]
            cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
            text = ""
            if class_names is not None and labels is not None:
                text = str(class_names[int(labels[i])])
            if scores is not None:
                text = f"{text}|{float(scores[i]):.02f}"
            if text:
                cv2.putText(
                    out,
                    text,
                    (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX,
                    0.5,
                    color,
                    1,
                    cv2.LINE_AA,
                )
    return out


def draw_panoptic(
    image: np.ndarray,  # (H, W, 3) RGB uint8
    panoptic_map: np.ndarray,  # (H, W) label + instance * 1e6
    num_classes: int,
    class_names: Optional[Sequence[str]] = None,
    alpha: float = 0.5,
) -> np.ndarray:
    """Color a fusion-head panoptic map over the image."""
    import cv2

    out = image.copy()
    ids = [i for i in np.unique(panoptic_map) if (i % 1000000) != num_classes]
    colors = _palette(len(ids))
    overlay = out.copy()
    for idx, seg_id in enumerate(ids):
        overlay[panoptic_map == seg_id] = colors[idx]
    out = cv2.addWeighted(out, 1 - alpha, overlay, alpha, 0)
    if class_names is not None:
        for seg_id in ids:
            label = int(seg_id % 1000000)
            ys, xs = np.nonzero(panoptic_map == seg_id)
            if len(xs) == 0:
                continue
            cv2.putText(
                out,
                str(class_names[label]),
                (int(xs.mean()), int(ys.mean())),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.5,
                (255, 255, 255),
                1,
                cv2.LINE_AA,
            )
    return out


def show_result(
    image: np.ndarray,
    result: Dict,
    class_names: Optional[Sequence[str]] = None,
    eval_type: str = "all_results",
    score_thr: float = 0.3,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Render a Detector result dict (evaluation/inference.py)."""
    import cv2

    res = result[eval_type]
    drawn = draw_instances(
        image,
        boxes=np.asarray(res["boxes"]),
        labels=np.asarray(res["labels"]),
        scores=np.asarray(res["scores"]),
        masks=np.asarray(res["masks"]),
        class_names=class_names,
        score_thr=score_thr,
    )
    caption = result.get("caption")
    if caption:
        cv2.putText(
            drawn,
            caption,
            (10, drawn.shape[0] - 10),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.6,
            (255, 255, 255),
            2,
            cv2.LINE_AA,
        )
    if out_file:
        cv2.imwrite(out_file, cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
    return drawn
