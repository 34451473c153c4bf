"""ADE20K cross-dataset open-vocabulary evaluation dataset.

TPU equivalent of the reference ``ADE20KDataset``
(open_set/datasets/ade20k.py:12-145): COCO-format ADE20K validation
annotations (100 instance classes), evaluated open-vocabulary with the
ADE20K class-name embedding bank (all classes 'novel' w.r.t. COCO
training). Reuses the CocoDatasetOpen machinery; the class list comes
from the annotation file's categories.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .coco import CocoDatasetOpen


class ADE20KDataset(CocoDatasetOpen):
    """COCO-format ADE20K val; no base/novel split (everything evaluated)."""

    def __init__(self, ann_file: str, img_prefix: str = "", **kwargs):
        kwargs.setdefault("known_file", None)
        kwargs.setdefault("unknown_file", None)
        kwargs.setdefault("test_mode", True)
        super().__init__(ann_file, img_prefix=img_prefix, **kwargs)

    def evaluate_open_vocab(
        self, per_image_results: List[dict], bank_names: Sequence[str]
    ) -> Dict[str, float]:
        """Cross-dataset eval: all classes via the 'all' bank (reference
        ade20k.py:86-145 uses standard COCO metrics over 100 classes)."""
        return self.evaluate(
            {"all_results": per_image_results},
            {"all_results": list(bank_names)},
            metrics=("segm", "bbox"),
        )
