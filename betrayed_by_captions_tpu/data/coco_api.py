"""Minimal COCO annotation API (pycocotools.coco.COCO is unavailable).

Index-only reimplementation of the pycocotools COCO access patterns the
framework needs (reference uses mmdet's COCO wrapper,
open_set/datasets/coco_open.py:139-179): annotation/image/category lookup
by id, image->annotation maps, category name queries, plus caption files.
Pure python over the json; no C dependencies.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence


class COCOJson:
    def __init__(self, annotation_file: Optional[str] = None, dataset=None):
        if annotation_file is not None:
            with open(annotation_file) as f:
                dataset = json.load(f)
        self.dataset = dataset or {}
        self.anns: Dict[int, dict] = {}
        self.imgs: Dict[int, dict] = {}
        self.cats: Dict[int, dict] = {}
        self.img_to_anns: Dict[int, List[dict]] = defaultdict(list)
        self.cat_img_map: Dict[int, List[int]] = defaultdict(list)
        self._index()

    def _index(self):
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat
        for i, ann in enumerate(self.dataset.get("annotations", [])):
            # panoptic-style annotations carry no per-annotation id
            ann_id = ann.get("id", -(i + 1))
            self.anns[ann_id] = ann
            self.img_to_anns[ann["image_id"]].append(ann)
            if "category_id" in ann:
                self.cat_img_map[ann["category_id"]].append(ann["image_id"])

    # -- pycocotools-compatible query surface -----------------------------
    def get_img_ids(self) -> List[int]:
        return list(self.imgs.keys())

    def get_cat_ids(self, cat_names: Optional[Sequence[str]] = None) -> List[int]:
        if cat_names is None:
            return list(self.cats.keys())
        names = [n for n in cat_names if n]
        return [c["id"] for c in self.cats.values() if c["name"] in names]

    def get_ann_ids(
        self,
        img_ids: Optional[Sequence[int]] = None,
        cat_ids: Optional[Sequence[int]] = None,
    ) -> List[int]:
        if img_ids is not None:
            anns = [a for i in img_ids for a in self.img_to_anns.get(i, [])]
        else:
            anns = list(self.anns.values())
        if cat_ids is not None:
            cat_set = set(cat_ids)
            anns = [a for a in anns if a.get("category_id") in cat_set]
        return [a["id"] for a in anns]

    def load_anns(self, ids: Sequence[int]) -> List[dict]:
        return [self.anns[i] for i in ids]

    def load_imgs(self, ids: Sequence[int]) -> List[dict]:
        return [self.imgs[i] for i in ids]

    def load_cats(self, ids: Sequence[int]) -> List[dict]:
        return [self.cats[i] for i in ids]
