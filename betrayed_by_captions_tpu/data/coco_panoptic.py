"""Open-set panoptic COCO dataset (OSPS task).

TPU-native equivalent of the reference ``CocoPanopticDatasetOpen``
(open_set/datasets/coco_panoptic_open.py:120-680). Behavior contract:

- panoptic annotations: per image a png of segment ids + segments_info,
- training GT merges thing segments (per instance) and stuff segments
  (per class) into unified (labels, masks) — the host-side equivalent of
  mmdet's preprocess_panoptic_gt consumed at mask2former_head.py:903,
- unknown (novel) thing classes carry no training annotations
  (reference :331-340); labels are contiguous in class-bank order:
  known things first, then stuff,
- captions handled as in the instance dataset,
- evaluation: predicted panoptic id maps (label + instance*1e6) are
  converted to COCO panoptic format and scored with the open-set PQ
  evaluator split into Known Things / Stuff / Unknown Things
  (reference :560-680).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.class_banks import read_split
from .coco_api import COCOJson
from .panoptic_codec import VOID, id2rgb, rgb2id
from .tokenizer import load_tokenizer
from .parser import build_parser
from .transforms import TestTransform, TrainTransform

INSTANCE_OFFSET = 1000000
MAX_TOKENS = 35


class CocoPanopticDatasetOpen:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        seg_prefix: str = "",
        caption_ann_file: Optional[str] = None,
        known_file: Optional[str] = None,
        unknown_file: Optional[str] = None,
        class_agnostic: bool = False,
        test_mode: bool = False,
        train_transform: Optional[TrainTransform] = None,
        test_transform: Optional[TestTransform] = None,
        nouns_parser: str = "lvis",
        seed: int = 0,
    ):
        self.coco = COCOJson(ann_file)
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix
        self.class_agnostic = class_agnostic
        self.test_mode = test_mode
        # per-item RNGs derived from (seed, epoch, idx) in get_train_sample:
        # thread-safe and schedule-independent (see data/coco.py)
        self.seed = seed
        self.epoch = 0

        self.coco_caption = COCOJson(caption_ann_file) if caption_ann_file else None
        if self.coco_caption is not None:
            self.tokenizer = load_tokenizer()
            self.parser = build_parser(nouns_parser)

        cats = self.coco.dataset.get("categories", [])
        self.categories = {c["id"]: c for c in cats}
        self.thing_ids = [c["id"] for c in cats if c.get("isthing", 0) == 1]
        self.stuff_ids = [c["id"] for c in cats if c.get("isthing", 0) == 0]

        known = set(read_split(known_file)) if known_file else None
        unknown = set(read_split(unknown_file)) if unknown_file else set()
        self.unknown_cat_ids = [
            c["id"] for c in cats if c["name"] in unknown
        ]
        self.known_thing_ids = [
            cid
            for cid in self.thing_ids
            if cid not in self.unknown_cat_ids
            and (known is None or self.categories[cid]["name"] in known)
        ]
        # training label order: known things, then stuff
        self.train_cat_order = self.known_thing_ids + self.stuff_ids
        self.cat2label = {c: i for i, c in enumerate(self.train_cat_order)}
        self.num_known_things = len(self.known_thing_ids)
        self.num_stuff = len(self.stuff_ids)

        # panoptic annotations are one per image
        self.img_ids = self.coco.get_img_ids()
        self.data_infos = self.coco.load_imgs(self.img_ids)
        self.pan_anns = {
            a["image_id"]: a for a in self.coco.dataset.get("annotations", [])
        }

        self.train_transform = train_transform or TrainTransform()
        self.test_transform = test_transform or TestTransform()

    def __len__(self):
        return len(self.img_ids)

    # -------------------------------------------------------------- loading
    def _load_image(self, info: dict) -> np.ndarray:
        import cv2

        path = os.path.join(self.img_prefix, info.get("file_name", ""))
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _load_pan_map(self, ann: dict) -> np.ndarray:
        import cv2

        path = os.path.join(self.seg_prefix, ann["file_name"])
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(path)
        return rgb2id(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))

    def parse_panoptic_gt(self, img_id: int):
        """Merge thing instances + per-class stuff into (masks, labels)."""
        ann = self.pan_anns[img_id]
        pan = self._load_pan_map(ann)
        masks: List[np.ndarray] = []
        labels: List[int] = []
        stuff_masks: Dict[int, np.ndarray] = {}
        for seg in ann["segments_info"]:
            cid = seg["category_id"]
            if seg.get("iscrowd", 0):
                continue
            m = (pan == seg["id"]).astype(np.uint8)
            if not m.any():
                continue
            if cid in self.cat2label and cid in self.known_thing_ids:
                label = 0 if self.class_agnostic else self.cat2label[cid]
                masks.append(m)
                labels.append(label)
            elif cid in self.stuff_ids:
                stuff_masks[cid] = stuff_masks.get(cid, 0) | m
            # unknown things: dropped at training time
        for cid, m in stuff_masks.items():
            if self.class_agnostic:
                continue  # agnostic pretrain uses things only
            masks.append(m.astype(np.uint8))
            labels.append(self.cat2label[cid])
        if masks:
            return np.stack(masks), np.asarray(labels, np.int32)
        h, w = pan.shape
        return np.zeros((0, h, w), np.uint8), np.zeros((0,), np.int32)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def get_train_sample(self, idx: int) -> Dict[str, np.ndarray]:
        img_id = self.img_ids[idx]
        info = self.data_infos[idx]
        image = self._load_image(info)
        masks, labels = self.parse_panoptic_gt(img_id)
        rng = np.random.RandomState(
            np.uint32(self.seed * 1000003 + self.epoch * 9176 + idx)
        )
        sample = self.train_transform(image, masks, labels, rng)
        if self.coco_caption is not None:
            anns = self.coco_caption.img_to_anns.get(img_id, [])
            caption = (
                anns[rng.randint(0, len(anns))]["caption"] if anns else ""
            )
            nouns, _ = self.parser.parse(caption)
            ids, mask = self.tokenizer.encode(caption, MAX_TOKENS)
            n_ids, n_mask = self.tokenizer.encode(
                " ".join(sorted(set(nouns))), MAX_TOKENS, add_special_tokens=False
            )
        else:
            ids = mask = n_ids = n_mask = [0] * MAX_TOKENS
        sample.update(
            caption_ids=np.asarray(ids, np.int32),
            caption_mask=np.asarray(mask, np.int32),
            caption_nouns_ids=np.asarray(n_ids, np.int32),
            caption_nouns_mask=np.asarray(n_mask, np.int32),
        )
        return sample

    def __getitem__(self, idx: int):
        if self.test_mode:
            info = self.data_infos[idx]
            image = self._load_image(info)
            padded, meta = self.test_transform(image)
            meta["img_id"] = self.img_ids[idx]
            return padded, meta
        return self.get_train_sample(idx)

    # ------------------------------------------------------------- results
    def pan_to_segments(
        self, pan_label_map: np.ndarray, label_to_cat_id: Sequence[int]
    ) -> Tuple[np.ndarray, List[dict]]:
        """Convert a fusion-head panoptic map (label + inst*1e6, background =
        len(label_to_cat_id)) into (segment-id map, segments_info)
        (reference _pan2json, coco_panoptic_open.py:512-558)."""
        num_classes = len(label_to_cat_id)
        out = np.zeros_like(pan_label_map, dtype=np.int64)
        segments: List[dict] = []
        next_id = 1
        for pan_id in np.unique(pan_label_map):
            label = int(pan_id) % INSTANCE_OFFSET
            if label == num_classes:
                continue  # void/background
            seg_mask = pan_label_map == pan_id
            out[seg_mask] = next_id
            segments.append(
                {
                    "id": next_id,
                    "category_id": int(label_to_cat_id[label]),
                    "area": int(seg_mask.sum()),
                }
            )
            next_id += 1
        return out, segments

    def evaluate_pq(
        self,
        pred_maps: Sequence[np.ndarray],  # fusion panoptic maps, ori res
        label_to_cat_id: Sequence[int],
    ) -> Dict[str, float]:
        """Open-set PQ over Known Things / Stuff / Unknown Things."""
        from ..evaluation.pq import PQStat, pq_compute_image

        total = PQStat()
        for idx, pred in enumerate(pred_maps):
            img_id = self.img_ids[idx]
            ann = self.pan_anns[img_id]
            gt_map = self._load_pan_map(ann)
            pred_ids, pred_segments = self.pan_to_segments(pred, label_to_cat_id)
            total += pq_compute_image(
                gt_map, pred_ids, ann["segments_info"], pred_segments
            )

        out: Dict[str, float] = {}
        splits = {
            "known_things": dict(isthing=True, isunknown=False),
            "unknown_things": dict(isthing=True, isunknown=True),
            "stuff": dict(isthing=False, isunknown=None),
            "all": dict(isthing=None, isunknown=None),
        }
        for name, kw in splits.items():
            res, _ = total.pq_average(
                self.categories, unknown_cat_ids=self.unknown_cat_ids, **kw
            )
            for k in ("pq", "sq", "rq", "precision", "recall"):
                out[f"{name}.{k}"] = res[k] * 100
            out[f"{name}.n"] = res["n"]
        return out
