"""Open-vocabulary COCO dataset: instances + captions, base/novel splits.

TPU-native equivalent of the reference ``CocoDatasetOpen``
(open_set/datasets/coco_open.py:34-781). Behavior contract:

- categories are filtered to known classes; unknown (novel) classes carry
  NO annotations at training time (reference :278-282),
- ``cat2label`` maps known-minus-unknown (base) category ids to contiguous
  training labels in embedding-JSON order via the class banks,
- one caption is sampled per image per epoch; object nouns are extracted
  with the LVIS parser; caption and nouns are tokenized to fixed 35-token
  id/mask arrays (reference :326-357),
- train samples come out as fixed-shape arrays (TrainTransform contract);
  test samples as padded images + meta.

CPU-hot-spot redesign (SURVEY.md §3.1): the reference runs spaCy per
sample inside dataloader workers; here noun parsing is memoized per
caption string and captions are tokenized with the self-contained
WordPiece tokenizer.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..evaluation import rle as rle_codec
from ..models.class_banks import read_split
from .coco_api import COCOJson
from .parser import build_parser
from .tokenizer import WordPieceTokenizer, load_tokenizer
from .transforms import TestTransform, TrainTransform

MAX_TOKENS = 35


class CocoDatasetOpen:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        caption_ann_file: Optional[str] = None,
        known_file: Optional[str] = None,
        unknown_file: Optional[str] = None,
        class_agnostic: bool = False,
        nouns_parser: str = "lvis",
        test_mode: bool = False,
        filter_empty_gt: bool = False,
        train_transform: Optional[TrainTransform] = None,
        test_transform: Optional[TestTransform] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        eval_types: Sequence[str] = ("all_results", "novel_results", "base_results"),
        seed: int = 0,
    ):
        self.coco = COCOJson(ann_file)
        self.img_prefix = img_prefix
        self.class_agnostic = class_agnostic
        self.test_mode = test_mode
        self.eval_types = tuple(eval_types)
        # per-item RNGs are derived from (seed, epoch, idx) in
        # get_train_sample — stateless, so thread-pool workers never share
        # RandomState (np RandomState is not thread-safe) and sampling is
        # reproducible regardless of worker scheduling
        self.seed = seed
        self.epoch = 0

        self.coco_caption = (
            COCOJson(caption_ann_file) if caption_ann_file else None
        )
        if self.coco_caption is not None or not test_mode:
            self.tokenizer = tokenizer or load_tokenizer()
            self.parser = build_parser(nouns_parser)

        # category id bookkeeping (reference load_annotations, :139-165)
        self.cat_ids = self.coco.get_cat_ids()
        self.all_cat_ids = list(self.cat_ids)
        if known_file:
            known_ids = set(self.coco.get_cat_ids(read_split(known_file)))
            self.all_cat_ids = [c for c in self.cat_ids if c in known_ids]
        self.unknown_cat_ids: List[int] = []
        if unknown_file:
            unk_ids = set(self.coco.get_cat_ids(read_split(unknown_file)))
            self.unknown_cat_ids = [c for c in self.cat_ids if c in unk_ids]
        self.known_cat_ids = [
            c
            for c in self.cat_ids
            if c in self.all_cat_ids and c not in self.unknown_cat_ids
        ]
        self.cat2label = {c: i for i, c in enumerate(self.known_cat_ids)}

        self.img_ids = self.coco.get_img_ids()
        self.data_infos = self.coco.load_imgs(self.img_ids)
        if filter_empty_gt and not test_mode:
            keep = [
                i
                for i, img_id in enumerate(self.img_ids)
                if any(
                    a.get("category_id") in self.cat2label
                    for a in self.coco.img_to_anns.get(img_id, [])
                )
            ]
            self.img_ids = [self.img_ids[i] for i in keep]
            self.data_infos = [self.data_infos[i] for i in keep]

        self.train_transform = train_transform or TrainTransform()
        self.test_transform = test_transform or TestTransform()

    def __len__(self) -> int:
        return len(self.img_ids)

    # ------------------------------------------------------------- loading
    def _load_image(self, info: dict) -> np.ndarray:
        import cv2

        path = os.path.join(self.img_prefix, info.get("file_name", ""))
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def parse_instances(self, img_id: int, info: dict):
        """Decode masks/labels for base-class annotations (reference
        _parse_ann_info, :250-312)."""
        h, w = info["height"], info["width"]
        masks, labels = [], []
        for ann in self.coco.img_to_anns.get(img_id, []):
            if ann.get("ignore", False) or ann.get("iscrowd", False):
                continue
            x1, y1, bw, bh = ann["bbox"]
            if ann.get("area", 0) <= 0 or bw < 1 or bh < 1:
                continue
            cid = ann.get("category_id")
            if cid not in self.cat2label:
                continue  # novel / unlisted classes carry no training anns
            seg = ann.get("segmentation")
            if seg is None:
                continue
            masks.append(rle_codec.segmentation_to_mask(seg, h, w))
            labels.append(0 if self.class_agnostic else self.cat2label[cid])
        if masks:
            return np.stack(masks), np.asarray(labels, np.int32)
        return np.zeros((0, h, w), np.uint8), np.zeros((0,), np.int32)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def sample_caption(
        self, img_id: int, rng: np.random.RandomState
    ) -> Tuple[str, str]:
        anns = self.coco_caption.img_to_anns.get(img_id, [])
        if not anns:
            return "", ""
        caption = anns[rng.randint(0, len(anns))]["caption"]
        nouns, _ = self.parser.parse(caption)
        return caption, " ".join(sorted(set(nouns)))

    def tokenize_caption(self, caption: str, nouns: str):
        """Fixed 35-token arrays (reference parse_caption, :326-357)."""
        ids, mask = self.tokenizer.encode(
            caption, max_length=MAX_TOKENS, add_special_tokens=True
        )
        nouns_ids, nouns_mask = self.tokenizer.encode(
            nouns, max_length=MAX_TOKENS, add_special_tokens=False
        )
        return (
            np.asarray(ids, np.int32),
            np.asarray(mask, np.int32),
            np.asarray(nouns_ids, np.int32),
            np.asarray(nouns_mask, np.int32),
        )

    # ------------------------------------------------------------ getitem
    def get_train_sample(self, idx: int) -> Dict[str, np.ndarray]:
        img_id = self.img_ids[idx]
        info = self.data_infos[idx]
        image = self._load_image(info)
        masks, labels = self.parse_instances(img_id, info)
        # fresh per-(epoch, item) RNG: thread-safe + schedule-independent
        rng = np.random.RandomState(
            np.uint32(self.seed * 1000003 + self.epoch * 9176 + idx)
        )
        sample = self.train_transform(image, masks, labels, rng)
        if self.coco_caption is not None:
            caption, nouns = self.sample_caption(img_id, rng)
            ids, mask, n_ids, n_mask = self.tokenize_caption(caption, nouns)
        else:
            ids = np.zeros((MAX_TOKENS,), np.int32)
            mask = np.zeros((MAX_TOKENS,), np.int32)
            n_ids, n_mask = ids.copy(), mask.copy()
        sample.update(
            caption_ids=ids,
            caption_mask=mask,
            caption_nouns_ids=n_ids,
            caption_nouns_mask=n_mask,
        )
        return sample

    def get_test_sample(self, idx: int):
        info = self.data_infos[idx]
        image = self._load_image(info)
        padded, meta = self.test_transform(image)
        meta["img_id"] = self.img_ids[idx]
        return padded, meta

    def __getitem__(self, idx: int):
        if self.test_mode:
            return self.get_test_sample(idx)
        return self.get_train_sample(idx)

    # ---------------------------------------------------------- evaluation
    def name_to_cat_id(self) -> Dict[str, int]:
        return {c["name"]: c["id"] for c in self.coco.cats.values()}

    def _imgs_with_cats(self, cat_ids: Sequence[int]) -> List[int]:
        """Images containing annotations of the given categories (reference
        _get_valid_imgs, coco_open.py:228-248)."""
        wanted = set(cat_ids)
        return [
            img_id
            for img_id in self.img_ids
            if any(
                a.get("category_id") in wanted
                for a in self.coco.img_to_anns.get(img_id, [])
            )
        ]

    def evaluate(
        self,
        results_per_type: Dict[str, List[dict]],
        class_names_per_type: Dict[str, Sequence[str]],
        metrics: Sequence[str] = ("segm", "bbox"),
    ) -> Dict[str, float]:
        """OVIS/OVOD evaluation (reference evaluate, coco_open.py:474-716).

        Args:
            results_per_type: eval_type -> per-image dicts with keys
                labels/scores/boxes/masks (host-postprocessed, ori res).
            class_names_per_type: eval_type -> bank class-name order, which
                defines the label -> category-id mapping.
        """
        from ..evaluation.ovis import (
            base_novel_all_summary,
            evaluate_coco,
            results_to_coco_json,
        )

        name2id = self.name_to_cat_id()
        out: Dict[str, float] = {}
        for eval_type, per_image in results_per_type.items():
            if eval_type == "cap_results":
                # generated caption strings -> BLEU/CIDEr-D/ROUGE-L vs the
                # GT caption pool (reference eval_cap_results,
                # coco_open.py:745-781)
                out.update(self.eval_cap_results(per_image))
                continue
            if eval_type == "visual":
                # query-embedding dump for analysis (reference
                # save_results, coco_open.py:718-743)
                self.save_embedding_results(per_image)
                continue
            names = class_names_per_type[eval_type]
            label2cat = [name2id[n] for n in names]
            # align results to images via each result's explicit img_id
            # when present (engine/test_loop.py attaches it); positional
            # fallback for callers that pass bare dicts
            res_img_ids = [
                r.get("img_id", self.img_ids[i]) if isinstance(r, dict) else self.img_ids[i]
                for i, r in enumerate(per_image)
            ]
            segm_res, bbox_res = results_to_coco_json(
                per_image, res_img_ids, label2cat
            )
            pred_cats = list(label2cat)
            valid_imgs = self._imgs_with_cats(pred_cats)
            use_summarize = not (self.known_cat_ids and self.unknown_cat_ids)
            for metric in metrics:
                res = segm_res if metric == "segm" else bbox_res
                stats = evaluate_coco(
                    self.coco,
                    res,
                    metric,
                    pred_cats,
                    img_ids=valid_imgs if not self.class_agnostic else None,
                    class_agnostic=self.class_agnostic,
                    use_summarize=use_summarize or self.class_agnostic,
                )
                summary = base_novel_all_summary(
                    stats.pop("classwise_ap50"),
                    self.unknown_cat_ids,
                    self.all_cat_ids,
                )
                prefix = f"{eval_type}.{metric}"
                for k, v in {**stats, **summary}.items():
                    out[f"{prefix}.{k}"] = v
        return out

    def eval_cap_results(self, captions: List[str]) -> Dict[str, float]:
        """Caption metrics for generated sentences, one per image in
        dataset order (reference coco_open.py:745-781)."""
        from ..evaluation.caption_metrics import evaluate_captions

        assert self.coco_caption is not None, "caption_ann_file required"
        candidates: Dict[str, str] = {}
        references: Dict[str, List[str]] = {}
        for idx, sent in enumerate(captions):
            img_id = self.img_ids[idx]
            gts = [
                a["caption"]
                for a in self.coco_caption.img_to_anns.get(img_id, [])
            ]
            if not gts:
                continue
            candidates[str(img_id)] = sent
            references[str(img_id)] = gts
        return {
            f"cap_results.{k}": v
            for k, v in evaluate_captions(candidates, references).items()
        }

    def save_embedding_results(
        self, per_image, dump_dir: str = "./results"
    ) -> None:
        """Dump assigned query embeddings + their GT category ids
        (reference save_results, coco_open.py:718-743): per image a tuple
        (embeddings (N, d), assigned_labels (N,)); label == num classes
        means unassigned and is skipped."""
        import os

        embs, cats = [], []
        for embeddings, assigned_labels in per_image:
            for emb, lab in zip(embeddings, assigned_labels):
                if int(lab) == len(self.all_cat_ids):
                    continue
                embs.append(np.asarray(emb))
                cats.append(self.all_cat_ids[int(lab)])
        os.makedirs(dump_dir, exist_ok=True)
        np.save(
            os.path.join(dump_dir, "coco_embedding.npy"), np.stack(embs)
        )
        np.save(
            os.path.join(dump_dir, "coco_gt_category.npy"), np.asarray(cats)
        )
