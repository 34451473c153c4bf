"""Evaluation loop: jitted inference over the val set + host post-processing
and the OVIS/OSPS protocols.

TPU-native replacement for the reference's single/multi_gpu_test
(open_set/apis/test.py:17-130) + dataset.evaluate: the device runs the
model forward in static shape buckets; the host crops/rescales mask
logits, runs the per-eval-type open-vocabulary post-processing, RLE-encodes
results and feeds the evaluators. No cross-process result collection is
needed — a single host drives the device mesh.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.class_banks import ClassEmbeddingBanks
from ..models.detector import build_detector


def evaluate(
    cfg: Config,
    params,
    work_dir: Optional[str] = None,
    max_images: Optional[int] = None,
) -> Dict[str, float]:
    from ..evaluation.ovis import postprocess_instance_host
    from .train_loop import build_banks, build_dataset

    banks = build_banks(cfg)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("num_classes", banks.num_base)
    model = build_detector(Config.fromdict(model_cfg))

    val_cfg = dict(cfg.data.val)
    val_cfg["test_mode"] = True
    dataset = build_dataset(Config.fromdict(val_cfg), train=False)

    if hasattr(dataset, "evaluate_pq"):
        return _evaluate_panoptic(cfg, params, model, dataset, banks, work_dir,
                                  max_images)

    eval_types = tuple(
        cfg.get("eval_types", ("all_results", "novel_results", "base_results"))
    )
    bank_by_type = {
        "all_results": banks.all_bank,
        "novel_results": banks.novel_bank,
        "base_results": banks.base_bank,
    }
    names_by_type = {
        "all_results": banks.names_all,
        "novel_results": banks.names_novel,
        "base_results": banks.names_base,
    }

    forward = jax.jit(
        lambda p, x: model.apply({"params": p}, x, only_last=True)
    )

    # caption generation path (reference eval_type 'cap_results')
    gen_caption = None
    if "cap_results" in eval_types:
        from ..data.tokenizer import load_tokenizer
        from ..evaluation.inference import (
            generate_caption,
            make_jit_beam_search,
        )
        from ..models.bert import BertWordEmbeddings, load_bert_assets

        bert = BertWordEmbeddings(
            load_bert_assets(
                cfg.get("bert_assets"),
                allow_synthetic=cfg.get("allow_synthetic_bert", False),
            )
        )
        tokenizer = load_tokenizer()
        jit_search = make_jit_beam_search(model, params, bert)

        def gen_caption(memory):
            return generate_caption(
                model, params, bert, tokenizer, memory, jit_search=jit_search
            )

    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    bs = int(cfg.get("eval_batch_size", 4))

    # multi-host: each process evaluates a strided slice of the val set;
    # results are gathered through the shared filesystem (reference
    # collect_results_cpu) and only process 0 computes metrics
    pid, pcount = jax.process_index(), jax.process_count()
    my_indices = [i for i in range(n) if i % pcount == pid]

    # batch images in two static aspect buckets (landscape 800x1344 /
    # portrait 1344x800, from the test transform) so the jitted forward
    # compiles at most twice; the tail of each bucket is padded by
    # repeating the last image and the extra outputs dropped
    def is_portrait(idx: int) -> bool:
        info = dataset.data_infos[idx]
        return info.get("height", 0) > info.get("width", 1)

    buckets: Dict[bool, List[int]] = {False: [], True: []}
    for idx in my_indices:
        buckets[is_portrait(idx)].append(idx)

    results_per_type: Dict[str, Dict[int, Optional[dict]]] = {
        et: {} for et in eval_types
    }
    for idxs in buckets.values():
        for start in range(0, len(idxs), bs):
            chunk = idxs[start : start + bs]
            loaded = [dataset[j] for j in chunk]
            images = [im for im, _ in loaded]
            metas = [m for _, m in loaded]
            while len(images) < bs:  # pad the tail batch
                images.append(images[-1])
            out = forward(params, jnp.asarray(np.stack(images)))
            cls_emb_b = np.asarray(out["cls_emb_preds"][-1])
            masks_b = np.asarray(out["mask_preds"][-1])
            for bi, (j, meta) in enumerate(zip(chunk, metas)):
                for et in eval_types:
                    if et == "cap_results":
                        results_per_type[et][j] = gen_caption(
                            out["cls_emb_preds"][-1][bi : bi + 1]
                        )
                        continue
                    labels, scores, boxes, bmasks = postprocess_instance_host(
                        cls_emb_b[bi],
                        masks_b[bi],
                        bank_by_type[et],
                        img_shape=meta["img_shape"],
                        ori_shape=meta["ori_shape"],
                        pad_shape=meta["pad_shape"],
                        max_per_image=cfg.get("max_per_image", 100),
                    )
                    results_per_type[et][j] = dict(
                        labels=labels,
                        scores=scores,
                        boxes=boxes,
                        masks=bmasks,
                        # explicit image id: evaluation aligns on this
                        # instead of list position (robust against any
                        # future skip/filter in the eval loop)
                        img_id=dataset.img_ids[j],
                    )

    from ..parallel.multihost import collect_results_cpu

    collected: Dict[str, List[dict]] = {}
    for et in eval_types:
        ordered = collect_results_cpu(
            work_dir or ".", results_per_type[et], n, tag=f"eval_{et}"
        )
        if ordered is None:  # non-root process under multi-host
            return {}
        collected[et] = ordered

    metrics = dataset.evaluate(
        collected,
        {et: names_by_type.get(et) for et in eval_types},
        metrics=tuple(cfg.get("metrics", ("segm", "bbox"))),
    )
    if work_dir:
        import json

        with open(os.path.join(work_dir, "eval.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)
    return metrics


def _evaluate_panoptic(
    cfg: Config,
    params,
    model,
    dataset,
    banks: ClassEmbeddingBanks,
    work_dir: Optional[str],
    max_images: Optional[int],
) -> Dict[str, float]:
    """OSPS evaluation: batched forward -> host panoptic fusion -> open-set
    PQ (reference coco_panoptic_open.py:512-680)."""
    from ..evaluation.osps import postprocess_panoptic_host
    from ..parallel.multihost import collect_results_cpu

    name2id = {
        c["name"]: cid for cid, c in dataset.categories.items()
    }
    label_to_cat = [name2id[n] for n in banks.names_all]
    isthing = np.array(
        [dataset.categories[c].get("isthing", 0) == 1 for c in label_to_cat]
    )
    num_things = int(isthing.sum())
    # panoptic fusion treats labels < num_things as things: the bank must
    # be ordered things-first (true for the shipped panoptic embeddings)
    assert isthing[:num_things].all(), "bank must order things before stuff"
    all_bank = np.asarray(banks.all_bank)

    forward = jax.jit(
        lambda p, x: model.apply({"params": p}, x, only_last=True)
    )
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    bs = int(cfg.get("eval_batch_size", 4))
    pid, pcount = jax.process_index(), jax.process_count()
    my_indices = [i for i in range(n) if i % pcount == pid]

    def is_portrait(idx: int) -> bool:
        info = dataset.data_infos[idx]
        return info.get("height", 0) > info.get("width", 1)

    buckets: Dict[bool, List[int]] = {False: [], True: []}
    for idx in my_indices:
        buckets[is_portrait(idx)].append(idx)

    local: Dict[int, np.ndarray] = {}
    for idxs in buckets.values():
        for start in range(0, len(idxs), bs):
            chunk = idxs[start : start + bs]
            loaded = [dataset[j] for j in chunk]
            images = [im for im, _ in loaded]
            metas = [m for _, m in loaded]
            while len(images) < bs:
                images.append(images[-1])
            out = forward(params, jnp.asarray(np.stack(images)))
            cls_emb_b = np.asarray(out["cls_emb_preds"][-1])
            masks_b = np.asarray(out["mask_preds"][-1])
            for bi, (j, meta) in enumerate(zip(chunk, metas)):
                local[j] = postprocess_panoptic_host(
                    cls_emb_b[bi],
                    masks_b[bi],
                    all_bank,
                    num_things,
                    img_shape=meta["img_shape"],
                    ori_shape=meta["ori_shape"],
                    pad_shape=meta["pad_shape"],
                    object_mask_thr=cfg.get("object_mask_thr", 0.8),
                    iou_thr=cfg.get("iou_thr", 0.8),
                    filter_low_score=cfg.get("filter_low_score", True),
                    # reference test_cfg.stuff_area_limit (4096 at COCO
                    # scale); small-image harnesses must scale it down
                    stuff_area_limit=cfg.get("stuff_area_limit", 4096),
                )

    ordered = collect_results_cpu(work_dir or ".", local, n, tag="eval_pq")
    if ordered is None:
        return {}
    metrics = dataset.evaluate_pq(ordered, label_to_cat)
    if work_dir:
        import json

        with open(os.path.join(work_dir, "eval.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)
    return metrics
