#!/usr/bin/env python
"""Interactive inference demo (reference notebooks/inference.ipynb
equivalent): load a config + ported checkpoint, run open-vocabulary
instance segmentation + caption generation on an image, save a
visualization.

Usage:
    python examples/demo.py configs/instance/coco_b48n17.py \
        work_dirs/coco_b48n17/params.npz path/to/image.jpg \
        [--out demo_out.jpg] [--with-caption]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("image")
    parser.add_argument("--out", default="demo_out.jpg")
    parser.add_argument("--with-caption", action="store_true")
    parser.add_argument("--score-thr", type=float, default=0.3)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from betrayed_by_captions_tpu.config import Config
    from betrayed_by_captions_tpu.data.tokenizer import load_tokenizer
    from betrayed_by_captions_tpu.engine.checkpoint import load_params
    from betrayed_by_captions_tpu.engine.train_loop import build_banks
    from betrayed_by_captions_tpu.evaluation.inference import Detector
    from betrayed_by_captions_tpu.models.bert import (
        BertWordEmbeddings,
        load_bert_assets,
    )
    from betrayed_by_captions_tpu.models.detector import build_detector
    from betrayed_by_captions_tpu.utils.visualization import show_result

    cfg = Config.fromfile(args.config)
    banks = build_banks(cfg)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("num_classes", banks.num_base)
    model = build_detector(Config.fromdict(model_cfg))
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), method="init_forward"
    )["params"]
    params = load_params(args.checkpoint, template)

    detector = Detector(
        model,
        params,
        banks,
        bert=BertWordEmbeddings(
            load_bert_assets(
                cfg.get("bert_assets"),
                allow_synthetic=cfg.get("allow_synthetic_bert", False),
            )
        ),
        tokenizer=load_tokenizer(),
        eval_types=("all_results",),
    )

    image = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    result = detector(image, with_caption=args.with_caption)
    if args.with_caption:
        print("caption:", result.get("caption", ""))
    show_result(
        image,
        result,
        class_names=banks.names_all,
        score_thr=args.score_thr,
        out_file=args.out,
    )
    print(f"saved visualization to {args.out}")


if __name__ == "__main__":
    main()
