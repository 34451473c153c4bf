#!/usr/bin/env python
"""Port a reference (mmdet torch) checkpoint into this framework.

Usage:
    python tools/port_checkpoint.py path/to/mmdet_ckpt.pth out_params.npz \
        [--verify-config configs/instance/coco_b48n17.py]

Loads the torch state dict on CPU, converts layouts
(engine/porting.py), optionally shape-verifies against a freshly
initialized model, and writes a weights-only .npz loadable by
``engine.checkpoint.load_params`` / tools/test.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_ckpt")
    parser.add_argument("out_npz")
    parser.add_argument("--verify-config", default=None)
    args = parser.parse_args()

    # porting is pure host work: force the CPU backend FIRST so the tool
    # never touches (or hangs on) the TPU tunnel. Must go through the
    # config API — the axon sitecustomize pre-imports jax, so env vars
    # are ignored.
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from betrayed_by_captions_tpu.engine.porting import (
        convert_reference_state_dict,
        verify_against_template,
    )

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items() if hasattr(v, "numpy")}
    converted = convert_reference_state_dict(state_dict)

    if args.verify_config:
        import jax.numpy as jnp

        from betrayed_by_captions_tpu.config import Config
        from betrayed_by_captions_tpu.engine.train_loop import build_banks
        from betrayed_by_captions_tpu.models.detector import build_detector

        cfg = Config.fromfile(args.verify_config)
        banks = build_banks(cfg)
        model_cfg = dict(cfg.model)
        model_cfg.setdefault("num_classes", banks.num_base)
        model = build_detector(Config.fromdict(model_cfg))
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            method="init_forward",
        )["params"]
        missing, extra, mismatched = verify_against_template(converted, template)
        if missing or mismatched:
            print(f"missing ({len(missing)}): {missing[:5]}")
            print(f"mismatched ({len(mismatched)}): {mismatched[:5]}")
            raise SystemExit(1)
        print("shape verification passed")
        if (
            model_cfg.get("attn_impl", "exact") != "exact"
            or model_cfg.get("deform_window", 8) is not None
        ):
            print(
                "NOTE: numeric parity checks against this reference "
                "checkpoint require attn_impl='exact' AND "
                "deform_window=None (mmcv never clamps sampling offsets; "
                "see engine/porting.py). This config's windowed/clamped "
                "sampling will NOT reproduce reference outputs."
            )

    from betrayed_by_captions_tpu.engine.checkpoint import save_params

    save_params(args.out_npz, converted)
    print(f"wrote {args.out_npz}")


if __name__ == "__main__":
    main()
