"""Optimizer: AdamW with per-param-group lr/decay multipliers, global-norm
clip and step LR schedule with linear warmup.

TPU-native (optax) equivalent of the reference's optimizer stack
(configs/instance/coco_b48n17.py:269-301 + mmcv OptimizerHook):

- AdamW lr 1e-4, weight_decay 0.05, betas (0.9, 0.999), eps 1e-8,
- paramwise multipliers: backbone lr x0.1; query_embed / query_feat /
  level_embed decay x0; all norm params decay x0,
- frozen params (frozen BN stats everywhere; backbone stem+stages1-3 with
  frozen_stages=3) get zero updates — the optax-mask equivalent of
  ``requires_grad=False``,
- grad clip: global L2 norm 0.01 (!) — reference optimizer_config,
- LR: linear warmup 10 iters (ratio 1.0 = effectively none), step decay
  x0.1 at iters [70000, 80000] (by_epoch=False).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    weight_decay: float = 0.05
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    grad_clip: float = 0.01
    backbone_lr_mult: float = 0.1
    embed_decay_mult: float = 0.0
    norm_decay_mult: float = 0.0
    # mmdet convention: -1 none, 0 stem only, N stem + layer1..N zero-lr
    frozen_backbone_stages: int = 3
    # reference freeze knobs (mask2former_head.py:242-247,262-271):
    # freeze_pretrained freezes the stage-1-pretrained trunk of the head
    # (pixel decoder + query transformer decoder incl. its post-norm —
    # the reference's decoder_input_projs live inside our pixel decoder);
    # freeze_v2l freezes the query->768-d projection
    freeze_pretrained: bool = False
    freeze_v2l: bool = False
    warmup_iters: int = 10
    warmup_ratio: float = 1.0
    lr_steps: Tuple[int, ...] = (70000, 80000)
    lr_gamma: float = 0.1


_NORM_KEYS = ("gn", "ln", "norm")  # GroupNorm / LayerNorm module names
_EMBED_PARAMS = ("query_embed", "query_feat", "level_embed")
_FROZEN_BN_LEAVES = ("mean", "var")


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        else:
            names.append(str(p))
    return tuple(names)


def _is_frozen(names: Sequence[str], cfg: OptimizerConfig) -> bool:
    # frozen BN statistics are never trained anywhere
    if names[-1] in _FROZEN_BN_LEAVES:
        return True
    if cfg.freeze_v2l and "v2l_transform" in names:
        return True
    if cfg.freeze_pretrained and any(
        n == "pixel_decoder" or n.startswith("decoder_layer") or n == "post_norm"
        for n in names
    ):
        return True
    # FrozenBatchNorm affine params are requires_grad=False in the reference
    if any(n.startswith("bn") or n == "stem_bn" or n.endswith("_bn") for n in names):
        if names[-1] in ("scale", "bias"):
            return True
    if "backbone" in names:
        # mmdet convention: -1 trains everything, >=0 freezes the stem,
        # N freezes stem + layer1..N (reference finetune configs use 3,
        # ag_pretrain uses -1)
        if cfg.frozen_backbone_stages >= 0 and any(
            n.startswith("stem_") for n in names
        ):
            return True
        for n in names:
            if n.startswith("layer") and "_block" in n:
                stage = int(n[5])
                if stage <= cfg.frozen_backbone_stages:
                    return True
    return False


def label_params(params, cfg: OptimizerConfig):
    """Label each leaf: frozen / backbone / embed / norm / default."""

    def label(path, _):
        names = _path_names(path)
        if _is_frozen(names, cfg):
            return "frozen"
        if any(n in _EMBED_PARAMS for n in names):
            return "embed"
        if any(any(k == n or n.startswith(k) for k in _NORM_KEYS) for n in names):
            return "norm"
        if "backbone" in names:
            return "backbone"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def make_lr_schedule(cfg: OptimizerConfig):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            step < cfg.warmup_iters,
            cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * step / max(cfg.warmup_iters, 1),
            1.0,
        )
        decay = jnp.float32(1.0)
        for s in cfg.lr_steps:
            decay = decay * jnp.where(step >= s, cfg.lr_gamma, 1.0)
        return cfg.lr * warm * decay

    return schedule


def build_optimizer(params, cfg: OptimizerConfig = OptimizerConfig()):
    """Build the optax transform. Returns (tx, schedule_fn)."""
    schedule = make_lr_schedule(cfg)

    def adamw(lr_mult: float, decay_mult: float):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
            optax.add_decayed_weights(cfg.weight_decay * decay_mult),
            optax.scale_by_learning_rate(
                lambda step: schedule(step) * lr_mult
            ),
        )

    labels = label_params(params, cfg)
    frozen_mask = jax.tree_util.tree_map(lambda l: l == "frozen", labels)
    tx = optax.chain(
        # zero frozen grads BEFORE the global-norm clip: the reference's
        # requires_grad=False params contribute nothing to the clip norm
        # (torch clip_grad_norm_ only sees grads that exist). Backbone
        # stages are already structurally zero via stop_gradient
        # (models/resnet.py); this also covers frozen-BN affine params
        # inside trainable stages.
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {
                "default": adamw(1.0, 1.0),
                "backbone": adamw(cfg.backbone_lr_mult, 1.0),
                "embed": adamw(1.0, cfg.embed_decay_mult),
                "norm": adamw(1.0, cfg.norm_decay_mult),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )
    return tx, schedule
