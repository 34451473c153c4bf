"""Detector shell: backbone + Mask2Former open head (+ caption generator).

TPU-native equivalent of the reference's ``Mask2FormerOpen`` /
``MaskFormerOpen`` detector (open_set/models/mask2former.py:7-27,
maskformer.py:15-382). Functional design: the module computes raw
per-layer predictions; train/test orchestration (losses, fusion
post-processing, beam search) lives in :mod:`..losses.criterion`,
:mod:`..engine` and :mod:`..evaluation.inference` as pure functions over
the module outputs, so one jitted step covers the whole pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from .caption_transformer import CaptionTransformer
from .mask2former_head import Mask2FormerHeadOpen
from .resnet import ResNet

Dtype = Any


class Mask2FormerOpen(nn.Module):
    """Flagship model (reference configs/instance/coco_b48n17.py)."""

    num_classes: int = 48
    num_queries: int = 100
    feat_channels: int = 256
    emb_dim: int = 768
    num_decoder_layers: int = 9
    backbone_depth: int = 50
    backbone_base_channels: int = 64  # mmdet ResNet base_channels
    # mmdet-style backbone freeze (-1 none, 0 stem, N stem+layer1..N);
    # enforced structurally with stop_gradient (models/resnet.py) AND by
    # the optimizer mask (engine/optim.py)
    frozen_backbone_stages: int = -1
    use_class_emb: bool = True
    use_caption_generation: bool = True
    pred_emb_norm: bool = False
    vocab_size: int = 30522
    max_caption_len: int = 35
    caption_num_layers: int = 4
    caption_ff_dim: int = 512
    caption_num_heads: int = 8
    learnable_temperature: bool = False
    softmax_temperature_init: float = 10.0
    attn_impl: str = "exact"
    deform_window: Any = 8  # int, per-level tuple, or None
    # rematerialize encoder layers in training backward (see pixel_decoder)
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            depth=self.backbone_depth,
            base_channels=self.backbone_base_channels,
            frozen_stages=self.frozen_backbone_stages,
            dtype=self.dtype,
            name="backbone",
        )
        self.head = Mask2FormerHeadOpen(
            num_classes=self.num_classes,
            num_queries=self.num_queries,
            feat_channels=self.feat_channels,
            emb_dim=self.emb_dim,
            num_decoder_layers=self.num_decoder_layers,
            use_class_emb=self.use_class_emb,
            pred_emb_norm=self.pred_emb_norm,
            learnable_temperature=self.learnable_temperature,
            softmax_temperature_init=self.softmax_temperature_init,
            attn_impl=self.attn_impl,
            deform_window=self.deform_window,
            remat=self.remat,
            dtype=self.dtype,
            name="head",
        )
        if self.use_caption_generation:
            self.caption_generator = CaptionTransformer(
                num_layers=self.caption_num_layers,
                input_dim=self.emb_dim,
                hidden_dim=self.emb_dim,
                ff_dim=self.caption_ff_dim,
                num_heads=self.caption_num_heads,
                vocab_size=self.vocab_size,
                seq_length=self.max_caption_len,
                dtype=self.dtype,
                name="caption_generator",
            )

    def __call__(
        self, images: jnp.ndarray, only_last: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """images: (B, H, W, 3) normalized NHWC. Returns stacked per-layer
        head outputs (see Mask2FormerHeadOpen.__call__)."""
        feats = self.backbone(images)
        return self.head(feats, only_last=only_last)

    def init_forward(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Initialization path touching every submodule (flax creates params
        only for executed code, so plain __call__ would miss the caption
        generator). Use ``model.init(rng, images, method='init_forward')``."""
        out = self(images)
        if self.use_caption_generation:
            b = images.shape[0]
            tgt = jnp.zeros((b, self.max_caption_len - 1, self.emb_dim), self.dtype)
            self.caption_forward(tgt, out["cls_emb_preds"][-1])
        return out

    def caption_forward(
        self,
        tgt_embs: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Caption decoder pass (training teacher-forcing or beam step)."""
        return self.caption_generator(
            tgt_embs, memory, tgt_key_padding_mask, deterministic
        )

    def caption_logits_all_layers(self, all_hidden: jnp.ndarray) -> jnp.ndarray:
        """Average generator logits across the 4 decoder layers (reference
        beam search, open_set/utils/eval/inference.py:91-113)."""
        logits = self.caption_generator.generate(all_hidden)  # (L, B, T, V)
        return logits.mean(axis=0)


def build_detector(model_cfg: Config, dtype=None) -> Mask2FormerOpen:
    """Build from a config dict (configs/ tree).

    ``dtype`` comes from ``model_cfg.dtype`` ("bfloat16"/"float32" — the
    shipped configs train in bf16) unless overridden by the argument.
    """
    if dtype is None:
        dtype = jnp.dtype(model_cfg.get("dtype", "float32"))
    return Mask2FormerOpen(
        num_classes=model_cfg.get("num_classes", 48),
        num_queries=model_cfg.get("num_queries", 100),
        feat_channels=model_cfg.get("feat_channels", 256),
        emb_dim=model_cfg.get("emb_dim", 768),
        num_decoder_layers=model_cfg.get("num_decoder_layers", 9),
        backbone_depth=model_cfg.get("backbone_depth", 50),
        backbone_base_channels=model_cfg.get("backbone_base_channels", 64),
        frozen_backbone_stages=model_cfg.get("frozen_backbone_stages", -1),
        use_class_emb=model_cfg.get("use_class_emb", True),
        use_caption_generation=model_cfg.get("use_caption_generation", True),
        pred_emb_norm=model_cfg.get("pred_emb_norm", False),
        vocab_size=model_cfg.get("vocab_size", 30522),
        max_caption_len=model_cfg.get("max_caption_len", 35),
        caption_num_layers=model_cfg.get("caption_num_layers", 4),
        caption_ff_dim=model_cfg.get("caption_ff_dim", 512),
        caption_num_heads=model_cfg.get("caption_num_heads", 8),
        learnable_temperature=model_cfg.get("learnable_temperature", False),
        softmax_temperature_init=model_cfg.get("softmax_temperature", 10.0),
        attn_impl=model_cfg.get("attn_impl", "exact"),
        deform_window=model_cfg.get("deform_window", 8),
        remat=model_cfg.get("remat", False),
        dtype=dtype,
    )
