"""Mask2Former open-vocabulary head: pixel decoder + masked-attention
query decoder + per-layer prediction heads.

TPU-native equivalent of the reference ``Mask2FormerHeadOpen``
(open_set/models/mask2former_head.py:34-980). Behavior contract:

- pixel decoder produces stride-4 ``mask_features`` and 3 memory levels,
- learned ``query_feat``/``query_embed`` (100 x 256) and a per-level
  ``level_embed`` added to decoder inputs (reference :786-811),
- prediction head applied to the initial queries and after each of the 9
  decoder layers (10 outputs total, deep supervision; reference :816-847):
  shared post-norm LN, class logits (num_classes+1), v2l 768-d embedding,
  3-layer mask MLP and the ``bqc,bchw->bqhw`` mask einsum (reference :748),
- the attention mask for layer i+1 is the sigmoid-thresholded mask
  prediction resized to the next level's resolution; queries whose mask
  blocks everything attend everywhere instead (reference :824-826),
- levels cycle 0,1,2 (stride 32,16,8) across the 9 layers.

TPU-first design notes: batch-first NHWC tensors; all 10 layer outputs are
stacked on a leading axis so the loss vmaps over decoder layers instead of
a Python loop of per-layer loss calls; static shapes throughout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.positional import sine_positional_encoding_2d
from ..ops.resize import bilinear_resize
from .common import MLP, LayerNormF32
from .pixel_decoder import MSDeformAttnPixelDecoder
from .transformer_decoder import DetrDecoderLayer

Dtype = Any


class Mask2FormerHeadOpen(nn.Module):
    num_classes: int = 48  # known (training) classes, excl. background
    num_queries: int = 100
    feat_channels: int = 256
    out_channels: int = 256
    emb_dim: int = 768  # v2l projection dim (BERT space)
    num_decoder_layers: int = 9
    num_feat_levels: int = 3
    num_heads: int = 8
    ffn_dim: int = 2048
    use_class_emb: bool = True
    pred_emb_norm: bool = False  # reference kwarg (default config: False)
    # learnable softmax temperature for the cls_emb/grounding logits
    # (reference mask2former_head.py:228-229); the init value matches the
    # criterion's static default
    learnable_temperature: bool = False
    softmax_temperature_init: float = 10.0
    attn_impl: str = "exact"
    deform_window: Any = 8  # int or per-value-level tuple
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.learnable_temperature:
            self.softmax_temperature = self.param(
                "softmax_temperature",
                lambda key, shape: jnp.full(
                    shape, self.softmax_temperature_init, jnp.float32
                ),
                (1,),
            )
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            feat_channels=self.feat_channels,
            out_channels=self.out_channels,
            attn_impl=self.attn_impl,
            window=self.deform_window,
            remat=self.remat,
            dtype=self.dtype,
            name="pixel_decoder",
        )
        # remat also covers the query decoder: each layer's saved
        # cross-attention probabilities over up-to-16k keys are the other
        # big training-HBM consumer after the encoder (B=8: ~0.4 GB per
        # stride-8 layer); recompute them in backward instead
        layer_cls = (
            nn.remat(DetrDecoderLayer) if self.remat else DetrDecoderLayer
        )
        self.decoder_layers = [
            layer_cls(
                embed_dim=self.feat_channels,
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                dtype=self.dtype,
                name=f"decoder_layer{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.post_norm = LayerNormF32(name="post_norm")
        self.cls_embed = nn.Dense(self.num_classes + 1, name="cls_embed")
        self.mask_embed = MLP(
            (self.feat_channels, self.feat_channels, self.out_channels),
            dtype=self.dtype,
            name="mask_embed",
        )
        if self.use_class_emb:
            self.v2l_transform = nn.Dense(self.emb_dim, name="v2l_transform")

        init = nn.initializers.normal(1.0)
        self.query_embed = self.param(
            "query_embed", init, (self.num_queries, self.feat_channels)
        )
        self.query_feat = self.param(
            "query_feat", init, (self.num_queries, self.feat_channels)
        )
        self.level_embed = self.param(
            "level_embed", init, (self.num_feat_levels, self.feat_channels)
        )

    def _forward_head(
        self,
        decoder_out: jnp.ndarray,  # (B, Q, C)
        mask_features: jnp.ndarray,  # (B, H4, W4, C)
        target_hw: Tuple[int, int],
        mask_features_at_target: Optional[jnp.ndarray] = None,
        skip_predictions: bool = False,
    ):
        """Per-layer prediction head (reference forward_head, :711-761).

        With ``mask_features_at_target`` (the stride-4 features already
        resized to the target level), the next layer's attention mask is
        computed by an einsum AT LEVEL RESOLUTION instead of a full-res
        einsum + resize — mathematically identical (bilinear resize and
        the channel einsum are both linear and commute), up to fp
        rounding at threshold-borderline pixels. ``skip_predictions``
        additionally drops this layer's cls/emb/full-res mask outputs
        (eval only needs the final layer's)."""
        x = self.post_norm(decoder_out).astype(jnp.float32)
        mask_embed = self.mask_embed(decoder_out)  # (B, Q, C)
        cls_pred = cls_emb_pred = mask_pred = None
        if not skip_predictions:
            cls_pred = self.cls_embed(x)  # (B, Q, num_classes+1)
            cls_emb_pred = cls_pred
            if self.use_class_emb:
                cls_emb_pred = self.v2l_transform(x)  # (B, Q, 768)
                if self.pred_emb_norm:
                    cls_emb_pred = cls_emb_pred / jnp.linalg.norm(
                        cls_emb_pred, axis=-1, keepdims=True
                    )
            # mask logits stay in the compute dtype: the 10-layer stacked
            # deep-supervision outputs at f32 are ~10 GB for batch-4
            # 1024^2 training; consumers cast AFTER slicing/sampling
            mask_pred = jnp.einsum(
                "bqc,bhwc->bqhw", mask_embed, mask_features
            ).astype(self.dtype)

        # next layer's attention mask at the target level resolution
        if mask_features_at_target is not None:
            attn_logits = jnp.einsum(
                "bqc,bhwc->bqhw", mask_embed, mask_features_at_target
            ).astype(self.dtype)
        else:
            attn_logits = bilinear_resize(
                mask_pred, target_hw[0], target_hw[1]
            )
        attn_mask = jax.nn.sigmoid(attn_logits) < 0.5  # True = blocked
        b, q = attn_mask.shape[:2]
        attn_mask = attn_mask.reshape(b, q, -1)  # (B, Q, h*w)
        # a fully-blocked query attends everywhere instead (reference :824-826)
        all_blocked = jnp.all(attn_mask, axis=-1, keepdims=True)
        attn_mask = jnp.where(all_blocked, False, attn_mask)
        attn_mask = jax.lax.stop_gradient(attn_mask)
        return cls_pred, cls_emb_pred, mask_pred, attn_mask

    def __call__(
        self,
        feats: Sequence[jnp.ndarray],
        only_last: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """feats: backbone C2..C5 (NHWC).

        Returns dict of stacked per-layer outputs:
            cls_scores (L+1, B, Q, num_classes+1) fp32
            cls_emb_preds (L+1, B, Q, emb_dim) fp32
            mask_preds (L+1, B, Q, H4, W4) compute dtype (bf16 on TPU)

        ``only_last`` (eval fast path): intermediate layers produce only
        the attention masks (einsum at level resolution against
        pre-resized mask features — exact up to fp; see _forward_head);
        the returned stacks have leading dim 1 (final layer only).
        """
        b = feats[0].shape[0]
        mask_features, memories = self.pixel_decoder(feats)

        level_shapes = [(m.shape[1], m.shape[2]) for m in memories]
        decoder_inputs: List[jnp.ndarray] = []
        decoder_pos: List[jnp.ndarray] = []
        for i, mem in enumerate(memories):
            h, w = level_shapes[i]
            tokens = mem.reshape(b, h * w, self.feat_channels)
            tokens = tokens + self.level_embed[i][None, None, :].astype(tokens.dtype)
            decoder_inputs.append(tokens)
            pos = sine_positional_encoding_2d(h, w, self.feat_channels // 2)
            pos = pos.reshape(self.feat_channels, h * w).T[None]
            decoder_pos.append(pos.astype(tokens.dtype))

        query_feat = jnp.broadcast_to(
            self.query_feat[None], (b,) + self.query_feat.shape
        ).astype(self.dtype)
        query_embed = jnp.broadcast_to(
            self.query_embed[None], (b,) + self.query_embed.shape
        ).astype(self.dtype)

        mf_levels = None
        if only_last:
            # stride-4 mask features resized once per level; every
            # intermediate attn-mask einsum then runs at level resolution
            mf = jnp.transpose(mask_features, (0, 3, 1, 2))
            mf_levels = [
                jnp.transpose(bilinear_resize(mf, h, w), (0, 2, 3, 1))
                for (h, w) in level_shapes
            ]

        cls_list, emb_list, mask_list = [], [], []
        cls_pred, emb_pred, mask_pred, attn_mask = self._forward_head(
            query_feat,
            mask_features,
            level_shapes[0],
            mask_features_at_target=(
                mf_levels[0] if only_last else None
            ),
            skip_predictions=only_last,
        )
        if not only_last:
            cls_list.append(cls_pred)
            emb_list.append(emb_pred)
            mask_list.append(mask_pred)

        for i in range(self.num_decoder_layers):
            level_idx = i % self.num_feat_levels
            last = i == self.num_decoder_layers - 1
            query_feat = self.decoder_layers[i](
                query_feat,
                decoder_inputs[level_idx],
                query_embed,
                decoder_pos[level_idx],
                cross_attn_mask=attn_mask[:, None, :, :],  # broadcast heads
            )
            next_level = (i + 1) % self.num_feat_levels
            cls_pred, emb_pred, mask_pred, attn_mask = self._forward_head(
                query_feat,
                mask_features,
                level_shapes[next_level],
                mask_features_at_target=(
                    mf_levels[next_level] if only_last and not last else None
                ),
                skip_predictions=only_last and not last,
            )
            if not only_last or last:
                cls_list.append(cls_pred)
                emb_list.append(emb_pred)
                mask_list.append(mask_pred)

        out = {
            "cls_scores": jnp.stack(cls_list, axis=0),
            "cls_emb_preds": jnp.stack(emb_list, axis=0),
            "mask_preds": jnp.stack(mask_list, axis=0),
        }
        if self.learnable_temperature:
            out["softmax_temperature"] = self.softmax_temperature
        return out
