"""Torch/mmdet checkpoint porting into this framework's parameter tree.

Converts reference-trained checkpoints (mmdet ``Mask2FormerOpen`` state
dicts, e.g. the released coco_b48n17 weights and torchvision resnet50)
into our flax param trees so accuracy parity can be checked without
retraining. Layout changes handled:

- conv kernels OIHW -> HWIO; linear kernels (out, in) -> (in, out),
- BN stats -> FrozenBatchNorm {scale, bias, mean, var},
- torch ``nn.MultiheadAttention`` packed in_proj (3C, C) split into our
  separate q/k/v projections,
- the caption decoder's fused qkv layer split likewise,
- mmcv module paths mapped to our module names (see _rules below).

Entry points: ``convert_reference_state_dict`` (full detector),
``convert_torchvision_resnet`` (backbone only).

IMPORTANT — parity checks against ported reference checkpoints must run
the model with ``attn_impl="exact"`` and ``deform_window=None``: mmcv's
MultiScaleDeformableAttention never clamps sampling offsets (its learned
offsets routinely exceed 2 cells; the compass init alone reaches 4), so
any windowed/clamped configuration samples differently from the
reference and cannot reproduce its outputs. The windowed TPU configs are
a self-consistent train/eval semantic for models trained HERE, not an
evaluation mode for reference weights. See models/deformable.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _lin(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))  # (out,in) -> (in,out)


def _set(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _bn(out: Dict, dst: str, src: Dict, prefix: str):
    _set(out, f"{dst}/scale", np.asarray(src[f"{prefix}.weight"]))
    _set(out, f"{dst}/bias", np.asarray(src[f"{prefix}.bias"]))
    _set(out, f"{dst}/mean", np.asarray(src[f"{prefix}.running_mean"]))
    _set(out, f"{dst}/var", np.asarray(src[f"{prefix}.running_var"]))


def _dense(out: Dict, dst: str, src: Dict, prefix: str):
    _set(out, f"{dst}/kernel", _lin(src[f"{prefix}.weight"]))
    if f"{prefix}.bias" in src:
        _set(out, f"{dst}/bias", np.asarray(src[f"{prefix}.bias"]))


def _conv2d(out: Dict, dst: str, src: Dict, prefix: str):
    _set(out, f"{dst}/kernel", _conv(src[f"{prefix}.weight"]))
    if f"{prefix}.bias" in src:
        _set(out, f"{dst}/bias", np.asarray(src[f"{prefix}.bias"]))


def _ln(out: Dict, dst: str, src: Dict, prefix: str):
    _set(out, f"{dst}/ln/scale", np.asarray(src[f"{prefix}.weight"]))
    _set(out, f"{dst}/ln/bias", np.asarray(src[f"{prefix}.bias"]))


def _gn(out: Dict, dst: str, src: Dict, prefix: str):
    _set(out, f"{dst}/scale", np.asarray(src[f"{prefix}.weight"]))
    _set(out, f"{dst}/bias", np.asarray(src[f"{prefix}.bias"]))


def _packed_qkv(out: Dict, dst_attn: str, src: Dict, prefix: str):
    """torch nn.MultiheadAttention in_proj -> q/k/v Dense kernels."""
    w = np.asarray(src[f"{prefix}.in_proj_weight"])  # (3C, C)
    b = np.asarray(src[f"{prefix}.in_proj_bias"])  # (3C,)
    c = w.shape[1]
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        _set(out, f"{dst_attn}/{name}/kernel", _lin(w[i * c : (i + 1) * c]))
        _set(out, f"{dst_attn}/{name}/bias", b[i * c : (i + 1) * c])
    _dense(out, f"{dst_attn}/out_proj", src, f"{prefix}.out_proj")


def convert_resnet(src: Dict, out: Dict, src_prefix: str, dst_prefix: str):
    """mmdet/torchvision ResNet -> our backbone tree."""
    p, d = src_prefix, dst_prefix
    _conv2d(out, f"{d}/stem_conv", src, f"{p}conv1")
    _bn(out, f"{d}/stem_bn", src, f"{p}bn1")
    stage_blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    for stage, n in stage_blocks.items():
        for b in range(n):
            sp = f"{p}{stage}.{b}"
            dp = f"{d}/{stage}_block{b}"
            for ci in (1, 2, 3):
                _conv2d(out, f"{dp}/conv{ci}", src, f"{sp}.conv{ci}")
                _bn(out, f"{dp}/bn{ci}", src, f"{sp}.bn{ci}")
            if f"{sp}.downsample.0.weight" in src:
                _conv2d(out, f"{dp}/downsample_conv", src, f"{sp}.downsample.0")
                _bn(out, f"{dp}/downsample_bn", src, f"{sp}.downsample.1")


def convert_torchvision_resnet(state_dict: Dict) -> Dict:
    """torchvision resnet50 state dict -> backbone params tree."""
    out: Dict = {}
    convert_resnet(state_dict, out, "", "backbone")
    return out["backbone"]


def convert_reference_state_dict(
    state_dict: Dict,
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 9,
    num_caption_layers: int = 4,
    use_caption_generator: bool = True,
) -> Dict:
    """mmdet Mask2FormerOpen state dict -> our full params tree.

    Unknown keys are ignored (text-encoder tables are loaded separately as
    assets, reference models/utils/bert_embeddings.py).
    """
    src = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}

    convert_resnet(src, out, "backbone.", "backbone")

    hp = "panoptic_head"
    pd = f"{hp}.pixel_decoder"
    dpd = "head/pixel_decoder"
    for i in range(3):
        _conv2d(out, f"{dpd}/input_conv{i}/conv", src, f"{pd}.input_convs.{i}.conv")
        _gn(out, f"{dpd}/input_conv{i}/gn", src, f"{pd}.input_convs.{i}.gn")
    for li in range(num_encoder_layers):
        sp = f"{pd}.encoder.layers.{li}"
        dp = f"{dpd}/encoder_layer{li}"
        attn = f"{sp}.attentions.0"
        _dense(out, f"{dp}/attn/sampling_offsets", src, f"{attn}.sampling_offsets")
        _dense(out, f"{dp}/attn/attention_weights", src, f"{attn}.attention_weights")
        _dense(out, f"{dp}/attn/value_proj", src, f"{attn}.value_proj")
        _dense(out, f"{dp}/attn/output_proj", src, f"{attn}.output_proj")
        _dense(out, f"{dp}/ffn/fc1", src, f"{sp}.ffns.0.layers.0.0")
        _dense(out, f"{dp}/ffn/fc2", src, f"{sp}.ffns.0.layers.1")
        _ln(out, f"{dp}/norm1", src, f"{sp}.norms.0")
        _ln(out, f"{dp}/norm2", src, f"{sp}.norms.1")
    _set(out, f"{dpd}/level_embed", np.asarray(src[f"{pd}.level_encoding.weight"]))
    _conv2d(out, f"{dpd}/lateral_conv0/conv", src, f"{pd}.lateral_convs.0.conv")
    _gn(out, f"{dpd}/lateral_conv0/gn", src, f"{pd}.lateral_convs.0.gn")
    _conv2d(out, f"{dpd}/output_conv0/conv", src, f"{pd}.output_convs.0.conv")
    _gn(out, f"{dpd}/output_conv0/gn", src, f"{pd}.output_convs.0.gn")
    _conv2d(out, f"{dpd}/mask_feature_conv", src, f"{pd}.mask_feature")

    # transformer decoder: attentions.0 = cross, attentions.1 = self
    for li in range(num_decoder_layers):
        sp = f"{hp}.transformer_decoder.layers.{li}"
        dp = f"head/decoder_layer{li}"
        _packed_qkv(out, f"{dp}/cross_attn", src, f"{sp}.attentions.0.attn")
        _packed_qkv(out, f"{dp}/self_attn", src, f"{sp}.attentions.1.attn")
        _dense(out, f"{dp}/ffn/fc1", src, f"{sp}.ffns.0.layers.0.0")
        _dense(out, f"{dp}/ffn/fc2", src, f"{sp}.ffns.0.layers.1")
        _ln(out, f"{dp}/norm1", src, f"{sp}.norms.0")
        _ln(out, f"{dp}/norm2", src, f"{sp}.norms.1")
        _ln(out, f"{dp}/norm3", src, f"{sp}.norms.2")
    _ln(out, "head/post_norm", src, f"{hp}.transformer_decoder.post_norm")

    _set(out, "head/query_embed", np.asarray(src[f"{hp}.query_embed.weight"]))
    _set(out, "head/query_feat", np.asarray(src[f"{hp}.query_feat.weight"]))
    _set(out, "head/level_embed", np.asarray(src[f"{hp}.level_embed.weight"]))
    _dense(out, "head/cls_embed", src, f"{hp}.cls_embed")
    for i, torch_idx in enumerate([0, 2, 4]):
        _dense(out, f"head/mask_embed/layers_{i}", src, f"{hp}.mask_embed.{torch_idx}")
    if f"{hp}.v2l_transform.weight" in src:
        _dense(out, "head/v2l_transform", src, f"{hp}.v2l_transform")

    if use_caption_generator and f"{hp}.caption_generator.generator.weight" in src:
        cg = f"{hp}.caption_generator"
        dcg = "caption_generator"
        for li in range(num_caption_layers):
            sp = f"{cg}.transformer_decoder.decoders.{li}"
            dp = f"{dcg}/layer{li}"
            # fused qkv self-attention
            w = np.asarray(src[f"{sp}.mha_layer.qkv_layer.weight"])  # (3C, C)
            b = np.asarray(src[f"{sp}.mha_layer.qkv_layer.bias"])
            c = w.shape[1]
            for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
                _set(out, f"{dp}/self_attn/{name}/kernel", _lin(w[i * c : (i + 1) * c]))
                _set(out, f"{dp}/self_attn/{name}/bias", b[i * c : (i + 1) * c])
            _dense(out, f"{dp}/self_attn/out_proj", src, f"{sp}.mha_layer.out_layer")
            for tname, oname in [
                ("to_qry", "q_proj"),
                ("to_key", "k_proj"),
                ("to_val", "v_proj"),
                ("to_out", "out_proj"),
            ]:
                _dense(out, f"{dp}/cross_attn/{oname}", src, f"{sp}.crx_layer.{tname}")
            _dense(out, f"{dp}/ffn_fc1", src, f"{sp}.ffn_layer.linears.0.0")
            _dense(out, f"{dp}/ffn_fc2", src, f"{sp}.ffn_layer.linears.1.0")
            # post-norm LNs (index 1 of each pair; index 0 is Identity)
            _ln(out, f"{dp}/norm1", src, f"{sp}.layer_normalz.mha.1")
            _ln(out, f"{dp}/norm2", src, f"{sp}.layer_normalz.crx.1")
            _ln(out, f"{dp}/norm3", src, f"{sp}.layer_normalz.ffn.1")
        _dense(out, f"{dcg}/generator", src, f"{cg}.generator")

    return out


def verify_against_template(converted: Dict, template: Dict, path: str = ""):
    """Shape-check a converted tree against a model-initialized template.

    Returns (missing_in_converted, extra_in_converted, shape_mismatches).
    """
    import jax

    missing, mismatched = [], []
    flat_t = {
        "/".join(str(getattr(k, "key", k)) for k in kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    flat_c = {
        "/".join(str(getattr(k, "key", k)) for k in kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    for name, leaf in flat_t.items():
        if name not in flat_c:
            missing.append(name)
        elif tuple(flat_c[name].shape) != tuple(leaf.shape):
            mismatched.append((name, flat_c[name].shape, tuple(leaf.shape)))
    extra = [n for n in flat_c if n not in flat_t]
    return missing, extra, mismatched
