"""Golden parity for the open CE loss family against the reference's
own torch module (open_set/models/losses/cross_entropy_loss.py).

Extends the executable-golden chain (tests/test_reference_golden.py)
to the classification losses: the criterion's
``weighted_softmax_ce_sum / avg_factor`` must equal the reference's
``cross_entropy(..., class_weight, avg_factor)`` (used for loss_cls
and loss_cls_emb, mask2former_head.py:516-537), and
``ignore_index_ce_sum`` must match torch CE-with-ignore_index (the
caption-generation loss uses ignore_index=0 = BERT [PAD]).

``weight_reduce_loss`` is stubbed with mmdet 2.28's exact semantics
(sum / (avg_factor + f32 eps) under 'mean' with avg_factor) — the only
piece of the reference import graph not present in this environment.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_reference_golden import _install_mm_stubs, _load


def _install_weight_reduce_stub():
    """mmdet.models.losses.utils.weight_reduce_loss, mmdet 2.28
    semantics (mmdet/models/losses/utils.py)."""
    name = "mmdet.models.losses.utils"
    if name in sys.modules:
        return

    def reduce_loss(loss, reduction):
        if reduction == "none":
            return loss
        if reduction == "mean":
            return loss.mean()
        return loss.sum()

    def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
        if weight is not None:
            loss = loss * weight
        if avg_factor is None:
            return reduce_loss(loss, reduction)
        if reduction == "mean":
            eps = torch.finfo(torch.float32).eps
            return loss.sum() / (avg_factor + eps)
        if reduction != "none":
            raise ValueError("avg_factor can not be used with reduction=sum")
        return loss

    mmdet = sys.modules.setdefault("mmdet", types.ModuleType("mmdet"))
    models = sys.modules.setdefault(
        "mmdet.models", types.ModuleType("mmdet.models")
    )
    losses = types.ModuleType("mmdet.models.losses")
    utils = types.ModuleType(name)
    utils.weight_reduce_loss = weight_reduce_loss
    utils.reduce_loss = reduce_loss
    losses.utils = utils
    models.losses = losses
    mmdet.models = models
    sys.modules["mmdet.models.losses"] = losses
    sys.modules[name] = utils


@pytest.fixture(scope="module")
def refce():
    _install_mm_stubs()
    _install_weight_reduce_stub()
    return _load(
        "ref_ce_loss",
        "/root/reference/open_set/models/losses/cross_entropy_loss.py",
    )


def test_class_weighted_ce_with_avg_factor_golden(refce, rng):
    """loss_cls / loss_cls_emb protocol: flattened (B*Q, C+1) logits,
    background class down-weighted, avg_factor = class_weight[labels]
    sum (mask2former_head.py:522-537)."""
    from betrayed_by_captions_tpu.losses.cross_entropy import (
        weighted_softmax_ce_sum,
    )

    n, c = 37, 5
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n).astype(np.int64)
    class_weight = np.array([1.0, 1.0, 1.0, 1.0, 0.1], np.float32)
    avg_factor = float(class_weight[labels].sum())

    want = refce.cross_entropy(
        torch.from_numpy(logits),
        torch.from_numpy(labels),
        class_weight=torch.from_numpy(class_weight),
        avg_factor=avg_factor,
    )
    got = weighted_softmax_ce_sum(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(class_weight)
    ) / avg_factor
    # the reference adds f32 eps to avg_factor; ~1e-7 relative
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ce_sample_weights_golden(refce, rng):
    """Per-sample label_weights (all-ones in the shipped path, but the
    reference API supports masking; verify the weighted form too)."""
    from betrayed_by_captions_tpu.losses.cross_entropy import (
        softmax_cross_entropy,
    )

    n, c = 21, 4
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n).astype(np.int64)
    weights = (rng.rand(n) > 0.3).astype(np.float32)
    avg_factor = 7.0

    want = refce.cross_entropy(
        torch.from_numpy(logits),
        torch.from_numpy(labels),
        weight=torch.from_numpy(weights),
        avg_factor=avg_factor,
    )
    ce = softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    got = (ce * jnp.asarray(weights)).sum() / avg_factor
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ignore_index_ce_golden(refce, rng):
    """Caption-generation CE: ignore_index=0 ([PAD]), averaged over
    non-ignored tokens (mask2former_head.py:550-580 via
    CrossEntropyLossOpen(avg_non_ignore))."""
    from betrayed_by_captions_tpu.losses.cross_entropy import (
        ignore_index_ce_sum,
    )

    n, v = 40, 30
    logits = rng.randn(n, v).astype(np.float32)
    labels = rng.randint(0, v, n).astype(np.int64)
    labels[rng.rand(n) < 0.4] = 0  # PAD

    want = refce.cross_entropy(
        torch.from_numpy(logits),
        torch.from_numpy(labels),
        ignore_index=0,
        avg_non_ignore=True,
    )
    ce_sum, cnt = ignore_index_ce_sum(
        jnp.asarray(logits), jnp.asarray(labels), ignore_index=0
    )
    got = ce_sum / jnp.maximum(cnt, 1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_nll_loss_golden(refce, rng):
    """negative_log_likelihood_loss (cross_entropy_loss.py:11-61):
    log-probability inputs + class weights."""
    n, c = 18, 6
    logp = np.log(
        np.random.RandomState(0).dirichlet(np.ones(c), n).astype(np.float32)
        + 1e-9
    )
    labels = rng.randint(0, c, n).astype(np.int64)
    cw = (rng.rand(c).astype(np.float32) + 0.5)

    want = refce.negative_log_likelihood_loss(
        torch.from_numpy(logp),
        torch.from_numpy(labels),
        class_weight=torch.from_numpy(cw),
    )
    # the reference runs F.nll_loss(reduction='none') then
    # weight_reduce_loss(reduction='mean') — a PLAIN mean over N, not
    # torch's weighted mean (sum/weight-sum); its class weights scale
    # the numerator only (cross_entropy_loss.py:42-61)
    w = cw[labels]
    got = float((-logp[np.arange(n), labels] * w).mean())
    np.testing.assert_allclose(got, float(want), rtol=1e-5)
