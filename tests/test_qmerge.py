"""Multi-query-level launch merging (DEFORM_QMERGE) parity.

The merged-query-level kernel (_multi_group_kernel) folds the coarse
query levels' launches into one pallas_call; its outputs and gradients
must be IDENTICAL to the per-level launches — the grouping changes
launch structure, not math.  Verified in interpret mode on mixed
portrait/landscape geometries, forward and backward, for 'coarse' and
'all' groupings and for mixed per-value-level windows.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.models.deformable_cm import (
    choose_orientations,
    make_reference_points_cm,
)
from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
    _qmerge_groups,
    windowed_ms_deform_attn_pallas_cm,
)

SHAPES = ((3, 2), (6, 4), (12, 8))
NH, D, P = 2, 8, 4


def _cm_inputs(rng, shapes, orientations):
    values, offsets, refs, attention = [], [], [], []
    nl = len(shapes)
    for (h, w), tr in zip(shapes, orientations):
        eh, ew = (w, h) if tr else (h, w)
        values.append(
            jnp.asarray(rng.randn(1, NH, eh, D, ew), jnp.bfloat16)
        )
        offsets.append(
            jnp.asarray(
                rng.uniform(-1.5, 1.5, (1, NH, nl, P, 2, eh, ew)),
                jnp.float32,
            )
        )
        attention.append(
            jnp.asarray(rng.rand(1, NH, nl, P, eh, ew), jnp.float32)
        )
    refs = [
        jnp.asarray(r) for r in make_reference_points_cm(shapes, orientations)
    ]
    return values, offsets, refs, attention


def _run(window, qmerge, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    orientations = choose_orientations(SHAPES)
    values, offsets, refs, attention = _cm_inputs(rng, SHAPES, orientations)
    old = os.environ.get("DEFORM_QMERGE")
    os.environ["DEFORM_QMERGE"] = qmerge
    try:
        outs = windowed_ms_deform_attn_pallas_cm(
            values, SHAPES, orientations, offsets, refs, attention,
            window=window, interpret=True,
        )
    finally:
        if old is None:
            os.environ.pop("DEFORM_QMERGE", None)
        else:
            os.environ["DEFORM_QMERGE"] = old
    return [np.asarray(o, np.float32) for o in outs]


@pytest.mark.parametrize("qmerge", ["coarse", "all"])
@pytest.mark.parametrize("window", [4, (4, 4, 4), (6, 4, 4)])
def test_qmerge_forward_matches_singleton(qmerge, window):
    base = _run(window, "0")
    got = _run(window, qmerge)
    assert len(base) == len(got) == len(SHAPES)
    for b_l, g_l in zip(base, got):
        np.testing.assert_array_equal(b_l, g_l)


def test_qmerge_gradients_match():
    rng = np.random.RandomState(3)
    orientations = choose_orientations(SHAPES)
    values, offsets, refs, attention = _cm_inputs(rng, SHAPES, orientations)

    def loss_fn(values, offsets, attention):
        outs = windowed_ms_deform_attn_pallas_cm(
            values, SHAPES, orientations, offsets, refs, attention,
            window=4, interpret=True,
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    def grads(qmerge):
        old = os.environ.get("DEFORM_QMERGE")
        os.environ["DEFORM_QMERGE"] = qmerge
        try:
            return jax.grad(loss_fn, argnums=(0, 1, 2))(
                values, offsets, attention
            )
        finally:
            if old is None:
                os.environ.pop("DEFORM_QMERGE", None)
            else:
                os.environ["DEFORM_QMERGE"] = old

    g0 = grads("0")
    g1 = grads("all")
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b_ in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_qmerge_grouping_rules():
    assert _qmerge_groups(3, [2, 2, 2]) == ((0,), (1,), (2,))
    os.environ["DEFORM_QMERGE"] = "coarse"
    try:
        assert _qmerge_groups(3, [2, 2, 2]) == ((0,), (1, 2))
        # differing per-level hp cannot share a grid
        assert _qmerge_groups(3, [2, 2, 4]) == ((0,), (1,), (2,))
        os.environ["DEFORM_QMERGE"] = "all"
        assert _qmerge_groups(3, [2, 2, 2]) == ((0, 1, 2),)
        assert _qmerge_groups(3, [4, 2, 2]) == ((0,), (1, 2))
    finally:
        os.environ.pop("DEFORM_QMERGE", None)
