"""Fused Pallas channels-major LayerNorm vs the XLA reference formula."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.ops.layernorm_pallas import (
    _ln_reference,
    layernorm_cm,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("eh", [8, 11])  # 11: a masked edge row block
def test_matches_reference(rng, dtype, eh):
    x = jnp.asarray(rng.randn(2, 16, eh, 7), dtype)
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    got = layernorm_cm(x, scale, bias)
    want = _ln_reference(x, scale, bias, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=1e-2 if dtype == jnp.bfloat16 else 1e-5,
        atol=1e-2 if dtype == jnp.bfloat16 else 1e-5,
    )


def test_grads_match_reference(rng):
    x = jnp.asarray(rng.randn(2, 16, 6, 5).astype(np.float32))
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)

    def loss_p(args):
        return (layernorm_cm(*args) ** 2).sum()

    def loss_r(args):
        return (_ln_reference(*args, 1e-5) ** 2).sum()

    gp = jax.grad(loss_p)((x, scale, bias))
    gr = jax.grad(loss_r)((x, scale, bias))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_module_param_tree_unchanged(rng, monkeypatch):
    """LayerNormF32CM must expose the same {ln: {scale, bias}} tree and
    the same output on both paths."""
    from betrayed_by_captions_tpu.models.deformable_cm import LayerNormF32CM

    x = jnp.asarray(rng.randn(1, 8, 6, 5).astype(np.float32))
    mod = LayerNormF32CM()
    monkeypatch.setenv("DEFORM_LN", "0")
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    monkeypatch.setenv("DEFORM_LN", "1")
    params_p = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        params
    ) == jax.tree_util.tree_structure(params_p)
    got = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
