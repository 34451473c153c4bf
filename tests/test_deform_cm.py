"""Channels-major encoder parity vs the token-layout path.

The CM modules (models/deformable_cm.py) must be numerically equivalent
to the token-layout modules with ``attn_impl='windowed_pallas'`` — same
param trees, same math, different resident layout. Verified param-for-
param on small mixed-orientation level geometries (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.models.deformable import (
    MSDeformAttention,
    make_reference_points,
)
from betrayed_by_captions_tpu.models.deformable_cm import (
    EncoderLayerCM,
    MSDeformAttentionCM,
    choose_orientations,
    make_reference_points_cm,
)
from betrayed_by_captions_tpu.models.pixel_decoder import EncoderLayer

# portrait level set: the (12, 8) level stores transposed
SHAPES = ((3, 2), (6, 4), (12, 8))
C, NH, P, W = 16, 2, 4, 4


def tokens_to_cm(x, shapes, orientations):
    """(B, S, C) -> per-level (B, C, eh, ew)."""
    out, off = [], 0
    b = x.shape[0]
    for (h, w), tr in zip(shapes, orientations):
        t = x[:, off : off + h * w].reshape(b, h, w, -1)
        perm = (0, 3, 2, 1) if tr else (0, 3, 1, 2)
        out.append(jnp.transpose(t, perm))
        off += h * w
    return tuple(out)


def cm_to_tokens(levels, shapes, orientations):
    out = []
    b = levels[0].shape[0]
    for t, (h, w), tr in zip(levels, shapes, orientations):
        perm = (0, 3, 2, 1) if tr else (0, 2, 3, 1)
        out.append(jnp.transpose(t, perm).reshape(b, h * w, -1))
    return jnp.concatenate(out, axis=1)


class TestCMParity:
    def _data(self, rng):
        s = sum(h * w for h, w in SHAPES)
        q = jnp.asarray(rng.randn(1, s, C).astype(np.float32))
        v = jnp.asarray(rng.randn(1, s, C).astype(np.float32))
        return q, v

    def test_attention_matches_token_path(self, rng):
        q, v = self._data(rng)
        orientations = choose_orientations(SHAPES)
        assert orientations[-1], "portrait level should store transposed"

        tok_mod = MSDeformAttention(
            embed_dim=C, num_heads=NH, num_levels=len(SHAPES), num_points=P,
            attn_impl="windowed_pallas", window=W,
        )
        ref = jnp.asarray(make_reference_points(SHAPES))
        params = tok_mod.init(jax.random.PRNGKey(0), q, v, ref, SHAPES)
        # non-trivial offsets/attention: randomize the zero-init params
        rs = np.random.RandomState(1)
        for name in ("sampling_offsets", "attention_weights"):
            leaf = params["params"][name]
            params["params"][name] = {
                "kernel": jnp.asarray(
                    rs.randn(*leaf["kernel"].shape).astype(np.float32) * 0.1
                ),
                "bias": leaf["bias"],
            }
        want = tok_mod.apply(params, q, v, ref, SHAPES)

        cm_mod = MSDeformAttentionCM(
            embed_dim=C, num_heads=NH, num_levels=len(SHAPES), num_points=P,
            window=W,
        )
        q_cm = tokens_to_cm(q, SHAPES, orientations)
        v_cm = tokens_to_cm(v, SHAPES, orientations)
        refs_cm = [
            jnp.asarray(r)
            for r in make_reference_points_cm(SHAPES, orientations)
        ]
        got_cm = cm_mod.apply(
            params, q_cm, v_cm, refs_cm, SHAPES, orientations
        )
        got = cm_to_tokens(got_cm, SHAPES, orientations)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
        )

    def test_encoder_layer_matches_token_path(self, rng):
        q, _ = self._data(rng)
        orientations = choose_orientations(SHAPES)
        s = q.shape[1]
        pos = jnp.asarray(rng.randn(1, s, C).astype(np.float32) * 0.1)

        tok_layer = EncoderLayer(
            spatial_shapes=SHAPES, embed_dim=C, num_heads=NH,
            num_levels=len(SHAPES), num_points=P, ffn_dim=32,
            attn_impl="windowed_pallas", window=W,
        )
        ref = jnp.asarray(make_reference_points(SHAPES))
        params = tok_layer.init(jax.random.PRNGKey(0), q, pos, ref)
        want = tok_layer.apply(params, q, pos, ref)

        cm_layer = EncoderLayerCM(
            spatial_shapes=SHAPES, orientations=orientations, embed_dim=C,
            num_heads=NH, num_levels=len(SHAPES), num_points=P, ffn_dim=32,
            window=W,
        )
        q_cm = tokens_to_cm(q, SHAPES, orientations)
        pos_cm = tokens_to_cm(pos, SHAPES, orientations)
        refs_cm = tuple(
            jnp.asarray(r)
            for r in make_reference_points_cm(SHAPES, orientations)
        )
        # identical param tree: apply the token layer's params directly
        got_cm = cm_layer.apply(params, q_cm, tuple(pos_cm), refs_cm)
        got = cm_to_tokens(got_cm, SHAPES, orientations)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
        )

    def test_encoder_layer_grads_flow(self, rng):
        q, _ = self._data(rng)
        orientations = choose_orientations(SHAPES)
        cm_layer = EncoderLayerCM(
            spatial_shapes=SHAPES, orientations=orientations, embed_dim=C,
            num_heads=NH, num_levels=len(SHAPES), num_points=P, ffn_dim=32,
            window=W,
        )
        q_cm = tokens_to_cm(q, SHAPES, orientations)
        pos_cm = tuple(jnp.zeros_like(t) for t in q_cm)
        refs_cm = tuple(
            jnp.asarray(r)
            for r in make_reference_points_cm(SHAPES, orientations)
        )
        params = cm_layer.init(jax.random.PRNGKey(0), q_cm, pos_cm, refs_cm)

        def loss(p):
            out = cm_layer.apply(p, q_cm, pos_cm, refs_cm)
            return sum(o.astype(jnp.float32).sum() for o in out)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
        assert total > 0

    def _inbound_offset_params(self, mod, q_cm, v_cm, refs_cm, orientations,
                               wins, rng):
        """Init params whose sampling offsets are CONSTANT (zero kernel)
        and already inside every level's mixed-window clamp, so a dense
        max-window model and a mixed-window model see identical clamped
        offsets."""
        params = mod.init(
            jax.random.PRNGKey(0), q_cm, v_cm, refs_cm, SHAPES, orientations
        )
        rs = np.random.RandomState(3)
        bias = np.stack(
            [
                rs.uniform(-(wl / 2 - 1) * 0.95, (wl / 2 - 1) * 0.95,
                           size=(NH, P, 2))
                for wl in wins
            ],
            axis=1,
        ).reshape(-1)  # (NH, NL, P, 2) -> flat
        off = dict(params["params"]["sampling_offsets"])
        off["bias"] = jnp.asarray(bias.astype(np.float32))
        aw = dict(params["params"]["attention_weights"])
        aw["kernel"] = jnp.asarray(
            rs.randn(*aw["kernel"].shape).astype(np.float32) * 0.1
        )
        p2 = dict(params["params"])
        p2["sampling_offsets"] = off
        p2["attention_weights"] = aw
        return {"params": p2}

    @pytest.mark.slow  # W=8 interpret-mode traces are ~1 min each
    def test_mixed_window_matches_dense_max(self, rng):
        """Per-value-level windows (8, 6, 4): running each level at its
        own window must equal the dense max-window kernel whenever the
        offsets respect every level's clamp (the outer cells of the dense
        window carry zero tent weight)."""
        wins = (8, 6, 4)
        q, v = self._data(rng)
        orientations = choose_orientations(SHAPES)
        q_cm = tokens_to_cm(q, SHAPES, orientations)
        v_cm = tokens_to_cm(v, SHAPES, orientations)
        refs_cm = [
            jnp.asarray(r)
            for r in make_reference_points_cm(SHAPES, orientations)
        ]
        mixed = MSDeformAttentionCM(
            embed_dim=C, num_heads=NH, num_levels=len(SHAPES), num_points=P,
            window=wins,
        )
        dense = MSDeformAttentionCM(
            embed_dim=C, num_heads=NH, num_levels=len(SHAPES), num_points=P,
            window=max(wins),
        )
        params = self._inbound_offset_params(
            mixed, q_cm, v_cm, refs_cm, orientations, wins, rng
        )
        got = mixed.apply(params, q_cm, v_cm, refs_cm, SHAPES, orientations)
        want = dense.apply(params, q_cm, v_cm, refs_cm, SHAPES, orientations)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.02, atol=0.02
            )

    def test_mixed_window_tuple_equals_int(self, rng):
        """window=(4, 4, 4) must be exactly the window=4 path."""
        q, v = self._data(rng)
        orientations = choose_orientations(SHAPES)
        q_cm = tokens_to_cm(q, SHAPES, orientations)
        v_cm = tokens_to_cm(v, SHAPES, orientations)
        refs_cm = [
            jnp.asarray(r)
            for r in make_reference_points_cm(SHAPES, orientations)
        ]
        m_t = MSDeformAttentionCM(
            embed_dim=C, num_heads=NH, num_levels=len(SHAPES), num_points=P,
            window=(W, W, W),
        )
        m_i = MSDeformAttentionCM(
            embed_dim=C, num_heads=NH, num_levels=len(SHAPES), num_points=P,
            window=W,
        )
        params = m_i.init(
            jax.random.PRNGKey(0), q_cm, v_cm, refs_cm, SHAPES, orientations
        )
        a = m_t.apply(params, q_cm, v_cm, refs_cm, SHAPES, orientations)
        b = m_i.apply(params, q_cm, v_cm, refs_cm, SHAPES, orientations)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.slow  # mixed-window backward traces all pair VJPs
    def test_mixed_window_grads_flow(self, rng):
        q, _ = self._data(rng)
        orientations = choose_orientations(SHAPES)
        cm_layer = EncoderLayerCM(
            spatial_shapes=SHAPES, orientations=orientations, embed_dim=C,
            num_heads=NH, num_levels=len(SHAPES), num_points=P, ffn_dim=32,
            window=(8, 6, 4),
        )
        q_cm = tokens_to_cm(q, SHAPES, orientations)
        pos_cm = tuple(jnp.zeros_like(t) for t in q_cm)
        refs_cm = tuple(
            jnp.asarray(r)
            for r in make_reference_points_cm(SHAPES, orientations)
        )
        params = cm_layer.init(jax.random.PRNGKey(0), q_cm, pos_cm, refs_cm)

        def loss(p):
            out = cm_layer.apply(p, q_cm, pos_cm, refs_cm)
            return sum(o.astype(jnp.float32).sum() for o in out)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0

    def test_pixel_decoder_cm_matches_exact(self, rng):
        """The full pixel decoder on the CM path vs attn_impl='exact'
        (same params; windowed clamp keeps sampling identical)."""
        from betrayed_by_captions_tpu.models.pixel_decoder import (
            MSDeformAttnPixelDecoder,
        )

        feats = [
            jnp.asarray(rng.randn(1, 24, 16, 8).astype(np.float32)),
            jnp.asarray(rng.randn(1, 12, 8, 8).astype(np.float32)),
            jnp.asarray(rng.randn(1, 6, 4, 8).astype(np.float32)),
            jnp.asarray(rng.randn(1, 3, 2, 8).astype(np.float32)),
        ]
        cgn = 32  # ConvGN group count divides feat_channels
        kw = dict(
            feat_channels=cgn, out_channels=cgn, num_encoder_layers=2,
            num_heads=NH, num_points=P, ffn_dim=32, window=W,
        )
        dec_cm = MSDeformAttnPixelDecoder(attn_impl="windowed_pallas", **kw)
        dec_ex = MSDeformAttnPixelDecoder(attn_impl="windowed", **kw)
        params = dec_ex.init(jax.random.PRNGKey(0), feats)
        mf_ex, mem_ex = dec_ex.apply(params, feats)
        mf_cm, mem_cm = dec_cm.apply(params, feats)
        np.testing.assert_allclose(
            np.asarray(mf_cm), np.asarray(mf_ex), rtol=0.06, atol=0.06
        )
        for a, b in zip(mem_cm, mem_ex):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.06, atol=0.06
            )
