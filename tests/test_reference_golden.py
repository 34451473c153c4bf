"""Golden-parity tests that EXECUTE the reference's own torch modules.

The reference's torch-only modules import cleanly in this environment
(torch-cpu is installed; mmcv/mmdet are stubbed with a 3-line registry).
Feeding identical inputs through reference-torch and repo-JAX is the
highest-confidence accuracy-parity evidence a zero-egress environment
permits — stronger than the hand-re-derived expectations in
tests/test_porting.py, because the reference code itself produces the
expected values.

Covered (reference file:line):
- grounding loss, 4-way InfoNCE incl. the zero-token caption filler
  (open_set/models/losses/grounding_loss.py:9-77),
- from-scratch transformer decoder stack, all-layer outputs
  (open_set/models/transformers/transformers.py:180-267),
- CaptionTransformer teacher-forcing logits incl. sinusoidal positions
  (open_set/models/transformers/caption_tranformer.py:17-44),
- beam-search step scores: generator logits averaged over all decoder
  layers then log-softmaxed (open_set/utils/eval/inference.py:84-119).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_MODELS = "/root/reference/open_set/models"

ATOL = 1e-5


def _install_mm_stubs():
    """Minimal mmcv/mmdet stand-ins so the reference modules import.

    Only touches sys.modules entries that don't exist (the real packages
    are not installed in this environment)."""
    if "mmcv.runner" not in sys.modules:
        mmcv = sys.modules.setdefault("mmcv", types.ModuleType("mmcv"))
        runner = types.ModuleType("mmcv.runner")
        runner.get_dist_info = lambda: (0, 1)
        mmcv.runner = runner
        sys.modules["mmcv.runner"] = runner
    if "mmdet.models.builder" not in sys.modules:

        class _Registry:
            def register_module(self, *args, **kwargs):
                def deco(cls):
                    return cls

                return deco

        mmdet = sys.modules.setdefault("mmdet", types.ModuleType("mmdet"))
        models = types.ModuleType("mmdet.models")
        builder = types.ModuleType("mmdet.models.builder")
        builder.LOSSES = _Registry()
        builder.HEADS = _Registry()
        models.builder = builder
        mmdet.models = models
        sys.modules["mmdet.models"] = models
        sys.modules["mmdet.models.builder"] = builder


def _load(qualname: str, path: str):
    spec = importlib.util.spec_from_file_location(qualname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[qualname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def refmods():
    _install_mm_stubs()
    # package shell so caption_tranformer's relative import resolves
    pkg = types.ModuleType("ref_open_set")
    pkg.__path__ = []
    sys.modules.setdefault("ref_open_set", pkg)
    tx = _load(
        "ref_open_set.transformers", f"{REF_MODELS}/transformers/transformers.py"
    )
    cap = _load(
        "ref_open_set.caption_tranformer",
        f"{REF_MODELS}/transformers/caption_tranformer.py",
    )
    gl = _load(
        "ref_open_set.grounding_loss", f"{REF_MODELS}/losses/grounding_loss.py"
    )
    return types.SimpleNamespace(tx=tx, cap=cap, gl=gl)


# ---------------------------------------------------------------- grounding


def test_grounding_loss_golden(refmods, rng):
    from betrayed_by_captions_tpu.losses.grounding import grounding_loss

    b, q, t, d = 5, 7, 6, 16
    emb = rng.randn(b, q, d).astype(np.float32)
    cap = rng.randn(b, t, d).astype(np.float32)
    mask = (rng.rand(b, t) > 0.35).astype(np.float32)
    mask[2] = 0.0  # a zero-token caption exercises the filler path (:52-61)
    temperature = 10.0

    ref = refmods.gl.grounding_loss(
        torch.from_numpy(emb),
        torch.from_numpy(cap),
        torch.from_numpy(mask),
        temperature,
    )
    ours = grounding_loss(
        jnp.asarray(emb), jnp.asarray(cap), jnp.asarray(mask), temperature
    )
    np.testing.assert_allclose(
        float(ours), float(ref), rtol=1e-5, atol=ATOL
    )


def test_grounding_loss_golden_all_valid(refmods, rng):
    from betrayed_by_captions_tpu.losses.grounding import grounding_loss

    b, q, t, d = 4, 9, 8, 12
    emb = rng.randn(b, q, d).astype(np.float32)
    cap = rng.randn(b, t, d).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    ref = refmods.gl.grounding_loss(
        torch.from_numpy(emb), torch.from_numpy(cap), torch.from_numpy(mask), 7.0
    )
    ours = grounding_loss(jnp.asarray(emb), jnp.asarray(cap), jnp.asarray(mask), 7.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=ATOL)


# ------------------------------------------------- caption decoder weights


def _port_self_attn(t_block, heads):
    """torch fused-qkv MultiHeadSelfAttention -> q/k/v/out Dense params.

    The torch layer computes qkv = x @ W.T, reshapes the 3C output to
    (H, 3*hd) per position and chunks the LAST dim into q/k/v
    (transformers.py:111-117) — so output column h*3hd + j holds head h's
    q (j < hd), k (hd <= j < 2hd) or v (j >= 2hd).  Our q/k/v Dense
    kernels are (in, H*hd) with column h*hd + i."""
    w = t_block.qkv_layer.weight.detach().numpy()  # (3C, C)
    bias = t_block.qkv_layer.bias.detach().numpy()  # (3C,)
    c = w.shape[1]
    hd = c // heads
    m = np.arange(c)
    h, i = m // hd, m % hd
    perm_q = h * 3 * hd + i
    perm_k = perm_q + hd
    perm_v = perm_q + 2 * hd

    def dense(perm):
        return {"kernel": jnp.asarray(w.T[:, perm]), "bias": jnp.asarray(bias[perm])}

    return {
        "q_proj": dense(perm_q),
        "k_proj": dense(perm_k),
        "v_proj": dense(perm_v),
        "out_proj": _port_linear(t_block.out_layer),
    }


def _port_linear(t_linear):
    return {
        "kernel": jnp.asarray(t_linear.weight.detach().numpy().T),
        "bias": jnp.asarray(t_linear.bias.detach().numpy()),
    }


def _port_cross_attn(t_block):
    return {
        "q_proj": _port_linear(t_block.to_qry),
        "k_proj": _port_linear(t_block.to_key),
        "v_proj": _port_linear(t_block.to_val),
        "out_proj": _port_linear(t_block.to_out),
    }


def _port_layernorm(t_ln):
    return {
        "ln": {
            "scale": jnp.asarray(t_ln.weight.detach().numpy()),
            "bias": jnp.asarray(t_ln.bias.detach().numpy()),
        }
    }


def _port_decoder_block(t_block, heads):
    """Reference post-norm DecoderBlock (transformers.py:180-234) -> our
    CaptionDecoderBlock param subtree."""
    ffn = t_block.ffn_layer.linears
    return {
        "self_attn": _port_self_attn(t_block.mha_layer, heads),
        "norm1": _port_layernorm(t_block.layer_normalz["mha"][1]),
        "cross_attn": _port_cross_attn(t_block.crx_layer),
        "norm2": _port_layernorm(t_block.layer_normalz["crx"][1]),
        "ffn_fc1": _port_linear(ffn[0][0]),
        "ffn_fc2": _port_linear(ffn[1][0]),
        "norm3": _port_layernorm(t_block.layer_normalz["ffn"][1]),
    }


def _port_caption_transformer(t_cap, num_layers, heads):
    params = {
        f"layer{li}": _port_decoder_block(t_cap.transformer_decoder.decoders[li], heads)
        for li in range(num_layers)
    }
    params["generator"] = _port_linear(t_cap.generator)
    return params


# --------------------------------------------------------- decoder stack


def _build_pair(refmods, num_layers=4, hidden=32, ff=24, heads=4, vocab=50, seq=12):
    """(torch CaptionTransformer in eval mode, our CaptionTransformer,
    ported params)."""
    from betrayed_by_captions_tpu.models.caption_transformer import (
        CaptionTransformer,
    )

    torch.manual_seed(0)
    t_cap = refmods.cap.CaptionTransformer(
        nb_layers=num_layers,
        input_dim=hidden,
        hidden_dim=hidden,
        ff_dim=ff,
        nb_heads=heads,
        drop_val=0.1,
        pre_norm=False,  # flagship post-norm path
        seq_length=seq,
        nb_tokens=vocab,
    ).eval()
    ours = CaptionTransformer(
        num_layers=num_layers,
        input_dim=hidden,
        hidden_dim=hidden,
        ff_dim=ff,
        num_heads=heads,
        dropout=0.1,
        seq_length=seq,
        vocab_size=vocab,
    )
    params = _port_caption_transformer(t_cap, num_layers, heads)
    return t_cap, ours, params


def test_decoder_stack_all_layer_outputs_golden(refmods, rng):
    """Reference TransformerDecoder returns every layer's output
    (transformers.py:252-267); ours must match layer by layer."""
    t_cap, ours, params = _build_pair(refmods)
    b, t, m, c = 2, 7, 5, 32
    tgt = rng.randn(b, t, c).astype(np.float32)
    memory = rng.randn(b, m, c).astype(np.float32)
    causal = refmods.cap.build_mask(torch.from_numpy(tgt))

    with torch.no_grad():
        ref_layers = t_cap.transformer_decoder(
            torch.from_numpy(tgt), torch.from_numpy(memory), causal
        )

    # drive only the decoder blocks (positions are added by the full
    # module; here we feed raw tgt to isolate the stack)
    import flax.linen as fnn

    from betrayed_by_captions_tpu.models.caption_transformer import (
        CaptionDecoderBlock,
    )

    class _Plain(fnn.Module):
        @fnn.compact
        def __call__(self, tgt, memory):
            causal_j = jnp.triu(jnp.ones((tgt.shape[1],) * 2, dtype=bool), k=1)
            outs = []
            x = tgt
            for li in range(4):
                x = CaptionDecoderBlock(
                    hidden_dim=32, ff_dim=24, num_heads=4, name=f"layer{li}"
                )(x, memory, causal_j, None, True)
                outs.append(x)
            return jnp.stack(outs)

    stack_params = {k: v for k, v in params.items() if k.startswith("layer")}
    got = _Plain().apply({"params": stack_params}, jnp.asarray(tgt), jnp.asarray(memory))
    ref = np.stack([layer.numpy() for layer in ref_layers])
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=ATOL)


def test_caption_teacher_forcing_logits_golden(refmods, rng):
    """Full CaptionTransformer (positions + stack + generator): last-layer
    teacher-forcing logits and all hidden states match the reference."""
    t_cap, ours, params = _build_pair(refmods)
    b, t, m, c = 2, 9, 6, 32
    tgt = rng.randn(b, t, c).astype(np.float32)
    memory = rng.randn(b, m, c).astype(np.float32)

    with torch.no_grad():
        ref_hidden, ref_logits = t_cap(
            torch.from_numpy(tgt), torch.from_numpy(memory)
        )

    all_hidden, logits = ours.apply(
        {"params": params}, jnp.asarray(tgt), jnp.asarray(memory)
    )
    np.testing.assert_allclose(
        np.asarray(all_hidden),
        np.stack([h.numpy() for h in ref_hidden]),
        rtol=1e-4,
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=ATOL
    )


def test_beam_step_scores_golden(refmods, rng):
    """Beam-search step scores: generator logits averaged over ALL decoder
    layers, then log-softmax (inference.py:91-113 and :110-119)."""
    t_cap, ours, params = _build_pair(refmods)
    w, t, m, c = 3, 5, 6, 32
    tgt = rng.randn(w, t, c).astype(np.float32)
    memory = rng.randn(w, m, c).astype(np.float32)

    with torch.no_grad():
        ref_layers, _ = t_cap(torch.from_numpy(tgt), torch.from_numpy(memory))
        ref_logits = torch.mean(
            torch.stack([t_cap.generator(out[:, -1, :]) for out in ref_layers]),
            dim=0,
        )
        ref_scores = torch.log_softmax(ref_logits, dim=1).numpy()

    all_hidden, _ = ours.apply(
        {"params": params}, jnp.asarray(tgt), jnp.asarray(memory)
    )
    import jax

    avg = ours.apply({"params": params}, all_hidden, method="generate").mean(axis=0)
    got = np.asarray(jax.nn.log_softmax(avg[:, -1, :], axis=-1))
    np.testing.assert_allclose(got, ref_scores, rtol=1e-4, atol=ATOL)
