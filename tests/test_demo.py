"""examples/demo.py end-to-end smoke test (reference notebook stand-in).

Runs the demo CLI main() on the bundled synthetic image with a tiny
config + randomly initialized checkpoint: config load -> checkpoint load
-> Detector forward -> host postprocess -> caption beam search ->
visualization file. Catches interface drift between the interactive API
and the model (the reference's equivalent is notebooks/inference.ipynb
on examples/toilet.png)."""

import os
import runpy
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.slow
def test_demo_cli_runs(tmp_path, monkeypatch):
    from betrayed_by_captions_tpu.config import Config
    from betrayed_by_captions_tpu.data.synthetic import write_synthetic_coco
    from betrayed_by_captions_tpu.engine.checkpoint import save_params
    from betrayed_by_captions_tpu.models import bert as bert_mod
    from betrayed_by_captions_tpu.models.detector import build_detector

    paths = write_synthetic_coco(
        str(tmp_path / "data"), n_images=1, hw=(64, 64), n_classes=2,
        emb_dim=16,
    )
    cfg_path = tmp_path / "tiny_cfg.py"
    cfg_path.write_text(
        f"""
assets = dict(class_to_emb_file={paths['class_emb']!r})
model = dict(
    num_queries=6,
    feat_channels=32,
    emb_dim=16,
    num_decoder_layers=2,
    caption_num_layers=2,
    vocab_size=200,
    max_caption_len=10,
)
data = dict()
allow_synthetic_bert = True
"""
    )

    cfg = Config.fromfile(str(cfg_path))
    model = build_detector(Config.fromdict(dict(cfg.model, num_classes=2)))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        method="init_forward",
    )["params"]
    ckpt = tmp_path / "params.npz"
    save_params(str(ckpt), params)

    # tiny-vocab synthetic BERT for the caption path
    monkeypatch.setattr(
        bert_mod,
        "load_bert_assets",
        lambda path=None, allow_synthetic=False: (
            bert_mod.synthetic_bert_assets(200, 16)
        ),
    )

    out_file = tmp_path / "demo_out.jpg"
    image = os.path.join(REPO, "examples", "synthetic_shapes.jpg")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "demo.py",
            str(cfg_path),
            str(ckpt),
            image,
            "--out",
            str(out_file),
            "--with-caption",
        ],
    )
    runpy.run_path(
        os.path.join(REPO, "examples", "demo.py"), run_name="__main__"
    )
    assert out_file.exists() and out_file.stat().st_size > 0
