"""betrayed_by_captions_tpu: a TPU-native (JAX/XLA/Pallas) open-vocabulary
segmentation framework with the capabilities of CGG
("Betrayed by Captions", ICCV 2023, jianzongwu/betrayed-by-captions).

The framework re-designs the reference's CUDA/torch/mmdet stack for TPU:

- compute path: flax.linen modules, jit/pjit-compiled train & eval steps,
  Pallas kernels for the hot ops (multi-scale deformable attention),
  on-device batched Hungarian matching (no host round-trips),
- parallelism: ``jax.sharding.Mesh`` + NamedSharding; data parallelism and
  the caption-grounding global-batch contrastive loss fall out of pjit's
  global-view semantics (no manual NCCL-style collectives),
- runtime: host-side data pipeline with fixed-shape batch contracts
  (static shapes everywhere), orbax checkpointing, native C++ RLE codec
  for the evaluation path.
"""

__version__ = "0.1.0"
