# OVIS finetuning: COCO 48 base / 17 novel open-vocabulary instance
# segmentation (reference configs/instance/coco_b48n17.py).
_base_ = ["../_base_/default_runtime.py"]

_asset_dir = "betrayed_by_captions_tpu/assets"
data_root = "data/coco/"

assets = dict(
    class_to_emb_file=f"{_asset_dir}/embeddings/coco_class_with_bert_emb.json",
    known_file=f"{_asset_dir}/splits/known_65.txt",
    unknown_file=f"{_asset_dir}/splits/unknown_17.txt",
)

model = dict(
    # bf16 compute throughout (f32 accumulation inside kernels/losses)
    dtype="bfloat16",
    num_queries=100,
    feat_channels=256,
    emb_dim=768,
    num_decoder_layers=9,
    backbone_depth=50,
    # stem + layer1..3 frozen (reference frozen_stages=3); enforced with
    # stop_gradient in the backbone AND a zero-lr optimizer mask
    frozen_backbone_stages=3,
    use_class_emb=True,
    use_caption_generation=True,
    pred_emb_norm=False,
    vocab_size=30522,
    max_caption_len=35,
    # TPU-first: per-value-level deformable sampling windows (offsets
    # clamped to +-(W_l/2-1) cells of the sampled level; see
    # models/deformable.py docstring), fused Pallas kernels with
    # custom-VJP backward. (8, 6, 4) over value strides (8, 16, 32)
    # keeps a CONSTANT ~24-48 px clamp reach across levels with 116
    # dense cells instead of 192. Chosen on 3-SEED HELD-OUT evidence
    # (ACCURACY.md §4, 512^2 occluding scenes, 16 unseen images):
    # exact-unclamped 0.213+-0.033 segm mAP, W=(8,6,4) 0.203+-0.040,
    # W=8 0.199+-0.013 — both windowed impls within 1 sd of exact,
    # mixed windows 1.23x faster end-to-end (PERF.md round 12:
    # 36.3 vs 29.5 img/s/chip). A single int (deform_window=8) and
    # 4/6 remain supported for A/B runs.
    deform_window=(8, 6, 4),
    attn_impl="windowed_pallas",
    # rematerialize encoder layers in the backward pass: the 6-layer
    # deformable encoder's activations dominate training HBM at 1024^2
    remat=True,
)

criterion = dict(
    softmax_temperature=10.0,
    bg_class_weight=0.1,
    cost_cls=0.0,
    cost_cls_emb=2.0,
    cost_mask=5.0,
    cost_dice=5.0,
    loss_cls=0.0,
    loss_cls_emb=2.0,
    loss_grounding=2.0,
    loss_caption_generation=2.0,
    loss_mask=5.0,
    loss_dice=5.0,
    use_class_emb=True,
    use_caption=True,
    use_caption_generation=True,
    # use_caption_align=True adds the reference's off-by-default
    # LOCAL-batch query<->caption-noun alignment loss
    # (mask2former_head.py:583-589; losses/criterion.py pins its math
    # to the grounding InfoNCE at this temperature). The matching
    # optimizer knobs freeze_pretrained / freeze_v2l live in the
    # optimizer dict (mask2former_head.py:242-247).
    # GT point targets sampled from an exact bilinear 4x downsample of
    # the GT masks (the mask-logit stride) instead of the reference's
    # full-res sampling (mask2former_head.py:609-613): the k=1 einsums
    # contract over H=1024 and alone cost ~3 s/step at batch-8 1024^2.
    # Accuracy A/B (tools/gtds_study.py, PERF.md round-5 table): k=4
    # overfit segm mAP 0.942 vs k=1 0.895 — neutral within run noise.
    # Set 1 for reference-parity runs.
    gt_point_downsample=4,
)

optimizer = dict(
    lr=1e-4,
    weight_decay=0.05,
    grad_clip=0.01,
    backbone_lr_mult=0.1,
    frozen_backbone_stages=3,
    warmup_iters=10,
    warmup_ratio=1.0,
    lr_steps=(70000, 80000),
    lr_gamma=0.1,
)

data = dict(
    samples_per_device=2,
    workers=4,
    train=dict(
        type="CocoDatasetOpen",
        ann_file=data_root + "annotations/instances_train2017.json",
        caption_ann_file=data_root + "annotations/captions_train2017.json",
        img_prefix=data_root + "train2017/",
        known_file=assets["known_file"],
        unknown_file=assets["unknown_file"],
        filter_empty_gt=False,
        image_size=(1024, 1024),
        max_instances=100,
    ),
    val=dict(
        type="CocoDatasetOpen",
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "val2017/",
        known_file=assets["known_file"],
        unknown_file=assets["unknown_file"],
    ),
)

eval_types = ("all_results", "novel_results", "base_results")
metrics = ("segm", "bbox")
max_epochs = 12
eval_interval = 12
# stage-2 initialization from class-agnostic pretraining
init_from = "work_dirs/coco_ag_pretrain_3x/params.npz"
