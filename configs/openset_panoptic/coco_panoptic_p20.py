# OSPS finetuning with 20% of thing classes unknown
# (reference configs/openset_panoptic/coco_panoptic_p20.py).
_base_ = ["../_base_/default_runtime.py"]

_asset_dir = "betrayed_by_captions_tpu/assets"
data_root = "data/coco/"

assets = dict(
    class_to_emb_file=f"{_asset_dir}/embeddings/coco_panoptic_class_with_bert_emb.json",
    known_file=None,
    unknown_file=f"{_asset_dir}/splits/unknown_p20.txt",
)

model = dict(
    # bf16 compute throughout (f32 accumulation inside kernels/losses)
    dtype="bfloat16",
    num_queries=100,
    feat_channels=256,
    emb_dim=768,
    num_decoder_layers=9,
    # stem + layer1..3 frozen (reference frozen_stages=3); stop_gradient
    # + zero-lr mask (see coco_b48n17.py)
    frozen_backbone_stages=3,
    use_class_emb=True,
    use_caption_generation=True,
    # TPU-first: per-value-level (8, 6, 4) deformable sampling windows
    # chosen on the 3-seed held-out window-study evidence (ACCURACY.md
    # §4, round 5); see models/deformable.py and coco_b48n17.py
    deform_window=(8, 6, 4),
    attn_impl="windowed_pallas",
    remat=True,  # see coco_b48n17.py
)

criterion = dict(
    softmax_temperature=10.0,
    bg_class_weight=0.1,
    cost_cls_emb=2.0,
    cost_mask=5.0,
    cost_dice=5.0,
    loss_cls_emb=2.0,
    loss_grounding=2.0,
    loss_caption_generation=2.0,
    loss_mask=5.0,
    loss_dice=5.0,
    use_class_emb=True,
    use_caption=True,
    use_caption_generation=True,
    # GT point targets at the mask-logit stride; accuracy-neutral per
    # the tools/gtds_study.py A/B (see configs/instance/coco_b48n17.py);
    # set 1 for reference-parity runs
    gt_point_downsample=4,
)

optimizer = dict(
    lr=1e-4,
    weight_decay=0.05,
    grad_clip=0.01,
    backbone_lr_mult=0.1,
    frozen_backbone_stages=3,
    lr_steps=(150000, 170000),
)

data = dict(
    samples_per_device=2,
    workers=4,
    train=dict(
        type="CocoPanopticDatasetOpen",
        ann_file=data_root + "annotations/panoptic_train2017.json",
        caption_ann_file=data_root + "annotations/captions_train2017.json",
        img_prefix=data_root + "train2017/",
        seg_prefix=data_root + "annotations/panoptic_train2017/",
        unknown_file=assets["unknown_file"],
        image_size=(1024, 1024),
        max_instances=100,
    ),
    val=dict(
        type="CocoPanopticDatasetOpen",
        ann_file=data_root + "annotations/panoptic_val2017.json",
        img_prefix=data_root + "val2017/",
        seg_prefix=data_root + "annotations/panoptic_val2017/",
        unknown_file=assets["unknown_file"],
    ),
)

panoptic_mode = True
eval_types = ("all_results",)
max_epochs = 24
eval_interval = 24
init_from = "work_dirs/coco_panoptic_p20_ag_pretrain/params.npz"
