# Stage-1 class-agnostic pretraining, 36 epochs
# (reference configs/instance/coco_ag_pretrain_3x.py).
_base_ = ["coco_b48n17.py"]

model = dict(
    # bf16 compute throughout (f32 accumulation inside kernels/losses)
    dtype="bfloat16",
    use_class_emb=True,
    use_caption_generation=True,
    # stage 1 trains the full backbone (reference frozen_stages=-1)
    frozen_backbone_stages=-1,
)

optimizer = dict(frozen_backbone_stages=-1)

criterion = dict(
    class_agnostic=True,
    loss_cls=2.0,  # agnostic stage trains the plain classifier
    loss_cls_emb=0.0,
    use_class_emb=False,
)

data = dict(
    train=dict(class_agnostic=True),
    val=dict(class_agnostic=True),
)

eval_types = ("ins_results",)
max_epochs = 36
eval_interval = 36
init_from = None
lr_steps = (210000, 250000)
