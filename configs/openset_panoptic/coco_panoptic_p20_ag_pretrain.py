# OSPS stage-1: class-agnostic panoptic pretraining
# (reference coco_panoptic_p20_ag_pretrain.py).
_base_ = ["coco_panoptic_p20.py"]

# stage 1 trains the full backbone (reference p*_ag_pretrain frozen_stages=-1)
model = dict(frozen_backbone_stages=-1)

optimizer = dict(frozen_backbone_stages=-1)

criterion = dict(
    class_agnostic=True,
    loss_cls=2.0,
    loss_cls_emb=0.0,
    use_class_emb=False,
)
data = dict(
    train=dict(class_agnostic=True),
    val=dict(class_agnostic=True),
)
eval_types = ("ins_results",)
init_from = None
