# OSPS stage-1: class-agnostic panoptic pretraining
# (reference coco_panoptic_p20_ag_pretrain.py).
_base_ = ["coco_panoptic_p20.py"]

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
