# OSPS stage-1 for the 5%-unknown split: class-agnostic panoptic
# pretraining (reference configs/openset_panoptic/p5_ag_pretrain.py,
# which differs from p20_ag_pretrain.py only in the unknown file).
_base_ = ["coco_panoptic_p20_ag_pretrain.py"]

_asset_dir = "betrayed_by_captions_tpu/assets"

assets = dict(unknown_file=f"{_asset_dir}/splits/unknown_p5.txt")
data = dict(
    train=dict(unknown_file=assets["unknown_file"]),
    val=dict(unknown_file=assets["unknown_file"]),
)
