# OSPS stage-1 for the 10%-unknown split: class-agnostic panoptic
# pretraining (reference configs/openset_panoptic/p10_ag_pretrain.py,
# which differs from p20_ag_pretrain.py only in the unknown file).
_base_ = ["coco_panoptic_p20_ag_pretrain.py"]

_asset_dir = "betrayed_by_captions_tpu/assets"

assets = dict(unknown_file=f"{_asset_dir}/splits/unknown_p10.txt")
data = dict(
    train=dict(unknown_file=assets["unknown_file"]),
    val=dict(unknown_file=assets["unknown_file"]),
)
