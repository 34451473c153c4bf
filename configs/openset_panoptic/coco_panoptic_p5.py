# OSPS with 5% unknown things (reference coco_panoptic_p5.py).
_base_ = ["coco_panoptic_p20.py"]

_asset_dir = "betrayed_by_captions_tpu/assets"
assets = dict(unknown_file=f"{_asset_dir}/splits/unknown_p5.txt")
data = dict(
    train=dict(unknown_file=assets["unknown_file"]),
    val=dict(unknown_file=assets["unknown_file"]),
)
init_from = "work_dirs/coco_panoptic_p5_ag_pretrain/params.npz"
