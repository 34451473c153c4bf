# Interactive/demo open-set panoptic config (reference
# configs/demo/coco_panoptic_p20.py): the K=20% OSPS model set up for
# single-image inference (examples/demo.py with panoptic post-processing).
_base_ = ["../openset_panoptic/coco_panoptic_p20.py"]

init_from = None

eval_types = ("all_results",)
eval_batch_size = 1
