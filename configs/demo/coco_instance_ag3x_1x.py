# Interactive/demo OVIS config (reference configs/demo/coco_instance_ag3x_1x.py):
# the flagship coco_b48n17 model set up for single-image inference with
# caption generation (examples/demo.py, the notebook-equivalent pipeline).
_base_ = ["../instance/coco_b48n17.py"]

# demo runs from a ported checkpoint; no two-stage init
init_from = None

eval_types = ("all_results",)
eval_batch_size = 1
