# Cross-dataset open-vocabulary evaluation on ADE20K (100 classes)
# (reference configs/demo/ade20k_instance.py + open_set/datasets/ade20k.py).
_base_ = ["../instance/coco_b48n17.py"]

_asset_dir = "betrayed_by_captions_tpu/assets"
data_root = "data/ADEChallengeData2016/"

assets = dict(
    class_to_emb_file=f"{_asset_dir}/embeddings/ade20k_instance_class_with_bert_emb.json",
    known_file=None,
    unknown_file=None,
    _delete_=True,
)

data = dict(
    val=dict(
        type="CocoDatasetOpen",
        ann_file=data_root + "ade20k_instance_val.json",
        img_prefix=data_root + "images/validation/",
        known_file=None,
        unknown_file=None,
        _delete_=True,
    ),
)

eval_types = ("all_results",)
init_from = None
