from .tokenizer import WordPieceTokenizer, load_tokenizer
from .parser import LVISParser, POSParser, build_parser
from .transforms import TrainTransform, TestTransform
from .coco import CocoDatasetOpen
from .coco_panoptic import CocoPanopticDatasetOpen
from .ade20k import ADE20KDataset
from .loader import DataLoader, ClassBalancedDataset
from .panoptic_codec import rgb2id, id2rgb

__all__ = [
    "WordPieceTokenizer",
    "load_tokenizer",
    "LVISParser",
    "POSParser",
    "build_parser",
    "TrainTransform",
    "TestTransform",
    "CocoDatasetOpen",
    "CocoPanopticDatasetOpen",
    "ADE20KDataset",
    "DataLoader",
    "ClassBalancedDataset",
    "rgb2id",
    "id2rgb",
]
