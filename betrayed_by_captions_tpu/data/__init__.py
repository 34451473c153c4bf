from .tokenizer import WordPieceTokenizer, load_tokenizer
from .parser import LVISParser, POSParser, build_parser
from .transforms import TrainTransform, TestTransform
from .coco import CocoDatasetOpen
from .loader import DataLoader

__all__ = [
    "WordPieceTokenizer",
    "load_tokenizer",
    "LVISParser",
    "POSParser",
    "build_parser",
    "TrainTransform",
    "TestTransform",
    "CocoDatasetOpen",
    "DataLoader",
]
