from .resnet import ResNet
from .pixel_decoder import MSDeformAttnPixelDecoder
from .transformer_decoder import DetrDecoderLayer
from .caption_transformer import CaptionTransformer
from .bert import BertWordEmbeddings, load_bert_assets
from .class_banks import ClassEmbeddingBanks, load_class_banks
from .mask2former_head import Mask2FormerHeadOpen
from .fusion_head import FusionHeadOpen
from .detector import Mask2FormerOpen, build_detector

__all__ = [
    "ResNet",
    "MSDeformAttnPixelDecoder",
    "DetrDecoderLayer",
    "CaptionTransformer",
    "BertWordEmbeddings",
    "load_bert_assets",
    "ClassEmbeddingBanks",
    "load_class_banks",
    "Mask2FormerHeadOpen",
    "FusionHeadOpen",
    "Mask2FormerOpen",
    "build_detector",
]
