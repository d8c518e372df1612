from loftr_tpu.models.matcher import LoFTR
from loftr_tpu.models.backbone import ResNetFPN_8_2, ResNetFPN_16_4, build_backbone
from loftr_tpu.models.transformer import LocalFeatureTransformer, LoFTREncoderLayer

__all__ = ["LoFTR", "ResNetFPN_8_2", "ResNetFPN_16_4", "build_backbone",
           "LocalFeatureTransformer", "LoFTREncoderLayer"]
