from .unet import TeraUNet, TeraUNetConfig
from .unet_attn import GeneAttnExtractor

__all__ = ["TeraUNet", "TeraUNetConfig", "GeneAttnExtractor"]
