from uegan_tpu.models.blocks import (
    ConvBlock,
    GAM,
    NormLayer,
    SNConv,
    get_act_fun,
)
from uegan_tpu.models.generator import Generator
from uegan_tpu.models.discriminator import Discriminator

__all__ = [
    "ConvBlock",
    "GAM",
    "NormLayer",
    "SNConv",
    "get_act_fun",
    "Generator",
    "Discriminator",
]
