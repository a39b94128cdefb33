"""Flax model modules: encoders, decoder, the IMM model shell, VGG16."""

from imm_tpu.models.nets import ContentEncoder, PoseEncoder, Decoder
from imm_tpu.models.imm import IMM, IMMConfig, IMMOutputs
from imm_tpu.models.vgg import VGG16Features, load_vgg16_params

__all__ = [
    "ContentEncoder",
    "PoseEncoder",
    "Decoder",
    "IMM",
    "IMMConfig",
    "IMMOutputs",
    "VGG16Features",
    "load_vgg16_params",
]
