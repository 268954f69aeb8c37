from diffpiso_tpu.models.networks import (
    fullyconv_apply,
    init_fullyconv,
)
from diffpiso_tpu.models.les import smagorinsky_eddy_viscosity, strain_tensor_centered
from diffpiso_tpu.models.unet import (
    conv2d,
    init_residual_block,
    init_unet,
    residual_block,
    unet_apply,
)

__all__ = [
    "fullyconv_apply",
    "init_fullyconv",
    "smagorinsky_eddy_viscosity",
    "strain_tensor_centered",
    "conv2d",
    "init_residual_block",
    "init_unet",
    "residual_block",
    "unet_apply",
]
