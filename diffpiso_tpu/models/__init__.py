from diffpiso_tpu.models.networks import (
    fullyconv_apply,
    init_fullyconv,
)
from diffpiso_tpu.models.les import smagorinsky_eddy_viscosity, strain_tensor_centered

__all__ = [
    "fullyconv_apply",
    "init_fullyconv",
    "smagorinsky_eddy_viscosity",
    "strain_tensor_centered",
]
