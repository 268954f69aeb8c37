from diffpiso_tpu.learning.losses import (
    l2_field_loss,
    multistep_averaging_loss,
    spectral_energy_loss,
    strain_rate_loss,
)

__all__ = [
    "l2_field_loss",
    "multistep_averaging_loss",
    "spectral_energy_loss",
    "strain_rate_loss",
]
