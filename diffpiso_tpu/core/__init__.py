from diffpiso_tpu.core.piso import (
    PisoOutput,
    SimulationParameters,
    piso_step,
    zero_adjoint_channels,
)
from diffpiso_tpu.core.masks import (
    channel_masks,
    lid_driven_cavity_masks,
    lid_driven_cavity_masks_3d,
    mixing_layer_masks,
    second_order_lid_values,
)
from diffpiso_tpu.core.setups import (
    MixingLayerSetup,
    spatial_mixing_layer_setup,
)

__all__ = [
    "PisoOutput",
    "SimulationParameters",
    "piso_step",
    "zero_adjoint_channels",
    "channel_masks",
    "lid_driven_cavity_masks",
    "lid_driven_cavity_masks_3d",
    "mixing_layer_masks",
    "second_order_lid_values",
    "MixingLayerSetup",
    "spatial_mixing_layer_setup",
]
