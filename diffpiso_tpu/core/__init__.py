from diffpiso_tpu.core.piso import PisoOutput, SimulationParameters, piso_step
from diffpiso_tpu.core.masks import lid_driven_cavity_masks, mixing_layer_masks

__all__ = [
    "PisoOutput",
    "SimulationParameters",
    "piso_step",
    "lid_driven_cavity_masks",
    "mixing_layer_masks",
]
