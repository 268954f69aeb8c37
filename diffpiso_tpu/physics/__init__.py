from diffpiso_tpu.physics.base import (
    Physics,
    Static,
    STATIC,
    StateDependency,
    StateRecord,
)
from diffpiso_tpu.physics.world import StateCollection, World
from diffpiso_tpu.physics.burgers import Burgers, advect_centered_vector
from diffpiso_tpu.physics.heat import HeatDiffusion
from diffpiso_tpu.physics.ks import KuramotoSivashinsky
from diffpiso_tpu.physics.reaction_diffusion import (
    Pattern,
    ReactionDiffusion,
    seed_pattern,
)
from diffpiso_tpu.physics.schroedinger import (
    Schroedinger,
    harmonic_potential,
    normalize_probability,
    psquare,
    sin_potential,
    step_potential,
    wave_packet,
)
from diffpiso_tpu.physics.fluid import Drift, IncompressibleFlow
from diffpiso_tpu.physics.effect import (
    ADD,
    FIX,
    GROW,
    Accelerator,
    ColdSource,
    ConstantVelocity,
    Fan,
    FieldEffect,
    Gravity,
    HeatSource,
    Inflow,
    effect_applied,
)
from diffpiso_tpu.physics.obstacle import (
    GeometryMovement,
    Obstacle,
    apply_obstacle_velocities,
    obstacle_accessible_mask,
)

__all__ = [
    "Physics",
    "Static",
    "STATIC",
    "StateDependency",
    "StateRecord",
    "StateCollection",
    "World",
    "Burgers",
    "advect_centered_vector",
    "HeatDiffusion",
    "KuramotoSivashinsky",
    "Pattern",
    "ReactionDiffusion",
    "seed_pattern",
    "Schroedinger",
    "harmonic_potential",
    "normalize_probability",
    "psquare",
    "sin_potential",
    "step_potential",
    "wave_packet",
    "Drift",
    "IncompressibleFlow",
    "ADD", "FIX", "GROW",
    "Accelerator", "ColdSource", "ConstantVelocity", "Fan", "FieldEffect",
    "Gravity", "HeatSource", "Inflow", "effect_applied",
    "GeometryMovement",
    "Obstacle",
    "apply_obstacle_velocities",
    "obstacle_accessible_mask",
]
