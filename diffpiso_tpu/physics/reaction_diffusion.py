"""Gray-Scott reaction-diffusion (PhiFlow/phi/physics/reaction_diffusion.py).

  du/dt = Du lap u - u v^2 + f (1 - u)
  dv/dt = Dv lap v + u v^2 - (f + k) v
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.material import REPLICATE
from diffpiso_tpu.ops.math_ext import laplace_centered
from diffpiso_tpu.physics.base import Physics


class Pattern(NamedTuple):
    u: jax.Array
    v: jax.Array


class ReactionDiffusion(Physics):
    def __init__(self, du=0.19, dv=0.05, f=0.04, k=0.05, dx=1.0, periodic=False):
        super().__init__()
        self.du, self.dv, self.f, self.k = du, dv, f, k
        self.dx = dx
        self.periodic = periodic

    def step(self, pattern: Pattern, dt=1.0, **deps) -> Pattern:
        mode = "circular" if self.periodic else REPLICATE
        lu = laplace_centered(pattern.u, self.dx, mode)
        lv = laplace_centered(pattern.v, self.dx, mode)
        uvv = pattern.u * pattern.v**2
        su = self.du * lu - uvv + self.f * (1.0 - pattern.u)
        sv = self.dv * lv + uvv - (self.f + self.k) * pattern.v
        return Pattern(pattern.u + dt * su, pattern.v + dt * sv)


def seed_pattern(resolution, mode="RANDOM", center=None, size=4, factor=1.0, seed=0):
    """Initial-condition helper (reaction_diffusion.py Seed.sample_at):
    'EXP' gaussian bump, 'RECT' box, 'RANDOM' noise with zeroed border."""
    rng = np.random.RandomState(seed)
    if mode == "EXP":
        axes = [np.arange(n) + 0.5 for n in resolution]
        grids = np.meshgrid(*axes, indexing="ij")
        c = np.asarray(center if center is not None else [n / 2 for n in resolution])
        r2 = sum((g - cc) ** 2 for g, cc in zip(grids, c))
        return jnp.asarray(np.exp(-0.5 * r2 / size**2) * factor, jnp.float32)
    if mode == "RECT":
        out = np.zeros(resolution, np.float32)
        c = [int(x) for x in (center if center is not None else [n // 2 for n in resolution])]
        sl = tuple(slice(cc - size, cc + size) for cc in c)
        out[sl] = 1.0
        return jnp.asarray(out * factor)
    if mode == "RANDOM":
        out = rng.random_sample(resolution).astype(np.float32)
        for ax in range(len(resolution)):
            sl0 = [slice(None)] * len(resolution)
            sl0[ax] = 0
            out[tuple(sl0)] = 0
            sl0[ax] = -1
            out[tuple(sl0)] = 0
        return jnp.asarray(out * factor)
    raise ValueError(mode)
