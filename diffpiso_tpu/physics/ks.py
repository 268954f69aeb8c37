"""Kuramoto-Sivashinsky equation (PhiFlow/phi/physics/flame.py):

  du/dt = -lap u - lap^2 u - 1/2 |grad u|^2,  mean removed each step.

Periodic domains use the exact spectral operators (the equation is the
classic flame-front chaos benchmark on a periodic box); bounded domains fall
back to finite differences with replicate padding.
"""

from __future__ import annotations

import jax.numpy as jnp

from diffpiso_tpu.fields.material import REPLICATE
from diffpiso_tpu.ops.math_ext import fourier_laplace, laplace_centered
from diffpiso_tpu.physics.base import Physics


class KuramotoSivashinsky(Physics):
    def __init__(self, dx=1.0, periodic=True):
        super().__init__()
        self.dx = dx
        self.periodic = periodic

    def _grad_sq(self, u):
        d = u.ndim
        dx = (self.dx,) * d if isinstance(self.dx, (int, float)) else tuple(self.dx)
        total = jnp.zeros_like(u)
        for ax, h in zip(range(d), dx):
            if self.periodic:
                g = (jnp.roll(u, -1, ax) - jnp.roll(u, 1, ax)) / (2 * h)
            else:
                pad = [(0, 0)] * d
                pad[ax] = (1, 1)
                p = jnp.pad(u, pad, mode="edge")
                lo = jnp.take(p, jnp.arange(u.shape[ax]), axis=ax)
                hi = jnp.take(p, jnp.arange(2, u.shape[ax] + 2), axis=ax)
                g = (hi - lo) / (2 * h)
            total = total + g**2
        return total

    def step(self, u, dt=1.0, **deps):
        if self.periodic and isinstance(self.dx, (int, float)) and self.dx == 1.0:
            lap = fourier_laplace(u)
            lap2 = fourier_laplace(u, times=2)
        else:
            mode = "circular" if self.periodic else REPLICATE
            lap = laplace_centered(u, self.dx, mode)
            lap2 = laplace_centered(lap, self.dx, mode)
        du = -lap - lap2 - 0.5 * self._grad_sq(u)
        out = u + dt * du
        return out - jnp.mean(out)
