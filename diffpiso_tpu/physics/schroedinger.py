"""Schroedinger equation via split-step Fourier.

Capability parity with PhiFlow/phi/physics/schroedinger.py: potential phase
rotation -> kinetic rotation in frequency space -> obstacle masking ->
boundary margin -> probability renormalization; plus the WavePacket,
HarmonicPotential, SinPotential and StepPotential initializers
(schroedinger.py:85-167). TPU note: complex FFTs lower to two real FFTs on
the VPU; the whole step is one fused jit region.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from diffpiso_tpu.ops.math_ext import fftfreq_grid
from diffpiso_tpu.physics.base import Physics, StateDependency


def normalize_probability(amplitude: jax.Array) -> jax.Array:
    """Scale so sum |psi|^2 == 1 (schroedinger.py:28-31)."""
    p = jnp.sum(jnp.abs(amplitude) ** 2)
    return amplitude / jnp.sqrt(p).astype(amplitude.dtype)


def psquare(amplitude: jax.Array) -> jax.Array:
    return jnp.abs(amplitude) ** 2


class Schroedinger(Physics):
    def __init__(self, mass: float = 0.1, margin: int = 1, normalize: bool = True):
        super().__init__(
            [StateDependency("potentials", "potential_effect", blocking=True)]
        )
        self.mass = mass
        self.margin = margin
        self.normalize = normalize

    def step(self, amplitude, dt=1.0, potentials=(), obstacle_mask=None, **deps):
        amp = jnp.asarray(amplitude)
        if not jnp.iscomplexobj(amp):
            amp = amp.astype(jnp.complex64)
        # rotate by potential
        potential = None
        for pot in potentials or ():
            potential = pot if potential is None else potential + pot
        if potential is not None:
            amp = amp * jnp.exp(1j * (potential * dt).astype(amp.dtype))
        # kinetic rotation in frequency space
        k2 = fftfreq_grid(amp.shape, "square")
        phase = jnp.exp(
            (-1j * (2 * jnp.pi) ** 2 * dt / (2.0 * self.mass)) * k2.astype(amp.dtype)
        )
        amp = jnp.fft.ifftn(jnp.fft.fftn(amp) * phase)
        if obstacle_mask is not None:
            amp = amp * (1.0 - obstacle_mask).astype(amp.dtype)
        if self.margin:
            mask = jnp.zeros(amp.shape, jnp.float32)
            inner = tuple(slice(self.margin, -self.margin) for _ in amp.shape)
            mask = mask.at[inner].set(1.0)
            amp = amp * mask.astype(amp.dtype)
        if self.normalize:
            amp = normalize_probability(amp)
        return amp


# -- analytic initial conditions -------------------------------------------------


def _point_grid(resolution: Sequence[int], dx=1.0):
    d = len(resolution)
    if isinstance(dx, (int, float)):
        dx = (float(dx),) * d
    axes = [
        (jnp.arange(n, dtype=jnp.float32) + 0.5) * h for n, h in zip(resolution, dx)
    ]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grids, axis=-1)


def wave_packet(resolution, center, size, wave_vector, dx=1.0) -> jax.Array:
    """Gaussian wave packet exp(-|x-c|^2 / 2 sigma^2) * exp(i k.x)
    (schroedinger.py WavePacket.sample_at)."""
    pts = _point_grid(resolution, dx)
    center = jnp.asarray(center, jnp.float32)
    k = jnp.asarray(wave_vector, jnp.float32)
    envelope = jnp.exp(-0.5 * jnp.sum((pts - center) ** 2, -1) / (size**2))
    phase = jnp.exp(1j * jnp.sum(pts * k, -1).astype(jnp.complex64))
    return envelope.astype(jnp.complex64) * phase


def harmonic_potential(
    resolution, center, unit_distance, maximum_value=1.0, dx=1.0
) -> jax.Array:
    """V = |x-c|^2 / L^2, clipped (schroedinger.py HarmonicPotential)."""
    pts = _point_grid(resolution, dx)
    center = jnp.asarray(center, jnp.float32)
    pot = jnp.sum(((pts - center) / unit_distance) ** 2, -1)
    if maximum_value is not None:
        pot = jnp.minimum(pot, maximum_value)
    return pot


def sin_potential(resolution, k, phase_offset=0.0, dx=1.0) -> jax.Array:
    """V = sin(k.x + phi) (schroedinger.py SinPotential)."""
    pts = _point_grid(resolution, dx)
    k = jnp.asarray(k, jnp.float32)
    return jnp.sin(jnp.sum(pts * k, -1) + phase_offset)


def step_potential(geometry_mask: jax.Array, height: float) -> jax.Array:
    """V = height inside the geometry (schroedinger.py StepPotential)."""
    return geometry_mask * height
