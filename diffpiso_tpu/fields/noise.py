"""Smooth random noise field initializer.

Capability parity with the reference's Noise field
(PhiFlow/phi/physics/field/noise.py): spectrally-shaped Gaussian noise with
physical-size `scale` and `smoothness` controlling high-frequency rolloff,
normalized to zero mean / unit std. TPU-native: explicit jax.random key
instead of the reference's "new field per call" statefulness, so the same
key reproduces the same field under jit and across hosts.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.grid import StaggeredField


def noise(
    key: jax.Array,
    resolution: Sequence[int],
    size: Sequence[float] | None = None,
    channels: int | None = None,
    scale: float = 10.0,
    smoothness: float = 1.0,
) -> jax.Array:
    """Sample shaped noise of shape (*resolution, channels) (channels axis
    dropped when channels is None)."""
    res = tuple(int(n) for n in resolution)
    d = len(res)
    size = tuple(float(s) for s in (size or res))
    nch = channels or 1
    k1, k2 = jax.random.split(key)
    shape = res + (nch,)
    rnd = jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape)
    # |k|^2 in physical units, scaled by the fluctuation size
    ks = [
        jnp.fft.fftfreq(n) * n / s * scale for n, s in zip(res, size)
    ]
    grids = jnp.meshgrid(*ks, indexing="ij")
    ksq = sum(g**2 for g in grids)[..., None]
    lowest_frequency = 0.1
    weight_mask = 1.0 / (1.0 + jnp.exp((lowest_frequency - ksq) * 1e3))  # high-pass
    inv_k = jnp.where(ksq == 0, 0.0, 1.0 / jnp.where(ksq == 0, 1.0, ksq))
    fft = rnd * inv_k**smoothness * weight_mask
    arr = jnp.real(jnp.fft.ifftn(fft, axes=tuple(range(d))))
    arr = arr / jnp.std(arr, axis=tuple(range(d)), keepdims=True)
    arr = arr - jnp.mean(arr, axis=tuple(range(d)), keepdims=True)
    arr = arr.astype(jnp.float32)
    return arr[..., 0] if channels is None else arr


def random_solenoidal(domain, key, k_peak: float = 6.0, amplitude: float = 1.0) -> StaggeredField:
    """Divergence-free random field on a fully periodic domain, from a
    streamfunction with a peaked-spectrum filter (k^4 exp(-2(k/k_peak)^2)) —
    the canonical decaying-turbulence initial condition. Exactly solenoidal
    w.r.t. the staggered fv_divergence; normalized to rms speed `amplitude`.
    (2-D; used by examples/decaying_turbulence.py and bench.py.)"""
    import numpy as np

    ny, nx = domain.resolution
    ky = np.fft.fftfreq(ny, d=1.0 / ny)
    kx = np.fft.fftfreq(nx, d=1.0 / nx)
    kk = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    filt = (kk**4) * np.exp(-2 * (kk / k_peak) ** 2)
    rnd = jax.random.normal(key, (ny, nx))
    psi_hat = jnp.fft.fft2(rnd) * jnp.asarray(filt)
    psi = jnp.real(jnp.fft.ifft2(psi_hat))
    dy, dx = domain.dx
    # psi lives on cell corners (j-1/2, i-1/2); u face (j, i-1/2) spans the
    # corners j-1/2..j+1/2, so the forward difference makes the staggered
    # divergence cancel exactly
    u = (jnp.roll(psi, -1, 0) - psi) / dy
    v = -(jnp.roll(psi, -1, 1) - psi) / dx
    rms = jnp.sqrt(0.5 * (jnp.mean(u**2) + jnp.mean(v**2)))
    u, v = u / rms * amplitude, v / rms * amplitude
    return StaggeredField(
        (v.astype(jnp.float32), u.astype(jnp.float32)), periodic=(True, True)
    )


def noise_staggered(
    key: jax.Array,
    resolution: Sequence[int],
    size: Sequence[float] | None = None,
    periodic=(True, True),
    scale: float = 10.0,
    smoothness: float = 1.0,
) -> StaggeredField:
    """Independent noise per staggered velocity component (Noise.at for
    StaggeredGrids). Component d gets the MAC face shape: resolution + e_d
    on non-periodic axes (boundary faces stored), plain resolution on
    periodic ones (unique faces only, fields/grid.py:51-55)."""
    keys = jax.random.split(key, len(resolution))
    comps = []
    for d, k in enumerate(keys):
        shape = tuple(
            n + (1 if (ax == d and not periodic[ax]) else 0)
            for ax, n in enumerate(resolution)
        )
        comps.append(noise(k, shape, size, None, scale, smoothness))
    return StaggeredField(tuple(comps), periodic=tuple(periodic))
