"""Spectral and multiscale math utilities + precision control.

Capability parity with the reference's math layer extras
(PhiFlow/phi/math/nd.py:99-368 — fourier_laplace/fourier_poisson/fftfreq,
downsample2x/upsample2x, l1/l2/frequency losses; PhiFlow/phi/math/__init__.py:26-39
— set_precision). All functions are jit/vmap/grad compatible; spatial axes are
the leading axes unless noted.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Sequence, Union

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE, SYMMETRIC, ZERO
from diffpiso_tpu.ops.resample import REFLECT

# -- precision (math.set_precision parity) -----------------------------------

_prec = threading.local()


def get_precision() -> int:
    return getattr(_prec, "bits", 32)


def get_dtype():
    return {16: jnp.bfloat16, 32: jnp.float32, 64: jnp.float64}[get_precision()]


@contextlib.contextmanager
def set_precision(bits: int):
    """Context manager setting the default float width for grid factories and
    solvers that consult get_dtype(). 16 maps to bfloat16 (the TPU-native
    half-precision; the reference's float16 has no MXU path)."""
    assert bits in (16, 32, 64)
    prev = get_precision()
    _prec.bits = bits
    try:
        yield
    finally:
        _prec.bits = prev


# -- spectral operators -------------------------------------------------------


def fftfreq_grid(resolution: Sequence[int], mode: str = "square", dtype=jnp.float32):
    """Frequency grid for an N-d resolution (math.fftfreq, nd.py:352-368).
    mode: 'vector' (*res, d), 'absolute' |k|, or 'square' |k|^2."""
    ks = [jnp.fft.fftfreq(int(n)).astype(dtype) for n in resolution]
    grids = jnp.meshgrid(*ks, indexing="ij")
    vec = jnp.stack(grids, axis=-1)
    if mode == "vector":
        return vec
    sq = jnp.sum(vec**2, axis=-1)
    if mode == "square":
        return sq
    if mode == "absolute":
        return jnp.sqrt(sq)
    raise ValueError(mode)


def fourier_laplace(data: jax.Array, times: int = 1) -> jax.Array:
    """Spectral Laplacian on a periodic grid (nd.py fourier_laplace):
    multiplication by -(2 pi |k|)^2 in frequency space (unit cell size)."""
    k2 = fftfreq_grid(data.shape, "square", jnp.float32)
    fft = jnp.fft.fftn(data)
    out = fft * (-((2 * jnp.pi) ** 2) * k2) ** times
    res = jnp.fft.ifftn(out)
    return res.real.astype(data.dtype) if not jnp.iscomplexobj(data) else res


def fourier_poisson(data: jax.Array, times: int = 1) -> jax.Array:
    """Spectral inverse Laplacian (zero-mean gauge) — exact on periodic
    domains (nd.py fourier_poisson)."""
    k2 = fftfreq_grid(data.shape, "square", jnp.float32)
    fft = jnp.fft.fftn(data)
    denom = (-((2 * jnp.pi) ** 2) * k2) ** times
    inv = jnp.where(denom == 0, 0.0, 1.0 / jnp.where(denom == 0, 1.0, denom))
    res = jnp.fft.ifftn(fft * inv)
    return res.real.astype(data.dtype) if not jnp.iscomplexobj(data) else res


# -- discrete Laplacian on centered data ---------------------------------------

_PAD_MODE = {
    ZERO: "constant",
    REPLICATE: "edge",
    SYMMETRIC: "symmetric",
    REFLECT: "reflect",
    CIRCULAR: "wrap",
}


def laplace_centered(
    data: jax.Array,
    dx: Union[float, Sequence[float]] = 1.0,
    mode: str = REPLICATE,
    axes: Sequence[int] | None = None,
) -> jax.Array:
    """5-point (2N+1-point) Laplacian of centered data with boundary padding
    (CenteredGrid.laplace, phi/math/nd.py:253-312)."""
    axes = tuple(range(data.ndim)) if axes is None else tuple(axes)
    if isinstance(dx, (int, float)):
        dx = (float(dx),) * len(axes)
    out = jnp.zeros_like(data)
    for ax, h in zip(axes, dx):
        pad = [(0, 0)] * data.ndim
        pad[ax] = (1, 1)
        p = jnp.pad(data, pad, mode=_PAD_MODE[mode])
        lo = jax.lax.slice_in_dim(p, 0, data.shape[ax], axis=ax)
        hi = jax.lax.slice_in_dim(p, 2, data.shape[ax] + 2, axis=ax)
        out = out + (lo + hi - 2.0 * data) / (h * h)
    return out


def diffuse(
    data: jax.Array,
    amount,
    dx: Union[float, Sequence[float]] = 1.0,
    periodic: bool = False,
    substeps: int = 1,
    axes: Sequence[int] | None = None,
) -> jax.Array:
    """Finite-time diffusion dF/dt = a * lap F (field/util.py diffuse):
    exact spectral kernel exp(-(2 pi |k|)^2 a) on periodic grids, explicit
    substepped finite differences otherwise."""
    axes = tuple(range(data.ndim)) if axes is None else tuple(axes)
    if periodic:
        shape = [data.shape[a] for a in axes]
        if isinstance(dx, (int, float)):
            dx = (float(dx),) * len(axes)
        ks = [jnp.fft.fftfreq(n) / h for n, h in zip(shape, dx)]
        grids = jnp.meshgrid(*ks, indexing="ij")
        k2 = sum(g**2 for g in grids)
        kernel = jnp.exp(-((2 * jnp.pi) ** 2) * k2 * amount)
        # broadcast the kernel across non-transformed (e.g. channel) axes
        bshape = [1] * data.ndim
        for a, n in zip(axes, shape):
            bshape[a] = n
        kernel = kernel.reshape(bshape)
        fft = jnp.fft.fftn(data, axes=axes)
        out = jnp.fft.ifftn(fft * kernel, axes=axes)
        return out.real.astype(data.dtype) if not jnp.iscomplexobj(data) else out
    for _ in range(substeps):
        data = data + (amount / substeps) * laplace_centered(data, dx, REPLICATE, axes)
    return data


# -- 2x multiscale resampling ---------------------------------------------------


def downsample2x(data: jax.Array, axes: Sequence[int] | None = None) -> jax.Array:
    """Average 2x2 (2^N) blocks (nd.py downsample2x). Axis sizes must be even."""
    axes = tuple(range(data.ndim)) if axes is None else tuple(axes)
    for ax in axes:
        n = data.shape[ax]
        assert n % 2 == 0, f"axis {ax} has odd size {n}"
        lo = jax.lax.slice_in_dim(data, 0, n, stride=2, axis=ax)
        hi = jax.lax.slice_in_dim(data, 1, n, stride=2, axis=ax)
        data = 0.5 * (lo + hi)
    return data


def upsample2x(data: jax.Array, axes: Sequence[int] | None = None) -> jax.Array:
    """Linear 2x upsampling (nd.py upsample2x): each coarse cell splits into
    two fine cells at 1/4 and 3/4, interpolated from edge-replicated
    neighbors."""
    axes = tuple(range(data.ndim)) if axes is None else tuple(axes)
    for ax in axes:
        n = data.shape[ax]
        pad = [(0, 0)] * data.ndim
        pad[ax] = (1, 1)
        p = jnp.pad(data, pad, mode="edge")
        left = jax.lax.slice_in_dim(p, 0, n, axis=ax)
        mid = jax.lax.slice_in_dim(p, 1, n + 1, axis=ax)
        right = jax.lax.slice_in_dim(p, 2, n + 2, axis=ax)
        a = 0.75 * mid + 0.25 * left
        b = 0.75 * mid + 0.25 * right
        stacked = jnp.stack([a, b], axis=ax + 1)
        new_shape = list(data.shape)
        new_shape[ax] = 2 * n
        data = stacked.reshape(new_shape)
    return data


def interpolate_linear(data: jax.Array, start, size: Sequence[int]) -> jax.Array:
    """Sample a `size`-shaped window starting at fractional index `start`
    (nd.py interpolate_linear) via the resample op."""
    from diffpiso_tpu.ops.resample import grid_sample

    d = len(size)
    start = jnp.asarray(start, jnp.float32)
    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in size], indexing="ij"
    )
    pts = jnp.stack(grids, axis=-1) + start
    return grid_sample(data, pts, REPLICATE)


# -- losses ---------------------------------------------------------------------


def l1_loss(x: jax.Array, batch_norm: bool = True) -> jax.Array:
    total = jnp.sum(jnp.abs(x))
    return total / x.shape[0] if (batch_norm and x.ndim > 0) else total


def l2_loss(x: jax.Array, batch_norm: bool = True) -> jax.Array:
    total = jnp.sum(x**2) / 2.0
    return total / x.shape[0] if (batch_norm and x.ndim > 0) else total


def frequency_loss(x: jax.Array, frequency_falloff: float = 100.0) -> jax.Array:
    """L2 in frequency space with 1/(1+falloff*|k|) weighting emphasizing low
    frequencies (nd.py frequency_loss)."""
    k = fftfreq_grid(x.shape, "absolute")
    weight = 1.0 / (1.0 + frequency_falloff * k)
    fft = jnp.fft.fftn(x)
    return 0.5 * jnp.sum(jnp.abs(fft) ** 2 * weight)
