"""Turbulence statistics: energy spectra, vorticity structure functions.

JAX equivalents of the reference's evaluation tools
(diffpiso/evaluation_tools.py):

  ek_spectrum_2d      <- EK_spectrum_2D_tf (:163-186) — differentiable,
                         jit-safe (static radial bins via bincount-style
                         segment_sum), used inside the spectral loss
  ek_spectrum_2d_np   <- EK_spectrum_2D (:92-113) — numpy offline version
  ek_spectrum_1d      <- EK_spectrum_1D_tf (:188-202)
  vorticity_structure / vorticity_correlation <- (:50-90)
  spectral_analysis_time <- (:10-28)

Convention: `velocity_centered` is (ny, nx, 2) with channel 0 = v (y),
channel 1 = u (x), as produced by StaggeredField.at_centers().
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _radial_bins(ny: int, nx: int):
    """Static rounded-radius bin index per (shifted) wavenumber cell."""
    iy = np.arange(ny) - ny / 2
    ix = np.arange(nx) - nx / 2
    r = np.sqrt(iy[:, None] ** 2 + ix[None, :] ** 2)
    bins = np.round(r).astype(np.int32)
    return bins, int(bins.max()) + 1


def ek_spectrum_2d(velocity_centered: jax.Array) -> jax.Array:
    """Radially binned 2-D TKE spectrum (differentiable).

    Returns E(k) for k = 0 .. min(ny, nx)//2 - 1, normalized like the
    reference: sum over shells of 0.5*(|u_hat|^2 + |v_hat|^2) / (ny*nx)^2."""
    ny, nx, _ = velocity_centered.shape
    u = velocity_centered[..., 1]
    v = velocity_centered[..., 0]
    u_fft = jnp.fft.fft2(u)
    v_fft = jnp.fft.fft2(v)
    e = jnp.abs(u_fft * jnp.conj(u_fft)) + jnp.abs(v_fft * jnp.conj(v_fft))
    e = jnp.fft.fftshift(e)
    bins, n_bins = _radial_bins(ny, nx)
    esum = jax.ops.segment_sum(
        e.reshape(-1), jnp.asarray(bins.reshape(-1)), num_segments=n_bins
    ) * 0.5
    cutoff = min(ny, nx) // 2
    return esum[:cutoff] / (float(ny * nx) ** 2)


def ek_spectrum_1d(velocity_centered: jax.Array, axis: int) -> jax.Array:
    """1-D spectrum along `axis`, summed over the other axis
    (EK_spectrum_1D_tf, evaluation_tools.py:188-202)."""
    n = velocity_centered.shape[1]
    u = velocity_centered[..., 1]
    v = velocity_centered[..., 0]
    u_fft = jnp.fft.fft(u, axis=axis)
    v_fft = jnp.fft.fft(v, axis=axis)
    e = jnp.abs(u_fft * jnp.conj(u_fft)) + jnp.abs(v_fft * jnp.conj(v_fft))
    other = 1 - axis
    esum = jnp.sum(e, axis=other)
    return esum[: n // 2 + 1]


def ek_spectrum_2d_np(velocity_centered: np.ndarray):
    """Offline numpy version returning (k, E(k)) with the reference's small
    epsilon floor (EK_spectrum_2D, evaluation_tools.py:92-113)."""
    velocity_centered = np.asarray(velocity_centered)
    ny, nx = velocity_centered.shape[:2]
    cutoff = ny // 2
    u = velocity_centered[..., 1]
    v = velocity_centered[..., 0]
    u_fft = np.fft.fft2(u) / u.size
    v_fft = np.fft.fft2(v) / v.size
    e = np.fft.fftshift(np.abs(u_fft * np.conj(u_fft)) + np.abs(v_fft * np.conj(v_fft)))
    bins, n_bins = _radial_bins(ny, nx)
    esum = np.bincount(bins.reshape(-1), weights=e.reshape(-1), minlength=n_bins) * 0.5
    esum += 1e-20
    return np.arange(esum.size, dtype=float)[:cutoff], esum[:cutoff]


def _vorticity_padded(velocity, dx0: float):
    """Reference vorticity stencil on the padded staggered tensor
    (evaluation_tools.py:51-53). velocity: StaggeredField."""
    from diffpiso_tpu.fields.material import SYMMETRIC
    from diffpiso_tpu.ops.fv import pad_staggered

    v_pad, u_pad = pad_staggered(velocity, SYMMETRIC, 1)
    # (u[j,i] - u[j,i-1])/dx - (v[j,i] - v[j-1,i])/dx on the padded grid
    u_t = u_pad[1:-1, 1:-1]
    u_tm = u_pad[1:-1, :-2]
    v_t = v_pad[1:-1, 1:-1]
    v_tm = v_pad[:-2, 1:-1]
    ny, nx = np.asarray(u_t.shape), None
    m = min(u_t.shape[0], v_t.shape[0]), min(u_t.shape[1], v_t.shape[1])
    return (u_t[: m[0], : m[1]] - u_tm[: m[0], : m[1]]) / dx0 - (
        v_t[: m[0], : m[1]] - v_tm[: m[0], : m[1]]
    ) / dx0


def _radial_average(data: np.ndarray):
    ny, nx = data.shape
    iy = (np.arange(ny) - ny / 2) ** 2
    ix = (np.arange(nx) - nx / 2) ** 2
    r = np.round(np.sqrt(iy[:, None] + ix[None, :])).astype(int)
    nmax = int(np.ceil(np.sqrt((ny // 2) ** 2 + (nx // 2) ** 2)) + 1)
    sums = np.bincount(r.reshape(-1), weights=data.reshape(-1), minlength=nmax)
    counts = np.bincount(r.reshape(-1), minlength=nmax)
    out = np.zeros(nmax)
    out[counts > 0] = sums[counts > 0] / counts[counts > 0]
    return out


def vorticity_structure(velocity, dx0: float) -> np.ndarray:
    """Radially averaged vorticity increment w.r.t. the domain center
    (evaluation_tools.py:50-69)."""
    w = np.asarray(_vorticity_padded(velocity, dx0))
    center = w[w.shape[0] // 2, w.shape[1] // 2]
    return _radial_average(w - center)


def vorticity_correlation(velocity, dx0: float) -> np.ndarray:
    """Radially averaged two-point vorticity correlation normalized by the
    center value (evaluation_tools.py:71-90)."""
    w = np.asarray(_vorticity_padded(velocity, dx0))
    center = w[w.shape[0] // 2, w.shape[1] // 2]
    return _radial_average(w * center) / (center * center)


def spectral_analysis_time(velocity, tstart, y_range, x_range, averaging, sample_spacing):
    """Temporal spectra of a (T, ny, nx, 2) velocity history
    (evaluation_tools.py:10-28)."""
    velocity = np.asarray(velocity)
    window = velocity[tstart:, y_range[0] : y_range[1], x_range[0] : x_range[1], :]
    ux = window[..., 1] - averaging * np.average(window[..., 1], axis=0)
    uy = window[..., 0] - averaging * np.average(window[..., 0], axis=0)
    n = uy.shape[0]
    uy_dft = np.fft.fft(uy, n, axis=0)
    ux_dft = np.fft.fft(ux, n, axis=0)
    freq = np.arange(0, n - 1) * (1.0 / sample_spacing / n)
    freq = freq[freq < 1.0 / sample_spacing / 2]
    ek = np.abs(ux_dft[: n // 2]) ** 2 + np.abs(uy_dft[: n // 2]) ** 2
    return freq, uy_dft, ux_dft, ek


def plot_spectra(spectra, labels=None, path=None, guides=(-3.0, -5.0 / 3.0, -5.0)):
    """Log-log TKE spectra plot with k^p guide lines (the reference's
    plot_spectra, diffpiso/evaluation_tools.py:205-219). `spectra` is a list
    of 1-D arrays E(k); returns the matplotlib figure (saved to `path` when
    given)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.5, 4.0))
    for i, ek in enumerate(spectra):
        ek = np.asarray(ek)
        k = np.arange(1, ek.shape[0])
        label = labels[i] if labels else f"spectrum {i}"
        ax.loglog(k, ek[1:], label=label)
    kref = np.arange(2, max(len(np.asarray(s)) for s in spectra))
    e0 = float(np.asarray(spectra[0])[2]) if len(np.asarray(spectra[0])) > 2 else 1.0
    for p in guides:
        ax.loglog(kref, e0 * (kref / 2.0) ** p, "k--", lw=0.6)
        ax.annotate(f"k^{p:.2g}", (kref[-1], e0 * (kref[-1] / 2.0) ** p), fontsize=7)
    ax.set_xlabel("k")
    ax.set_ylabel("E(k)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=130)
    return fig
