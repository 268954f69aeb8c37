"""Physics losses for closure training.

JAX equivalents of diffpiso/losses.py with the same math term by term:

  l2_field_loss            <- losses.py:6-35
  spectral_energy_loss     <- losses.py:38-65
  strain_rate_loss         <- losses.py:67-94
  multistep_averaging_loss <- losses.py:96-148

Data model: a rollout is a StaggeredField whose component arrays carry a
leading time axis (the natural output of lax.scan), and the ground truth has
the same layout. Each loss returns per-step contributions (shape (T,)); the
caller sums them (sum_steps=True) or windows them for TBPTT subranges
(losses are accumulated per loss_influence_range in the reference's
sum_steps=False mode).

Cropping: `buffer_width` = ((top, bottom), (left, right)) rows/cols removed
from the loss region; `sponge_start` (0 = disabled) truncates the x-extent
before the sponge layer, matching the reference's slicing of the stacked
staggered tensor (losses.py:21-25).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.eval.spectra import ek_spectrum_2d
from diffpiso_tpu.fields.grid import StaggeredField


def _stack_rollout_tensor(rollout: StaggeredField) -> jax.Array:
    """(T, ny+1, nx+1, 2) stacked staggered tensor of a time-major rollout."""
    comps = []
    rank = len(rollout.components)
    for d, comp in enumerate(rollout.components):
        widths = [(0, 0)] + [(0, 0) if i == d else (0, 1) for i in range(rank)]
        comps.append(jnp.pad(comp, widths))
    return jnp.stack(comps, axis=-1)


def _crop(data, buffer_width, sponge_start):
    (t, b), (l, r) = buffer_width if buffer_width is not None else ((0, 0), (0, 0))
    ny = data.shape[1]
    nx = data.shape[2]
    x_end = (sponge_start if sponge_start else nx) - r
    return data[:, t : ny - b, l : x_end]


def l2_field_loss(
    rollout: StaggeredField,
    target: StaggeredField,
    buffer_width=None,
    loss_factor=1.0,
    sponge_start: int = 0,
) -> jax.Array:
    """Per-step 0.5*sum((v - v_gt)^2) over the cropped staggered tensor
    (tf.nn.l2_loss semantics, losses.py:22-27). Returns shape (T,)."""
    a = _crop(_stack_rollout_tensor(rollout), buffer_width, sponge_start)
    b = _crop(_stack_rollout_tensor(target), buffer_width, sponge_start)
    per_step = 0.5 * jnp.sum((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return per_step * loss_factor


def spectral_energy_loss(
    rollout: StaggeredField,
    target: StaggeredField,
    buffer_width=((0, 0), (0, 0)),
    loss_factor=1.0,
    sponge_start: int = 0,
    log_distance: bool = True,
    start_wavenumber: int = 0,
) -> jax.Array:
    """Per-step distance between radially binned TKE spectra of the centered
    velocities (losses.py:38-65). log_distance: sqrt(sum(log(E_gt/E)^2))
    over k > start_wavenumber; else sum|E_gt - E| over k >= 1."""

    def centered(f: StaggeredField) -> jax.Array:
        return jax.vmap(lambda *comps: StaggeredField(comps).at_centers())(
            *f.components
        )

    a = _crop(centered(rollout), buffer_width, sponge_start)
    b = _crop(centered(target), buffer_width, sponge_start)

    def one_step(ca, cb):
        e = ek_spectrum_2d(ca)
        e_gt = ek_spectrum_2d(cb)
        if log_distance:
            d = jnp.log(e_gt / e) ** 2
            return jnp.sqrt(jnp.sum(d[1 + start_wavenumber :]))
        return jnp.sum(jnp.abs(e_gt - e)[1:])

    return jax.vmap(one_step)(a, b) * loss_factor


def _strain_components(v: jax.Array, u: jax.Array, dx: Sequence[float]):
    """Forward-difference strain components of a (possibly batched) staggered
    pair, replicate-padded like math.gradient(..., 'forward')
    (losses.py:75-87). v: (..., ny+1, nx), u: (..., ny, nx+1)."""
    dy, dxx = float(dx[0]), float(dx[1])

    def fwd(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, 1)
        ap = jnp.pad(a, pad, mode="edge")
        hi = jax.lax.slice_in_dim(ap, 1, ap.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(ap, 0, ap.shape[axis] - 1, axis=axis)
        return hi - lo

    dv_dy = fwd(v, -2) / dy
    dv_dx = fwd(v, -1) / dxx
    du_dy = fwd(u, -2) / dy
    du_dx = fwd(u, -1) / dxx
    s_yy = dv_dy[..., :-1, :]
    s_xy = 0.5 * (dv_dx[..., 1:-1, 0:-1] + du_dy[..., 0:-1, 1:-1])
    s_xx = du_dx[..., :, :-1]
    return s_yy, s_xy, s_xx


def strain_rate_loss(
    rollout: StaggeredField,
    target: StaggeredField,
    dx: Sequence[float],
    loss_factor=1.0,
) -> jax.Array:
    """Per-step L1 distance of the rate-of-strain components; the
    off-diagonal term is counted twice like the reference's 4-entry list
    (losses.py:77-89)."""
    sa = _strain_components(rollout.components[0], rollout.components[1], dx)
    sb = _strain_components(target.components[0], target.components[1], dx)
    per_step = sum(
        jnp.sum(jnp.abs(a - b), axis=tuple(range(1, a.ndim))) * (2.0 if i == 1 else 1.0)
        for i, (a, b) in enumerate(zip(sa, sb))
    )
    return per_step * loss_factor


def multistep_averaging_loss(
    rollout: StaggeredField,
    target: StaggeredField,
    buffer_width=((0, 0), (0, 0)),
    loss_factor=1.0,
    loss_influence_range: Optional[int] = None,
) -> jax.Array:
    """Per-step L1 distance of sliding-window (length loss_influence_range)
    time means of u and v (losses.py:96-148). Step i is compared through the
    window centered at i (clamped at the ends)."""
    (t, b), (l, r) = buffer_width

    def crop(a):
        return a[:, t : a.shape[1] - b, l : a.shape[2] - r]

    v, u = (crop(c) for c in rollout.components)
    v_gt, u_gt = (crop(c) for c in target.components)
    steps = v.shape[0]
    win = loss_influence_range if loss_influence_range else steps
    win = min(win, steps)
    n_windows = steps - win + 1

    def window_mean(a):
        csum = jnp.cumsum(jnp.concatenate([jnp.zeros_like(a[:1]), a], axis=0), axis=0)
        return (csum[win:] - csum[:-win]) / win  # (n_windows, ...)

    au, av = window_mean(u), window_mean(v)
    au_gt, av_gt = window_mean(u_gt), window_mean(v_gt)
    per_window = jnp.sum(jnp.abs(au - au_gt), axis=tuple(range(1, au.ndim))) + jnp.sum(
        jnp.abs(av - av_gt), axis=tuple(range(1, av.ndim))
    )
    # map step index -> window index, clamped (losses.py:136-143)
    idx = jnp.clip(jnp.arange(steps) - win // 2, 0, n_windows - 1)
    return per_window[idx] * loss_factor
