"""Algebraic LES closures.

  strain_tensor_centered / smagorinsky_eddy_viscosity
  <- diffpiso/LES_models.py:13-32

The Smagorinsky model is the non-learned baseline that plugs into piso_step
through the same per-face `viscosity_field` slot the CNN closure's forcing
complements (piso_tf.py:21-24)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.fields.material import SYMMETRIC
from diffpiso_tpu.ops.fv import pad_staggered


def strain_tensor_centered(velocity: StaggeredField, dx: Sequence[float], pad_modes=SYMMETRIC):
    """Rate-of-strain components at cell centers (S_yy, S_xy, S_xy, S_xx),
    with the off-diagonal computed on corners and bilinearly averaged back
    (LES_models.py:13-26). Velocity is padded by one like custom_padded."""
    v_pad, u_pad = pad_staggered(velocity, pad_modes, 1)
    dy, dxx = float(dx[0]), float(dx[1])
    ny, nx = velocity.resolution

    # exact MAC-grid diagonal terms
    s_yy = (v_pad[2 : ny + 2, 1 : nx + 1] - v_pad[1 : ny + 1, 1 : nx + 1]) / dy
    s_xx = (u_pad[1 : ny + 1, 2 : nx + 2] - u_pad[1 : ny + 1, 1 : nx + 1]) / dxx

    # S_xy on corners: 0.5 (dv/dx + du/dy), then 4-corner average to centers
    dv_dx = (v_pad[:, 1:] - v_pad[:, :-1]) / dxx  # (ny+3, nx+1)
    du_dy = (u_pad[1:, :] - u_pad[:-1, :]) / dy  # (ny+1, nx+3)
    corners = 0.5 * (dv_dx[1 : ny + 2, 0 : nx + 1] + du_dy[0 : ny + 1, 1 : nx + 2])
    s_xy = 0.25 * (
        corners[:-1, :-1] + corners[:-1, 1:] + corners[1:, :-1] + corners[1:, 1:]
    )
    return s_yy, s_xy, s_xy, s_xx


def smagorinsky_eddy_viscosity(
    velocity: StaggeredField,
    smagorinsky_constant: float,
    dx: Sequence[float],
    pad_modes=SYMMETRIC,
):
    """nu_t = (C_s * dx^2) * |S| with |S| = sqrt(2 sum_ij S_ij^2), at cell
    centers (LES_models.py:28-32). Feed through ops.centered_to_staggered to
    get the per-face viscosity_field for piso_step."""
    s = strain_tensor_centered(velocity, dx, pad_modes)
    norm = jnp.sqrt(2.0 * sum(si**2 for si in s))
    return smagorinsky_constant * float(dx[0]) ** 2 * norm
