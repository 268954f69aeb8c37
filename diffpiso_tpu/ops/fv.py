"""Finite-volume operators on staggered grids.

TPU-native (shift/pad based, autodiff-friendly) equivalents of the
reference's FV helpers:

  fv_divergence       <- finite_volume_divergence   (diffpiso/piso_helpers.py:277-310)
  fv_gradient         <- finite_volume_gradient_tensor (piso_helpers.py:236-274)
  pad_staggered       <- custom_padded               (piso_helpers.py:35-55)
  vorticity           <- vorticity                   (piso_helpers.py:313-323)
  centered_to_faces   <- CenteredGrid.at(staggered component) resampling

All return the *volume-integrated* quantities exactly like the reference
(factors of prod(dx)/dx_d are baked in), so downstream PISO algebra matches
term by term.
"""

from __future__ import annotations

import math as _math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE, SYMMETRIC, ZERO

_JNP_MODE = {ZERO: "constant", REPLICATE: "edge", SYMMETRIC: "symmetric", CIRCULAR: "wrap"}


def pad_centered(data: jax.Array, modes, width: int = 1) -> jax.Array:
    """Pad a centered field with per-axis-per-side modes.

    modes: ((lo_mode, hi_mode) per axis) using the constants in
    fields.material, or a single mode string applied everywhere.
    """
    if isinstance(modes, str):
        modes = tuple((modes, modes) for _ in range(data.ndim))
    for axis, (lo, hi) in enumerate(modes):
        widths_lo = [(0, 0)] * data.ndim
        widths_lo[axis] = (width, 0)
        widths_hi = [(0, 0)] * data.ndim
        widths_hi[axis] = (0, width)
        if lo == hi:
            widths = [(0, 0)] * data.ndim
            widths[axis] = (width, width)
            data = jnp.pad(data, widths, mode=_JNP_MODE[lo])
        else:
            data = jnp.pad(data, widths_lo, mode=_JNP_MODE[lo])
            data = jnp.pad(data, widths_hi, mode=_JNP_MODE[hi])
    return data


def pad_staggered(field: StaggeredField, modes, width: int = 1) -> Tuple[jax.Array, ...]:
    """Pad each staggered component by `width` on all sides.

    Mirrors custom_padded (piso_helpers.py:35-55): when axis d is periodic
    (circular mode) and the component is staggered in d, the stored duplicate
    face (last entry along d) is dropped before wrapping so the circular pad
    runs over the unique faces, then one extra upper pad restores the shape.
    Returns a tuple of plain arrays (shape = component shape + 2*width).
    """
    if isinstance(modes, str):
        modes = tuple((modes, modes) for _ in range(field.rank))
    out = []
    for c, comp in enumerate(field.components):
        data = comp
        for axis in range(field.rank):
            lo, hi = modes[axis]
            w_lo, w_hi = width, width
            if lo == CIRCULAR or hi == CIRCULAR:
                assert lo == hi == CIRCULAR, "periodic axes must wrap on both sides"
                if axis == c and not field.periodic[axis]:
                    # duplicate-face storage (reference layout): drop the
                    # stored duplicate so the wrap runs over the unique
                    # faces, then restore the shape with one extra pad.
                    # Fields marked periodic already store unique faces.
                    data = jax.lax.slice_in_dim(data, 0, data.shape[axis] - 1, axis=axis)
                    w_hi = width + 1
                widths = [(0, 0)] * data.ndim
                widths[axis] = (w_lo, w_hi)
                data = jnp.pad(data, widths, mode="wrap")
            elif lo == hi:
                widths = [(0, 0)] * data.ndim
                widths[axis] = (w_lo, w_hi)
                data = jnp.pad(data, widths, mode=_JNP_MODE[lo])
            else:
                widths = [(0, 0)] * data.ndim
                widths[axis] = (w_lo, 0)
                data = jnp.pad(data, widths, mode=_JNP_MODE[lo])
                widths = [(0, 0)] * data.ndim
                widths[axis] = (0, w_hi)
                data = jnp.pad(data, widths, mode=_JNP_MODE[hi])
        out.append(data)
    return tuple(out)


def fv_divergence(field: StaggeredField, dx: Sequence[float]) -> jax.Array:
    """Volume-integrated divergence: sum_d (comp_d[+1] - comp_d) * prod(dx)/dx_d.

    Matches finite_volume_divergence (piso_helpers.py:277-310). The boundary
    faces stored in the field are used directly, so no padding is involved;
    plain autodiff reproduces the reference's hand-written adjoint
    (scatter +/- onto faces, zero outside) exactly.
    """
    dx = tuple(float(d) for d in dx)
    dxprod = _math.prod(dx)
    if field.rank in (2, 3) and all(field.periodic):
        from diffpiso_tpu.ops import pallas_fv

        c0 = field.components[0]
        elig = pallas_fv.eligible3 if field.rank == 3 else pallas_fv.eligible2
        if (
            all(c.shape == c0.shape for c in field.components)
            and elig(c0.shape, c0.dtype)
        ):
            fs = tuple(dxprod / d for d in dx)
            op = pallas_fv.div3 if field.rank == 3 else pallas_fv.div2
            return op(fs, tuple(field.components))
    if field.rank == 2:
        from diffpiso_tpu.ops import pallas_fv

        comps_ = field.components
        res_ = (comps_[1].shape[0], comps_[0].shape[1])
        if pallas_fv.eligible2m(
            tuple(c.shape for c in comps_), res_, comps_[0].dtype
        ):
            fs = tuple(dxprod / d_ for d_ in dx)
            return pallas_fv.div2m(
                fs, tuple(field.periodic), res_, tuple(comps_)
            )
    total = None
    for d, comp in enumerate(field.components):
        if field.periodic[d]:
            lo, hi = comp, jnp.roll(comp, -1, axis=d)
        else:
            lo = jax.lax.slice_in_dim(comp, 0, comp.shape[d] - 1, axis=d)
            hi = jax.lax.slice_in_dim(comp, 1, comp.shape[d], axis=d)
        term = (hi - lo) * (dxprod / dx[d])
        total = term if total is None else total + term
    return total


def fv_gradient(
    pressure: jax.Array,
    dx: Sequence[float],
    pad_modes,
    accessible_mask: jax.Array | None = None,
) -> StaggeredField:
    """Volume-integrated pressure gradient sampled on staggered faces.

    Per axis d: (p_upper - p_lower) * prod(dx)/dx_d where p is padded by one
    on each end of axis d using the domain's pressure pad modes (zero at
    solid walls, replicate at open boundaries — see Material.pressure_pad).
    If `accessible_mask` (padded centered mask, shape res+2) is given, faces
    touching an inaccessible cell are zeroed, replicating the
    zero_gradient_mask of piso_helpers.py:255-265.
    """
    dx = tuple(float(d) for d in dx)
    dxprod = _math.prod(dx)
    if isinstance(pad_modes, str):
        pad_modes = tuple((pad_modes, pad_modes) for _ in range(pressure.ndim))
    periodic = tuple(lo == CIRCULAR for lo, _ in pad_modes)
    if pressure.ndim in (2, 3) and all(periodic):
        from diffpiso_tpu.ops import pallas_fv

        elig = pallas_fv.eligible3 if pressure.ndim == 3 else pallas_fv.eligible2
        if elig(pressure.shape, pressure.dtype):
            fs = tuple(dxprod / d for d in dx)
            op = pallas_fv.grad3 if pressure.ndim == 3 else pallas_fv.grad2
            comps = list(op(fs, pressure))
            if accessible_mask is not None:
                comps = _mask_gradient_faces(
                    comps, accessible_mask, periodic, pressure.ndim
                )
            return StaggeredField(tuple(comps), periodic=periodic)
    if pressure.ndim == 2:
        from diffpiso_tpu.ops import pallas_fv

        comp_shapes = tuple(
            tuple(
                pressure.shape[i] + (0 if periodic[d] else 1) * (i == d)
                for i in range(2)
            )
            for d in range(2)
        )
        modes_ok = all(
            periodic[d]
            or (
                pad_modes[d][0] in (ZERO, REPLICATE, SYMMETRIC)
                and pad_modes[d][1] in (ZERO, REPLICATE, SYMMETRIC)
            )
            for d in range(2)
        )
        if modes_ok and pallas_fv.eligible2m(
            comp_shapes, pressure.shape, pressure.dtype
        ):
            fs = tuple(dxprod / d_ for d_ in dx)
            # SYMMETRIC at pad width 1 is identical to REPLICATE
            rep = tuple(
                (pad_modes[d][0] != ZERO, pad_modes[d][1] != ZERO)
                for d in range(2)
            )
            masks = None
            if accessible_mask is not None:
                masks = tuple(
                    m.astype(pressure.dtype)
                    for m in _face_masks(accessible_mask, periodic, 2)
                )
            comps_f = pallas_fv.grad2m(
                fs, tuple(periodic), rep, comp_shapes, pressure, masks
            )
            return StaggeredField(tuple(comps_f), periodic=periodic)
    comps = []
    for d in range(pressure.ndim):
        lo_mode, hi_mode = pad_modes[d]
        if lo_mode == CIRCULAR:
            # unique-face periodic gradient; autodiff through the roll IS the
            # wrap-aware adjoint the reference hand-codes
            # (circular_padded_gradient, piso_helpers.py:226-233)
            grad = pressure - jnp.roll(pressure, 1, axis=d)
        else:
            widths = [(0, 0)] * pressure.ndim
            widths[d] = (1, 0)
            lower = jnp.pad(pressure, widths, mode=_JNP_MODE[lo_mode])
            widths[d] = (0, 1)
            upper = jnp.pad(pressure, widths, mode=_JNP_MODE[hi_mode])
            grad = upper - lower
        comps.append(grad * (dxprod / dx[d]))
    if accessible_mask is not None:
        comps = _mask_gradient_faces(comps, accessible_mask, periodic, pressure.ndim)
    return StaggeredField(tuple(comps), periodic=periodic)


def _face_masks(accessible_mask, periodic, ndim):
    """Per-component face-open masks from the padded centered mask (the
    zero_gradient_mask of piso_helpers.py:255-265)."""
    out = []
    for d in range(ndim):
        # upper/lower windows of the padded mask along d, cropped [1:-1]
        # on the other axes. Periodic axes have unique faces: the face at
        # index i couples cells i-1 and i (mask pre-padded with wrap).
        up = slice(1, -1) if periodic[d] else slice(1, None)
        lo = slice(0, -2) if periodic[d] else slice(0, -1)
        idx_up = tuple(up if i == d else slice(1, -1) for i in range(ndim))
        idx_lo = tuple(lo if i == d else slice(1, -1) for i in range(ndim))
        out.append(
            jnp.minimum(accessible_mask[idx_up], accessible_mask[idx_lo])
        )
    return out


def _mask_gradient_faces(comps, accessible_mask, periodic, ndim):
    """Zero gradient faces touching an inaccessible cell."""
    fms = _face_masks(accessible_mask, periodic, ndim)
    return [g * fm.astype(g.dtype) for g, fm in zip(comps, fms)]


def centered_to_faces(data: jax.Array, axis: int, pad_mode: str = REPLICATE) -> jax.Array:
    """Resample a centered field to the faces normal to `axis` (linear
    interpolation; boundary faces use the pad mode, default replicate like
    the reference's CenteredGrid extrapolation='boundary'). CIRCULAR returns
    the unique periodic faces (size = resolution along axis)."""
    if pad_mode == CIRCULAR:
        return 0.5 * (data + jnp.roll(data, 1, axis=axis))
    widths = [(0, 0)] * data.ndim
    widths[axis] = (1, 1)
    padded = jnp.pad(data, widths, mode=_JNP_MODE[pad_mode])
    lo = jax.lax.slice_in_dim(padded, 0, padded.shape[axis] - 1, axis=axis)
    hi = jax.lax.slice_in_dim(padded, 1, padded.shape[axis], axis=axis)
    return 0.5 * (lo + hi)


def centered_to_staggered(data: jax.Array, pad_modes=REPLICATE) -> StaggeredField:
    """Resample a centered scalar to every staggered face set. pad_modes:
    one mode, or ((lo, hi) per axis) — circular axes yield unique faces and
    periodic metadata."""
    if isinstance(pad_modes, str):
        pad_modes = tuple((pad_modes, pad_modes) for _ in range(data.ndim))
    periodic = tuple(lo == CIRCULAR for lo, _ in pad_modes)
    return StaggeredField(
        tuple(
            centered_to_faces(data, d, pad_modes[d][0]) for d in range(data.ndim)
        ),
        periodic=periodic,
    )


def vorticity(field: StaggeredField, dx: Sequence[float]) -> jax.Array:
    """2-D vorticity at cell centers via central differences of the
    center-sampled velocity (piso_helpers.py:313-323). Returns (ny, nx)."""
    assert field.rank == 2
    dx0 = float(dx[0])
    centered = field.at_centers()  # (ny, nx, 2) channels (v, u)
    v = centered[..., 0]
    u = centered[..., 1]

    def central(a, axis):
        padded = jnp.pad(a, [(1, 1) if i == axis else (0, 0) for i in range(a.ndim)], mode="edge")
        hi = jax.lax.slice_in_dim(padded, 2, padded.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(padded, 0, padded.shape[axis] - 2, axis=axis)
        return (hi - lo) / (2.0 * dx0)

    # omega = dv/dx - du/dy  (axis 0 = y, axis 1 = x)
    return central(v, 1) - central(u, 0)
