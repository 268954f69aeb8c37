"""General N-d multilinear grid sampling with per-axis boundary modes.

Capability parity with the reference's CUDA Resample / ResampleGradient ops
(PhiFlow/phi/tf/cuda/src/resample.cu.cc, resample_gradient.cu.cc) and the
generic fallback general_grid_sample_nd (PhiFlow/phi/backend/backend_helper.py).
That op is the hot path of PhiFlow's Field.at() resampling; its boundary enum
{ZERO, REPLICATE, CIRCULAR, SYMMETRIC, REFLECT} lives in
PhiFlow/phi/tf/cuda/src/helpers.h:105.

TPU-first design: the 2^d corner reads become ONE flattened gather over
precomputed linear indices (XLA lowers this to a dynamic-gather that the TPU
executes from HBM at memcpy speed); the interpolation weights fuse into the
gather's consumer. The hand-written CUDA scatter gradient is unnecessary —
autodiff of the gather IS that scatter.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE, SYMMETRIC, ZERO

REFLECT = "reflect"

_MODES = (ZERO, REPLICATE, CIRCULAR, SYMMETRIC, REFLECT)


def _fold_index(idx: jax.Array, n: int, mode: str):
    """Map an out-of-range integer index onto [0, n) per the boundary mode.

    Returns (folded_index, valid) where valid==False marks reads that must
    contribute 0 (ZERO mode). Index arithmetic mirrors the reference's
    applyBoundaries (PhiFlow/phi/tf/cuda/src/helpers.h:120).
    """
    if mode == CIRCULAR:
        return jnp.mod(idx, n), None
    if mode == REPLICATE:
        return jnp.clip(idx, 0, n - 1), None
    if mode == ZERO:
        valid = (idx >= 0) & (idx <= n - 1)
        return jnp.clip(idx, 0, n - 1), valid
    if mode == SYMMETRIC:
        # ... c b a | a b c ... | c b a ... (edge duplicated), period 2n
        idx = jnp.mod(idx, 2 * n)
        return jnp.where(idx < n, idx, 2 * n - 1 - idx), None
    if mode == REFLECT:
        # ... c b | a b c ... | b a ...    (edge not duplicated), period 2n-2
        if n == 1:
            return jnp.zeros_like(idx), None
        idx = jnp.mod(idx, 2 * n - 2)
        return jnp.where(idx < n, idx, 2 * n - 2 - idx), None
    raise ValueError(f"unknown boundary mode {mode!r}; expected one of {_MODES}")


def grid_sample(
    data: jax.Array,
    points: jax.Array,
    modes: Union[str, Sequence[str]] = REPLICATE,
) -> jax.Array:
    """Multilinear interpolation of `data` at fractional index coordinates.

    Args:
      data:   (*spatial, channels) or (*spatial,) grid values.
      points: (*out_shape, d) index-space coordinates (0 .. n_axis-1 maps onto
              the sample points of axis `axis`), ordered like the spatial axes.
      modes:  one boundary mode, or one per spatial axis, from
              {zero, replicate, circular, symmetric, reflect}.

    Returns (*out_shape, channels) (channel axis squeezed if data had none).
    """
    squeeze = data.ndim == points.shape[-1]
    if squeeze:
        data = data[..., None]
    d = points.shape[-1]
    spatial = data.shape[:-1]
    if len(spatial) != d:
        raise ValueError(f"data has {len(spatial)} spatial axes, points {d}")
    if isinstance(modes, str):
        modes = (modes,) * d
    if len(modes) != d:
        raise ValueError(f"need {d} boundary modes, got {len(modes)}")

    out_shape = points.shape[:-1]
    pts = points.reshape(-1, d)
    flat = data.reshape(-1, data.shape[-1])

    lo_list, w_list = [], []
    for ax in range(d):
        c = pts[:, ax]
        lo = jnp.floor(c)
        w_list.append((c - lo).astype(data.dtype))
        lo_list.append(lo.astype(jnp.int32))

    # strides for linearizing the spatial index
    strides = []
    s = 1
    for n in reversed(spatial):
        strides.append(s)
        s *= n
    strides = strides[::-1]

    acc = None
    for corner in range(2 ** d):
        lin = jnp.zeros_like(lo_list[0])
        weight = None
        valid_all = None
        for ax in range(d):
            hi_bit = (corner >> (d - 1 - ax)) & 1
            idx = lo_list[ax] + hi_bit
            folded, valid = _fold_index(idx, spatial[ax], modes[ax])
            lin = lin + folded * strides[ax]
            w_ax = w_list[ax] if hi_bit else (1.0 - w_list[ax])
            weight = w_ax if weight is None else weight * w_ax
            if valid is not None:
                valid_all = valid if valid_all is None else (valid_all & valid)
        if valid_all is not None:
            weight = weight * valid_all.astype(weight.dtype)
        vals = jnp.take(flat, lin, axis=0)
        term = vals * weight[:, None]
        acc = term if acc is None else acc + term

    out = acc.reshape(*out_shape, data.shape[-1])
    return out[..., 0] if squeeze else out


def resample_field(
    data: jax.Array,
    in_box_lower: Sequence[float],
    in_dx: Sequence[float],
    out_points: jax.Array,
    modes: Union[str, Sequence[str]] = REPLICATE,
    cell_centered: bool = True,
) -> jax.Array:
    """Sample grid `data` (physical layout given by box lower corner + cell
    size) at physical-space coordinates `out_points` (*out_shape, d) — the
    Field.at() primitive. Cell-centered grids have their sample points at
    (i + 0.5) * dx; staggered components at i * dx along their own axis."""
    d = out_points.shape[-1]
    lower = jnp.asarray(in_box_lower, out_points.dtype)
    dx = jnp.asarray(in_dx, out_points.dtype)
    idx = (out_points - lower) / dx
    if cell_centered:
        idx = idx - 0.5
    return grid_sample(data, idx, modes)
