"""CNN turbulence-closure model.

Same architecture as the reference's fullyconv network
(diffpiso/networks.py:3-73): 7 bias-free conv layers with leaky-ReLU,
kernels 7/5/5/3/3/1/1, channels 2*[8,8,16,32,32,32] -> 2, Glorot-normal
init, SAME or VALID padding with optional shape restoration and buffer-width
cropping. Implemented as a plain JAX params-pytree + apply function so it
composes with jit/grad/vmap/shard_map; convs run on the MXU in NHWC/HWIO
layout (bfloat16-friendly).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

_KERNELS = (7, 5, 5, 3, 3, 1, 1)
_FEATURES = (16, 16, 32, 64, 64, 64)  # = 2 * [8, 8, 16, 32, 32, 32]


def init_fullyconv(
    key: jax.Array,
    in_channels: int = 4,
    out_channels: int = 2,
    kernels: Sequence[int] = _KERNELS,
    features: Sequence[int] = _FEATURES,
    dtype=jnp.float32,
) -> List[jax.Array]:
    """Glorot-normal weights, HWIO layout (networks.py:57-68; default input is
    centered (v, u) + pressure gradient = 4 channels)."""
    chans = (in_channels,) + tuple(features) + (out_channels,)
    params = []
    keys = jax.random.split(key, len(kernels))
    for i, k in enumerate(kernels):
        fan_in = k * k * chans[i]
        fan_out = k * k * chans[i + 1]
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        params.append(std * jax.random.normal(keys[i], (k, k, chans[i], chans[i + 1]), dtype))
    return params


def receptive_field_half_width(kernels: Sequence[int] = _KERNELS) -> int:
    """Total one-sided receptive field lost by VALID convs
    (reduced_buffer_width, networks.py:70)."""
    return sum(k // 2 for k in kernels)


def _conv(x, w, padding):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def fullyconv_apply(
    params: List[jax.Array],
    x: jax.Array,
    padding: str = "SAME",
    buffer_width=None,
    restore_shape: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Apply the closure CNN.

    x — (ny, nx, c) or (batch, ny, nx, c).
    buffer_width — ((top, bottom), (left, right)) rows/cols cropped from the
    input before the convs and re-padded with zeros after (networks.py:4-13,50-52).
    restore_shape — with VALID padding, zero-pad the output back to the
    cropped input shape (networks.py:44-48).
    compute_dtype — mixed precision: cast activations AND weights to this
    dtype for the convolutions (jnp.bfloat16 feeds the MXU at 2x the f32
    rate) and cast the output back to x's dtype. Params (and their
    gradients, via the cast's transpose) stay in the stored dtype — the
    standard master-weights scheme. None = run in x's dtype.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = [w.astype(compute_dtype) for w in params]
    if buffer_width is not None:
        (t, b), (l, r) = buffer_width
        x = x[:, t : x.shape[1] - b, l : x.shape[2] - r, :]
    target_shape = x.shape

    if padding == "VALID":
        need = 2 * receptive_field_half_width([w.shape[0] for w in params]) + 1
        assert min(x.shape[1], x.shape[2]) >= need, (
            f"VALID padding needs input >= {need} per spatial dim, got "
            f"{x.shape[1:3]} — the convolutions would produce an empty output"
        )
    h = x
    for w in params[:-1]:
        # tf.nn.leaky_relu defaults to alpha=0.2 (reference networks.py:34-40);
        # jax.nn.leaky_relu defaults to 0.01, so pin the reference slope
        h = jax.nn.leaky_relu(_conv(h, w, padding), negative_slope=0.2)
    out = _conv(h, params[-1], padding)

    if padding == "VALID" and restore_shape:
        half = receptive_field_half_width([w.shape[0] for w in params])
        out = jnp.pad(
            out,
            (
                (0, 0),
                (half, target_shape[1] - out.shape[1] - half),
                (half, target_shape[2] - out.shape[2] - half),
                (0, 0),
            ),
        )
    if buffer_width is not None:
        (t, b), (l, r) = buffer_width
        out = jnp.pad(out, ((0, 0), (t, b), (l, r), (0, 0)))
    out = out.astype(out_dtype)
    return out[0] if squeeze else out
