"""U-Net and conv/residual grid layers.

Capability parity with the reference's standard networks
(PhiFlow/phi/tf/standard_networks.py u_net, grid_layers.py
conv_layer/residual_block): a 2-D U-Net with stride-2 down-convolutions,
residual blocks with symmetric padding, 2x linear upsampling and concat skip
connections. TPU-native: NHWC layout feeding the MXU via
lax.conv_general_dilated, functional init/apply (matches
models/networks.py's closure CNN), SAME padding so any 2^levels-divisible
resolution maps through without the reference's pad/shave bookkeeping.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from diffpiso_tpu.ops.math_ext import upsample2x


def _conv_init(key, k, cin, cout):
    fan_in = k * k * cin
    fan_out = k * k * cout
    scale = jnp.sqrt(6.0 / (fan_in + fan_out))  # Glorot uniform
    wkey, _ = jax.random.split(key)
    w = jax.random.uniform(wkey, (k, k, cin, cout), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def conv2d(params, x, stride: int = 1, padding: str = "SAME"):
    """NHWC conv on the MXU (grid_layers.py conv_layer)."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"]


def init_residual_block(key, channels: int, kernel_size: int = 3):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _conv_init(k1, kernel_size, channels, channels),
        "conv2": _conv_init(k2, kernel_size, channels, channels),
    }


def residual_block(params, x, activation=jax.nn.leaky_relu):
    """Two symmetric-padded convs + identity shortcut
    (grid_layers.py residual_block)."""
    k = params["conv1"]["w"].shape[0]
    lo, hi = (k - 1) // 2, k // 2
    pad = [(0, 0), (lo, hi), (lo, hi), (0, 0)]
    y = jnp.pad(x, pad, mode="symmetric")
    y = activation(conv2d(params["conv1"], y, padding="VALID"))
    y = jnp.pad(y, pad, mode="symmetric")
    y = conv2d(params["conv2"], y, padding="VALID")
    return activation(y + x)


def init_unet(
    key,
    in_channels: int,
    out_channels: int,
    levels: int = 2,
    filters: int | Sequence[int] = 16,
    blocks_per_level: int = 2,
):
    """Parameter pytree for u_net (standard_networks.py u_net signature)."""
    if isinstance(filters, int):
        filters = [filters * (2**i) for i in range(levels)]
    filters = list(filters)
    assert len(filters) == levels
    # static structure (level count, block count) is encoded by list lengths
    # so the params dict is a pure array pytree that jax.grad can map over
    params = {"down": [], "up": []}
    keys = jax.random.split(key, 2 * levels + 2)
    ki = 0
    cin = in_channels
    for lvl in range(levels):
        cout = filters[lvl]
        blk_keys = jax.random.split(keys[ki], blocks_per_level)
        ki += 1
        params["down"].append(
            {
                "conv": _conv_init(keys[ki], 2, cin, cout),
                "blocks": [
                    init_residual_block(bk, cout) for bk in blk_keys
                ],
            }
        )
        ki += 1
        cin = cout
    # decoder: at each level, input = upsampled current + skip
    for lvl in range(levels):
        skip_ch = filters[levels - 2 - lvl] if lvl < levels - 1 else in_channels
        cat_ch = cin + skip_ch
        last = lvl == levels - 1
        cout = out_channels if last else filters[levels - 2 - lvl]
        blk_key = keys[(2 * levels) % len(keys)]
        params["up"].append(
            {
                "conv": _conv_init(jax.random.fold_in(blk_key, lvl), 3, cat_ch, cout),
                "blocks": []
                if last
                else [
                    init_residual_block(jax.random.fold_in(blk_key, 100 + lvl * 10 + b), cout)
                    for b in range(blocks_per_level)
                ],
            }
        )
        cin = cout
    return params


def unet_apply(params, x, activation=jax.nn.relu):
    """Apply the U-Net to NHWC input (H, W divisible by 2**levels).
    Accepts (H, W, C) and adds/strips the batch axis."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    levels = len(params["down"])
    skips = [x]
    y = x
    for lvl in range(levels):
        p = params["down"][lvl]
        y = activation(conv2d(p["conv"], y, stride=2))
        for blk in p["blocks"]:
            y = residual_block(blk, y)
        skips.append(y)
    skips.pop()  # bottom level is `y` itself
    for lvl in range(levels):
        p = params["up"][lvl]
        y = upsample2x(y, axes=(1, 2))
        skip = skips.pop()
        y = jnp.concatenate([y, skip], axis=-1)
        last = lvl == levels - 1
        y = conv2d(p["conv"], y)
        if not last:
            y = activation(y)
            for blk in p["blocks"]:
                y = residual_block(blk, y)
    return y[0] if squeeze else y
