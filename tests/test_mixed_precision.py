"""Mixed-precision closure CNN: bfloat16 compute with f32 master weights
(fullyconv_apply compute_dtype; TrainingConfig.network_dtype)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.models.networks import fullyconv_apply, init_fullyconv


def test_bf16_apply_close_to_f32_and_f32_grads():
    params = init_fullyconv(jax.random.PRNGKey(0), in_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 40, 4), jnp.float32)

    y32 = fullyconv_apply(params, x)
    y16 = fullyconv_apply(params, x, compute_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32  # cast back to the input dtype
    # bf16 has ~3 decimal digits; a 7-layer net compounds that
    scale = float(jnp.max(jnp.abs(y32))) + 1e-6
    assert float(jnp.max(jnp.abs(y16 - y32))) / scale < 0.15

    def loss(p, dtype):
        return jnp.sum(fullyconv_apply(p, x, compute_dtype=dtype) ** 2)

    g16 = jax.grad(lambda p: loss(p, jnp.bfloat16))(params)
    g32 = jax.grad(lambda p: loss(p, None))(params)
    for a, b in zip(g16, g32):
        # master-weight scheme: gradients come back in the STORED dtype
        assert a.dtype == jnp.float32
        denom = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / denom < 0.3


def test_training_config_network_dtype_plumbs():
    from diffpiso_tpu.learning.training import TrainingConfig

    cfg = TrainingConfig(network_dtype="bfloat16")
    assert jnp.dtype(cfg.network_dtype) == jnp.bfloat16
