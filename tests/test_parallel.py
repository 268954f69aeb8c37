"""Multi-device correctness: the sharded PISO step must reproduce the
single-device result bit-for-bit-ish on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.parallel import make_mesh, shard_piso_args

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tg_field(domain, nu=0.01):
    ny, nx = domain.resolution
    dy, dx = domain.dx
    xs_u = np.arange(nx) * dx
    ys_u = (np.arange(ny) + 0.5) * dy
    u = -np.cos(xs_u)[None, :] * np.sin(ys_u)[:, None]
    xs_v = (np.arange(nx) + 0.5) * dx
    ys_v = np.arange(ny) * dy
    v = np.sin(xs_v)[None, :] * np.cos(ys_v)[:, None]
    return StaggeredField(
        (jnp.asarray(v, jnp.float32), jnp.asarray(u, jnp.float32)),
        periodic=(True, True),
    )


def test_sharded_step_matches_single_device():
    domain, sim = decaying_turbulence_setup((64, 64), viscosity=0.01, max_iterations=(50, 400))
    vel = tg_field(domain)
    p = domain.centered_grid(0.0)

    @jax.jit
    def step(vel, p):
        out = piso_step(vel, p, 0.05, domain, sim, advection_tol=1e-6, pressure_tol=1e-6)
        return out.velocity, out.pressure

    vel_ref, p_ref = step(vel, p)

    mesh = make_mesh((4, 2), ("y", "x"))
    vel_s, p_s = shard_piso_args(vel, p, mesh)
    # the arrays really are distributed
    assert len(vel_s.components[0].sharding.device_set) == 8
    vel_out, p_out = step(vel_s, p_s)

    # sharded reductions reorder the Krylov dot products, so the two runs
    # agree to solver tolerance rather than bitwise
    for a, b in zip(vel_out.components, vel_ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref), rtol=1e-3, atol=1e-3)


def test_data_parallel_batch_matches_vmap():
    domain, sim = decaying_turbulence_setup((32, 32), viscosity=0.01, max_iterations=(50, 300))
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    vels = StaggeredField(
        (
            jnp.stack([0.1 * jax.random.normal(k, (32, 32)) for k in keys]),
            jnp.stack([0.1 * jax.random.normal(jax.random.fold_in(k, 1), (32, 32)) for k in keys]),
        ),
        periodic=(True, True),
    )
    ps = jnp.zeros((8, 32, 32))

    def single(vel, p):
        out = piso_step(vel, p, 0.05, domain, sim, advection_tol=1e-6, pressure_tol=1e-6)
        return out.velocity, out.pressure

    batched = jax.jit(jax.vmap(single))
    vel_ref, p_ref = batched(vels, ps)

    mesh = make_mesh((8,), ("data",))
    vel_sh, p_sh = shard_piso_args(vels, ps, mesh, leading_axes=("data",))
    vel_out, p_out = batched(vel_sh, p_sh)
    for a, b in zip(vel_out.components, vel_ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_shard_map_halo_apply_matches_global():
    """Explicit ppermute halo-exchange stencil apply (parallel/halo.py) must
    equal the single-device apply_laplacian bit-for-bit structure-wise."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from diffpiso_tpu.ops.fv import centered_to_staggered
    from diffpiso_tpu.ops.laplace import apply_laplacian, assemble_pressure_laplacian
    from diffpiso_tpu.parallel.halo import make_sharded_laplacian_apply
    from diffpiso_tpu.parallel.sharding import make_mesh

    ny, nx = 32, 16
    rng = np.random.RandomState(0)
    infl = centered_to_staggered(
        jnp.asarray(0.5 + rng.rand(ny, nx).astype(np.float32))
    )
    active = np.zeros((ny + 2, nx + 2), np.float32)
    active[1:-1, 1:-1] = 1
    lap = assemble_pressure_laplacian(
        infl, jnp.asarray(active), jnp.asarray(active), (False, False), True
    )
    p = jnp.asarray(rng.randn(ny, nx).astype(np.float32))
    want = np.asarray(apply_laplacian(lap, p))

    mesh = make_mesh((4, 2), ("y", "x"))
    apply_sharded = jax.jit(make_sharded_laplacian_apply(lap, mesh))
    got = np.asarray(apply_sharded(p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_shard_map_halo_periodic_axis():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffpiso_tpu.ops.fv import centered_to_staggered
    from diffpiso_tpu.ops.laplace import apply_laplacian, assemble_pressure_laplacian
    from diffpiso_tpu.parallel.halo import make_sharded_laplacian_apply
    from diffpiso_tpu.parallel.sharding import make_mesh

    from diffpiso_tpu.fields.material import CIRCULAR

    ny, nx = 16, 16
    rng = np.random.RandomState(1)
    infl = centered_to_staggered(jnp.ones((ny, nx), jnp.float32), CIRCULAR)
    ones = jnp.ones((ny + 2, nx + 2), jnp.float32)
    lap = assemble_pressure_laplacian(infl, ones, ones, (True, True), True)
    p = jnp.asarray(rng.randn(ny, nx).astype(np.float32))
    want = np.asarray(apply_laplacian(lap, p))
    mesh = make_mesh((8,), ("y",))
    apply_sharded = jax.jit(
        make_sharded_laplacian_apply(lap, mesh, axis_names=("y", None))
    )
    got = np.asarray(apply_sharded(p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
