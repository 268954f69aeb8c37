"""Fused Pallas Laplacian assembly (ops/pallas_assembly.py) vs the jnp
assembly path, on random masks, bounded and periodic, in interpret mode
(compiled path exercised on real TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import assemble_pressure_laplacian
from diffpiso_tpu.ops import pallas_assembly


def _case(periodic, seed=0, res=(32, 128)):
    ny, nx = res
    rng = np.random.RandomState(seed)
    if periodic == (True, True):
        comps = (rng.rand(ny, nx), rng.rand(ny, nx))
        act = np.pad(np.ones((ny, nx), np.float32), 1, mode="wrap")
    else:
        comps = (rng.rand(ny + 1, nx), rng.rand(ny, nx + 1))
        act = rng.randint(0, 2, (ny + 2, nx + 2)).astype(np.float32)
    acc = (
        act.copy()
        if periodic == (True, True)
        else rng.randint(0, 2, (ny + 2, nx + 2)).astype(np.float32)
    )
    infl = StaggeredField(
        tuple(jnp.asarray(c + 0.1, jnp.float32) for c in comps), periodic=periodic
    )
    return infl, jnp.asarray(act), jnp.asarray(acc)


@pytest.mark.parametrize("periodic", [(False, False), (True, True)])
@pytest.mark.parametrize("rank_deficient", [False, True])
def test_fused_assembly_matches_jnp(periodic, rank_deficient, monkeypatch):
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")

    infl, act, acc = _case(periodic)

    ref = assemble_pressure_laplacian(infl, act, acc, periodic, rank_deficient)

    # force the fused path in interpret mode
    monkeypatch.setattr(pallas_assembly, "_INTERPRET", True)
    monkeypatch.setattr(
        pallas_assembly, "assembly_eligible", lambda *a, **k: True
    )
    monkeypatch.setattr(pallas_assembly, "pltpu", _FakePltpu())
    fused = assemble_pressure_laplacian(infl, act, acc, periodic, rank_deficient)

    np.testing.assert_allclose(
        np.asarray(fused.center), np.asarray(ref.center), rtol=1e-6, atol=1e-7
    )
    for d in range(2):
        np.testing.assert_allclose(
            np.asarray(fused.lo[d]), np.asarray(ref.lo[d]), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(fused.hi[d]), np.asarray(ref.hi[d]), rtol=1e-6, atol=1e-7
        )
    np.testing.assert_allclose(
        float(fused.shift), float(ref.shift), rtol=1e-5
    )


class _FakePltpu:
    """interpret-mode stand-in: pltpu.roll -> jnp.roll, real memory spaces."""

    def __getattr__(self, name):
        from jax.experimental.pallas import tpu as real_pltpu

        return getattr(real_pltpu, name)

    @staticmethod
    def roll(x, shift, axis):
        return jnp.roll(x, shift, axis)
