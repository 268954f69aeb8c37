"""Quantitative 3-D validation (VERDICT r2 item 7): the 3-D PISO solver
against an INDEPENDENT physics oracle — a pseudo-spectral Fourier-Galerkin
incompressible NS solver (RK4, 2/3 dealiasing) written here in numpy f64.
The reference's 3-D support is native CUDA (central_difference_csr_op.cu.cc
calcCellFluxesZ, :103); ours must be validated as physics, not plumbing.

Case: 3-D Taylor-Green vortex, Re = 1/nu = 100, 24^3, t in [0, 1].
  u =  sin(x) cos(y) cos(z)
  v = -cos(x) sin(y) cos(z)
  w = 0
Kinetic-energy decay KE(t) of the 2nd-order FV PISO solution must track
the spectral truth within the discretization error of a 24^3 staggered
grid (tolerance pinned at 2% relative on KE and 5% on dissipation-rate
shape; measured headroom ~2x at pin time)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup


def _spectral_tgv_ke(n, nu, dt, steps):
    """Pseudo-spectral NS oracle on the same box: returns KE(t) samples
    (every step, incl. t=0), f64, 2/3-rule dealiased, RK4."""
    k1 = np.fft.fftfreq(n, 1.0 / n)
    KX = k1[:, None, None]
    KY = k1[None, :, None]
    KZ = k1[None, None, :]
    K2 = KX**2 + KY**2 + KZ**2
    K2s = np.where(K2 == 0, 1.0, K2)
    kmax = n // 3
    dealias = (
        (np.abs(KX) <= kmax) & (np.abs(KY) <= kmax) & (np.abs(KZ) <= kmax)
    )

    x = (np.arange(n) + 0.5) * (2 * np.pi / n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    u = np.sin(X) * np.cos(Y) * np.cos(Z)
    v = -np.cos(X) * np.sin(Y) * np.cos(Z)
    w = np.zeros_like(u)

    def fft(a):
        return np.fft.fftn(a)

    def ifft(a):
        return np.real(np.fft.ifftn(a))

    uh, vh, wh = fft(u), fft(v), fft(w)

    def project(ah, bh, ch):
        div = KX * ah + KY * bh + KZ * ch
        return (
            ah - KX * div / K2s,
            bh - KY * div / K2s,
            ch - KZ * div / K2s,
        )

    def rhs(uh, vh, wh):
        u, v, w = ifft(uh), ifft(vh), ifft(wh)
        ux, uy, uz = ifft(1j * KX * uh), ifft(1j * KY * uh), ifft(1j * KZ * uh)
        vx, vy, vz = ifft(1j * KX * vh), ifft(1j * KY * vh), ifft(1j * KZ * vh)
        wx, wy, wz = ifft(1j * KX * wh), ifft(1j * KY * wh), ifft(1j * KZ * wh)
        Nu = fft(u * ux + v * uy + w * uz) * dealias
        Nv = fft(u * vx + v * vy + w * vz) * dealias
        Nw = fft(u * wx + v * wy + w * wz) * dealias
        au, av, aw = project(-Nu, -Nv, -Nw)
        return (
            au - nu * K2 * uh,
            av - nu * K2 * vh,
            aw - nu * K2 * wh,
        )

    ke = [0.5 * np.mean(u**2 + v**2 + w**2)]
    for _ in range(steps):
        k1u, k1v, k1w = rhs(uh, vh, wh)
        k2u, k2v, k2w = rhs(uh + 0.5 * dt * k1u, vh + 0.5 * dt * k1v, wh + 0.5 * dt * k1w)
        k3u, k3v, k3w = rhs(uh + 0.5 * dt * k2u, vh + 0.5 * dt * k2v, wh + 0.5 * dt * k2w)
        k4u, k4v, k4w = rhs(uh + dt * k3u, vh + dt * k3v, wh + dt * k3w)
        uh = uh + dt / 6 * (k1u + 2 * k2u + 2 * k3u + k4u)
        vh = vh + dt / 6 * (k1v + 2 * k2v + 2 * k3v + k4v)
        wh = wh + dt / 6 * (k1w + 2 * k2w + 2 * k3w + k4w)
        uh, vh, wh = project(uh, vh, wh)
        u, v, w = ifft(uh), ifft(vh), ifft(wh)
        ke.append(0.5 * np.mean(u**2 + v**2 + w**2))
    return np.asarray(ke)


def _piso_tgv_ke(n, nu, dt, steps):
    """3-D PISO on the same TGV initial condition; KE(t) from face means.

    Component order is (y, x)->(axis0, axis1, axis2) = (y-like, ...): our
    convention indexes axes (0,1,2); place the TGV so axis0 = x of the
    formula, matching the staggered face offsets per component."""
    domain, sim = decaying_turbulence_setup((n, n, n), viscosity=nu,
                                            max_iterations=(100, 500))
    h = 2 * np.pi / n
    # component d lives on faces: coordinate d at i*h, others at (i+0.5)*h
    def coords(d):
        cs = []
        for ax in range(3):
            off = 0.0 if ax == d else 0.5
            cs.append((np.arange(n) + off) * h)
        return np.meshgrid(*cs, indexing="ij")

    X0, Y0, Z0 = coords(0)
    u0 = np.sin(X0) * np.cos(Y0) * np.cos(Z0)  # component along axis 0
    X1, Y1, Z1 = coords(1)
    u1 = -np.cos(X1) * np.sin(Y1) * np.cos(Z1)  # component along axis 1
    u2 = np.zeros((n, n, n))
    vel = StaggeredField(
        tuple(jnp.asarray(a, jnp.float32) for a in (u0, u1, u2)),
        periodic=(True, True, True),
    )
    p = domain.centered_grid(0.0)

    @jax.jit
    def rollout(vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=1e-7, pressure_tol=1e-7,
            )
            ke = 0.5 * sum(jnp.mean(c**2) for c in out.velocity.components)
            return (
                out.velocity, out.pressure, out.pressure_inc1,
                out.pressure_inc2,
            ), (ke, out.warn)

        (vel, p, _, _), (kes, warns) = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=steps,
        )
        return kes, warns

    ke0 = 0.5 * sum(float(jnp.mean(c**2)) for c in vel.components)
    kes, warns = rollout(vel, p)
    assert not bool(jnp.any(warns))
    return np.concatenate([[ke0], np.asarray(kes, np.float64)])


def test_tgv3d_kinetic_energy_decay_vs_spectral_oracle():
    n, nu, dt, steps = 24, 1.0 / 100.0, 0.02, 50  # t in [0, 1]
    ke_ref = _spectral_tgv_ke(n, nu, dt, steps)
    ke_piso = _piso_tgv_ke(n, nu, dt, steps)
    assert ke_ref.shape == ke_piso.shape
    # initial energies agree (same IC, face-sampled vs collocated): TGV KE0
    # = 1/8 analytically
    np.testing.assert_allclose(ke_ref[0], 1.0 / 8.0, rtol=1e-12)
    np.testing.assert_allclose(ke_piso[0], 1.0 / 8.0, rtol=1e-4)  # f32 IC
    # KE(t) tracks the spectral truth within 2% relative everywhere
    rel = np.abs(ke_piso - ke_ref) / ke_ref
    assert rel.max() < 0.02, (rel.max(), ke_piso[-1], ke_ref[-1])
    # dissipation-rate shape: -dKE/dt normalized curves within 5%
    eps_ref = -np.diff(ke_ref) / dt
    eps_piso = -np.diff(ke_piso) / dt
    scale = eps_ref.max()
    assert np.abs(eps_piso - eps_ref).max() / scale < 0.05
    # the flow genuinely decays (not frozen): ~6% of KE gone by t=1 at
    # Re=100 (matches the oracle); require >= 4%
    assert ke_piso[-1] < 0.96 * ke_piso[0]


def test_3d_uniform_forcing_momentum_balance():
    """3-D effect/forcing case: a uniform body force f in a periodic box
    accelerates the mean flow at exactly du/dt = f (pressure cannot oppose
    a mean force; the correctors must not leak it). Analytic oracle."""
    n = 16
    nu = 1e-2
    domain, sim = decaying_turbulence_setup((n, n, n), viscosity=nu,
                                            max_iterations=(60, 300))
    vel = StaggeredField(
        tuple(jnp.zeros((n, n, n), jnp.float32) for _ in range(3)),
        periodic=(True, True, True),
    )
    p = domain.centered_grid(0.0)
    f = (0.3, -0.2, 0.1)
    forcing = StaggeredField(
        tuple(jnp.full((n, n, n), fi, jnp.float32) for fi in f),
        periodic=(True, True, True),
    )
    dt = 0.05
    steps = 10

    @jax.jit
    def rollout(vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim, forcing_term=forcing,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=1e-8, pressure_tol=1e-8,
            )
            return (
                out.velocity, out.pressure, out.pressure_inc1,
                out.pressure_inc2,
            ), out.warn

        (vel, p, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=steps,
        )
        return vel, warns

    velT, warns = rollout(vel, p)
    assert not bool(jnp.any(warns))
    for d in range(3):
        mean = float(jnp.mean(velT.components[d]))
        np.testing.assert_allclose(mean, f[d] * dt * steps, rtol=1e-4,
                                   atol=1e-6)
