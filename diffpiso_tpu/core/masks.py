"""Boundary-mask factories for the canonical flow cases.

  lid_driven_cavity_masks <- lid_driven_cavity_2d.py:15-47 (the reference's
                             validation case setup)
  mixing_layer_masks      <- compute_mixingLayer_masks
                             (diffpiso/piso_helpers.py:73-133)

Mask semantics (reference README.md:61-66):
  dirichlet_mask/values — staggered faces with prescribed velocity
  active_mask           — centered cells carrying momentum (padded by 1)
  accessible_mask       — centered cells fluid can occupy (padded by 1)
  no_slip_mask          — centered cells that are no-slip walls (padded by 1)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.grid import StaggeredField


def lid_driven_cavity_masks(N: int, lid_velocity: float = 1.0, dtype=np.float32):
    """Masks for the lid-driven cavity on a (N+1, N) grid.

    The extra top row of cells is inactive; the moving lid is imposed as a
    Dirichlet condition on the u-faces of that row (lid_driven_cavity_2d.py:20-43).
    Returns (dirichlet_mask, dirichlet_values, active, accessible, no_slip).
    """
    ny, nx = N + 1, N

    dm_v = np.zeros((ny + 1, nx), bool)
    dm_v[0, :] = True
    dm_v[-2:, :] = True
    dm_u = np.zeros((ny, nx + 1), bool)
    dm_u[:, 0] = True
    dm_u[:, -1] = True
    dm_u[-1, :] = True
    dirichlet_mask = StaggeredField((jnp.asarray(dm_v), jnp.asarray(dm_u)))

    dv_v = np.zeros((ny + 1, nx), dtype)
    dv_u = np.zeros((ny, nx + 1), dtype)
    dv_u[-1, :] = lid_velocity
    dirichlet_values = StaggeredField((jnp.asarray(dv_v), jnp.asarray(dv_u)))

    active = np.zeros((ny + 2, nx + 2), dtype)
    active[1:-1, 1:-1] = 1
    active[-2, :] = 0  # the dummy row of cells above the lid
    accessible = active.copy()

    no_slip = np.zeros((ny + 2, nx + 2), bool)
    no_slip[0, :] = True
    no_slip[-2:, :] = True
    no_slip[:, 0] = True
    no_slip[:, -1] = True

    return (
        dirichlet_mask,
        dirichlet_values,
        jnp.asarray(active),
        jnp.asarray(accessible),
        jnp.asarray(no_slip),
    )


def channel_masks(ny: int, nx: int, dtype=np.float32):
    """Masks for plane channel (pipe) flow: no-slip walls at the y ends,
    periodic x (the PhiFlow/demos/pipe.py layout on PISO masks).

    Returns (dirichlet_mask, dirichlet_values, active, accessible, no_slip)
    for a StaggeredField with periodic=(False, True): v carries ny+1 faces
    with Dirichlet v=0 at both walls; u carries the nx unique periodic
    faces with the no-slip wall treatment via the 2-nu diagonal penalty
    (central_difference_csr_op.cu.cc:265-288). The x pad ring of the
    centered masks wraps."""
    dm_v = np.zeros((ny + 1, nx), bool)
    dm_v[0, :] = True
    dm_v[-1, :] = True
    dm_u = np.zeros((ny, nx), bool)
    dirichlet_mask = StaggeredField(
        (jnp.asarray(dm_v), jnp.asarray(dm_u)), periodic=(False, True)
    )
    dirichlet_values = StaggeredField(
        (jnp.zeros((ny + 1, nx), dtype), jnp.zeros((ny, nx), dtype)),
        periodic=(False, True),
    )

    active = np.zeros((ny + 2, nx + 2), dtype)
    active[1:-1, 1:-1] = 1
    active[:, 0] = active[:, -2]  # wrap the x pad ring
    active[:, -1] = active[:, 1]

    accessible = active.copy()

    no_slip = np.zeros((ny + 2, nx + 2), bool)
    no_slip[0, :] = True
    no_slip[-1, :] = True

    return (
        dirichlet_mask,
        dirichlet_values,
        jnp.asarray(active),
        jnp.asarray(accessible),
        jnp.asarray(no_slip),
    )


def second_order_lid_values(
    dirichlet_values: StaggeredField,
    velocity: StaggeredField,
    lid_velocity: float = 1.0,
) -> StaggeredField:
    """Second-order moving-wall ghost values for the lid-driven cavity.

    The reference imposes u = U_lid directly on the u-faces of the dummy row
    above the lid (lid_driven_cavity_2d.py:28-31), which places the effective
    wall half a cell above the physical lid — a first-order treatment that
    leaves the Ghia centerline magnitudes ~10% shallow (u_min -0.338 vs Ghia
    -0.383 at 128^2). This helper instead sets the ghost-row value to
    2*U_lid - u_interior so the linearly interpolated velocity AT the wall is
    exactly U_lid (standard second-order ghost-cell treatment). The value is
    state-dependent (lagged one step, like the reference's explicit
    update_dirichlet_values pattern, piso_helpers.py:58-70); pass the result
    as piso_step(dirichlet_values=...) each step.

    Works for the 2-D and 3-D cavity layouts produced by the mask factories
    above (the u component's last y-row is the ghost lid row in both).
    """
    comps = list(dirichlet_values.components)
    u = comps[1]
    u_interior = jax.lax.stop_gradient(velocity.components[1][-2])
    comps[1] = u.at[-1].set(2.0 * lid_velocity - u_interior)
    return StaggeredField(tuple(comps), periodic=dirichlet_values.periodic)


def lid_driven_cavity_masks_3d(N: int, lid_velocity: float = 1.0, dtype=np.float32):
    """3-D lid-driven cavity on an (N+1, N, N) grid, axes (y, x, z).

    Direct extension of the 2-D construction (lid_driven_cavity_2d.py:20-43)
    to the reference's 3-D kernel semantics: the CUDA assembly is natively
    3-D (calcCellFluxesZ, central_difference_csr_op.cu.cc:103; w-component
    solve, multi_bicgstab_ilu_linear_solve_op.cu.cc:493-512). The moving lid
    drives u (x-velocity) on the dummy top row; z behaves like x: Dirichlet
    normal faces at the z walls, tangential components feel the no-slip 2*nu
    wall penalty.

    Returns (dirichlet_mask, dirichlet_values, active, accessible, no_slip).
    """
    ny, nx, nz = N + 1, N, N

    dm_v = np.zeros((ny + 1, nx, nz), bool)
    dm_v[0] = True
    dm_v[-2:] = True
    dm_u = np.zeros((ny, nx + 1, nz), bool)
    dm_u[:, 0, :] = True
    dm_u[:, -1, :] = True
    dm_u[-1] = True
    dm_w = np.zeros((ny, nx, nz + 1), bool)
    dm_w[:, :, 0] = True
    dm_w[:, :, -1] = True
    dm_w[-1] = True
    dirichlet_mask = StaggeredField(
        (jnp.asarray(dm_v), jnp.asarray(dm_u), jnp.asarray(dm_w))
    )

    dv_v = np.zeros((ny + 1, nx, nz), dtype)
    dv_u = np.zeros((ny, nx + 1, nz), dtype)
    dv_u[-1] = lid_velocity
    dv_w = np.zeros((ny, nx, nz + 1), dtype)
    dirichlet_values = StaggeredField(
        (jnp.asarray(dv_v), jnp.asarray(dv_u), jnp.asarray(dv_w))
    )

    active = np.zeros((ny + 2, nx + 2, nz + 2), dtype)
    active[1:-1, 1:-1, 1:-1] = 1
    active[-2] = 0  # the dummy layer of cells above the lid
    accessible = active.copy()

    no_slip = np.zeros((ny + 2, nx + 2, nz + 2), bool)
    no_slip[0] = True
    no_slip[-2:] = True
    no_slip[:, 0, :] = True
    no_slip[:, -1, :] = True
    no_slip[:, :, 0] = True
    no_slip[:, :, -1] = True

    return (
        dirichlet_mask,
        dirichlet_values,
        jnp.asarray(active),
        jnp.asarray(accessible),
        jnp.asarray(no_slip),
    )


def temporal_mixing_layer_masks(
    resolution: Tuple[int, int],
    upper_velocity: np.ndarray,
    lower_velocity: np.ndarray,
    dtype=np.float32,
):
    """Masks for the TEMPORALLY evolving mixing layer: Dirichlet streamwise
    velocity at the top/bottom walls, periodic in x
    (temporal_mixing_layer_masks, piso_helpers.py:136-166; asserts
    dirichlet_bool == ((True, True), (False, False))).

    upper/lower_velocity: arrays of length nx (u values on the boundary
    rows). Returns (dirichlet_mask, dirichlet_values, active, accessible,
    no_slip=None) with periodic-x (unique-face) shapes."""
    ny, nx = resolution
    # v faces Dirichlet on the y walls (value 0); u faces: the reference
    # marks the first/last *rows* of v as Dirichlet and leaves u free — here
    # v: (ny+1, nx), u: (ny, nx) (periodic x)
    dm_v = np.zeros((ny + 1, nx), bool)
    dm_v[0, :] = True
    dm_v[-1, :] = True
    dv_v = np.zeros((ny + 1, nx), dtype)
    dm_u = np.zeros((ny, nx), bool)
    dm_u[0, :] = True
    dm_u[-1, :] = True
    dv_u = np.zeros((ny, nx), dtype)
    dv_u[0, :] = np.asarray(lower_velocity, dtype)
    dv_u[-1, :] = np.asarray(upper_velocity, dtype)

    dirichlet_mask = StaggeredField(
        (jnp.asarray(dm_v), jnp.asarray(dm_u)), periodic=(False, True)
    )
    dirichlet_values = StaggeredField(
        (jnp.asarray(dv_v), jnp.asarray(dv_u)), periodic=(False, True)
    )

    # accessible/active: zeros at the y walls, wrap-padded in x
    # (piso_helpers.py:159-163: active == accessible)
    inner = np.ones((ny, nx), dtype)
    padded = np.pad(inner, ((1, 1), (0, 0)), "constant")
    padded = np.pad(padded, ((0, 0), (1, 1)), "wrap")
    return (
        dirichlet_mask,
        dirichlet_values,
        jnp.asarray(padded),
        jnp.asarray(padded),
        None,
    )


def mixing_layer_masks(
    resolution: Tuple[int, int],
    inflow_profile: np.ndarray,
    dtype=np.float32,
):
    """Masks for the spatially-evolving mixing layer:

    boundary layout ((OPEN, OPEN), (OPEN, CLOSED)) with Dirichlet inflow on
    the left x-boundary (profile of length ny+2 including ghost entries, as
    produced by the reference's tanh profile, combined_training_integrated.py:497-501)
    and Neumann-style outflow on the right
    (compute_mixingLayer_masks with dirichlet_bool ((True,True),(True,False)),
    piso_helpers.py:73-133).

    Returns (dirichlet_mask, dirichlet_values, active, accessible, no_slip=None).
    """
    ny, nx = resolution
    inflow = np.asarray(inflow_profile, dtype).reshape(-1)
    assert inflow.shape[0] == ny + 2, "inflow profile must cover ny + 2 ghost rows"

    # v faces: Dirichlet on bottom (y=0) and top (y=ny) rows
    dm_v = np.zeros((ny + 1, nx), bool)
    dm_v[0, :] = True
    dm_v[-1, :] = True
    dv_v = np.zeros((ny + 1, nx), dtype)

    # u faces: Dirichlet at the inflow column (x=0) only
    dm_u = np.zeros((ny, nx + 1), bool)
    dm_u[:, 0] = True
    dv_u = np.zeros((ny, nx + 1), dtype)
    dv_u[:, 0] = inflow[1:-1]

    dirichlet_mask = StaggeredField((jnp.asarray(dm_v), jnp.asarray(dm_u)))
    dirichlet_values = StaggeredField((jnp.asarray(dv_v), jnp.asarray(dv_u)))

    # accessible: open outflow at x = nx (ring stays 1 there), closed
    # elsewhere (piso_helpers.py:124-128: zeros at x=0 column and both y rows)
    accessible = np.ones((ny + 2, nx + 2), dtype)
    accessible[:, 0] = 0
    accessible[0, :] = 0
    accessible[-1, :] = 0

    # active: interior cells only (piso_helpers.py:130-131)
    active = np.zeros((ny + 2, nx + 2), dtype)
    active[1:-1, 1:-1] = 1

    return (
        dirichlet_mask,
        dirichlet_values,
        jnp.asarray(active),
        jnp.asarray(accessible),
        None,
    )


def obstacle_channel_masks(
    resolution: Tuple[int, int],
    inflow_profile: np.ndarray,
    geometry,
    box=None,
    dtype=np.float32,
):
    """Channel flow with an embedded solid obstacle (the PISO-mask analog of
    the reference's Obstacle + GeometryMask capability, phi/physics/
    obstacle.py + field/mask.py, which its Schroedinger/Fluid paths consume).

    Boundary layout = the spatial-mixing-layer channel (Dirichlet inflow at
    x=0, open outflow at x=nx, closed y walls) plus `geometry` carved out of
    the interior: obstacle cells leave active/accessible, faces touching a
    solid cell become zero-Dirichlet (no-slip obstacle surface), and the
    obstacle ring enters no_slip_mask so the stencil assembly adds the
    2*nu wall penalty (central_difference_csr_op.cu.cc:265-288 semantics).

    Returns (dirichlet_mask, dirichlet_values, active, accessible, no_slip).
    """
    from diffpiso_tpu.fields.box import Box
    from diffpiso_tpu.fields.geometry import geometry_mask

    ny, nx = resolution
    inflow = np.asarray(inflow_profile, dtype).reshape(-1)
    assert inflow.shape[0] == ny + 2, "inflow profile must cover ny + 2 ghost rows"
    box = box or Box.from_size((float(ny), float(nx)))

    solid = np.asarray(geometry_mask(geometry, (ny, nx), box)).astype(bool)

    # channel boundary faces (mixing_layer_masks layout)
    dm_v = np.zeros((ny + 1, nx), bool)
    dm_v[0, :] = True
    dm_v[-1, :] = True
    dv_v = np.zeros((ny + 1, nx), dtype)
    dm_u = np.zeros((ny, nx + 1), bool)
    dm_u[:, 0] = True
    dv_u = np.zeros((ny, nx + 1), dtype)
    dv_u[:, 0] = inflow[1:-1]

    # obstacle faces: any face adjacent to a solid cell is zero-Dirichlet
    solid_v = np.zeros((ny + 1, nx), bool)  # v face between cells (j-1,i),(j,i)
    solid_v[:-1, :] |= solid
    solid_v[1:, :] |= solid
    solid_u = np.zeros((ny, nx + 1), bool)
    solid_u[:, :-1] |= solid
    solid_u[:, 1:] |= solid
    dm_v |= solid_v
    dm_u |= solid_u
    dv_v[solid_v] = 0.0
    dv_u[solid_u] = 0.0

    dirichlet_mask = StaggeredField((jnp.asarray(dm_v), jnp.asarray(dm_u)))
    dirichlet_values = StaggeredField((jnp.asarray(dv_v), jnp.asarray(dv_u)))

    accessible = np.ones((ny + 2, nx + 2), dtype)
    accessible[:, 0] = 0
    accessible[0, :] = 0
    accessible[-1, :] = 0
    accessible[1:-1, 1:-1][solid] = 0

    active = np.zeros((ny + 2, nx + 2), dtype)
    active[1:-1, 1:-1] = 1
    active[1:-1, 1:-1][solid] = 0

    no_slip = np.zeros((ny + 2, nx + 2), bool)
    no_slip[1:-1, 1:-1] = solid

    return (
        dirichlet_mask,
        dirichlet_values,
        jnp.asarray(active),
        jnp.asarray(accessible),
        jnp.asarray(no_slip),
    )
