"""Device-mesh scaling: spatial domain decomposition + data parallelism.

The reference is single-GPU (SURVEY.md par.2.5); this module is the designed
-in TPU scaling story. The solver is built entirely from 5-point stencil
shift-multiply-accumulates (jnp.roll) and global reductions (solver dot
products) — exactly the two patterns XLA's SPMD partitioner handles
natively:

  * rolls over sharded axes become halo collective-permutes over ICI,
  * jnp.sum reductions become on-chip partial sums + psum.

So the multi-chip path is: build a Mesh, place the state with
NamedShardings, jit the same piso_step — GSPMD inserts the halo exchanges
and all-reduces. No NCCL-style porting, no separate distributed solver.

Axes convention:
  'data'  — batch of independent simulations (DP)
  'y','x' — spatial decomposition of the grid (the CP/SP analog for grid
            solvers; halo traffic rides ICI)

Staggered components carry +1 faces on non-periodic axes, which may not
divide the mesh axis. Two layouts exist:

  * spatial_spec (legacy): falls back to REPLICATING such a component along
    the indivisible axis — correct, but on bounded domains (cavity,
    mixing layer) roughly half the velocity state is duplicated per chip.
  * PaddedSpatialLayout (default for bounded scale-out): the state is held
    PADDED to mesh-divisible shapes at rest (zero ghost rows/cols appended
    high), fully sharded along every mesh axis, and sliced back to true
    shapes inside the jitted step. JAX's jit boundary demands divisibility,
    but GSPMD handles the uneven INTERMEDIATES natively (it masks/pads the
    last shard internally) — the compiled HLO contains only edge-sliver
    collective-permutes (halos) and scalar all-reduces, no all-gathers
    (verified on the 8-device CPU mesh, r3). Per-chip state memory drops by
    the previously-replicated factor (measured 3.6x for the 256^2 cavity
    state on a (2,4) mesh).

An explicitly halo-exchanged shard_map kernel path (parallel/halo.py) can
replace GSPMD where its collectives prove suboptimal; measure first.

IMPORTANT: trace spatially-sharded jits inside `no_pallas()` (re-exported
here from ops/pallas_stencil.py). The single-chip fast path dispatches to
Pallas kernels, which the GSPMD partitioner treats as opaque custom-calls;
the roll/reduction formulation is the one that partitions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffpiso_tpu.fields.grid import StaggeredField


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = ("y", "x"),
    devices=None,
) -> Mesh:
    """Mesh over the first prod(shape) devices. E.g. make_mesh((4, 2)) for a
    4x2 spatial grid, or make_mesh((8,), ('data',)) for pure DP."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def spatial_spec(
    shape: Tuple[int, ...],
    mesh: Mesh,
    spatial_axes: Sequence[Optional[str]] = ("y", "x"),
    leading_axes: Sequence[Optional[str]] = (),
) -> P:
    """PartitionSpec for an array whose trailing dims are the spatial grid.
    A spatial dim is sharded over its mesh axis only when evenly divisible
    (staggered +1 faces otherwise replicate along that axis)."""
    n_lead = len(shape) - len(spatial_axes)
    entries = list(leading_axes) + [None] * (n_lead - len(leading_axes))
    for dim, name in zip(shape[n_lead:], spatial_axes):
        if name is not None and name in mesh.shape and dim % mesh.shape[name] == 0:
            entries.append(name)
        else:
            entries.append(None)
    return P(*entries)


def shard_field(field: StaggeredField, mesh: Mesh, leading_axes=()) -> StaggeredField:
    comps = tuple(
        jax.device_put(
            c, NamedSharding(mesh, spatial_spec(c.shape, mesh, leading_axes=leading_axes))
        )
        for c in field.components
    )
    return StaggeredField(comps, periodic=field.periodic)


def shard_piso_args(vel: StaggeredField, p: jax.Array, mesh: Mesh, leading_axes=()):
    """Place a (velocity, pressure) state onto the mesh."""
    vel = shard_field(vel, mesh, leading_axes)
    p = jax.device_put(
        p, NamedSharding(mesh, spatial_spec(p.shape, mesh, leading_axes=leading_axes))
    )
    return vel, p


class PaddedSpatialLayout:
    """Divisible-padded face decomposition for bounded-domain scale-out.

    The staggered +1 boundary faces become the ghost tail of the last shard:
    every array is padded high (zeros) on its trailing spatial dims up to the
    next multiple of the mesh extent, so every spatial dim shards with NO
    replication. Inside a jitted step, `unpad` slices back to the true
    shapes; GSPMD keeps the resulting uneven intermediates distributed
    (internal last-shard padding — the compiler-native version of the masked
    -ghost layout). `pad`/`constrain` restore the divisible layout on the
    way out so the state can cross the jit boundary sharded.

    Which leaves are spatial: a leaf participates iff it has at least
    n_spatial trailing dims and each trailing spatial dim is >= its mesh
    extent (aux outputs like per-step warn flags or iteration stacks pass
    through untouched). Pass `is_spatial` to override the heuristic.

    Typical use (see tests/test_parallel.py and __graft_entry__.py):

        layout = PaddedSpatialLayout(mesh)               # axes ('y', 'x')
        padded0 = layout.put(layout.pad(state))          # shard at rest
        step_p  = layout.wrap_state_fn(step, state)      # padded -> padded
        padded1 = jax.jit(step_p)(padded0)
    """

    def __init__(
        self,
        mesh: Mesh,
        spatial_axes: Sequence[str] = ("y", "x"),
        leading_axes: Sequence[Optional[str]] = (),
        is_spatial=None,
    ):
        self.mesh = mesh
        self.spatial_axes = tuple(spatial_axes)
        self.leading_axes = tuple(leading_axes)
        self.extents = tuple(mesh.shape[a] for a in self.spatial_axes)
        self._is_spatial = is_spatial

    # -- classification ---------------------------------------------------------
    def _spatial(self, leaf) -> bool:
        if self._is_spatial is not None:
            return self._is_spatial(leaf)
        nd = getattr(leaf, "ndim", 0)
        if nd < len(self.spatial_axes):
            return False
        trailing = leaf.shape[nd - len(self.spatial_axes):]
        return all(d >= m for d, m in zip(trailing, self.extents))

    # -- shape transforms (host or traced) --------------------------------------
    def pad(self, tree):
        """Zero-pad every spatial leaf's trailing dims to mesh-divisible."""

        def _pad(a):
            if not self._spatial(a):
                return a
            nd = a.ndim
            pads = [(0, 0)] * (nd - len(self.extents)) + [
                (0, (-a.shape[nd - len(self.extents) + i]) % m)
                for i, m in enumerate(self.extents)
            ]
            return jnp.pad(a, pads) if any(p != (0, 0) for p in pads) else a

        return jax.tree_util.tree_map(_pad, tree)

    def unpad(self, tree, template):
        """Slice every spatial leaf back to its template's true shape."""

        def _unpad(a, t):
            shape = getattr(t, "shape", None)
            if shape is None or not self._spatial(a) or tuple(a.shape) == tuple(shape):
                return a
            return a[tuple(slice(0, s) for s in shape)]

        return jax.tree_util.tree_map(_unpad, tree, template)

    # -- placement ---------------------------------------------------------------
    def spec(self, leaf) -> P:
        if not self._spatial(leaf):
            return P()
        n_lead = leaf.ndim - len(self.spatial_axes)
        entries = list(self.leading_axes)[:n_lead]
        entries += [None] * (n_lead - len(entries))
        entries += list(self.spatial_axes)
        return P(*entries)

    def put(self, tree):
        """device_put a (padded) tree with full spatial sharding."""
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(self.mesh, self.spec(a))), tree
        )

    def constrain(self, tree):
        """with_sharding_constraint for use inside jit (on padded shapes)."""
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(self.mesh, self.spec(a))
            ),
            tree,
        )

    # -- step wrapper ------------------------------------------------------------
    def wrap_state_fn(self, fn, template, *, constrain_out: bool = True):
        """Lift fn(state, *aux) -> out into padded space: the wrapped
        function takes/returns padded fully-sharded trees; aux args pass
        through untouched. `template` is a pytree matching fn's first
        argument with the TRUE (unpadded) leaf shapes."""

        def wrapped(padded_state, *aux):
            state = self.unpad(padded_state, template)
            out = fn(state, *aux)
            out = self.pad(out)
            return self.constrain(out) if constrain_out else out

        return wrapped


def with_spatial_sharding(tree, mesh: Mesh, leading_axes=()):
    """Apply lax.with_sharding_constraint with spatial specs to every array
    leaf of a pytree (use inside jitted functions to pin layouts)."""

    def constrain(a):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, spatial_spec(a.shape, mesh, leading_axes=leading_axes))
        )

    return jax.tree_util.tree_map(constrain, tree)
