"""Flame-front physics (reference PhiFlow/phi/physics/flame.py:1-19).

The reference's flame module contains exactly one physics: the
Kuramoto-Sivashinsky equation (du/dt = -lap u - lap^2 u - 1/2 |grad u|^2
with per-step mean removal) — the classic flame-front instability model.
Our implementation lives in physics/ks.py (periodic boxes use the exact
spectral Laplacians); this module keeps the reference's file-level name so
the component inventory maps one-to-one.
"""

from diffpiso_tpu.physics.ks import KuramotoSivashinsky

__all__ = ["KuramotoSivashinsky"]
