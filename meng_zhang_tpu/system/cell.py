"""Periodic simulation cell.

Orthogonal periodic boxes (all reference scenes are orthogonal: the benchmark
box `in.st_test`/`fe_st.dat` and both geometry generators write orthogonal
LAMMPS data files). Positions are stored in Cartesian coordinates; minimum-
image displacements use the nearest-image convention, valid while the
interaction cutoff is below half the shortest box edge.
"""
from __future__ import annotations

import jax.numpy as jnp


def min_image(dx, box, pbc=(True, True, True)):
    """Nearest-image displacement for an orthogonal box.

    Args:
      dx: [..., 3] raw displacement(s) x_i - x_j.
      box: [3] orthogonal box edge lengths.
      pbc: static per-axis periodicity (the reference benchmark runs
        `boundary m p m`, in.st_test:7 -- only y periodic).
    """
    box = jnp.asarray(box, dtype=dx.dtype)
    wrapped = dx - box * jnp.round(dx / box)
    if all(pbc):
        return wrapped
    keep = jnp.asarray([not p for p in pbc], dtype=bool)
    return jnp.where(keep, dx, wrapped)


def wrap(x, box):
    """Wrap positions into [0, box)."""
    box = jnp.asarray(box, dtype=x.dtype)
    return x - box * jnp.floor(x / box)


def pair_displacements(x, idx, box):
    """dx[i, s] = min_image(x[i] - x[idx[i, s]]).

    Matches the reference sign convention xij = x_i - x_j
    (fe/src/pair_annp.cpp:138-140).
    """
    return min_image(x[:, None, :] - x[idx], box)


def volume(box):
    return box[0] * box[1] * box[2]
