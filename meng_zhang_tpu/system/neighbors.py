"""Neighbor lists: fixed-capacity padded arrays, built on device.

TPU-native replacement for the LAMMPS neighbor machinery the reference relies
on (full lists, REQ_FULL, fe/src/pair_annp.cpp:310) plus the GPU package's
in-kernel short-neighbor repack (k_annp_short_nbor, fe/lib/lal_annp.cu:267-344).

Design (SURVEY.md section 7): every list is a dense [N, K] int32 array padded
with the sentinel `N`; capacity overflows are reported through an explicit
`overflow` flag instead of the reference's silently-unchecked register caps
(fe/lib/lal_annp.cu:288). Lists are *symmetric by construction* (the cutoff
criterion is symmetric), which the gather-based force formulation requires.

Two builders:
  * `build_neighbors_n2`   — O(N^2) masked build, for small systems and tests.
  * `build_neighbors_cell` — cell-list binning, O(N), for production scenes.

Both are jit-compatible with static capacity arguments.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cell import min_image


class NeighborList(NamedTuple):
    idx: jax.Array        # [N, K] int32, padded with N
    overflow: jax.Array   # bool: any per-atom neighbor count exceeded K
    ref_x: jax.Array      # [N, 3] positions at build time (for skin check)
    rev: jax.Array        # [N, K] reverse-slot map (or [0, 0] placeholder)

    @property
    def capacity(self) -> int:
        return self.idx.shape[1]

    def mask(self) -> jax.Array:
        return self.idx < self.idx.shape[0]


_NO_REV = None


def _rev_placeholder():
    return jnp.zeros((0, 0), dtype=jnp.int32)


def _compact_rows(within, cand_idx, capacity, n_sentinel):
    """Pack True entries of `within` [R, C] into [R, capacity] index rows.

    Sort-based: valid candidate indices sort ahead of the sentinel, so a
    row sort + slice packs without any scatter (TPU scatters serialize;
    a bitonic row sort is orders of magnitude faster here). Returns
    (idx [R, capacity] padded with n_sentinel and ascending per row,
    per-row true counts).
    """
    keys = jnp.where(within, cand_idx.astype(jnp.int32),
                     jnp.int32(n_sentinel))
    keys = jnp.sort(keys, axis=1)
    counts = jnp.sum(within, axis=1)
    if keys.shape[1] < capacity:
        keys = jnp.concatenate(
            [keys, jnp.full((keys.shape[0], capacity - keys.shape[1]),
                            n_sentinel, jnp.int32)], axis=1)
    return keys[:, :capacity], counts


def build_neighbors_n2(x, box, cutoff, capacity, with_rev=False,
                       pbc=(True, True, True)):
    """All-pairs neighbor build (use for N up to a few thousand)."""
    n = x.shape[0]
    dx = min_image(x[:, None, :] - x[None, :, :], box, pbc)
    rsq = jnp.sum(dx * dx, axis=-1)
    # 1e-12 inner epsilon matches the reference's self/overlap guard
    # (fe/src/pair_annp.cpp:142)
    within = (rsq < cutoff * cutoff) & (rsq > 1.0e-12)
    within &= ~jnp.eye(n, dtype=bool)
    cand = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    idx, counts = _compact_rows(within, cand, capacity, n)
    nl = NeighborList(idx=idx, overflow=jnp.any(counts > capacity), ref_x=x,
                      rev=_rev_placeholder())
    if with_rev:
        nl = nl._replace(rev=reverse_slots(nl))
    return nl


def cell_grid_dims(box, cutoff):
    """Static grid dimensions for a cell list (>=1 cell of edge >= cutoff)."""
    return tuple(max(int(b // cutoff), 1) for b in box)


def build_neighbors_cell_rowsweep(x, box, cutoff, capacity, dims,
                                  cell_capacity, row_chunk=16384,
                                  with_rev=False, pbc=(True, True, True)):
    """Cell-list neighbor build.

    Args:
      x: [N, 3] positions (any image; binning wraps into the box).
      box: [3] box lengths.
      cutoff: interaction + skin cutoff.
      capacity: static max neighbors per atom (K).
      dims: static (nx, ny, nz) from `cell_grid_dims`; every entry must be
        >= 3 so the 27-stencil never aliases a cell onto itself — callers
        should fall back to `build_neighbors_n2` otherwise.
      cell_capacity: static max atoms per cell.
      row_chunk: atoms processed per compaction chunk (bounds peak memory).
    """
    n = x.shape[0]
    nx, ny, nz = dims
    ncell = nx * ny * nz
    if min(dims) < 3:
        raise ValueError("cell list needs >= 3 cells per direction; use n2")

    box = jnp.asarray(box, dtype=x.dtype)
    frac_w = x / box - jnp.floor(x / box)        # wrapped fractional coords
    frac_c = jnp.clip(x / box, 0.0, 1.0)         # clamped (non-periodic axes)
    keep = jnp.asarray(pbc, dtype=bool)
    frac = jnp.where(keep, frac_w, frac_c)
    dvec = jnp.asarray([nx, ny, nz])
    c3 = jnp.clip((frac * dvec).astype(jnp.int32), 0, dvec - 1)   # [N, 3]
    cid = (c3[:, 0] * ny + c3[:, 1]) * nz + c3[:, 2]              # [N]

    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    start = jnp.searchsorted(sorted_cid, jnp.arange(ncell), side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - start[sorted_cid].astype(jnp.int32)
    cell_overflow = jnp.any(rank >= cell_capacity)
    cell_atoms = jnp.full((ncell, cell_capacity + 1), n, dtype=jnp.int32)
    cell_atoms = cell_atoms.at[
        sorted_cid, jnp.minimum(rank, cell_capacity)].set(order, mode="drop")
    cell_atoms = cell_atoms[:, :cell_capacity]                    # [ncell, C]
    cell_atoms = jnp.concatenate(
        [cell_atoms, jnp.full((1, cell_capacity), n, jnp.int32)])  # sentinel row

    # 27-stencil neighbor cell ids for every cell, with periodic wrap
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"),
                     axis=-1).reshape(27, 3)
    all3 = jnp.stack(jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), jnp.arange(nz),
                                  indexing="ij"), axis=-1).reshape(ncell, 3)
    nb3_raw = all3[:, None, :] + offs[None, :, :]                 # [ncell, 27, 3]
    in_range = (nb3_raw >= 0) & (nb3_raw < dvec)
    cell_ok = jnp.all(in_range | jnp.asarray(pbc, bool), axis=-1)  # [ncell, 27]
    nb3 = nb3_raw % dvec
    nb_cid = (nb3[..., 0] * ny + nb3[..., 1]) * nz + nb3[..., 2]  # [ncell, 27]
    nb_cid = jnp.where(cell_ok, nb_cid, ncell)   # empty sentinel cell

    cut2 = cutoff * cutoff
    # per-component padded coordinates: a [M, 3] candidate-displacement array
    # would be tiled to [M, 128] on TPU (trailing-dim padding) -- 42x memory
    xp = [jnp.concatenate([x[:, d], jnp.zeros((1,), x.dtype)]) for d in range(3)]

    def chunk_fn(i0):
        ids = i0 + jnp.arange(row_chunk)
        ids_c = jnp.minimum(ids, n - 1)
        cand = cell_atoms[nb_cid[cid[ids_c]]].reshape(row_chunk, 27 * cell_capacity)
        rsq = jnp.zeros(cand.shape, x.dtype)
        for d in range(3):
            dxd = xp[d][ids_c][:, None] - xp[d][cand]
            if pbc[d]:
                dxd = dxd - box[d] * jnp.round(dxd / box[d])
            rsq = rsq + dxd * dxd
        within = (cand < n) & (cand != ids_c[:, None]) \
            & (rsq < cut2) & (rsq > 1.0e-12) & (ids < n)[:, None]
        return _compact_rows(within, cand, capacity, n)

    nchunk = -(-n // row_chunk)
    idx_chunks, count_chunks = jax.lax.map(
        chunk_fn, jnp.arange(nchunk) * row_chunk)
    idx = idx_chunks.reshape(nchunk * row_chunk, capacity)[:n]
    counts = count_chunks.reshape(-1)[:n]
    # NPT guard: if the box shrank so a cell edge dropped below the cutoff,
    # the 27-stencil can miss neighbors -- flag it instead of silently
    # losing pairs
    dims_stale = jnp.any((box / jnp.asarray(dims, box.dtype) < cutoff)
                         & jnp.asarray(pbc, bool))
    overflow = jnp.any(counts > capacity) | cell_overflow | dims_stale
    nl = NeighborList(idx=idx, overflow=overflow, ref_x=x,
                      rev=_rev_placeholder())
    if with_rev:
        nl = nl._replace(rev=reverse_slots(nl))
    return nl


def build_neighbors_cell(x, box, cutoff, capacity, dims,
                         cell_capacity, cell_chunk=64,
                         with_rev=False, pbc=(True, True, True)):
    """Cell-list build, cell-blocked variant.

    Same result as `build_neighbors_cell` but organized per cell so neighbor
    candidates arrive via LARGE-row gathers (one [C*8]-float row per stencil
    cell) instead of per-element gathers -- pointwise TPU gathers run at
    ~130M elem/s while multi-KB-row gathers approach HBM bandwidth.
    """
    n = x.shape[0]
    nx, ny, nz = dims
    ncell = nx * ny * nz
    if min(dims) < 3:
        raise ValueError("cell list needs >= 3 cells per direction; use n2")

    box = jnp.asarray(box, dtype=x.dtype)
    frac_w = x / box - jnp.floor(x / box)
    frac_c = jnp.clip(x / box, 0.0, 1.0)
    frac = jnp.where(jnp.asarray(pbc, bool), frac_w, frac_c)
    dvec = jnp.asarray([nx, ny, nz])
    c3 = jnp.clip((frac * dvec).astype(jnp.int32), 0, dvec - 1)
    cid = (c3[:, 0] * ny + c3[:, 1]) * nz + c3[:, 2]

    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    start = jnp.searchsorted(sorted_cid, jnp.arange(ncell), side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - start[sorted_cid].astype(jnp.int32)
    cell_overflow = jnp.any(rank >= cell_capacity)
    cc = cell_capacity
    # grid[c, slot] = atom id; one extra sentinel cell row at index ncell
    grid = jnp.full(((ncell + 1) * cc,), n, dtype=jnp.int32)
    grid = grid.at[sorted_cid * cc + jnp.minimum(rank, cc - 1)].set(
        order, mode="drop")
    grid = grid.reshape(ncell + 1, cc)

    # packed per-cell coordinates [ncell+1, cc, 8] -> rows of cc*8 floats
    x8 = jnp.pad(x, ((0, 1), (0, 5)))                     # [N+1, 8]
    grid_x8 = x8[jnp.minimum(grid, n)]                    # [ncell+1, cc, 8]
    grid_x8 = grid_x8.reshape(ncell + 1, cc * 8)

    # stencil cell ids
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"),
                     axis=-1).reshape(27, 3)
    all3 = jnp.stack(jnp.meshgrid(jnp.arange(nx), jnp.arange(ny),
                                  jnp.arange(nz), indexing="ij"),
                     axis=-1).reshape(ncell, 3)
    nb3_raw = all3[:, None, :] + offs[None, :, :]
    cell_ok = jnp.all(((nb3_raw >= 0) & (nb3_raw < dvec))
                      | jnp.asarray(pbc, bool), axis=-1)
    nb3 = nb3_raw % dvec
    nb_cid = (nb3[..., 0] * ny + nb3[..., 1]) * nz + nb3[..., 2]
    nb_cid = jnp.where(cell_ok, nb_cid, ncell)            # [ncell, 27]

    cut2 = cutoff * cutoff
    n_blocks = -(-ncell // cell_chunk)

    def block_fn(c0):
        cells = jnp.minimum(c0 + jnp.arange(cell_chunk), ncell - 1)
        own = grid[cells]                                  # [B, cc]
        own8 = grid_x8[cells].reshape(cell_chunk, cc, 8)
        cand = grid[nb_cid[cells]].reshape(cell_chunk, 27 * cc)
        cand8 = grid_x8[nb_cid[cells]].reshape(cell_chunk, 27 * cc, 8)
        rsq = jnp.zeros((cell_chunk, cc, 27 * cc), x.dtype)
        for d in range(3):
            dd = own8[:, :, None, d] - cand8[:, None, :, d]
            if pbc[d]:
                dd = dd - box[d] * jnp.round(dd / box[d])
            rsq = rsq + dd * dd
        within = (cand[:, None, :] < n) & (own[:, :, None] < n) \
            & (cand[:, None, :] != own[:, :, None]) \
            & (rsq < cut2) & (rsq > 1.0e-12)
        w2 = within.reshape(cell_chunk * cc, 27 * cc)
        c2 = jnp.broadcast_to(cand[:, None, :],
                              (cell_chunk, cc, 27 * cc)
                              ).reshape(cell_chunk * cc, 27 * cc)
        idx_rows, counts = _compact_rows(w2, c2, capacity, n)
        return idx_rows.reshape(cell_chunk, cc, capacity), \
            counts.reshape(cell_chunk, cc)

    idx_cells, count_cells = jax.lax.map(
        block_fn, jnp.arange(n_blocks) * cell_chunk)
    idx_cells = idx_cells.reshape(n_blocks * cell_chunk, cc, capacity)[:ncell]
    count_cells = count_cells.reshape(-1, cc)[:ncell]

    # back to atom order: atom i sits at (cid[i], rank[inv_order[i]])
    # (`rank` is indexed by sorted position, not atom id)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    rank_atom = rank[inv_order]
    flat = cid * cc + jnp.minimum(rank_atom, cc - 1)
    idx = idx_cells.reshape(ncell * cc, capacity)[flat]    # row gather (K ints)
    counts = count_cells.reshape(-1)[flat]

    dims_stale = jnp.any((box / jnp.asarray(dims, box.dtype) < cutoff)
                         & jnp.asarray(pbc, bool))
    overflow = jnp.any(counts > capacity) | cell_overflow | dims_stale
    nl = NeighborList(idx=idx, overflow=overflow, ref_x=x,
                      rev=_rev_placeholder())
    if with_rev:
        nl = nl._replace(rev=reverse_slots(nl))
    return nl


def max_displacement_sq(nbrs: NeighborList, x, box, pbc=(True, True, True)):
    """Largest squared displacement since the list was built (scalar).

    Componentwise to avoid trailing-dim-3 tiling on TPU. Callers comparing
    against several thresholds (stale + dangerous-build) evaluate the O(N)
    reduction once and compare the scalar."""
    rsq = jnp.zeros(x.shape[0], x.dtype)
    for d in range(3):
        dd = x[:, d] - nbrs.ref_x[:, d]
        if pbc[d]:
            dd = dd - box[d] * jnp.round(dd / box[d])
        rsq = rsq + dd * dd
    return jnp.max(rsq)


def needs_rebuild(nbrs: NeighborList, x, box, skin, pbc=(True, True, True)):
    """True when any atom moved more than skin/2 since the list was built.

    Replaces the reference benchmark's fixed `neigh_modify every 5`
    (in.st_test:10) with the standard safe-displacement criterion.
    """
    return max_displacement_sq(nbrs, x, box, pbc) > (0.5 * skin) ** 2


def estimate_capacity(box, cutoff, n, headroom=1.25, minimum=8):
    """Padded capacity estimate from mean density (rounded up to 8)."""
    vol = float(box[0] * box[1] * box[2])
    mean = n / vol * (4.0 / 3.0) * math.pi * cutoff ** 3
    k = int(mean * headroom) + 1
    return max(minimum, -(-k // 8) * 8)


def reverse_slots(nbrs: NeighborList, row_chunk=1024):
    """rev[i, s] = slot s' with idx[idx[i, s], s'] == i (symmetric lists).

    Enables a gather-only force pass: a per-pair contribution computed
    i-centered for neighbor j sits at a position the *receiving* atom can
    gather through (j, rev), eliminating the reference's serialized scatter
    kernel (k_annp_updat, fe/lib/lal_annp.cu:715-846). Entries with no match
    (padding) return K.
    """
    n, k = nbrs.idx.shape

    def chunk_fn(i0):
        rows = jnp.minimum(i0 + jnp.arange(row_chunk), n - 1)
        j = nbrs.idx[rows]                                   # [R, K]
        nbrs_of_j = nbrs.idx[jnp.minimum(j, n - 1)]          # [R, K, K]
        match = nbrs_of_j == rows[:, None, None]             # i appears where?
        s_prime = jnp.argmax(match, axis=-1).astype(jnp.int32)
        ok = jnp.any(match, axis=-1) & (j < n)
        return jnp.where(ok, s_prime, k)

    nchunk = -(-n // row_chunk)
    out = jax.lax.map(chunk_fn, jnp.arange(nchunk) * row_chunk)
    return out.reshape(nchunk * row_chunk, k)[:n]
