"""Multi-chip spatial domain decomposition (the MD analogue of data parallel).

TPU-native replacement for the reference's MPI machinery (LAMMPS rank
subdomains + ghost exchange, `processors 2 1 1` in the benchmark,
in.st_test:2; parameter MPI_Bcast fe/src/pair_annp.cpp:516-574):

  * Atoms are globally SORTED by x at every rebuild and partitioned into
    equal-count contiguous slabs -- one per device. Equal counts = perfect
    load balance; sorted order makes every halo a *contiguous* block.
  * Per step, each device refreshes its two halo blocks (B atoms each) from
    its ring neighbors with `lax.ppermute` over ICI -- the ghost-atom
    forward communication of the reference, minus any host staging.
  * Forces use the same newton-off gather formulation as the single-chip
    path: each device evaluates descriptor/force rows for its local atoms
    PLUS a center-extension of Bc = B//2 halo atoms per side (every center
    that lists a local atom as neighbor), so the reverse-slot partner sums
    stay entirely local. B must cover all atoms within a 2*(cutoff+skin)
    x-slab of a slab boundary; a psum'd overflow flag reports violations.
  * Weights are replicated (a jit constant) -- the MPI_Bcast equivalent.

Neighbor rebuilds run globally (replicated positions, one build, slab
slicing + index remap); between rebuilds everything is device-local except
the two ppermutes and the psum thermo reductions.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..system.neighbors import (build_neighbors_cell, build_neighbors_n2,
                                cell_grid_dims, reverse_slots)
from ..units import BOLTZ, MVV2E
from ..md import integrate as I


class ShardState(NamedTuple):
    """Per-device slab state (leading axis sharded over the mesh)."""
    x_loc: jax.Array     # [D, C, 3] local atom positions (sorted order)
    v_loc: jax.Array     # [D, C, 3]
    f_loc: jax.Array     # [D, C, 3]
    halo_l: jax.Array    # [D, B, 3] positions of left-neighbor edge atoms
    halo_r: jax.Array    # [D, B, 3]
    idx: jax.Array       # [D, Cc, K] neighbor table rows for extended centers,
                         #            indices in the local frame [0, C+2B)
    rev: jax.Array       # [D, Cc, K] reverse slots within the center frame
    pe: jax.Array        # [D] per-device potential energy of local atoms
    step: jax.Array
    stale: jax.Array     # [D] bool
    overflow: jax.Array  # [D] bool


@dataclasses.dataclass(frozen=True)
class ShardConfig:
    n_devices: int
    c_loc: int            # atoms per device (N padded to D*C)
    halo_b: int           # halo block size (atoms; must cover a 2*rlist slab)
    capacity: int         # neighbor capacity K
    cutoff: float
    skin: float
    dt: float
    ensemble: str = "nve"
    t_target: float = 300.0
    tau_t: float = 0.1
    thermo_every: int = 10

    @property
    def bc(self) -> int:          # center extension per side
        return self.halo_b // 2

    @property
    def c_ext(self) -> int:       # position rows per device
        return self.c_loc + 2 * self.halo_b

    @property
    def cc(self) -> int:          # center rows per device
        return self.c_loc + 2 * self.bc


class ShardedMD:
    """1-D spatially-sharded MD driver around a PallasAnnp-style evaluator.

    evaluator must expose `energy_forces_frame(x_centers, x_src, box, idx,
    rev, n_local_slice)` semantics via `make_frame_force` below; here we
    wire it to PallasAnnp directly.
    """

    def __init__(self, pallas_model, masses_scalar, box, cfg: ShardConfig,
                 mesh: Mesh | None = None):
        self.pk = pallas_model
        self.m = float(masses_scalar)
        self.cfg = cfg
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:cfg.n_devices]), ("dp",))
        self.mesh = mesh
        self.box = jnp.asarray(box)

    # ---------- global (re)distribution ----------
    def distribute(self, x, v=None):
        """Sort atoms by x, pad to D*C, slice slabs + halos + neighbor rows.

        Runs replicated (cheap relative to its ~50-100 step cadence).
        Returns (ShardState, sort_order) -- order maps sorted->original.
        """
        cfg = self.cfg
        n = x.shape[0]
        n_pad = cfg.n_devices * cfg.c_loc
        if n != n_pad:
            raise ValueError(f"need n == n_devices*c_loc ({n_pad}), got {n}")
        order = jnp.argsort(x[:, 0])
        xs = x[order]
        vs = v[order] if v is not None else jnp.zeros_like(xs)

        rlist = cfg.cutoff + cfg.skin
        nbrs = self._global_build(xs)
        rev = reverse_slots(nbrs)

        d_idx = jnp.arange(cfg.n_devices)
        lo = d_idx * cfg.c_loc

        def slab(d):
            lo_d = lo[d]
            ext0 = lo_d - cfg.halo_b                     # start of frame
            rows0 = lo_d - cfg.bc                        # first center row
            center_rows = (rows0 + jnp.arange(cfg.cc)) % n
            idx_d = nbrs.idx[center_rows]
            rev_d = rev[center_rows]
            # remap neighbor ids: global (sorted) -> local frame, periodic
            rel = (idx_d - ext0) % n
            # ids outside the frame, and sentinels, map to the frame sentinel
            ok = (idx_d < n) & (rel < cfg.c_ext)
            idx_local = jnp.where(ok, rel, cfg.c_ext).astype(jnp.int32)
            # any real neighbor outside the frame = halo too small
            bad = jnp.any((idx_d < n) & (rel >= cfg.c_ext))
            loc_rows = (lo_d + jnp.arange(cfg.c_loc)) % n
            hl_rows = (lo_d - cfg.halo_b + jnp.arange(cfg.halo_b)) % n
            hr_rows = (lo_d + cfg.c_loc + jnp.arange(cfg.halo_b)) % n
            return (xs[loc_rows], vs[loc_rows], xs[hl_rows], xs[hr_rows],
                    idx_local, rev_d, bad)

        x_l, v_l, h_l, h_r, idx_l, rev_l, bad = jax.vmap(slab)(d_idx)
        st = ShardState(
            x_loc=x_l, v_loc=v_l, f_loc=jnp.zeros_like(x_l),
            halo_l=h_l, halo_r=h_r, idx=idx_l, rev=rev_l,
            pe=jnp.zeros(cfg.n_devices, x.dtype),
            step=jnp.asarray(0, jnp.int32),
            stale=jnp.zeros(cfg.n_devices, bool),
            overflow=bad | nbrs.overflow)
        st = self._shard(st)
        st = self._fill_forces(st)
        return st, order

    def _fill_forces(self, st: ShardState) -> ShardState:
        def dev(xl, hl, hr, idx, rev):
            pe, f = self._force_local(xl[0], hl[0], hr[0], idx[0], rev[0])
            return pe[None], f[None]

        pe, f = jax.shard_map(
            dev, mesh=self.mesh, in_specs=(P("dp"),) * 5,
            out_specs=(P("dp"), P("dp")), check_vma=False,
        )(st.x_loc, st.halo_l, st.halo_r, st.idx, st.rev)
        return st._replace(f_loc=f, pe=pe)

    def _global_build(self, xs):
        cfg = self.cfg
        rlist = cfg.cutoff + cfg.skin
        dims = cell_grid_dims(np.asarray(self.box), rlist)
        if min(dims) >= 3:
            return build_neighbors_cell(xs, self.box, rlist, cfg.capacity,
                                        dims, 96)
        return build_neighbors_n2(xs, self.box, rlist, cfg.capacity)

    def _shard(self, st: ShardState) -> ShardState:
        sh = NamedSharding(self.mesh, P("dp"))
        rep = NamedSharding(self.mesh, P())

        def put(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                    and leaf.shape[0] == self.cfg.n_devices:
                return jax.device_put(leaf, sh)
            return jax.device_put(leaf, rep)

        return jax.tree_util.tree_map(put, st)

    # ---------- per-device physics ----------
    def _frame_positions(self, x_loc, halo_l, halo_r):
        return jnp.concatenate([halo_l, x_loc, halo_r], axis=0)  # [C_ext, 3]

    def _force_local(self, x_loc, halo_l, halo_r, idx, rev):
        """Energy of local atoms + forces on local atoms (one device)."""
        cfg = self.cfg
        x_ext = self._frame_positions(x_loc, halo_l, halo_r)
        off = cfg.halo_b - cfg.bc              # center-frame offset in frame
        xc = x_ext[off: off + cfg.cc]
        eat, forces = self.pk.energy_forces_frame(
            xc, x_ext, self.box, idx, rev, off)
        sl = slice(cfg.bc, cfg.bc + cfg.c_loc)
        e_shift = dict(self.pk.cfg_key)["e_shift"]
        pe = jnp.sum(eat[sl] - e_shift) + cfg.c_loc * e_shift
        return pe, forces[sl]

    def _halo_refresh(self, x_loc):
        """Ring-exchange edge blocks: my top B rows -> right neighbor's left
        halo; my bottom B rows -> left neighbor's right halo."""
        cfg = self.cfg
        dn = cfg.n_devices
        right = [(i, (i + 1) % dn) for i in range(dn)]
        left = [(i, (i - 1) % dn) for i in range(dn)]
        halo_l = jax.lax.ppermute(x_loc[-cfg.halo_b:], "dp", right)
        halo_r = jax.lax.ppermute(x_loc[:cfg.halo_b], "dp", left)
        return halo_l, halo_r

    # ---------- sharded step ----------
    def _step_device(self, st_leaf):
        """One velocity-Verlet step; runs inside shard_map (leaves have the
        device axis stripped)."""
        cfg = self.cfg
        (x, v, f, hl, hr, idx, rev, pe, step, stale, ovf) = st_leaf
        dt = cfg.dt
        m = self.m

        if cfg.ensemble == "nvt":
            ndof = 3 * cfg.c_loc * cfg.n_devices - 3
            ke2 = jax.lax.psum(MVV2E * jnp.sum(m * v * v), "dp")
            # global single NH thermostat (chain of 1 across devices)
            scale = jnp.exp(-0.5 * dt / cfg.tau_t
                            * (ke2 / (ndof * BOLTZ * cfg.t_target) - 1.0))
            v = v * scale

        v = v + (0.5 * dt / MVV2E) * f / m
        x = x + dt * v
        hl, hr = self._halo_refresh(x)
        pe, f = self._force_local(x, hl, hr, idx, rev)
        v = v + (0.5 * dt / MVV2E) * f / m

        if cfg.ensemble == "nvt":
            ke2 = jax.lax.psum(MVV2E * jnp.sum(m * v * v), "dp")
            scale = jnp.exp(-0.5 * dt / cfg.tau_t
                            * (ke2 / (ndof * BOLTZ * cfg.t_target) - 1.0))
            v = v * scale
        return (x, v, f, hl, hr, idx, rev, pe, step + 1, stale, ovf)

    def make_run(self, n_steps: int):
        """Jitted sharded runner: n_steps with fixed neighbor tables."""
        cfg = self.cfg

        @jax.jit
        def run(st: ShardState):
            def dev_fn(x, v, f, hl, hr, idx, rev, pe, step, stale, ovf):
                leaf = (x[0], v[0], f[0], hl[0], hr[0], idx[0], rev[0],
                        pe[0], step, stale[0], ovf[0])

                def body(i, lf):
                    return self._step_device(lf)

                out = jax.lax.fori_loop(0, n_steps, body, leaf)
                (x, v, f, hl, hr, idx, rev, pe, step, stale, ovf) = out
                ke = jax.lax.psum(0.5 * MVV2E * jnp.sum(self.m * v * v), "dp")
                pe_g = jax.lax.psum(pe, "dp")
                return (x[None], v[None], f[None], hl[None], hr[None],
                        idx[None], rev[None], pe_g[None], step, stale[None],
                        ovf[None], ke[None])

            sh = P("dp")
            out = jax.shard_map(
                dev_fn, mesh=self.mesh,
                in_specs=(sh, sh, sh, sh, sh, sh, sh, sh, P(), sh, sh),
                out_specs=(sh, sh, sh, sh, sh, sh, sh, sh, P(), sh, sh, sh),
                check_vma=False,
            )(st.x_loc, st.v_loc, st.f_loc, st.halo_l, st.halo_r, st.idx,
              st.rev, st.pe, st.step, st.stale, st.overflow)
            (x, v, f, hl, hr, idx, rev, pe, step, stale, ovf, ke) = out
            new = ShardState(x_loc=x, v_loc=v, f_loc=f, halo_l=hl, halo_r=hr,
                             idx=idx, rev=rev, pe=pe, step=step, stale=stale,
                             overflow=ovf)
            return new, ke[0]

        return run

    # ---------- convenience ----------
    def gather_positions(self, st: ShardState, order):
        """Back to the original (unsorted) order, replicated [N, 3]."""
        xs = st.x_loc.reshape(-1, 3)
        inv = jnp.argsort(order)
        return xs[inv]
