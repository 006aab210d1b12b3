"""2-D (x, y) spatial domain decomposition over a device mesh.

Generalizes the 1-D slab driver (parallel/domain.py) to a (Dx, Dy) grid of
rectangular columns -- the TPU-native analogue of LAMMPS' 3-D `processors`
decomposition (the reference benchmark ran `processors 2 1 1`, in.st_test:2,
but LAMMPS itself decomposes in all dimensions). On a near-cubic box at 8+
devices, 1-D slabs pay a halo fraction approaching the slab width / rlist
ratio; a 2-D mesh cuts the ghost volume roughly by the aspect improvement
(see scripts/halo_fraction.py for the recorded table).

Layout (all shapes static):
  * Atoms are sorted by x into Dx equal-count slabs, then by y into Dy
    equal-count blocks per slab; device (sx, sy) owns C = n/(Dx*Dy) rows.
    Nominal rectangle boundaries are stored as box FRACTIONS so NPT box
    rescaling moves them with the atoms.
  * Ghost exchange is the classic two-round staged halo (LAMMPS comm
    order): round 1 ships x-face atoms to the two x-neighbors, round 2
    ships y-face rows of the round-1 frame [local + x-ghosts] to the two
    y-neighbors -- corner ghosts ride the second round automatically.
    Both rounds are `lax.ppermute` rings over the flat mesh axis.
  * Send sets are DYNAMIC index tables carried in the state (Plan2D) and
    recomputed IN-GRAPH at every rebuild from the current coordinates with
    a drift-headroom window (w_send = 2*rlist + skin/2 per face -- ghosts
    within rlist feed local forces directly and need their own complete
    neighborhoods one more rlist out). Only the table CAPACITIES (bx, by)
    are planned on the host at distribute() (with headroom); in-run
    membership growth beyond them latches OVF_COVERAGE. Dynamic tables are
    what allow in-run atom migration (LAMMPS exchange()): after rows move
    between devices, the next rebuild replans from the new ownership.
    Padding entries are parked in a gutter of the frame box: parked rows
    sit > rlist from every real atom, and park-park pairs have exactly zero
    distance, which the 1e-12 self-overlap guard excludes -- so pads never
    enter any neighbor row.
  * Correctness is enforced by sticky checks at every rebuild, each device
    validating its OWN data:
      (a) retroactive send-coverage: every local/frame atom now inside the
          exact 2*rlist face band must have been a member of the send set
          used during the ending epoch (OVF_COVERAGE otherwise) -- the
          w_send - w_need = skin/2 margin guarantees this whenever the
          epoch's drift stayed under the staleness trigger;
      (b) containment: every local atom stays inside its rectangle plus the
          drift margin (OVF_FRAME) -- with the static minimum-width check
          at plan time this also rules out non-adjacent-device pairs;
      (c) table-capacity overflow at replan time (OVF_COVERAGE);
      (d) the neighbor build's own capacity/cell flags (OVF_NEIGHBOR).
  * Energies are evaluated for ALL frame rows (centers = frame): ghost rows
    within rlist of the rectangle have complete neighborhoods by (a), so
    -grad of the center-energy sum is exact for local rows; farther ghost
    rows have zero dependence on local coordinates and contribute nothing.
    Served models: the gradient / newton-off frame models (XlaFrameModel
    for fe AND ni, AnnaFrameModel) AND the Pallas reverse-slot model
    (AnnpFrameModel) -- the frame neighbor build emits reverse-slot maps
    when the model asks for them.
  * In-run migration (cfg.migrate_b > 0): an x-round then a y-round of the
    1-D driver's bounded edge-block exchange -- local rows re-sorted by x,
    the migrate_b-row edge blocks at each x-face merged with the x-neighbor
    by boundary-centered x and re-split half/half (bit-exact transport,
    equal counts preserved); then the same along y within each slab. An
    atom crossing an x-boundary lands in the adjacent slab with its y-block
    resolved by subsequent y-rounds (adjacent slabs' y-boundaries are
    misaligned by at most the delta the plan-time check bounds).

Integrator, thermostats, barostat, thermo, and the run loop are inherited
unchanged from ShardedMD -- the layout lives entirely behind the
`_exchange_and_force` / `_rebuild_body` / `_migrate_body` hooks.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .domain import (OVF_COVERAGE, OVF_FRAME, OVF_NEIGHBOR, ShardConfig,
                     ShardedMD, ShardState, _state_specs)
from ..md import integrate as I
from ..system.neighbors import (build_neighbors_cell, build_neighbors_n2,
                                cell_grid_dims, estimate_capacity,
                                reverse_slots)


def plan_park_sites(n_rows, w_after_x, wy, wz, rlist, cell_capacity):
    """Static pad-park geometry for a frame of n_rows rows.

    Pads must sit > rlist from every real atom AND not overload any cell
    of the frame neighbor build. A single park point piles every pad into
    one cell and trips cell_capacity once frames grow past ~64 pads (the
    cell-build path); instead reserve a strip of park SITES beyond the
    real x-extent, pitch ~rlist, assigning row r to site r mod n_sites.
    Co-located pads on one site exclude each other through the 1e-12
    self-overlap guard, so the only constraint is <= cell_capacity pads
    per site -- n_sites is planned for the worst case (every row a pad).

    Returns (wx_total, park_xyz [n_rows, 3] float64)."""
    rl = float(rlist) + 0.1
    ny_s = max(1, int(wy // rl))
    nz_s = max(1, int(wz // rl))
    n_sites = -(-n_rows // max(1, cell_capacity // 2))
    nx_s = -(-n_sites // (ny_s * nz_s))
    base_x = w_after_x + rl
    wx_total = base_x + nx_s * rl + rl
    s = np.arange(n_rows) % (nx_s * ny_s * nz_s)
    ix, rem = np.divmod(s, ny_s * nz_s)
    iy, iz = np.divmod(rem, nz_s)
    park = np.stack([base_x + (ix + 0.5) * rl, (iy + 0.5) * rl,
                     (iz + 0.5) * rl], axis=1)
    return wx_total, park


class Plan2D(NamedTuple):
    """Dynamic exchange plan, one leaf set per device (sharded over "dp").

    sxh/sxl: [D, bx] local-row send tables toward x+1 / x-1 (-1 pads);
    syh/syl: [D, by] F1-row send tables toward y+1 / y-1;
    f1v:     [D, C + 2*bx] round-1 frame-row validity;
    padm:    [D, c_ext] pad mask over the assembled frame;
    cov:     [D] bool -- the tables describe the CURRENT row ownership, so
             the retroactive coverage check at the next rebuild is
             meaningful (False right after distribute() or migrate(),
             whose row moves invalidate old-table row indices)."""
    sxh: jax.Array
    sxl: jax.Array
    syh: jax.Array
    syl: jax.Array
    f1v: jax.Array
    padm: jax.Array
    cov: jax.Array


@dataclasses.dataclass(frozen=True)
class Shard2DConfig(ShardConfig):
    """ShardConfig plus the (Dx, Dy) mesh shape. halo_b is a 1-D concept
    and must stay at its default; bx/by ghost-block sizes are derived from
    the scene at distribute(). migrate_b enables the two-round in-run
    migration."""
    mesh_shape: tuple = (2, 2)


class ShardedMD2D(ShardedMD):
    """Spatially-sharded MD driver on a 2-D (x, y) device grid."""

    def __init__(self, model, masses_scalar, box, cfg: Shard2DConfig,
                 mesh=None):
        dx, dy = cfg.mesh_shape
        if dx * dy != cfg.n_devices:
            raise ValueError("mesh_shape must multiply to n_devices")
        if dy < 2:
            raise ValueError("use the 1-D ShardedMD for a Dy=1 mesh")
        if cfg.halo_b is not None:
            raise ValueError("halo_b is a 1-D slab option")
        super().__init__(model, masses_scalar, box, cfg, mesh=mesh)
        self.dx, self.dy = dx, dy

    # ================= planning (host, at distribute) =================
    def _plan2d(self, xs: np.ndarray, box: np.ndarray):
        """Derive rectangle boundaries, table CAPACITIES, the frame grid,
        and the initial Plan2D arrays from the initial sorted coordinates.
        xs is the [n, 3] array already in (slab, block) order."""
        cfg = self.cfg
        dx, dy, C = self.dx, self.dy, cfg.c_loc
        n, sx_n = self.n, self.n // dx
        lx, ly = float(box[0]), float(box[1])
        rlist = cfg.rlist
        self.w_need = 2.0 * rlist
        self.w_send = self.w_need + 0.5 * cfg.skin
        self.m_drift = 0.5 * cfg.skin

        # ---- nominal boundaries (count medians), box fractions ----
        # rows arrive in (slab, y-within-slab) order: x boundaries must come
        # from the x-sorted values, not the row order
        xcol = xs[:, 0]
        xsrt = np.sort(xcol)
        xb = np.empty(dx + 1)
        for s in range(1, dx):
            xb[s] = 0.5 * (xsrt[s * sx_n - 1] + xsrt[s * sx_n])
        if cfg.pbc[0]:
            seam = 0.5 * (xsrt[-1] + xsrt[0] + lx)
            xb[0], xb[dx] = seam - lx, seam
        else:
            xb[0], xb[dx] = xsrt[0] - 1e-6, xsrt[-1] + 1e-6
        yb = np.empty((dx, dy + 1))
        for s in range(dx):
            yc = np.sort(xs[s * sx_n:(s + 1) * sx_n, 1])
            for t in range(1, dy):
                yb[s, t] = 0.5 * (yc[t * C - 1] + yc[t * C])
            if cfg.pbc[1]:
                seam = 0.5 * (yc[-1] + yc[0] + ly)
                yb[s, 0], yb[s, dy] = seam - ly, seam
            else:
                yb[s, 0], yb[s, dy] = yc.min() - 1e-6, yc.max() + 1e-6
        self.xb_frac, self.yb_frac = xb / lx, yb / ly

        # Static separation guarantee: devices at grid distance >= 2 must be
        # unreachable within the w_need frame band. An atom of such a device
        # is separated from this rectangle by at least one full block width
        # (minus the boundary misalignment between adjacent slabs, delta,
        # for diagonal blocks); the containment check below then bounds how
        # far any atom may stray from its own rectangle. Distance-2 devices
        # only exist past these mesh sizes (a periodic ring of 3 is all-
        # adjacent).
        min_wx = np.diff(xb).min()
        min_wy = np.diff(yb, axis=1).min()
        delta_y = 0.0
        for s in range(dx - 1 + (1 if cfg.pbc[0] else 0)):
            delta_y = max(delta_y, np.max(np.abs(
                yb[s, 1:dy] - yb[(s + 1) % dx, 1:dy])))
        far_x = dx >= 4 or (dx == 3 and not cfg.pbc[0])
        far_y = dy >= 4 or (dy == 3 and not cfg.pbc[1])
        self.m_contain_x = min_wx - self.w_need if far_x else None
        self.m_contain_y = (min_wy - self.w_need - delta_y if far_y
                            else None)
        if far_x and self.m_contain_x <= self.m_drift:
            raise ValueError(f"slab x-width {min_wx:.2f} leaves no drift "
                             f"margin over w_need {self.w_need:.2f}: too "
                             "many x-slabs for this box")
        if far_y and self.m_contain_y <= self.m_drift:
            raise ValueError(f"block y-width {min_wy:.2f} (boundary "
                             f"misalignment {delta_y:.2f}) leaves no drift "
                             f"margin over w_need: too many y-blocks")

        # ---- capacities from the initial membership + headroom ----
        d_of = lambda s, t: s * dy + t                      # noqa: E731
        rows0 = lambda d: (d // dy) * sx_n + (d % dy) * C   # noqa: E731
        memx_hi = np.zeros((self.n_dev, C), bool)
        memx_lo = np.zeros((self.n_dev, C), bool)
        for d in range(self.n_dev):
            s = d // dy
            loc_x = xcol[rows0(d): rows0(d) + C]
            if cfg.pbc[0] or s < dx - 1:
                memx_hi[d] = loc_x > xb[s + 1] - self.w_send
            if cfg.pbc[0] or s > 0:
                memx_lo[d] = loc_x < xb[s] + self.w_send
        bx = max(int(memx_hi.sum(1).max()), int(memx_lo.sum(1).max()))
        # 25% headroom: membership is dynamic now and breathes with drift
        bx = min(max(8, -(-int(bx * 1.25 + 2) // 8) * 8), C)
        self.bx = bx
        c1 = C + 2 * bx

        # y-capacity from the initial frame contents
        f1_y = np.zeros((self.n_dev, c1))
        f1_valid = np.zeros((self.n_dev, c1), bool)
        f1_valid[:, :C] = True
        for d in range(self.n_dev):
            s, t = d // dy, d % dy
            f1_y[d, :C] = xs[rows0(d): rows0(d) + C, 1]
            for side, (ns, mem) in enumerate(
                    [((s - 1) % dx, memx_hi), ((s + 1) % dx, memx_lo)]):
                if not cfg.pbc[0] and ((side == 0 and s == 0)
                                       or (side == 1 and s == dx - 1)):
                    continue                      # wrap block: stays invalid
                src = d_of(ns, t)
                idx = np.nonzero(mem[src])[0]
                o = C + side * bx
                f1_y[d, o:o + len(idx)] = xs[rows0(src) + idx, 1]
                f1_valid[d, o:o + len(idx)] = True
        memy = np.zeros((self.n_dev, c1), bool)
        by = 0
        for d in range(self.n_dev):
            s, t = d // dy, d % dy
            if cfg.pbc[1] or t < dy - 1:
                m = f1_valid[d] & (f1_y[d] > yb[s, t + 1] - self.w_send)
                by = max(by, int(m.sum()))
            if cfg.pbc[1] or t > 0:
                m = f1_valid[d] & (f1_y[d] < yb[s, t] + self.w_send)
                by = max(by, int(m.sum()))
        by = min(max(8, -(-int(by * 1.25 + 2) // 8) * 8), c1)
        self.by = by
        self.c1, self.c_ext2d = c1, c1 + 2 * by

        # ---- frame box + grid (static), park sites in the x-gutter ----
        # window = send window + one skin of drift headroom per side: a
        # marginal send-set member that drifts stays inside the frame
        self.w_frame = self.w_send + cfg.skin
        w_real_x = float(np.diff(xb).max()) + 2 * self.w_frame
        wy = float(np.diff(yb, axis=1).max()) + 2 * self.w_frame
        wx, park = plan_park_sites(self.c_ext2d, w_real_x, wy,
                                   float(box[2]), rlist, cfg.cell_capacity)
        self.park2d = park
        self.wx_frame, self.wy_frame = wx, wy
        shrink = 0.92 if cfg.ensemble == "npt" else 1.0
        dims = cell_grid_dims((wx, wy, float(box[2]) * shrink), rlist)
        method = cfg.nbr_method
        if method == "auto":
            method = "cell" if (min(dims) >= 3
                                and self.c_ext2d > 2048) else "n2"
        self.frame_dims = dims if method == "cell" else None
        if cfg.capacity is None:
            self.cfg = dataclasses.replace(
                cfg, capacity=estimate_capacity(box, rlist, n))
        for attr in ("_rebuild_fn", "_refill_fn", "_run1", "_exch_fn",
                     "_migrate_fn"):
            if hasattr(self, attr):
                delattr(self, attr)

    @property
    def n_dev(self):
        return self.cfg.n_devices

    def _specs(self):
        return _state_specs(Plan2D(*([P("dp")] * 7)),
                            short_spec=self._short_spec())

    def _short_geom(self):
        # 2-D frames evaluate ALL frame rows as centers
        return 0, self.c_ext2d

    def _frame_rows(self):
        return self.c_ext2d

    # ================= distribution =================
    def distribute(self, x, v=None, box=None):
        """Two-level (x, then y within slab) equal-count sort; returns
        (ShardState, order)."""
        cfg = self.cfg
        n = x.shape[0]
        if n != self.n:
            raise ValueError(f"need n == n_devices*c_loc ({self.n}), got {n}")
        box_np = self.box0 if box is None else np.asarray(box, np.float64)
        dx, dy, C = self.dx, self.dy, cfg.c_loc
        sx_n = n // dx
        xh = np.asarray(x, np.float64)
        o1 = np.argsort(xh[:, 0], kind="stable")
        order = np.empty(n, np.int64)
        for s in range(dx):
            sl = o1[s * sx_n:(s + 1) * sx_n]
            order[s * sx_n:(s + 1) * sx_n] = sl[np.argsort(xh[sl, 1],
                                                           kind="stable")]
        self._plan2d(xh[order], box_np)
        cfg = self.cfg

        order_j = jnp.asarray(order)
        xs = jnp.asarray(x)[order_j]
        vs = (jnp.asarray(v)[order_j] if v is not None
              else jnp.zeros_like(xs))
        D = self.n_dev
        dtype = xs.dtype
        x_l = xs.reshape(D, C, 3)
        hshape = (D, self.bx + self.by, 3)
        plan0 = Plan2D(
            sxh=jnp.full((D, self.bx), -1, jnp.int32),
            sxl=jnp.full((D, self.bx), -1, jnp.int32),
            syh=jnp.full((D, self.by), -1, jnp.int32),
            syl=jnp.full((D, self.by), -1, jnp.int32),
            f1v=jnp.zeros((D, self.c1), bool),
            padm=jnp.ones((D, self.c_ext2d), bool),
            cov=jnp.zeros(D, bool))
        st = ShardState(
            x_loc=x_l, v_loc=vs.reshape(D, C, 3), f_loc=jnp.zeros_like(x_l),
            gid=order_j.astype(jnp.int32).reshape(D, C),
            halo_l=jnp.zeros(hshape, dtype), halo_r=jnp.zeros(hshape, dtype),
            idx=jnp.zeros((D, self.c_ext2d, cfg.capacity), jnp.int32),
            rev=(jnp.zeros((D, self.c_ext2d, cfg.capacity), jnp.int32)
                 if self.model.with_rev else jnp.zeros((D, 1, 1), jnp.int32)),
            ref_loc=x_l, pe=jnp.zeros(D, dtype),
            box=jnp.asarray(box_np, dtype),
            virial=jnp.zeros((3, 3), dtype),
            nhc=I.NHCState.zeros(cfg.nhc_len, dtype),
            v_eps=jnp.zeros(3, dtype),
            baro_nhc=I.NHCState.zeros(cfg.pchain, dtype),
            step=jnp.asarray(0, jnp.int32),
            stale=jnp.zeros(D, bool), unsafe=jnp.zeros(D, bool),
            overflow=jnp.zeros(D, jnp.int32), plan=plan0,
            short=self._short_placeholder(x_l))
        st = self._shard(st)
        st = self.rebuild(st)           # replans + exchanges + builds
        st = self.refill_forces(st)
        return st, order_j

    # ================= in-graph halo machinery =================
    def _perm(self, axis, step):
        """Flat-axis permutation pairs for a +-1 ring shift on (sx, sy)."""
        dx, dy = self.dx, self.dy
        out = []
        for d in range(self.n_dev):
            s, t = d // dy, d % dy
            if axis == 0:
                out.append((d, ((s + step) % dx) * dy + t))
            else:
                out.append((d, s * dy + (t + step) % dy))
        return out

    def _bounds(self, i, box, dtype):
        sx, sy = i // self.dy, i % self.dy
        xb = jnp.asarray(self.xb_frac, dtype) * box[0]         # [Dx+1]
        yb = jnp.asarray(self.yb_frac, dtype) * box[1]         # [Dx, Dy+1]
        return sx, sy, xb[sx], xb[sx + 1], yb[sx, sy], yb[sx, sy + 1]

    def _exchange2d(self, plan, x, box):
        """Two-round staged halo exchange from the state-borne plan;
        returns (halo_l, halo_r) with halo_l = [xg_l | yg_d],
        halo_r = [xg_r | yg_u]."""
        cfg = self.cfg
        i = jax.lax.axis_index("dp")
        sx, sy = i // self.dy, i % self.dy
        zero = jnp.asarray(0.0, x.dtype)

        sxh, sxl = plan.sxh[0], plan.sxl[0]
        xg_l = jax.lax.ppermute(x[jnp.maximum(sxh, 0)], "dp",
                                self._perm(0, +1))
        xg_r = jax.lax.ppermute(x[jnp.maximum(sxl, 0)], "dp",
                                self._perm(0, -1))
        if cfg.pbc[0]:       # periodic x-seam: patch-shift received blocks
            xg_l = xg_l.at[:, 0].add(jnp.where(sx == 0, -box[0], zero))
            xg_r = xg_r.at[:, 0].add(jnp.where(sx == self.dx - 1,
                                               box[0], zero))
        f1 = jnp.concatenate([x, xg_l, xg_r], axis=0)

        syh, syl = plan.syh[0], plan.syl[0]
        yg_d = jax.lax.ppermute(f1[jnp.maximum(syh, 0)], "dp",
                                self._perm(1, +1))
        yg_u = jax.lax.ppermute(f1[jnp.maximum(syl, 0)], "dp",
                                self._perm(1, -1))
        if cfg.pbc[1]:
            yg_d = yg_d.at[:, 1].add(jnp.where(sy == 0, -box[1], zero))
            yg_u = yg_u.at[:, 1].add(jnp.where(sy == self.dy - 1,
                                               box[1], zero))
        return (jnp.concatenate([xg_l, yg_d], axis=0),
                jnp.concatenate([xg_r, yg_u], axis=0))

    def exchange(self, st: ShardState) -> ShardState:
        """Refresh the halo buffers from the current local positions."""
        if not hasattr(self, "_exch_fn"):
            def body(s):
                hl, hr = self._exchange2d(s.plan, s.x_loc[0], s.box)
                return s._replace(halo_l=hl[None], halo_r=hr[None])
            self._exch_fn = jax.jit(self._smap(body))
        return self._exch_fn(st)

    # ---------- per-device frame helpers ----------
    def _frame(self, x, hl, hr):
        bx = self.bx
        return jnp.concatenate([x, hl[:bx], hr[:bx], hl[bx:], hr[bx:]],
                               axis=0)

    def _force_local(self, x, hl, hr, box, idx, rev, short=None):
        cfg = self.cfg
        x_ext = self._frame(x, hl, hr)
        sl = (0, cfg.c_loc)
        if short is not None:
            eat, forces, w = self._eval_frame_short(
                x_ext, x_ext, box, short, self.c_ext2d, sl)
        else:
            eat, forces, w = self.model.eval(x_ext, x_ext, box, idx, rev, 0,
                                             sl, True)
        pe = jnp.sum(eat[:cfg.c_loc] - self.model.e_shift)
        return pe, forces[:cfg.c_loc], w

    def _exchange_and_force(self, st: ShardState, x, box):
        hl, hr = self._exchange2d(st.plan, x, box)
        pe, f, w = self._force_local(x, hl, hr, box, st.idx[0], st.rev[0],
                                     short=st.short)
        return {"halo_l": hl[None], "halo_r": hr[None]}, pe, f, w

    # ---------- in-graph replanning ----------
    @staticmethod
    def _pack_rows(mem, cap):
        """(indices [cap] of True entries in ascending row order, -1 pads;
        overflow bool). A stable 2-operand sort -- no scatters."""
        r = mem.shape[0]
        key = jnp.where(mem, 0, 1).astype(jnp.int32)
        rows = jnp.arange(r, dtype=jnp.int32)
        _, srt = jax.lax.sort((key, rows), num_keys=1)
        cnt = jnp.sum(mem.astype(jnp.int32))
        lane = jnp.arange(cap, dtype=jnp.int32)
        idx = jnp.where(lane < cnt, srt[:cap], -1)
        return idx, cnt > cap

    @staticmethod
    def _mark(idx, rows):
        """Bool membership [rows] from an index table (-1 pads)."""
        m = jnp.zeros(rows + 1, bool)
        return m.at[jnp.where(idx >= 0, idx, rows)].set(True)[:rows]

    def _replan_exchange(self, st: ShardState, x, box):
        """Recompute the send tables from the current positions, run the
        two-round exchange (with validity), and assemble the new plan.
        Returns (plan, halo_l, halo_r, bad_cov_retro, plan_ovf)."""
        cfg = self.cfg
        C, bx, by, c1 = cfg.c_loc, self.bx, self.by, self.c1
        dtype = x.dtype
        i = jax.lax.axis_index("dp")
        sx, sy, r_xlo, r_xhi, r_ylo, r_yhi = self._bounds(i, box, dtype)
        ws = jnp.asarray(self.w_send, dtype)
        wn = jnp.asarray(self.w_need, dtype)
        zero = jnp.asarray(0.0, dtype)

        need_xh = cfg.pbc[0] | (sx < self.dx - 1)
        need_xl = cfg.pbc[0] | (sx > 0)
        need_yh = cfg.pbc[1] | (sy < self.dy - 1)
        need_yl = cfg.pbc[1] | (sy > 0)

        # (a) retroactive coverage of the ENDING epoch's tables: any atom
        # now in the exact w_need band must have been in the old send set.
        # Skipped (cov=False) right after distribute()/migrate(), whose row
        # moves invalidate the old tables' row indices.
        old = st.plan
        oldx_hi = self._mark(old.sxh[0], C)
        oldx_lo = self._mark(old.sxl[0], C)
        bad = (need_xh & jnp.any((x[:, 0] > r_xhi - wn) & ~oldx_hi)) \
            | (need_xl & jnp.any((x[:, 0] < r_xlo + wn) & ~oldx_lo))
        f1y_old = jnp.concatenate([x[:, 1], st.halo_l[0][:bx, 1],
                                   st.halo_r[0][:bx, 1]])
        oldy_hi = self._mark(old.syh[0], c1)
        oldy_lo = self._mark(old.syl[0], c1)
        f1v_old = old.f1v[0]
        bad = bad \
            | (need_yh & jnp.any(f1v_old & (f1y_old > r_yhi - wn)
                                 & ~oldy_hi)) \
            | (need_yl & jnp.any(f1v_old & (f1y_old < r_ylo + wn)
                                 & ~oldy_lo))
        bad = bad & old.cov[0]

        # ---- replan round 1 (x) ----
        memx_hi = need_xh & (x[:, 0] > r_xhi - ws)
        memx_lo = need_xl & (x[:, 0] < r_xlo + ws)
        sxh, ovh = self._pack_rows(memx_hi, bx)
        sxl, ovl = self._pack_rows(memx_lo, bx)
        plan_ovf = ovh | ovl
        vxh, vxl = sxh >= 0, sxl >= 0
        xg_l, vg_l = jax.lax.ppermute(
            (x[jnp.maximum(sxh, 0)], vxh), "dp", self._perm(0, +1))
        xg_r, vg_r = jax.lax.ppermute(
            (x[jnp.maximum(sxl, 0)], vxl), "dp", self._perm(0, -1))
        if cfg.pbc[0]:
            xg_l = xg_l.at[:, 0].add(jnp.where(sx == 0, -box[0], zero))
            xg_r = xg_r.at[:, 0].add(jnp.where(sx == self.dx - 1,
                                               box[0], zero))
        f1 = jnp.concatenate([x, xg_l, xg_r], axis=0)
        f1v = jnp.concatenate([jnp.ones(C, bool), vg_l, vg_r])

        # ---- replan round 2 (y) over F1 rows ----
        memy_hi = need_yh & f1v & (f1[:, 1] > r_yhi - ws)
        memy_lo = need_yl & f1v & (f1[:, 1] < r_ylo + ws)
        syh, ovh = self._pack_rows(memy_hi, by)
        syl, ovl = self._pack_rows(memy_lo, by)
        plan_ovf = plan_ovf | ovh | ovl
        yg_d, vy_d = jax.lax.ppermute(
            (f1[jnp.maximum(syh, 0)], syh >= 0), "dp", self._perm(1, +1))
        yg_u, vy_u = jax.lax.ppermute(
            (f1[jnp.maximum(syl, 0)], syl >= 0), "dp", self._perm(1, -1))
        if cfg.pbc[1]:
            yg_d = yg_d.at[:, 1].add(jnp.where(sy == 0, -box[1], zero))
            yg_u = yg_u.at[:, 1].add(jnp.where(sy == self.dy - 1,
                                               box[1], zero))

        padm = jnp.concatenate([~f1v, ~vy_d, ~vy_u])
        plan = Plan2D(sxh=sxh[None], sxl=sxl[None], syh=syh[None],
                      syl=syl[None], f1v=f1v[None], padm=padm[None],
                      cov=jnp.ones((1,), bool))
        hl = jnp.concatenate([xg_l, yg_d], axis=0)
        hr = jnp.concatenate([xg_r, yg_u], axis=0)
        return plan, hl, hr, bad, plan_ovf

    # ---------- rebuild: replan + exchange + device-local build ----------
    def _rebuild_body(self, st: ShardState) -> ShardState:
        cfg = self.cfg
        C = cfg.c_loc
        i = jax.lax.axis_index("dp")
        x, box = st.x_loc[0], st.box
        dtype = x.dtype
        _, _, r_xlo, r_xhi, r_ylo, r_yhi = self._bounds(i, box, dtype)

        plan, hl, hr, bad_cov, plan_ovf = self._replan_exchange(st, x, box)
        x_ext = self._frame(x, hl, hr)

        # (b) containment: local atoms inside rect +- the static separation
        # margin, enforced only on axes with grid-distance-2 devices
        bad_frame = jnp.asarray(False)
        if self.m_contain_x is not None:
            m = jnp.asarray(self.m_contain_x, dtype)
            bad_frame |= jnp.any((x[:, 0] < r_xlo - m)
                                 | (x[:, 0] > r_xhi + m))
        if self.m_contain_y is not None:
            m = jnp.asarray(self.m_contain_y, dtype)
            bad_frame |= jnp.any((x[:, 1] < r_ylo - m)
                                 | (x[:, 1] > r_yhi + m))

        # frame-local coordinates; pads to the single park point
        wf = jnp.asarray(self.w_frame, dtype)
        ox, oy = r_xlo - wf, r_ylo - wf
        xs = x_ext.at[:, 0].add(-ox)
        xs = xs.at[:, 1].add(-oy)
        wx = jnp.asarray(self.wx_frame, dtype)
        wy = jnp.asarray(self.wy_frame, dtype)
        pad = plan.padm[0]
        # per-row park sites (plan_park_sites); the z coordinate wraps into
        # the (periodic-z) frame box inside the build, x sits > rlist
        # beyond every real atom
        park = jnp.asarray(self.park2d, dtype)          # [c_ext, 3]
        xs = jnp.where(pad[:, None], park, xs)
        out_of_frame = jnp.any(~pad & (
            (xs[:, 0] < 0.0) | (xs[:, 0] >= wx)
            | (xs[:, 1] < 0.0) | (xs[:, 1] >= wy)))

        frame_box = jnp.stack([wx, wy, box[2]])
        fpbc = (False, False, cfg.pbc[2])
        if self.frame_dims is not None:
            nl = build_neighbors_cell(xs, frame_box, cfg.rlist, cfg.capacity,
                                      self.frame_dims, cfg.cell_capacity,
                                      pbc=fpbc)
        else:
            nl = build_neighbors_n2(xs, frame_box, cfg.rlist, cfg.capacity,
                                    pbc=fpbc)
        rev = (reverse_slots(nl)[None] if self.model.with_rev
               else st.rev)
        ovf = (st.overflow[0]
               | jnp.where(nl.overflow, OVF_NEIGHBOR, 0)
               | jnp.where(out_of_frame | bad_frame, OVF_FRAME, 0)
               | jnp.where(bad_cov | plan_ovf, OVF_COVERAGE, 0)
               ).astype(jnp.int32)
        return st._replace(
            idx=nl.idx[None], rev=rev, ref_loc=x[None],
            halo_l=hl[None], halo_r=hr[None], plan=plan,
            stale=jnp.zeros((1,), bool), overflow=ovf[None])

    # ---------- two-round bounded migration ----------
    def _migrate_round(self, cols, axis, i, box):
        """One bounded edge-block exchange along `axis` (0 = x between
        slabs, 1 = y within a slab): the 1-D driver's merge-and-split
        transport on the 2-D mesh rings. cols are the 10 payload columns
        ALREADY sorted by the axis coordinate. Returns (cols, n_in)."""
        cfg = self.cfg
        C, Bm = cfg.c_loc, cfg.migrate_b
        dy = self.dy
        sx, sy = i // dy, i % dy
        pos = sx if axis == 0 else sy
        dcount = self.dx if axis == 0 else dy
        L = box[axis]
        pbc = cfg.pbc[axis]

        def rows(lo, hi):
            return [c[lo:hi] for c in cols]

        top, bot = rows(C - Bm, C), rows(0, Bm)
        recv_top = jax.lax.ppermute(top, "dp", self._perm(axis, +1))
        recv_bot = jax.lax.ppermute(bot, "dp", self._perm(axis, -1))

        def merge(top_cols, bot_cols, S):
            key = jnp.concatenate([top_cols[axis], bot_cols[axis] - S])
            merged = [jnp.concatenate([a, b])
                      for a, b in zip(top_cols, bot_cols)]
            src = jnp.concatenate([jnp.zeros(Bm, jnp.int32),
                                   jnp.ones(Bm, jnp.int32)])
            out = jax.lax.sort([key] + merged + [src], num_keys=1)
            vals, srcs = list(out[1:-1]), out[-1]
            dest = (jnp.arange(2 * Bm) >= Bm).astype(jnp.int32)
            vals[axis] = vals[axis] + S * (dest - srcs).astype(
                vals[axis].dtype)
            return vals, srcs

        zero = jnp.asarray(0.0, cols[0].dtype)
        if pbc:
            s_r = jnp.where(pos == dcount - 1, -L, zero)
            s_l = jnp.where(pos == 0, -L, zero)
        else:
            s_r = s_l = zero
        mr, src_r = merge(top, recv_bot, s_r)
        ml, src_l = merge(recv_top, bot, s_l)
        new_top = [c[:Bm] for c in mr]
        new_bot = [c[Bm:] for c in ml]
        in_r = jnp.sum(src_r[:Bm])
        in_l = jnp.sum(1 - src_l[Bm:])
        if not pbc:
            new_top = [jnp.where(pos == dcount - 1, t, nt)
                       for t, nt in zip(top, new_top)]
            new_bot = [jnp.where(pos == 0, b, nb)
                       for b, nb in zip(bot, new_bot)]
            in_r = jnp.where(pos == dcount - 1, 0, in_r)
            in_l = jnp.where(pos == 0, 0, in_l)
        mid = rows(Bm, C - Bm)
        return ([jnp.concatenate([b, m, t])
                 for b, m, t in zip(new_bot, mid, new_top)], in_l + in_r)

    def _migrate_body(self, st: ShardState):
        """x-round then y-round of the bounded edge-block exchange (LAMMPS
        exchange() on the 2-D grid). Rows end y-sorted; neighbor tables and
        the plan are stale afterwards -- run() always follows with
        rebuild(), which replans from the new ownership."""
        cfg = self.cfg
        i = jax.lax.axis_index("dp")
        box = st.box
        x, v, f = st.x_loc[0], st.v_loc[0], st.f_loc[0]
        payload = [x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1], v[:, 2],
                   f[:, 0], f[:, 1], f[:, 2], st.gid[0]]

        cols = list(jax.lax.sort(payload, num_keys=1))       # x-sorted
        cols, n_x = self._migrate_round(cols, 0, i, box)
        # re-sort by y for the y-round (key column first)
        perm = [1, 0] + list(range(2, 10))
        ycols = list(jax.lax.sort([cols[p] for p in perm], num_keys=1))
        ycols = [ycols[perm.index(k)] for k in range(10)]
        ycols, n_y = self._migrate_round(ycols, 1, i, box)

        x2 = jnp.stack(ycols[0:3], axis=1)
        v2 = jnp.stack(ycols[3:6], axis=1)
        f2 = jnp.stack(ycols[6:9], axis=1)
        n_mig = jax.lax.psum(n_x + n_y, "dp")
        return st._replace(
            x_loc=x2[None], v_loc=v2[None], f_loc=f2[None],
            gid=ycols[9][None], ref_loc=x2[None],
            plan=st.plan._replace(cov=jnp.zeros((1,), bool))), n_mig
