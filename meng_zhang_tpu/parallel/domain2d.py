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
  * Send sets are STATIC index tables derived from the initial coordinates
    with a drift-headroom window (w_send = 2*rlist + skin/2 per face --
    ghosts within rlist feed local forces directly and need their own
    complete neighborhoods one more rlist out). Padding entries point to a
    single shared PARK position in a gutter of the frame box: parked rows
    sit > rlist from every real atom, and park-park pairs have exactly zero
    distance, which the 1e-12 self-overlap guard excludes -- so pads never
    enter any neighbor row.
  * Correctness is enforced by three sticky checks at every rebuild, each
    device validating its OWN data (no interval gymnastics):
      (a) send-coverage: every local/frame atom inside the exact 2*rlist
          face band must be a member of the corresponding static send set
          (OVF_COVERAGE otherwise);
      (b) containment: every local atom stays inside its rectangle plus the
          drift margin (OVF_FRAME) -- with the static minimum-width check
          at plan time this also rules out non-adjacent-device pairs;
      (c) the neighbor build's own capacity/cell flags (OVF_NEIGHBOR).
  * Energies are evaluated for ALL frame rows (centers = frame): ghost rows
    within rlist of the rectangle have complete neighborhoods by (a), so
    -grad of the center-energy sum is exact for local rows; farther ghost
    rows have zero dependence on local coordinates and contribute nothing.
    This supports the gradient / newton-off frame models (XlaFrameModel for
    fe AND ni, AnnaFrameModel); the Pallas reverse-slot model remains 1-D.

Integrator, thermostats, barostat, thermo, and the run loop are inherited
unchanged from ShardedMD -- the layout lives entirely behind the
`_exchange_and_force` / `_rebuild_body` hooks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .domain import (OVF_COVERAGE, OVF_FRAME, OVF_NEIGHBOR, ShardConfig,
                     ShardedMD, ShardState)
from ..md import integrate as I
from ..system.neighbors import (build_neighbors_cell, build_neighbors_n2,
                                cell_grid_dims, estimate_capacity)


@dataclasses.dataclass(frozen=True)
class Shard2DConfig(ShardConfig):
    """ShardConfig plus the (Dx, Dy) mesh shape. halo_b / migrate_b are 1-D
    concepts and must stay at their defaults; bx/by ghost-block sizes are
    derived from the scene at distribute()."""
    mesh_shape: tuple = (2, 2)


class ShardedMD2D(ShardedMD):
    """Spatially-sharded MD driver on a 2-D (x, y) device grid."""

    def __init__(self, model, masses_scalar, box, cfg: Shard2DConfig,
                 mesh=None):
        if getattr(model, "with_rev", False):
            raise ValueError(
                "the 2-D driver supports the gradient/newton-off frame "
                "models (XlaFrameModel, AnnaFrameModel); the Pallas "
                "reverse-slot model runs on the 1-D slab driver")
        dx, dy = cfg.mesh_shape
        if dx * dy != cfg.n_devices:
            raise ValueError("mesh_shape must multiply to n_devices")
        if dy < 2:
            raise ValueError("use the 1-D ShardedMD for a Dy=1 mesh")
        if cfg.halo_b is not None or cfg.migrate_b:
            raise ValueError("halo_b/migrate_b are 1-D slab options")
        super().__init__(model, masses_scalar, box, cfg, mesh=mesh)
        self.dx, self.dy = dx, dy

    # ================= planning (host, at distribute) =================
    def _plan2d(self, xs: np.ndarray, box: np.ndarray):
        """Derive rectangle boundaries, static send sets, ghost capacities,
        pad masks, and the frame grid from the initial sorted coordinates.
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
            yc = xs[s * sx_n:(s + 1) * sx_n, 1]
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
                             "margin over w_need: too many y-blocks")

        # ---- x-send membership + index tables ----
        d_of = lambda s, t: s * dy + t
        rows0 = lambda d: (d // dy) * sx_n + (d % dy) * C
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
        # headroom is padding slack only -- membership is bounded by C
        bx = min(max(8, -(-int(bx * 1.125 + 1) // 8) * 8), C)
        self.bx = bx

        def pack(mem, cap):
            out = np.full((self.n_dev, cap), -1, np.int32)
            for d in range(self.n_dev):
                idx = np.nonzero(mem[d])[0]
                out[d, :len(idx)] = idx
            return out

        sendx_hi, sendx_lo = pack(memx_hi, bx), pack(memx_lo, bx)

        # ---- round-1 frame contents (initial positions) per device ----
        # F1 = [local C | xg_l bx | xg_r bx]; ghosts shifted into this
        # device's coordinate patch at the periodic x-seam
        c1 = C + 2 * bx
        f1_y = np.zeros((self.n_dev, c1))
        f1_valid = np.zeros((self.n_dev, c1), bool)
        f1_valid[:, :C] = True
        for d in range(self.n_dev):
            s, t = d // dy, d % dy
            f1_y[d, :C] = xs[rows0(d): rows0(d) + C, 1]
            for side, (ns, tab) in enumerate(
                    [((s - 1) % dx, sendx_hi), ((s + 1) % dx, sendx_lo)]):
                if not cfg.pbc[0] and ((side == 0 and s == 0)
                                       or (side == 1 and s == dx - 1)):
                    continue                      # wrap block: stays invalid
                src = d_of(ns, t)
                idx = tab[src]
                ok = idx >= 0
                o = C + side * bx
                f1_y[d, o:o + bx][ok] = xs[rows0(src) + idx[ok], 1]
                f1_valid[d, o:o + bx] = ok

        # ---- y-send membership + tables (on F1 rows) ----
        memy_hi = np.zeros((self.n_dev, c1), bool)
        memy_lo = np.zeros((self.n_dev, c1), bool)
        for d in range(self.n_dev):
            s, t = d // dy, d % dy
            if cfg.pbc[1] or t < dy - 1:
                memy_hi[d] = f1_valid[d] & (f1_y[d] > yb[s, t + 1]
                                            - self.w_send)
            if cfg.pbc[1] or t > 0:
                memy_lo[d] = f1_valid[d] & (f1_y[d] < yb[s, t]
                                            + self.w_send)
        by = max(int(memy_hi.sum(1).max()), int(memy_lo.sum(1).max()))
        by = min(max(8, -(-int(by * 1.125 + 1) // 8) * 8), c1)
        self.by = by
        sendy_hi, sendy_lo = pack(memy_hi, by), pack(memy_lo, by)

        # ---- pad mask over the full frame [local|xg_l|xg_r|yg_d|yg_u] ----
        c_ext = c1 + 2 * by
        padm = np.zeros((self.n_dev, c_ext), bool)
        for d in range(self.n_dev):
            s, t = d // dy, d % dy
            padm[d, :c1] = ~f1_valid[d]
            for side, (nt, tab) in enumerate(
                    [((t - 1) % dy, sendy_hi), ((t + 1) % dy, sendy_lo)]):
                o = c1 + side * by
                if not cfg.pbc[1] and ((side == 0 and t == 0)
                                       or (side == 1 and t == dy - 1)):
                    padm[d, o:o + by] = True      # wrap block invalid
                    continue
                src = d_of(s, nt)
                idx = tab[src]
                padm[d, o:o + by] = ((idx < 0)
                                     | ~f1_valid[src][np.maximum(idx, 0)])
        self.c1, self.c_ext2d = c1, c_ext

        # ---- frame box + grid (static), park point in the x-gutter ----
        # window = send window + one skin of drift headroom per side: a
        # marginal send-set member that drifts stays inside the frame
        self.gutter = 2.0 * (rlist + 0.5)
        self.w_frame = self.w_send + cfg.skin
        wx = float(np.diff(xb).max()) + 2 * self.w_frame + self.gutter
        wy = float(np.diff(yb, axis=1).max()) + 2 * self.w_frame
        self.wx_frame, self.wy_frame = wx, wy
        shrink = 0.92 if cfg.ensemble == "npt" else 1.0
        dims = cell_grid_dims((wx, wy, float(box[2]) * shrink), rlist)
        method = cfg.nbr_method
        if method == "auto":
            method = "cell" if (min(dims) >= 3 and c_ext > 2048) else "n2"
        self.frame_dims = dims if method == "cell" else None
        if cfg.capacity is None:
            self.cfg = dataclasses.replace(
                cfg, capacity=estimate_capacity(box, rlist, n))

        as_i32 = lambda a: jnp.asarray(a, jnp.int32)
        self._sendx = (as_i32(sendx_hi), as_i32(sendx_lo))
        self._sendy = (as_i32(sendy_hi), as_i32(sendy_lo))
        self._memx = (jnp.asarray(memx_hi), jnp.asarray(memx_lo))
        self._memy = (jnp.asarray(memy_hi), jnp.asarray(memy_lo))
        self._f1_valid = jnp.asarray(f1_valid)
        self._padmask = jnp.asarray(padm)
        for attr in ("_rebuild_fn", "_refill_fn", "_run1", "_exch_fn"):
            if hasattr(self, attr):
                delattr(self, attr)

    @property
    def n_dev(self):
        return self.cfg.n_devices

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
        st = ShardState(
            x_loc=x_l, v_loc=vs.reshape(D, C, 3), f_loc=jnp.zeros_like(x_l),
            gid=order_j.astype(jnp.int32).reshape(D, C),
            halo_l=jnp.zeros(hshape, dtype), halo_r=jnp.zeros(hshape, dtype),
            idx=jnp.zeros((D, self.c_ext2d, cfg.capacity), jnp.int32),
            rev=jnp.zeros((D, 1, 1), jnp.int32),
            ref_loc=x_l, pe=jnp.zeros(D, dtype),
            box=jnp.asarray(box_np, dtype),
            virial=jnp.zeros((3, 3), dtype),
            nhc=I.NHCState.zeros(cfg.nhc_len, dtype),
            v_eps=jnp.zeros(3, dtype),
            baro_nhc=I.NHCState.zeros(cfg.pchain, dtype),
            step=jnp.asarray(0, jnp.int32),
            stale=jnp.zeros(D, bool), unsafe=jnp.zeros(D, bool),
            overflow=jnp.zeros(D, jnp.int32))
        st = self._shard(st)
        st = self.exchange(st)
        st = self.rebuild(st)
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

    def _exchange2d(self, x, box):
        """Two-round staged halo exchange; returns (halo_l, halo_r) with
        halo_l = [xg_l | yg_d], halo_r = [xg_r | yg_u]."""
        cfg = self.cfg
        i = jax.lax.axis_index("dp")
        sx, sy = i // self.dy, i % self.dy
        zero = jnp.asarray(0.0, x.dtype)

        sxh, sxl = self._sendx[0][i], self._sendx[1][i]
        xg_l = jax.lax.ppermute(x[jnp.maximum(sxh, 0)], "dp",
                                self._perm(0, +1))
        xg_r = jax.lax.ppermute(x[jnp.maximum(sxl, 0)], "dp",
                                self._perm(0, -1))
        if cfg.pbc[0]:       # periodic x-seam: patch-shift received blocks
            xg_l = xg_l.at[:, 0].add(jnp.where(sx == 0, -box[0], zero))
            xg_r = xg_r.at[:, 0].add(jnp.where(sx == self.dx - 1,
                                               box[0], zero))
        f1 = jnp.concatenate([x, xg_l, xg_r], axis=0)

        syh, syl = self._sendy[0][i], self._sendy[1][i]
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
                hl, hr = self._exchange2d(s.x_loc[0], s.box)
                return s._replace(halo_l=hl[None], halo_r=hr[None])
            self._exch_fn = jax.jit(self._smap(body))
        return self._exch_fn(st)

    # ---------- per-device frame helpers ----------
    def _frame(self, x, hl, hr):
        bx = self.bx
        return jnp.concatenate([x, hl[:bx], hr[:bx], hl[bx:], hr[bx:]],
                               axis=0)

    def _force_local(self, x, hl, hr, box, idx, rev):
        cfg = self.cfg
        x_ext = self._frame(x, hl, hr)
        sl = (0, cfg.c_loc)
        eat, forces, w = self.model.eval(x_ext, x_ext, box, idx, rev, 0, sl,
                                         True)
        pe = jnp.sum(eat[:cfg.c_loc] - self.model.e_shift)
        return pe, forces[:cfg.c_loc], w

    def _exchange_and_force(self, st: ShardState, x, box):
        hl, hr = self._exchange2d(x, box)
        pe, f, w = self._force_local(x, hl, hr, box, st.idx[0], st.rev[0])
        return {"halo_l": hl[None], "halo_r": hr[None]}, pe, f, w

    # ---------- rebuild: device-local build + sender-side proofs ----------
    def _rebuild_body(self, st: ShardState) -> ShardState:
        cfg = self.cfg
        C, c1 = cfg.c_loc, self.c1
        i = jax.lax.axis_index("dp")
        sx, sy = i // self.dy, i % self.dy
        x, box = st.x_loc[0], st.box
        dtype = x.dtype
        x_ext = self._frame(x, st.halo_l[0], st.halo_r[0])

        xb = jnp.asarray(self.xb_frac, dtype) * box[0]         # [Dx+1]
        yb = jnp.asarray(self.yb_frac, dtype) * box[1]         # [Dx, Dy+1]
        r_xlo, r_xhi = xb[sx], xb[sx + 1]
        r_ylo, r_yhi = yb[sx, sy], yb[sx, sy + 1]

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

        # (a) send-coverage: the exact w_need face bands must be subsets of
        # the static send sets (each device checks its OWN outgoing data)
        w = jnp.asarray(self.w_need, dtype)
        mxh, mxl = self._memx[0][i], self._memx[1][i]
        need_hi = (cfg.pbc[0] | (sx < self.dx - 1))
        need_lo = (cfg.pbc[0] | (sx > 0))
        bad_cov = (need_hi & jnp.any((x[:, 0] > r_xhi - w) & ~mxh)) \
            | (need_lo & jnp.any((x[:, 0] < r_xlo + w) & ~mxl))
        f1v = self._f1_valid[i]
        f1y = x_ext[:c1, 1]
        myh, myl = self._memy[0][i], self._memy[1][i]
        need_hi = (cfg.pbc[1] | (sy < self.dy - 1))
        need_lo = (cfg.pbc[1] | (sy > 0))
        bad_cov = bad_cov \
            | (need_hi & jnp.any(f1v & (f1y > r_yhi - w) & ~myh)) \
            | (need_lo & jnp.any(f1v & (f1y < r_ylo + w) & ~myl))

        # frame-local coordinates; pads to the single park point
        ws = jnp.asarray(self.w_frame, dtype)
        ox, oy = r_xlo - ws, r_ylo - ws
        xs = x_ext.at[:, 0].add(-ox)
        xs = xs.at[:, 1].add(-oy)
        wx = jnp.asarray(self.wx_frame, dtype)
        wy = jnp.asarray(self.wy_frame, dtype)
        pad = self._padmask[i]
        park = jnp.stack([wx - 0.25 * self.gutter, 0.5 * wy, 0.5 * box[2]])
        xs = jnp.where(pad[:, None], park.astype(dtype)[None, :], xs)
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
        ovf = (st.overflow[0]
               | jnp.where(nl.overflow, OVF_NEIGHBOR, 0)
               | jnp.where(out_of_frame | bad_frame, OVF_FRAME, 0)
               | jnp.where(bad_cov, OVF_COVERAGE, 0)).astype(jnp.int32)
        return st._replace(
            idx=nl.idx[None], ref_loc=x[None],
            stale=jnp.zeros((1,), bool), overflow=ovf[None])

    # migration is a 1-D slab maintenance pass; diffusive 2-D scenes use
    # redistribute()
    def migrate(self, st):
        raise NotImplementedError("in-run migration is 1-D only; "
                                  "use redistribute() for 2-D scenes")
