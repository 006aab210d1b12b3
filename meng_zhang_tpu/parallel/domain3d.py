"""3-D (x, y, z) spatial domain decomposition over a device mesh.

Completes the LAMMPS `processors Px Py Pz` analogue (the reference benchmark
ran `processors 2 1 1`, in.st_test:2, but LAMMPS decomposes all three axes):
the 2-D column driver (parallel/domain2d.py) pays ghost volume proportional
to the column height; at 64 devices an 8x8 mesh carries ~3x ghost rows per
owned row (artifacts/halo_fraction.json) while a 4x4x4 brick cuts that to
the classic 6-face + edge + corner surface.

Layout is the staged-round generalization of the 2-D driver:
  * Atoms sort into Dx equal-count x-slabs, Dy equal-count y-blocks per
    slab, Dz equal-count z-bricks per block; device (sx, sy, sz) owns
    C = n/(Dx*Dy*Dz) rows. Rectangle boundaries live as box fractions.
  * Ghost exchange runs THREE staged rounds (the LAMMPS comm order):
    round 1 ships x-face atoms, round 2 ships y-face rows of the round-1
    frame (corners in xy ride automatically), round 3 ships z-face rows of
    the round-2 frame (xz/yz edges and xyz corners ride automatically).
    Each round is a pair of `lax.ppermute` rings over the flat mesh axis.
  * Send sets are dynamic Plan3D index tables recomputed in-graph at every
    rebuild with the same w_send = 2*rlist + skin/2 face window, capacity
    planning + retroactive coverage checks, containment margins on axes
    with grid-distance-2 devices, and pad parking as the 2-D driver --
    each mechanism is the 2-D one applied per round, so the correctness
    arguments in domain2d.py's docstring carry over axis by axis.
  * In-run migration runs x, y then z rounds of the bounded edge-block
    exchange; integrators/thermo/run loop are inherited from ShardedMD.

Serves the same model adapters as the 2-D driver, including the
FrameShortModel fast path (centers = all frame rows, off = 0).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .domain import (OVF_COVERAGE, OVF_FRAME, OVF_NEIGHBOR, ShardConfig,
                     ShardedMD, ShardState, _state_specs)
from .domain2d import ShardedMD2D as _S2D
from ..md import integrate as I
from ..system.neighbors import (build_neighbors_cell, build_neighbors_n2,
                                cell_grid_dims, estimate_capacity,
                                reverse_slots)


class Plan3D(NamedTuple):
    """Dynamic 3-round exchange plan (sharded over "dp"); -1 pads.

    sxh/sxl index local rows, syh/syl index round-1 frame rows (C + 2bx),
    szh/szl index round-2 frame rows (c1 + 2by); f1v/f2v carry frame-row
    validity after rounds 1/2; padm marks pad rows of the full frame;
    cov gates the retroactive coverage check (False right after
    distribute()/migrate())."""
    sxh: jax.Array
    sxl: jax.Array
    syh: jax.Array
    syl: jax.Array
    szh: jax.Array
    szl: jax.Array
    f1v: jax.Array
    f2v: jax.Array
    padm: jax.Array
    cov: jax.Array


@dataclasses.dataclass(frozen=True)
class Shard3DConfig(ShardConfig):
    """ShardConfig plus the (Dx, Dy, Dz) mesh shape."""
    mesh_shape: tuple = (2, 2, 2)


class ShardedMD3D(ShardedMD):
    """Spatially-sharded MD driver on a 3-D (x, y, z) device grid."""

    def __init__(self, model, masses_scalar, box, cfg: Shard3DConfig,
                 mesh=None):
        dx, dy, dz = cfg.mesh_shape
        if dx * dy * dz != cfg.n_devices:
            raise ValueError("mesh_shape must multiply to n_devices")
        if dz < 2:
            raise ValueError("use ShardedMD2D (or ShardedMD) for Dz=1")
        if cfg.halo_b is not None:
            raise ValueError("halo_b is a 1-D slab option")
        super().__init__(model, masses_scalar, box, cfg, mesh=mesh)
        self.dx, self.dy, self.dz = dx, dy, dz

    # ================= planning (host, at distribute) =================
    def _plan3d(self, xs: np.ndarray, box: np.ndarray):
        """Boundaries, table capacities, frame grid and plan shapes from
        the initial (slab, block, brick)-ordered coordinates."""
        cfg = self.cfg
        dx, dy, dz, C = self.dx, self.dy, self.dz, cfg.c_loc
        n = self.n
        sx_n, sy_n = n // dx, n // (dx * dy)
        lx, ly, lz = float(box[0]), float(box[1]), float(box[2])
        rlist = cfg.rlist
        self.w_need = 2.0 * rlist
        self.w_send = self.w_need + 0.5 * cfg.skin
        self.m_drift = 0.5 * cfg.skin

        # ---- nominal boundaries (count medians), box fractions ----
        xsrt = np.sort(xs[:, 0])
        xb = np.empty(dx + 1)
        for s in range(1, dx):
            xb[s] = 0.5 * (xsrt[s * sx_n - 1] + xsrt[s * sx_n])
        if cfg.pbc[0]:
            seam = 0.5 * (xsrt[-1] + xsrt[0] + lx)
            xb[0], xb[dx] = seam - lx, seam
        else:
            xb[0], xb[dx] = xsrt[0] - 1e-6, xsrt[-1] + 1e-6
        yb = np.empty((dx, dy + 1))
        zb = np.empty((dx, dy, dz + 1))
        for s in range(dx):
            yc = np.sort(xs[s * sx_n:(s + 1) * sx_n, 1])
            for t in range(1, dy):
                yb[s, t] = 0.5 * (yc[t * sy_n - 1] + yc[t * sy_n])
            if cfg.pbc[1]:
                seam = 0.5 * (yc[-1] + yc[0] + ly)
                yb[s, 0], yb[s, dy] = seam - ly, seam
            else:
                yb[s, 0], yb[s, dy] = yc.min() - 1e-6, yc.max() + 1e-6
            for t in range(dy):
                o = s * sx_n + t * sy_n
                zc = np.sort(xs[o:o + sy_n, 2])
                for u in range(1, dz):
                    zb[s, t, u] = 0.5 * (zc[u * C - 1] + zc[u * C])
                if cfg.pbc[2]:
                    seam = 0.5 * (zc[-1] + zc[0] + lz)
                    zb[s, t, 0], zb[s, t, dz] = seam - lz, seam
                else:
                    zb[s, t, 0] = zc.min() - 1e-6
                    zb[s, t, dz] = zc.max() + 1e-6
        self.xb_frac = xb / lx
        self.yb_frac = yb / ly
        self.zb_frac = zb / lz

        # ---- static separation (2-D argument per axis) ----
        min_wx = np.diff(xb).min()
        min_wy = np.diff(yb, axis=1).min()
        min_wz = np.diff(zb, axis=2).min()
        delta_y = 0.0
        for s in range(dx - 1 + (1 if cfg.pbc[0] else 0)):
            if dy > 1:
                delta_y = max(delta_y, np.max(np.abs(
                    yb[s, 1:dy] - yb[(s + 1) % dx, 1:dy])))
        delta_z = 0.0
        for s in range(dx):
            for t in range(dy):
                for ds in (-1, 0, 1):
                    for dt in (-1, 0, 1):
                        if ds == 0 and dt == 0:
                            continue
                        s2, t2 = s + ds, t + dt
                        if cfg.pbc[0]:
                            s2 %= dx
                        if cfg.pbc[1]:
                            t2 %= dy
                        if not (0 <= s2 < dx and 0 <= t2 < dy):
                            continue
                        delta_z = max(delta_z, np.max(np.abs(
                            zb[s, t, 1:dz] - zb[s2, t2, 1:dz])))
        far = [dx >= 4 or (dx == 3 and not cfg.pbc[0]),
               dy >= 4 or (dy == 3 and not cfg.pbc[1]),
               dz >= 4 or (dz == 3 and not cfg.pbc[2])]
        self.m_contain_x = min_wx - self.w_need if far[0] else None
        self.m_contain_y = (min_wy - self.w_need - delta_y if far[1]
                            else None)
        self.m_contain_z = (min_wz - self.w_need - delta_z if far[2]
                            else None)
        for name, m in (("x", self.m_contain_x), ("y", self.m_contain_y),
                        ("z", self.m_contain_z)):
            if m is not None and m <= self.m_drift:
                raise ValueError(
                    f"{name}-block width leaves no drift margin over "
                    f"w_need {self.w_need:.2f}: too many {name}-blocks")

        # ---- capacities from initial membership + 25% headroom ----
        dy_z = dy * dz

        def rows0(d):
            s, r = divmod(d, dy_z)
            t, u = divmod(r, dz)
            return s * sx_n + t * sy_n + u * C

        D = self.n_dev
        memx_hi = np.zeros((D, C), bool)
        memx_lo = np.zeros((D, C), bool)
        for d in range(D):
            s = d // dy_z
            loc_x = xs[rows0(d): rows0(d) + C, 0]
            if cfg.pbc[0] or s < dx - 1:
                memx_hi[d] = loc_x > xb[s + 1] - self.w_send
            if cfg.pbc[0] or s > 0:
                memx_lo[d] = loc_x < xb[s] + self.w_send
        bx = max(int(memx_hi.sum(1).max()), int(memx_lo.sum(1).max()))
        bx = min(max(8, -(-int(bx * 1.25 + 2) // 8) * 8), C)
        self.bx = bx
        c1 = C + 2 * bx

        def d_of(s, t, u):
            return (s * dy + t) * dz + u

        # round-1 frame contents (y/z coords + validity) per device
        f1_yz = np.zeros((D, c1, 2))
        f1_valid = np.zeros((D, c1), bool)
        f1_valid[:, :C] = True
        for d in range(D):
            s, r = divmod(d, dy_z)
            t, u = divmod(r, dz)
            f1_yz[d, :C] = xs[rows0(d): rows0(d) + C, 1:3]
            for side, (ns, mem) in enumerate(
                    [((s - 1) % dx, memx_hi), ((s + 1) % dx, memx_lo)]):
                if not cfg.pbc[0] and ((side == 0 and s == 0)
                                       or (side == 1 and s == dx - 1)):
                    continue
                src = d_of(ns, t, u)
                idx = np.nonzero(mem[src])[0]
                o = C + side * bx
                f1_yz[d, o:o + len(idx)] = xs[rows0(src) + idx, 1:3]
                f1_valid[d, o:o + len(idx)] = True

        memy_hi = np.zeros((D, c1), bool)
        memy_lo = np.zeros((D, c1), bool)
        by = 0
        for d in range(D):
            s, r = divmod(d, dy_z)
            t, u = divmod(r, dz)
            if cfg.pbc[1] or t < dy - 1:
                memy_hi[d] = f1_valid[d] & (f1_yz[d, :, 0]
                                            > yb[s, t + 1] - self.w_send)
            if cfg.pbc[1] or t > 0:
                memy_lo[d] = f1_valid[d] & (f1_yz[d, :, 0]
                                            < yb[s, t] + self.w_send)
            by = max(by, int(memy_hi[d].sum()), int(memy_lo[d].sum()))
        by = min(max(8, -(-int(by * 1.25 + 2) // 8) * 8), c1)
        self.by = by
        c2 = c1 + 2 * by

        # round-2 frame contents (z coord + validity)
        f2_z = np.zeros((D, c2))
        f2_valid = np.zeros((D, c2), bool)
        f2_z[:, :c1] = f1_yz[:, :, 1]
        f2_valid[:, :c1] = f1_valid
        for d in range(D):
            s, r = divmod(d, dy_z)
            t, u = divmod(r, dz)
            for side, (nt, mem) in enumerate(
                    [((t - 1) % dy, memy_hi), ((t + 1) % dy, memy_lo)]):
                if not cfg.pbc[1] and ((side == 0 and t == 0)
                                       or (side == 1 and t == dy - 1)):
                    continue
                src = d_of(s, nt, u)
                idx = np.nonzero(mem[src])[0]
                o = c1 + side * by
                f2_z[d, o:o + len(idx)] = f1_yz[src, idx, 1]
                f2_valid[d, o:o + len(idx)] = True

        bz = 0
        for d in range(D):
            s, r = divmod(d, dy_z)
            t, u = divmod(r, dz)
            if cfg.pbc[2] or u < dz - 1:
                m = f2_valid[d] & (f2_z[d] > zb[s, t, u + 1] - self.w_send)
                bz = max(bz, int(m.sum()))
            if cfg.pbc[2] or u > 0:
                m = f2_valid[d] & (f2_z[d] < zb[s, t, u] + self.w_send)
                bz = max(bz, int(m.sum()))
        bz = min(max(8, -(-int(bz * 1.25 + 2) // 8) * 8), c2)
        self.bz = bz
        self.c1, self.c2 = c1, c2
        self.c_ext3d = c2 + 2 * bz

        # ---- frame box + grid, park sites in the x-gutter ----
        from .domain2d import plan_park_sites
        self.w_frame = self.w_send + cfg.skin
        w_real_x = float(np.diff(xb).max()) + 2 * self.w_frame
        wy = float(np.diff(yb, axis=1).max()) + 2 * self.w_frame
        wz = float(np.diff(zb, axis=2).max()) + 2 * self.w_frame
        wx, park = plan_park_sites(self.c_ext3d, w_real_x, wy, wz,
                                   rlist, cfg.cell_capacity)
        self.park3d = park
        self.wx_frame, self.wy_frame, self.wz_frame = wx, wy, wz
        dims = cell_grid_dims((wx, wy, wz), rlist)
        method = cfg.nbr_method
        if method == "auto":
            method = "cell" if (min(dims) >= 3
                                and self.c_ext3d > 2048) else "n2"
        self.frame_dims = dims if method == "cell" else None
        if cfg.capacity is None:
            self.cfg = dataclasses.replace(
                cfg, capacity=estimate_capacity(box, rlist, n))
        for attr in ("_rebuild_fn", "_refill_fn", "_run1", "_exch_fn",
                     "_migrate_fn", "_refresh_short_fn"):
            if hasattr(self, attr):
                delattr(self, attr)

    @property
    def n_dev(self):
        return self.cfg.n_devices

    def _specs(self):
        return _state_specs(Plan3D(*([P("dp")] * 10)),
                            short_spec=self._short_spec())

    def _short_geom(self):
        return 0, self.c_ext3d

    def _frame_rows(self):
        return self.c_ext3d

    # ================= distribution =================
    def distribute(self, x, v=None, box=None):
        cfg = self.cfg
        n = x.shape[0]
        if n != self.n:
            raise ValueError(f"need n == n_devices*c_loc ({self.n}), got {n}")
        box_np = self.box0 if box is None else np.asarray(box, np.float64)
        dx, dy, dz, C = self.dx, self.dy, self.dz, cfg.c_loc
        sx_n, sy_n = n // dx, n // (dx * dy)
        xh = np.asarray(x, np.float64)
        o1 = np.argsort(xh[:, 0], kind="stable")
        order = np.empty(n, np.int64)
        for s in range(dx):
            sl = o1[s * sx_n:(s + 1) * sx_n]
            sl = sl[np.argsort(xh[sl, 1], kind="stable")]
            for t in range(dy):
                bl = sl[t * sy_n:(t + 1) * sy_n]
                order[s * sx_n + t * sy_n: s * sx_n + (t + 1) * sy_n] = \
                    bl[np.argsort(xh[bl, 2], kind="stable")]
        self._plan3d(xh[order], box_np)
        cfg = self.cfg

        order_j = jnp.asarray(order)
        xs = jnp.asarray(x)[order_j]
        vs = (jnp.asarray(v)[order_j] if v is not None
              else jnp.zeros_like(xs))
        D = self.n_dev
        dtype = xs.dtype
        x_l = xs.reshape(D, C, 3)
        hb = self.bx + self.by + self.bz
        plan0 = Plan3D(
            sxh=jnp.full((D, self.bx), -1, jnp.int32),
            sxl=jnp.full((D, self.bx), -1, jnp.int32),
            syh=jnp.full((D, self.by), -1, jnp.int32),
            syl=jnp.full((D, self.by), -1, jnp.int32),
            szh=jnp.full((D, self.bz), -1, jnp.int32),
            szl=jnp.full((D, self.bz), -1, jnp.int32),
            f1v=jnp.zeros((D, self.c1), bool),
            f2v=jnp.zeros((D, self.c2), bool),
            padm=jnp.ones((D, self.c_ext3d), bool),
            cov=jnp.zeros(D, bool))
        st = ShardState(
            x_loc=x_l, v_loc=vs.reshape(D, C, 3), f_loc=jnp.zeros_like(x_l),
            gid=order_j.astype(jnp.int32).reshape(D, C),
            halo_l=jnp.zeros((D, hb, 3), dtype),
            halo_r=jnp.zeros((D, hb, 3), dtype),
            idx=jnp.zeros((D, self.c_ext3d, cfg.capacity), jnp.int32),
            rev=(jnp.zeros((D, self.c_ext3d, cfg.capacity), jnp.int32)
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
        st = self.rebuild(st)
        st = self.refill_forces(st)
        return st, order_j

    # ================= in-graph halo machinery =================
    def _grid(self, i):
        dy_z = self.dy * self.dz
        return i // dy_z, (i // self.dz) % self.dy, i % self.dz

    def _perm(self, axis, step):
        dx, dy, dz = self.dx, self.dy, self.dz
        out = []
        for d in range(self.n_dev):
            s, r = divmod(d, dy * dz)
            t, u = divmod(r, dz)
            if axis == 0:
                nd = (((s + step) % dx) * dy + t) * dz + u
            elif axis == 1:
                nd = (s * dy + (t + step) % dy) * dz + u
            else:
                nd = (s * dy + t) * dz + (u + step) % dz
            out.append((d, nd))
        return out

    def _bounds(self, i, box, dtype):
        sx, sy, sz = self._grid(i)
        xb = jnp.asarray(self.xb_frac, dtype) * box[0]
        yb = jnp.asarray(self.yb_frac, dtype) * box[1]
        zb = jnp.asarray(self.zb_frac, dtype) * box[2]
        return (sx, sy, sz, xb[sx], xb[sx + 1], yb[sx, sy], yb[sx, sy + 1],
                zb[sx, sy, sz], zb[sx, sy, sz + 1])

    def _exchange3d(self, plan, x, box):
        cfg = self.cfg
        i = jax.lax.axis_index("dp")
        sx, sy, sz = self._grid(i)
        zero = jnp.asarray(0.0, x.dtype)

        xg_l = jax.lax.ppermute(x[jnp.maximum(plan.sxh[0], 0)], "dp",
                                self._perm(0, +1))
        xg_r = jax.lax.ppermute(x[jnp.maximum(plan.sxl[0], 0)], "dp",
                                self._perm(0, -1))
        if cfg.pbc[0]:
            xg_l = xg_l.at[:, 0].add(jnp.where(sx == 0, -box[0], zero))
            xg_r = xg_r.at[:, 0].add(jnp.where(sx == self.dx - 1,
                                               box[0], zero))
        f1 = jnp.concatenate([x, xg_l, xg_r], axis=0)

        yg_d = jax.lax.ppermute(f1[jnp.maximum(plan.syh[0], 0)], "dp",
                                self._perm(1, +1))
        yg_u = jax.lax.ppermute(f1[jnp.maximum(plan.syl[0], 0)], "dp",
                                self._perm(1, -1))
        if cfg.pbc[1]:
            yg_d = yg_d.at[:, 1].add(jnp.where(sy == 0, -box[1], zero))
            yg_u = yg_u.at[:, 1].add(jnp.where(sy == self.dy - 1,
                                               box[1], zero))
        f2 = jnp.concatenate([f1, yg_d, yg_u], axis=0)

        zg_b = jax.lax.ppermute(f2[jnp.maximum(plan.szh[0], 0)], "dp",
                                self._perm(2, +1))
        zg_t = jax.lax.ppermute(f2[jnp.maximum(plan.szl[0], 0)], "dp",
                                self._perm(2, -1))
        if cfg.pbc[2]:
            zg_b = zg_b.at[:, 2].add(jnp.where(sz == 0, -box[2], zero))
            zg_t = zg_t.at[:, 2].add(jnp.where(sz == self.dz - 1,
                                               box[2], zero))
        return (jnp.concatenate([xg_l, yg_d, zg_b], axis=0),
                jnp.concatenate([xg_r, yg_u, zg_t], axis=0))

    # ---------- per-device frame helpers ----------
    def _frame(self, x, hl, hr):
        bx, by = self.bx, self.by
        return jnp.concatenate(
            [x, hl[:bx], hr[:bx], hl[bx:bx + by], hr[bx:bx + by],
             hl[bx + by:], hr[bx + by:]], axis=0)

    def _force_local(self, x, hl, hr, box, idx, rev, short=None):
        cfg = self.cfg
        x_ext = self._frame(x, hl, hr)
        sl = (0, cfg.c_loc)
        if short is not None:
            eat, forces, w = self._eval_frame_short(
                x_ext, x_ext, box, short, self.c_ext3d, sl)
        else:
            eat, forces, w = self.model.eval(x_ext, x_ext, box, idx, rev, 0,
                                             sl, True)
        pe = jnp.sum(eat[:cfg.c_loc] - self.model.e_shift)
        return pe, forces[:cfg.c_loc], w

    def _exchange_and_force(self, st: ShardState, x, box):
        hl, hr = self._exchange3d(st.plan, x, box)
        pe, f, w = self._force_local(x, hl, hr, box, st.idx[0], st.rev[0],
                                     short=st.short)
        return {"halo_l": hl[None], "halo_r": hr[None]}, pe, f, w

    # ---------- in-graph replanning (table packers shared with 2-D) ----
    _pack_rows = staticmethod(_S2D._pack_rows)
    _mark = staticmethod(_S2D._mark)

    def _replan_exchange(self, st: ShardState, x, box):
        cfg = self.cfg
        C, bx, by, bz = cfg.c_loc, self.bx, self.by, self.bz
        c1, c2 = self.c1, self.c2
        dtype = x.dtype
        i = jax.lax.axis_index("dp")
        (sx, sy, sz, r_xlo, r_xhi, r_ylo, r_yhi,
         r_zlo, r_zhi) = self._bounds(i, box, dtype)
        ws = jnp.asarray(self.w_send, dtype)
        wn = jnp.asarray(self.w_need, dtype)
        zero = jnp.asarray(0.0, dtype)

        need = [
            (cfg.pbc[0] | (sx < self.dx - 1), cfg.pbc[0] | (sx > 0)),
            (cfg.pbc[1] | (sy < self.dy - 1), cfg.pbc[1] | (sy > 0)),
            (cfg.pbc[2] | (sz < self.dz - 1), cfg.pbc[2] | (sz > 0)),
        ]

        # (a) retroactive coverage of the ending epoch's tables
        old = st.plan
        bad = ((need[0][0] & jnp.any((x[:, 0] > r_xhi - wn)
                                     & ~self._mark(old.sxh[0], C)))
               | (need[0][1] & jnp.any((x[:, 0] < r_xlo + wn)
                                       & ~self._mark(old.sxl[0], C))))
        f1y_old = jnp.concatenate([x[:, 1], st.halo_l[0][:bx, 1],
                                   st.halo_r[0][:bx, 1]])
        f1v_old = old.f1v[0]
        bad = bad \
            | (need[1][0] & jnp.any(f1v_old & (f1y_old > r_yhi - wn)
                                    & ~self._mark(old.syh[0], c1))) \
            | (need[1][1] & jnp.any(f1v_old & (f1y_old < r_ylo + wn)
                                    & ~self._mark(old.syl[0], c1)))
        f2z_old = jnp.concatenate([x[:, 2], st.halo_l[0][:bx, 2],
                                   st.halo_r[0][:bx, 2],
                                   st.halo_l[0][bx:bx + by, 2],
                                   st.halo_r[0][bx:bx + by, 2]])
        f2v_old = old.f2v[0]
        bad = bad \
            | (need[2][0] & jnp.any(f2v_old & (f2z_old > r_zhi - wn)
                                    & ~self._mark(old.szh[0], c2))) \
            | (need[2][1] & jnp.any(f2v_old & (f2z_old < r_zlo + wn)
                                    & ~self._mark(old.szl[0], c2)))
        bad = bad & old.cov[0]

        # ---- round 1 (x) ----
        memx_hi = need[0][0] & (x[:, 0] > r_xhi - ws)
        memx_lo = need[0][1] & (x[:, 0] < r_xlo + ws)
        sxh, ovh = self._pack_rows(memx_hi, bx)
        sxl, ovl = self._pack_rows(memx_lo, bx)
        plan_ovf = ovh | ovl
        xg_l, vg_l = jax.lax.ppermute(
            (x[jnp.maximum(sxh, 0)], sxh >= 0), "dp", self._perm(0, +1))
        xg_r, vg_r = jax.lax.ppermute(
            (x[jnp.maximum(sxl, 0)], sxl >= 0), "dp", self._perm(0, -1))
        if cfg.pbc[0]:
            xg_l = xg_l.at[:, 0].add(jnp.where(sx == 0, -box[0], zero))
            xg_r = xg_r.at[:, 0].add(jnp.where(sx == self.dx - 1,
                                               box[0], zero))
        f1 = jnp.concatenate([x, xg_l, xg_r], axis=0)
        f1v = jnp.concatenate([jnp.ones(C, bool), vg_l, vg_r])

        # ---- round 2 (y) over F1 rows ----
        memy_hi = need[1][0] & f1v & (f1[:, 1] > r_yhi - ws)
        memy_lo = need[1][1] & f1v & (f1[:, 1] < r_ylo + ws)
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
        f2 = jnp.concatenate([f1, yg_d, yg_u], axis=0)
        f2v = jnp.concatenate([f1v, vy_d, vy_u])

        # ---- round 3 (z) over F2 rows ----
        memz_hi = need[2][0] & f2v & (f2[:, 2] > r_zhi - ws)
        memz_lo = need[2][1] & f2v & (f2[:, 2] < r_zlo + ws)
        szh, ovh = self._pack_rows(memz_hi, bz)
        szl, ovl = self._pack_rows(memz_lo, bz)
        plan_ovf = plan_ovf | ovh | ovl
        zg_b, vz_b = jax.lax.ppermute(
            (f2[jnp.maximum(szh, 0)], szh >= 0), "dp", self._perm(2, +1))
        zg_t, vz_t = jax.lax.ppermute(
            (f2[jnp.maximum(szl, 0)], szl >= 0), "dp", self._perm(2, -1))
        if cfg.pbc[2]:
            zg_b = zg_b.at[:, 2].add(jnp.where(sz == 0, -box[2], zero))
            zg_t = zg_t.at[:, 2].add(jnp.where(sz == self.dz - 1,
                                               box[2], zero))

        padm = jnp.concatenate([~f1v, ~vy_d, ~vy_u, ~vz_b, ~vz_t])
        plan = Plan3D(sxh=sxh[None], sxl=sxl[None], syh=syh[None],
                      syl=syl[None], szh=szh[None], szl=szl[None],
                      f1v=f1v[None], f2v=f2v[None], padm=padm[None],
                      cov=jnp.ones((1,), bool))
        hl = jnp.concatenate([xg_l, yg_d, zg_b], axis=0)
        hr = jnp.concatenate([xg_r, yg_u, zg_t], axis=0)
        return plan, hl, hr, bad, plan_ovf

    # ---------- rebuild ----------
    def _rebuild_body(self, st: ShardState) -> ShardState:
        cfg = self.cfg
        i = jax.lax.axis_index("dp")
        x, box = st.x_loc[0], st.box
        dtype = x.dtype
        (_, _, _, r_xlo, r_xhi, r_ylo, r_yhi,
         r_zlo, r_zhi) = self._bounds(i, box, dtype)

        plan, hl, hr, bad_cov, plan_ovf = self._replan_exchange(st, x, box)
        x_ext = self._frame(x, hl, hr)

        bad_frame = jnp.asarray(False)
        for m_c, lo, hi, d in ((self.m_contain_x, r_xlo, r_xhi, 0),
                               (self.m_contain_y, r_ylo, r_yhi, 1),
                               (self.m_contain_z, r_zlo, r_zhi, 2)):
            if m_c is not None:
                m = jnp.asarray(m_c, dtype)
                bad_frame |= jnp.any((x[:, d] < lo - m) | (x[:, d] > hi + m))

        wf = jnp.asarray(self.w_frame, dtype)
        ox, oy, oz = r_xlo - wf, r_ylo - wf, r_zlo - wf
        xs = x_ext.at[:, 0].add(-ox)
        xs = xs.at[:, 1].add(-oy)
        xs = xs.at[:, 2].add(-oz)
        wx = jnp.asarray(self.wx_frame, dtype)
        wy = jnp.asarray(self.wy_frame, dtype)
        wz = jnp.asarray(self.wz_frame, dtype)
        pad = plan.padm[0]
        park = jnp.asarray(self.park3d, dtype)          # [c_ext, 3] sites
        xs = jnp.where(pad[:, None], park, xs)
        out_of_frame = jnp.any(~pad & (
            (xs[:, 0] < 0.0) | (xs[:, 0] >= wx)
            | (xs[:, 1] < 0.0) | (xs[:, 1] >= wy)
            | (xs[:, 2] < 0.0) | (xs[:, 2] >= wz)))

        frame_box = jnp.stack([wx, wy, wz])
        fpbc = (False, False, False)
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

    # ---------- three-round bounded migration ----------
    def _migrate_round(self, cols, axis, i, box):
        """Bounded edge-block exchange along one axis of the 3-D grid (the
        1-D merge-and-split transport; cols already sorted by cols[axis])."""
        cfg = self.cfg
        C, Bm = cfg.c_loc, cfg.migrate_b
        pos = self._grid(i)[axis]
        dcount = (self.dx, self.dy, self.dz)[axis]
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
        """x, y then z rounds of the bounded edge-block exchange; run()
        always follows with rebuild() (replans from the new ownership)."""
        i = jax.lax.axis_index("dp")
        box = st.box
        x, v, f = st.x_loc[0], st.v_loc[0], st.f_loc[0]
        payload = [x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1], v[:, 2],
                   f[:, 0], f[:, 1], f[:, 2], st.gid[0]]

        cols = list(jax.lax.sort(payload, num_keys=1))
        n_mig = jnp.asarray(0, jnp.int32)
        for axis in (0, 1, 2):
            if axis > 0:
                perm = [axis] + [k for k in range(10) if k != axis]
                scols = list(jax.lax.sort([cols[p] for p in perm],
                                          num_keys=1))
                cols = [scols[perm.index(k)] for k in range(10)]
            cols, n_ax = self._migrate_round(cols, axis, i, box)
            n_mig = n_mig + n_ax

        x2 = jnp.stack(cols[0:3], axis=1)
        v2 = jnp.stack(cols[3:6], axis=1)
        f2 = jnp.stack(cols[6:9], axis=1)
        return st._replace(
            x_loc=x2[None], v_loc=v2[None], f_loc=f2[None],
            gid=cols[9][None], ref_loc=x2[None],
            plan=st.plan._replace(cov=jnp.zeros((1,), bool))), \
            jax.lax.psum(n_mig, "dp")
