"""Multi-chip spatial domain decomposition -- the production sharded driver.

TPU-native replacement for the reference's MPI machinery (LAMMPS rank
subdomains + per-step ghost exchange, `processors 2 1 1` in the benchmark,
in.st_test:2; parameter MPI_Bcast fe/src/pair_annp.cpp:516-574; ANNA-ADP's
mid-step 12-field forward_comm, src/pair_anna_adp_gpu.cpp:135-158):

  * Atoms are globally sorted by x ONCE at `distribute` and partitioned into
    equal-count contiguous slabs, one per device. Equal counts = perfect load
    balance and static shapes; sorted order makes every halo a *contiguous*
    index block. The atom->device assignment then stays FIXED: in solid-state
    MD atoms vibrate around lattice sites, so the initial spatial sort stays
    coherent indefinitely (LAMMPS likewise migrates only at rebuilds, and the
    benchmark scenes are crystals). For diffusive scenes (melts), setting
    cfg.migrate_b enables bounded in-run migration at every rebuild: a
    device-local x re-sort plus a migrate_b-row edge-block merge/split with
    each ring neighbor (`_migrate_body`) -- the LAMMPS exchange()/borders()
    analogue with exactly-equal counts preserved and no replicated global
    work. `redistribute` remains the host-level full re-sort fallback; the
    rebuild-time coverage proof reports when either becomes necessary.
  * Per step, each device refreshes its two halo blocks (B atoms each) from
    its ring neighbors with `lax.ppermute` over ICI -- the ghost forward
    communication of the reference, minus any host staging.
  * Neighbor rebuilds are DEVICE-LOCAL: each device runs the cell-list build
    over its own frame (local + halo positions, x shifted to a frame-local
    origin), so no global gather, sort, or replicated O(N) work happens
    inside a run. Staleness (>0.4*skin drift) is flagged in-step; the host
    triggers the sharded rebuild program at the next block boundary, exactly
    like the single-chip driver (md/simulation.py). A `>0.5*skin` sticky
    `unsafe` flag records any LAMMPS-style "dangerous build".
  * Frame adequacy is *proven* at every rebuild by exchanging six per-device
    x-extent scalars (one all_gather): (a) every non-frame atom is > rlist
    from every center row, and (b) every non-center atom is > rlist from
    every local atom (so reverse-slot partner sums and ANNA neighbor fields
    are complete). Violations trip the sticky overflow flag -- pairs can
    never go missing silently.
  * Thermostats/barostats run the same Nose-Hoover chain and MTK barostat
    math as the single-chip driver (md/integrate.py), driven by psum-reduced
    global KE / virial; chain state is replicated so every device computes
    bit-identical updates. NPT rescales positions and box identically on all
    devices; the slab geometry scales with the box automatically.
  * Weights are replicated (a jit constant) -- the MPI_Bcast equivalent.

Model adapters:
  * AnnpFrameModel -- fused Pallas Chebyshev ANNP (fe/fe_v2); reverse-slot
    partner sums stay device-local via a bc-row center extension.
  * AnnaFrameModel -- ANNA-ADP two-phase halo recompute: per-atom fields
    (d2,q2,rho,mu,lambda) are computed for local+extended center rows from
    the position halo, replacing the reference's 12 per-field MPI round
    trips (src/pair_anna_adp_gpu.cpp:135-158, pack/unpack :279-318) with
    zero extra communication.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..md import integrate as I
from ..md.simulation import Thermo, npt_drift_vcoef
from ..system.neighbors import (build_neighbors_cell, build_neighbors_n2,
                                cell_grid_dims, reverse_slots)
from ..units import BOLTZ, MVV2E, NKTV2P


class FrameShort(NamedTuple):
    """Refresh-static frame short list (FrameShortModel): per-device
    compacted pair tables rebuilt from the stored skin list every block
    boundary (the sharded analogue of the single-chip ShortList epochs)."""
    sidx: jax.Array   # [D, P, Ks] partner frame indices (C_ext = filler)
    akey: jax.Array   # [D, P, Ks] banded delivery keys (two-sort inversion)
    ref: jax.Array    # [D, C, 3] local positions at refresh (drift guard);
                      # compaction overflow folds into ShardState.overflow
                      # as OVF_SHORT


class ShardState(NamedTuple):
    """Sharded MD state. Leaves with a leading [D] axis are sharded over the
    mesh axis "dp"; the rest are replicated."""
    x_loc: jax.Array      # [D, C, 3]
    v_loc: jax.Array      # [D, C, 3]
    f_loc: jax.Array      # [D, C, 3]
    gid: jax.Array        # [D, C] int32 original atom id of each local row
                          # (rows permute under migrate(); gid tracks them)
    halo_l: jax.Array     # [D, B, 3] ring-received edge positions
    halo_r: jax.Array     # [D, B, 3]
    idx: jax.Array        # [D, Cc, K] neighbor rows (frame indices)
    rev: jax.Array        # [D, Cc, K] partner slots (annp) or [D, 1, 1]
    ref_loc: jax.Array    # [D, C, 3] local positions at last rebuild
    pe: jax.Array         # [D] per-device shift-free potential energy
    box: jax.Array        # [3] (replicated)
    virial: jax.Array     # [3, 3] global, psum'd at force eval (replicated)
    nhc: I.NHCState       # particle thermostat chain (replicated)
    v_eps: jax.Array      # [3] barostat strain rates (replicated)
    baro_nhc: I.NHCState  # barostat thermostat chain (replicated)
    step: jax.Array       # (replicated)
    stale: jax.Array      # [D] rebuild wanted
    unsafe: jax.Array     # [D] sticky: drift crossed skin/2 pre-rebuild
    overflow: jax.Array   # [D] int32 sticky bitmask: 1 = neighbor-capacity
                          # overflow, 2 = frame x-extent exceeded,
                          # 4 = halo coverage proof violated (see
                          # OVF_* constants); 0 = healthy
    plan: Any = None      # layout-owned dynamic exchange plan (None for the
                          # 1-D slab driver; Plan2D for ShardedMD2D, whose
                          # send tables are recomputed in-graph at rebuild
                          # so rows may migrate between devices)
    short: Any = None     # FrameShort when the model serves the refresh-
                          # static frame short list (FrameShortModel);
                          # refreshed every block boundary + at rebuild


# overflow bitmask bits (ShardState.overflow) -- a sticky nonzero value
# means the run is invalid; the bits say WHY (the reference's analogue is
# LAMMPS' "neighbor list overflow" / "lost atoms" errors, which abort)
OVF_NEIGHBOR = 1   # a neighbor row exceeded capacity K
OVF_FRAME = 2      # an atom left the static frame x-extent
OVF_COVERAGE = 4   # the rebuild-time halo coverage proof failed
OVF_SHORT = 8      # frame short-list compaction overflow / band violation


def _state_specs(plan_spec=None, short_spec=None):
    sh, rep = P("dp"), P()
    return ShardState(
        x_loc=sh, v_loc=sh, f_loc=sh, gid=sh, halo_l=sh, halo_r=sh,
        idx=sh, rev=sh,
        ref_loc=sh, pe=sh, box=rep, virial=rep,
        nhc=I.NHCState(rep, rep), v_eps=rep, baro_nhc=I.NHCState(rep, rep),
        step=rep, stale=sh, unsafe=sh, overflow=sh, plan=plan_spec,
        short=short_spec)


@dataclasses.dataclass(frozen=True)
class ShardConfig:
    n_devices: int
    c_loc: int                    # atoms per device (n must equal D*C)
    cutoff: float
    skin: float
    dt: float
    halo_b: Optional[int] = None  # halo block size in atoms (must span >
                                  # rlist in x); None = derived from the
                                  # scene at distribute() (see
                                  # ShardedMD._auto_geometry)
    capacity: Optional[int] = None  # neighbor capacity K; None = derived
                                    # from mean density (estimate_capacity)
    ensemble: str = "nve"          # "nve" | "nvt" | "npt"
    t_target: float = 300.0
    tau_t: float = 0.1
    nhc_len: int = 3
    p_target: tuple = (0.0, 0.0, 0.0)
    p_couple: tuple = (False, False, False)
    tau_p: float = 1.0
    pchain: int = 3                # barostat thermostat chain length
    thermo_every: int = 10
    pbc: tuple = (True, True, True)
    cell_capacity: int = 64
    nbr_method: str = "auto"       # "auto" | "cell" | "n2"
    stale_factor: float = 0.8      # flag staleness at stale_factor*skin/2;
                                   # the remaining margin absorbs drift until
                                   # the block-boundary rebuild (lower for
                                   # hot scenes / large thermo_every)
    migrate_b: int = 0             # edge-block rows exchanged per slab
                                   # boundary at each rebuild (0 = fixed
                                   # assignment). Enables diffusive scenes
                                   # (melts): atoms that crossed a slab
                                   # boundary move to the ring neighbor,
                                   # bounded by migrate_b rows per rebuild.
                                   # Must be <= c_loc // 2.

    @property
    def bc(self) -> int:          # center-row extension per side
        return self.halo_b // 2

    @property
    def c_ext(self) -> int:       # position rows per device frame
        return self.c_loc + 2 * self.halo_b

    @property
    def cc(self) -> int:          # center rows per device
        return self.c_loc + 2 * self.bc

    @property
    def rlist(self) -> float:
        return self.cutoff + self.skin


class AnnpFrameModel:
    """Adapter: fused Pallas Chebyshev ANNP over a halo frame."""
    with_rev = True

    def __init__(self, pk):
        self.pk = pk
        self.e_shift = dict(pk.cfg_key)["e_shift"]

    def eval(self, xc, x_ext, box, idx, rev, off, vslice, want_virial):
        return self.pk.energy_forces_frame(
            xc, x_ext, box, idx, rev, off, want_virial=want_virial,
            vslice=vslice if want_virial else None)


class FrameShortModel:
    """Serve a fused pair-table evaluator (ops.pallas_annp.PallasAnnp for
    fe/fe_v2 or ops.pallas_ni.PallasNi for ni) from the sharded drivers
    through the refresh-static frame short list -- the single-chip fast
    path's ShortList epochs, per device frame. The skin list built at
    rebuild stays in the state; every block boundary the driver recompacts
    it against current positions (compact_short_frame: rev-free two-sort
    delivery keys), and each step then runs gather + kernels + ONE banded
    delivery sort at the short width Ks instead of the full skin width K
    (the reference runs its same kernels under MPI, fe/lib/lal_annp.cu
    rank-agnostic).
    """
    with_rev = False
    is_short = True

    def __init__(self, pk):
        self.pk = pk
        if hasattr(pk, "cfg_key"):
            self.e_shift = dict(pk.cfg_key)["e_shift"]
        else:
            self.e_shift = pk.e_shift

    @property
    def short_delta(self):
        return self.pk.short_delta

    def refresh(self, x_ext, box, idx, off, cc):
        return self.pk.compact_short_frame(x_ext, box, idx, off, cc)

    def eval_short(self, xc_pad, x_ext, box, sidx, akey, cc, vslice,
                   want_virial):
        return self.pk.energy_forces_frame_short(
            xc_pad, x_ext, box, sidx, akey, cc,
            want_virial=want_virial, vslice=vslice if want_virial else None)


class XlaFrameModel:
    """Adapter: chunked XLA ANNP evaluation over a halo frame (fe AND ni).

    Newton-off halo formulation: forces are -grad of the summed center-row
    energies (models.annp.energy_forces_virial_frame). No reverse-slot maps
    needed; this is also the sharded path for the Behler-Parrinello ni
    potential, which has no fused Pallas kernel."""
    with_rev = False

    def __init__(self, mcfg, params, chunk=512, k_short=None):
        from ..models import annp
        self._m = annp
        self.mcfg = mcfg
        self.params = params
        self.chunk = chunk
        self.k_short = k_short
        self.e_shift = mcfg.e_shift

    def eval(self, xc, x_ext, box, idx, rev, off, vslice, want_virial):
        return self._m.energy_forces_virial_frame(
            self.mcfg, self.params, x_ext, box, idx, off, vslice,
            chunk=self.chunk, k_short=self.k_short)


class AnnaFrameModel:
    """Adapter: ANNA-ADP two-phase halo-recompute evaluation.

    The reference communicates 12 per-atom fields between its energy and
    force phases (rho, mu x3, lambda x6, d2q2 x2). Here every device simply
    computes those fields for its local atoms PLUS the bc-row center
    extension (every atom within rlist of a local atom) directly from the
    position halo -- the fields are pure functions of positions within the
    cutoff, so a 2x-rlist position halo makes the field exchange redundant.
    """
    with_rev = False

    def __init__(self, mcfg, params, fast=False):
        from ..models import anna_adp
        self._m = anna_adp
        self.mcfg = mcfg
        self.params = params
        self.e_shift = mcfg.e_base
        # fast: the plane-layout TPU path (harmonic-Pallas phase 1,
        # packed field gathers, shared r-only force terms) -- the sharded
        # serving of make_anna_fast_fns (VERDICT round-4 item 2)
        self.fast = fast

    def eval(self, xc, x_ext, box, idx, rev, off, vslice, want_virial):
        fn = (self._m.energy_forces_frame_fast if self.fast
              else self._m.energy_forces_frame)
        return fn(self.mcfg, self.params, xc, x_ext, box, idx, off, vslice,
                  want_virial=want_virial)


class ShardedMD:
    """Spatially-sharded MD driver (1-D slab decomposition over a Mesh)."""

    def __init__(self, model, masses_scalar, box, cfg: ShardConfig,
                 mesh: Mesh | None = None):
        # accept a bare PallasAnnp for convenience
        if hasattr(model, "energy_forces_frame"):
            model = AnnpFrameModel(model)
        self.model = model
        self.m = float(masses_scalar)
        self.cfg = cfg
        if cfg.n_devices < 2:
            raise ValueError("use md.simulation.Simulator for a single chip")
        if (cfg.halo_b is not None and cfg.n_devices == 2
                and 2 * cfg.halo_b > cfg.c_loc):
            raise ValueError("2-device ring needs halo_b <= c_loc/2 "
                             "(the two halo blocks must not overlap)")
        if 2 * cfg.migrate_b > cfg.c_loc:
            raise ValueError("migrate_b must be <= c_loc/2 (the two edge "
                             "blocks of a device must not overlap)")
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:cfg.n_devices]), ("dp",))
        self.mesh = mesh
        self.box0 = np.asarray(box, np.float64)
        self.n = cfg.n_devices * cfg.c_loc
        self.ndof = 3 * self.n - 3
        self.frame_wx: Optional[float] = None      # set by distribute()
        self.frame_dims: Optional[tuple] = None
        self.rebuild_count = 0
        self.migrated = 0              # atoms moved between devices (run())

    # ================= planning =================
    def _auto_geometry(self, xs_sorted_x: np.ndarray, box):
        """Derive halo_b (and capacity) from the initial sorted coordinates.

        Requirement (docstring of _rebuild_body): the bc = halo_b/2
        center-extension rows on each side of every slab must span at least
        rlist in x, with extra width for drift until a redistribute. For
        every slab edge, count the sorted atoms inside an (rlist + skin)
        window on each side; bc = the max count x a 12.5% safety factor.
        The rebuild-time coverage proof stays as the exact backstop -- a
        deliberately undersized override still trips it."""
        cfg = self.cfg
        n, C, D = self.n, cfg.c_loc, cfg.n_devices
        L = float(box[0])
        # rlist + skin/4 of window plus the 6.25% count headroom: the
        # fixed-row extension only has to absorb thermal drift between
        # rebuilds (each rebuild re-proves coverage; sustained drift is the
        # redistribute() case)
        w = cfg.rlist + 0.25 * cfg.skin
        xs = xs_sorted_x
        if cfg.halo_b is not None:        # only capacity was left to derive
            from ..system.neighbors import estimate_capacity
            self.cfg = dataclasses.replace(
                cfg, capacity=estimate_capacity(box, cfg.rlist, n))
            return
        need = 0
        for e in range(D):
            edge = e * C          # boundary between slabs e-1 and e
            x_e = xs[edge] if edge < n else xs[0] + L
            if cfg.pbc[0]:
                ext = np.concatenate([xs - L, xs, xs + L])
                lo = np.searchsorted(ext, x_e - w, side="right")
                hi = np.searchsorted(ext, x_e + w, side="left")
                mid = np.searchsorted(ext, x_e, side="left")
            else:
                ext = xs
                lo = np.searchsorted(ext, x_e - w, side="right")
                hi = np.searchsorted(ext, x_e + w, side="left")
                mid = edge
            need = max(need, mid - lo, hi - mid)
        bc = -(-int(need * 1.0625 + 1) // 8) * 8
        halo_b = 2 * bc
        cap = min(C // 2 if D == 2 else C, self.n // 2)
        if halo_b > cap:
            # headroom exceeded the ring bound: clamp to the largest legal
            # block -- the rebuild-time coverage proof (exact) is the
            # arbiter of whether that actually suffices
            clamped = (cap // 16) * 16
            if clamped // 2 < need:
                raise ValueError(
                    f"derived halo_b={halo_b} exceeds the slab bound {cap} "
                    f"and clamping below the {need}-row requirement: the "
                    f"scene is too thin in x for {D} slabs -- use fewer "
                    "devices or a wider box")
            halo_b = clamped
        updates = {"halo_b": halo_b}
        if cfg.capacity is None:
            from ..system.neighbors import estimate_capacity
            updates["capacity"] = estimate_capacity(box, cfg.rlist, n)
        self.cfg = dataclasses.replace(cfg, **updates)

    def _plan_frame(self, xs_sorted_x: np.ndarray, box):
        """Static frame x-extent + cell grid from the initial sorted coords.

        Invalidates compiled programs (they bake the static geometry)."""
        cfg = self.cfg
        n, C, B = self.n, cfg.c_loc, cfg.halo_b
        L = float(box[0])
        spans = []
        for d in range(cfg.n_devices):
            i0, i1 = d * C - B, d * C + C + B
            if 0 <= i0 and i1 <= n:
                spans.append(xs_sorted_x[i1 - 1] - xs_sorted_x[i0])
            elif cfg.pbc[0]:
                lo = xs_sorted_x[i0 % n] - L if i0 < 0 else xs_sorted_x[i0]
                hi = xs_sorted_x[(i1 - 1) % n] + (L if i1 > n else 0.0)
                spans.append(hi - lo)
            else:
                i0c, i1c = max(i0, 0), min(i1, n)
                spans.append(xs_sorted_x[i1c - 1] - xs_sorted_x[i0c])
        self.frame_wx = float(np.max(spans)) + cfg.rlist
        shrink = 0.92 if cfg.ensemble == "npt" else 1.0
        dims = cell_grid_dims(
            (self.frame_wx, float(box[1]) * shrink, float(box[2]) * shrink),
            cfg.rlist)
        method = cfg.nbr_method
        if method == "auto":
            method = "cell" if (min(dims) >= 3 and cfg.c_ext > 2048) else "n2"
        self.frame_dims = dims if method == "cell" else None
        for attr in ("_rebuild_fn", "_refill_fn", "_run1", "_migrate_fn"):
            if hasattr(self, attr):
                delattr(self, attr)

    # ================= distribution =================
    def distribute(self, x, v=None, box=None):
        """Global sort by x (init-time only) -> slabs -> sharded local build.

        Returns (ShardState, order); order maps sorted row -> original atom.
        """
        cfg = self.cfg
        n = x.shape[0]
        if n != self.n:
            raise ValueError(f"need n == n_devices*c_loc ({self.n}), got {n}")
        box_np = self.box0 if box is None else np.asarray(box, np.float64)
        order = jnp.argsort(x[:, 0])
        xs = x[order]
        vs = v[order] if v is not None else jnp.zeros_like(xs)
        if cfg.halo_b is None or cfg.capacity is None:
            self._auto_geometry(np.asarray(xs[:, 0], np.float64), box_np)
            cfg = self.cfg
        self._plan_frame(np.asarray(xs[:, 0], np.float64), box_np)

        D, C, B = cfg.n_devices, cfg.c_loc, cfg.halo_b
        d_idx = jnp.arange(D)
        ids_l = (d_idx[:, None] * C - B + jnp.arange(B)[None, :]) % n
        ids_r = (d_idx[:, None] * C + C + jnp.arange(B)[None, :]) % n
        dtype = x.dtype
        rev0 = (jnp.zeros((D, cfg.cc, cfg.capacity), jnp.int32)
                if self.model.with_rev else jnp.zeros((D, 1, 1), jnp.int32))
        x_l = xs.reshape(D, C, 3)
        st = ShardState(
            x_loc=x_l, v_loc=vs.reshape(D, C, 3), f_loc=jnp.zeros_like(x_l),
            gid=order.astype(jnp.int32).reshape(D, C),
            halo_l=xs[ids_l], halo_r=xs[ids_r],
            idx=jnp.zeros((D, cfg.cc, cfg.capacity), jnp.int32), rev=rev0,
            ref_loc=x_l, pe=jnp.zeros(D, dtype),
            box=jnp.asarray(box_np, dtype),
            virial=jnp.zeros((3, 3), dtype),
            nhc=I.NHCState.zeros(cfg.nhc_len, dtype),
            v_eps=jnp.zeros(3, dtype),
            baro_nhc=I.NHCState.zeros(cfg.pchain, dtype),
            step=jnp.asarray(0, jnp.int32),
            stale=jnp.zeros(D, bool), unsafe=jnp.zeros(D, bool),
            overflow=jnp.zeros(D, jnp.int32),
            short=self._short_placeholder(x_l))
        st = self._shard(st)
        st = self.rebuild(st)
        st = self.refill_forces(st)
        return st, order

    @property
    def _is_short(self):
        return getattr(self.model, "is_short", False)

    def _short_placeholder(self, x_l):
        """Structural FrameShort placeholder so the sharded programs see a
        consistent pytree; rebuild() -> refresh_short() fills it before
        any force evaluation reads it."""
        if not self._is_short:
            return None
        off, cc = self._short_geom()
        p = -(-cc // 8) * 8
        ks = min(self.model.pk.k_short, self.cfg.capacity)
        d = x_l.shape[0]
        return FrameShort(
            sidx=jnp.full((d, p, ks), self._frame_rows(), jnp.int32),
            akey=jnp.zeros((d, p, ks), jnp.int32), ref=x_l)

    def _short_geom(self):
        """(off, cc) of the center rows inside the frame (layout hook)."""
        return self.cfg.halo_b - self.cfg.bc, self.cfg.cc

    def _frame_rows(self):
        return self.cfg.c_ext

    def _short_spec(self):
        return (FrameShort(*([P("dp")] * 3)) if self._is_short else None)

    def _specs(self):
        return _state_specs(short_spec=self._short_spec())

    def _shard(self, st):
        leaves, treedef = jax.tree_util.tree_flatten(st)
        spec_leaves = jax.tree_util.tree_flatten(
            self._specs(), is_leaf=lambda s: isinstance(s, P))[0]
        put = [jax.device_put(l, NamedSharding(self.mesh, s))
               for l, s in zip(leaves, spec_leaves)]
        return jax.tree_util.tree_unflatten(treedef, put)

    def _smap(self, fn, out_specs=None):
        specs = self._specs()
        return jax.shard_map(fn, mesh=self.mesh, in_specs=(specs,),
                             out_specs=specs if out_specs is None
                             else out_specs, check_vma=False)

    # ---------- per-device frame helpers (run inside shard_map) ----------
    def _frame(self, x, hl, hr):
        return jnp.concatenate([hl, x, hr], axis=0)      # [C_ext, 3]

    def _force_local(self, x, hl, hr, box, idx, rev, short=None):
        """(pe_shiftfree, f_local [C,3], w_local [3,3])."""
        cfg = self.cfg
        x_ext = self._frame(x, hl, hr)
        off = cfg.halo_b - cfg.bc
        xc = x_ext[off: off + cfg.cc]
        sl = (cfg.bc, cfg.bc + cfg.c_loc)
        if short is not None:
            eat, forces, w = self._eval_frame_short(xc, x_ext, box, short,
                                                    cfg.cc, sl)
        else:
            eat, forces, w = self.model.eval(xc, x_ext, box, idx, rev, off,
                                             sl, True)
        pe = jnp.sum(eat[sl[0]:sl[1]] - self.model.e_shift)
        return pe, forces[sl[0]:sl[1]], w

    def _eval_frame_short(self, xc, x_ext, box, short, cc, sl):
        """Fast-path frame evaluation through the FrameShort tables
        (device-local leaves, leading [1] axis stripped)."""
        p = short.sidx.shape[1]
        xc_pad = xc if p == cc else jnp.concatenate(
            [xc, jnp.zeros((p - cc, 3), xc.dtype)])
        return self.model.eval_short(xc_pad, x_ext, box, short.sidx[0],
                                     short.akey[0], cc, sl, True)

    def _halo_refresh(self, x_loc):
        cfg = self.cfg
        dn = cfg.n_devices
        right = [(i, (i + 1) % dn) for i in range(dn)]
        left = [(i, (i - 1) % dn) for i in range(dn)]
        halo_l = jax.lax.ppermute(x_loc[-cfg.halo_b:], "dp", right)
        halo_r = jax.lax.ppermute(x_loc[:cfg.halo_b], "dp", left)
        return halo_l, halo_r

    # the two layout hooks the 2-D subclass overrides --------------------
    def _exchange_and_force(self, st: ShardState, x, box):
        """Refresh halos from the current x, evaluate forces.

        Returns (halo_updates kwargs for st._replace, pe, f_local, w)."""
        hl, hr = self._halo_refresh(x)
        pe, f, w = self._force_local(x, hl, hr, box, st.idx[0], st.rev[0],
                                     short=st.short)
        return {"halo_l": hl[None], "halo_r": hr[None]}, pe, f, w

    def _force_stored(self, st: ShardState):
        """Force eval with the halos already stored in the state."""
        return self._force_local(st.x_loc[0], st.halo_l[0], st.halo_r[0],
                                 st.box, st.idx[0], st.rev[0],
                                 short=st.short)

    def _max_displacement_sq(self, x, ref, box):
        rsq = jnp.zeros(x.shape[0], x.dtype)
        for d in range(3):
            dd = x[:, d] - ref[:, d]
            if self.cfg.pbc[d]:
                dd = dd - box[d] * jnp.round(dd / box[d])
            rsq = rsq + dd * dd
        return jnp.max(rsq)

    # ---------- rebuild: device-local cell build + coverage proof ----------
    def _rebuild_body(self, st: ShardState) -> ShardState:
        cfg = self.cfg
        D, C, B, bc = cfg.n_devices, cfg.c_loc, cfg.halo_b, cfg.bc
        i = jax.lax.axis_index("dp")
        x, hl, hr = st.x_loc[0], st.halo_l[0], st.halo_r[0]
        box = st.box
        dtype = x.dtype
        big = jnp.asarray(1e30, dtype)

        # unwrap ring-edge halos so the frame is x-contiguous (periodic x);
        # for non-periodic x the edge halos are physically meaningless far
        # atoms -- they park outside the frame and the distance checks
        # exclude them from every pair (their rows are never a local slice)
        valid = jnp.ones(cfg.c_ext, bool)
        if cfg.pbc[0]:
            hl = hl.at[:, 0].add(jnp.where(i == 0, -box[0], 0.0))
            hr = hr.at[:, 0].add(jnp.where(i == D - 1, box[0], 0.0))
        else:
            valid = valid.at[:B].set(i != 0)
            valid = valid.at[C + B:].set(i != D - 1)
        x_ext = self._frame(x, hl, hr)

        wx = jnp.asarray(self.frame_wx, dtype)
        fx = jnp.where(valid, x_ext[:, 0], jnp.min(x[:, 0]))
        origin = 0.5 * (jnp.min(fx) + jnp.max(fx)) - 0.5 * wx
        xs = x_ext.at[:, 0].add(-origin)
        out_of_frame = jnp.any(valid & ((xs[:, 0] < 0.0) | (xs[:, 0] >= wx)))
        frame_box = jnp.stack([wx, box[1], box[2]])
        fpbc = (False, cfg.pbc[1], cfg.pbc[2])
        if self.frame_dims is not None:
            nl = build_neighbors_cell(xs, frame_box, cfg.rlist, cfg.capacity,
                                      self.frame_dims, cfg.cell_capacity,
                                      pbc=fpbc)
        else:
            nl = build_neighbors_n2(xs, frame_box, cfg.rlist, cfg.capacity,
                                    pbc=fpbc)
        off = B - bc
        idx_c = nl.idx[off: off + cfg.cc]
        rev_c = (reverse_slots(nl)[off: off + cfg.cc]
                 if self.model.with_rev else st.rev[0])

        # ---- coverage proof (one all_gather of 6 scalars per device):
        # (a) no non-frame atom within rlist of any center row, and
        # (b) no non-center atom within rlist of any local row.
        # Every device's atoms occupy a contiguous x-interval (positions are
        # never re-wrapped during a run), so each outside set is a union of
        # per-device intervals; a violation is an interval intersecting the
        # rlist-widened band around this device's center/local interval --
        # an exact circular interval-intersection test on gathered scalars.
        xc_x = x_ext[off: off + cfg.cc, 0]
        vc = valid[off: off + cfg.cc]        # parked edge rows excluded
        ctr_min = jnp.min(jnp.where(vc, xc_x, big))
        ctr_max = jnp.max(jnp.where(vc, xc_x, -big))
        loc_min, loc_max = jnp.min(x[:, 0]), jnp.max(x[:, 0])

        def hits_band(b_lo, b_hi, a_lo, a_w):
            """Interval [b_lo, b_hi] intersects band [a_lo, a_lo + a_w]
            (circularly when x is periodic)."""
            b_w = b_hi - b_lo
            if cfg.pbc[0]:
                dd = b_lo - a_lo
                dd = dd - box[0] * jnp.floor(dd / box[0])    # [0, L)
                return (dd < a_w) | (dd > box[0] - b_w)
            return (b_lo < a_lo + a_w) & (a_lo < b_lo + b_w)

        if D == 2:
            # both halos come from the SAME neighbor: its non-frame /
            # non-center rows are the single mid block [B, C-B) / [bc, C-bc).
            # Emptiness is STATIC (B, bc, C are Python ints): an empty
            # segment short-circuits to False here rather than passing
            # sentinel coordinates through the periodic modulo in hits_band
            # (where (1e30 - a_lo) mod L is numerically meaningless).
            def seg(lo_r, hi_r):
                if hi_r <= lo_r:
                    return None              # empty: never intersects
                return (jnp.min(x[lo_r:hi_r, 0]), jnp.max(x[lo_r:hi_r, 0]))

            mB = seg(B, C - B)
            mc = seg(bc, C - bc)
            vals = [v for s in (mB, mc)
                    for v in (s if s is not None else (big, -big))]
            g = jax.lax.all_gather(jnp.stack(vals), "dp")         # [2, 4]
            o = 1 - i

            def check(col, ref_lo, ref_hi, nonempty):
                if not nonempty:
                    return jnp.asarray(False)
                a_lo = ref_lo - cfg.rlist
                a_w = (ref_hi - ref_lo) + 2.0 * cfg.rlist
                return hits_band(g[o, col], g[o, col + 1], a_lo, a_w)

            bad_cover = (check(0, ctr_min, ctr_max, mB is not None)
                         | check(2, loc_min, loc_max, mc is not None))
        else:
            # left neighbor's rows [0, C-B) and right neighbor's rows [B, C)
            # are the adjacent non-frame blocks; every other device is
            # entirely non-frame
            pb_B = jnp.max(x[: C - B, 0]) if C > B else -big
            pa_B = jnp.min(x[B:, 0]) if C > B else big
            pb_c = jnp.max(x[: C - bc, 0]) if C > bc else -big
            pa_c = jnp.min(x[bc:, 0]) if C > bc else big
            g = jax.lax.all_gather(jnp.stack([
                loc_min, loc_max, pb_B, pa_B, pb_c, pa_c]), "dp")  # [D, 6]
            ar = jnp.arange(D)

            def check(col_l, col_r, ref_lo, ref_hi, nonempty):
                a_lo = ref_lo - cfg.rlist
                a_w = (ref_hi - ref_lo) + 2.0 * cfg.rlist
                if cfg.pbc[0]:
                    far = ((ar != (i - 1) % D) & (ar != i)
                           & (ar != (i + 1) % D))
                else:
                    far = (ar < i - 1) | (ar > i + 1)
                bad = jnp.any(far & hits_band(g[:, 0], g[:, 1], a_lo, a_w))
                if nonempty:  # partial blocks of the two ring neighbors
                    il, ir = (i - 1) % D, (i + 1) % D
                    hit_l = hits_band(g[il, 0], g[il, col_l], a_lo, a_w)
                    hit_r = hits_band(g[ir, col_r], g[ir, 1], a_lo, a_w)
                    if not cfg.pbc[0]:
                        hit_l = hit_l & (i >= 1)
                        hit_r = hit_r & (i <= D - 2)
                    bad = bad | hit_l | hit_r
                return bad

            bad_cover = (check(2, 3, ctr_min, ctr_max, C > B)
                         | check(4, 5, loc_min, loc_max, C > bc))

        ovf = (st.overflow[0]
               | jnp.where(nl.overflow, OVF_NEIGHBOR, 0)
               | jnp.where(out_of_frame, OVF_FRAME, 0)
               | jnp.where(bad_cover, OVF_COVERAGE, 0)).astype(jnp.int32)
        return st._replace(
            idx=idx_c[None], rev=rev_c[None], ref_loc=x[None],
            stale=jnp.zeros((1,), bool), overflow=ovf[None])

    def rebuild(self, st: ShardState) -> ShardState:
        if not hasattr(self, "_rebuild_fn"):
            self._rebuild_fn = jax.jit(self._smap(self._rebuild_body))
        st = self._rebuild_fn(st)
        if self._is_short:
            st = self.refresh_short(st)
        return st

    # ---------- frame short-list refresh (FrameShortModel) ----------
    def _refresh_short_body(self, st: ShardState) -> ShardState:
        """Recompact the stored skin list against current positions
        (every block boundary; the single-chip ShortList epoch)."""
        x, hl, hr = st.x_loc[0], st.halo_l[0], st.halo_r[0]
        x_ext = self._frame(x, hl, hr)
        off, cc = self._short_geom()
        sidx, akey, ovf = self.model.refresh(x_ext, st.box, st.idx[0],
                                             off, cc)
        short = FrameShort(sidx[None], akey[None], x[None])
        overflow = (st.overflow[0]
                    | jnp.where(ovf, OVF_SHORT, 0)).astype(jnp.int32)
        return st._replace(short=short, overflow=overflow[None])

    def refresh_short(self, st: ShardState) -> ShardState:
        if not hasattr(self, "_refresh_short_fn"):
            self._refresh_short_fn = jax.jit(
                self._smap(self._refresh_short_body))
        return self._refresh_short_fn(st)

    # ---------- force refill (used by distribute / restart) ----------
    def refill_forces(self, st: ShardState) -> ShardState:
        if not hasattr(self, "_refill_fn"):
            def body(s):
                pe, f, w = self._force_stored(s)
                return s._replace(pe=pe[None], f_loc=f[None],
                                  virial=jax.lax.psum(w, "dp"))
            self._refill_fn = jax.jit(self._smap(body))
        return self._refill_fn(st)

    # ---------- bounded atom migration (the LAMMPS exchange() analogue) ----
    def _migrate_body(self, st: ShardState):
        """Move boundary-crossing atoms to the ring neighbor (in shard_map).

        Restores the sorted-rank ownership invariant after diffusion, the
        TPU-native equivalent of LAMMPS' exchange()/borders() at reneighbor
        (SURVEY.md section 2.5 rows 1-2): local rows are re-sorted by x
        (payloads ride the lax.sort), then the two edge blocks at every slab
        boundary (migrate_b rows from each side) are merged by boundary-
        centered x and re-split so each device keeps the half nearest it.
        Both sides sort the identical operand sequence, so the split is
        bit-identical and no atom is lost or duplicated. Equal per-device
        counts -- static shapes, perfect load balance -- are preserved
        exactly; an atom migrates at most migrate_b rows per call, so
        migrate_b bounds the crossing flux per rebuild interval, NOT the
        total drift. No replicated global work.

        Returns (state, n_migrated). Neighbor tables are stale afterwards:
        run() always follows a migrate with rebuild().
        """
        cfg = self.cfg
        C, D, Bm = cfg.c_loc, cfg.n_devices, cfg.migrate_b
        i = jax.lax.axis_index("dp")
        box = st.box
        x, v, f = st.x_loc[0], st.v_loc[0], st.f_loc[0]

        # device-local re-sort by x: 10 payload columns (never a [C, 10]
        # matrix -- trailing dims tile-pad on TPU)
        cols = list(jax.lax.sort(
            [x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1], v[:, 2],
             f[:, 0], f[:, 1], f[:, 2], st.gid[0]], num_keys=1))

        def rows(lo, hi):
            return [c[lo:hi] for c in cols]

        top, bot = rows(C - Bm, C), rows(0, Bm)
        right = [(d, (d + 1) % D) for d in range(D)]
        left = [(d, (d - 1) % D) for d in range(D)]
        recv_top = jax.lax.ppermute(top, "dp", right)   # left nbr's top
        recv_bot = jax.lax.ppermute(bot, "dp", left)    # right nbr's bottom

        def merge(top_cols, bot_cols, S):
            """Sort the 2*Bm union [top of left device ++ bottom of right
            device] by x expressed in the LEFT device's coordinate patch.

            Positions are never re-wrapped during a run, so each device's
            atoms stay a contiguous unwrapped interval; patches only differ
            at the periodic seam (the D-1 -> 0 boundary), where the right
            side is offset by S = -L. Atoms that change sides get one exact
            +-L patch shift so the destination interval stays contiguous;
            atoms that stay put are transported bit-exactly (shift term
            multiplies by an exact 0)."""
            key = jnp.concatenate([top_cols[0], bot_cols[0] - S])
            merged = [jnp.concatenate([a, b])
                      for a, b in zip(top_cols, bot_cols)]
            src = jnp.concatenate([jnp.zeros(Bm, jnp.int32),
                                   jnp.ones(Bm, jnp.int32)])
            out = jax.lax.sort([key] + merged + [src], num_keys=1)
            vals, srcs = list(out[1:-1]), out[-1]
            dest = (jnp.arange(2 * Bm) >= Bm).astype(jnp.int32)
            vals[0] = vals[0] + S * (dest - srcs).astype(vals[0].dtype)
            return vals, srcs

        zero = jnp.asarray(0.0, x.dtype)
        if cfg.pbc[0]:
            s_r = jnp.where(i == D - 1, -box[0], zero)   # my right boundary
            s_l = jnp.where(i == 0, -box[0], zero)       # my left boundary
        else:
            s_r = s_l = zero
        mr, src_r = merge(top, recv_bot, s_r)    # my right boundary
        ml, src_l = merge(recv_top, bot, s_l)    # my left boundary
        new_top = [c[:Bm] for c in mr]
        new_bot = [c[Bm:] for c in ml]
        in_r = jnp.sum(src_r[:Bm])            # right-nbr atoms now mine
        in_l = jnp.sum(1 - src_l[Bm:])        # left-nbr atoms now mine
        if not cfg.pbc[0]:
            # no ring wrap: the outermost slab faces do not exchange
            new_top = [jnp.where(i == D - 1, t, nt)
                       for t, nt in zip(top, new_top)]
            new_bot = [jnp.where(i == 0, b, nb)
                       for b, nb in zip(bot, new_bot)]
            in_r = jnp.where(i == D - 1, 0, in_r)
            in_l = jnp.where(i == 0, 0, in_l)

        mid = rows(Bm, C - Bm)
        full = [jnp.concatenate([b, m, t])
                for b, m, t in zip(new_bot, mid, new_top)]
        x2 = jnp.stack(full[0:3], axis=1)
        v2 = jnp.stack(full[3:6], axis=1)
        f2 = jnp.stack(full[6:9], axis=1)
        hl, hr = self._halo_refresh(x2)
        n_mig = jax.lax.psum(in_l + in_r, "dp")
        return st._replace(
            x_loc=x2[None], v_loc=v2[None], f_loc=f2[None],
            gid=full[9][None], halo_l=hl[None], halo_r=hr[None],
            ref_loc=x2[None]), n_mig

    def migrate(self, st: ShardState) -> ShardState:
        """Bounded boundary migration; caller must rebuild() afterwards
        (run() does). Tallies self.migrated."""
        if not hasattr(self, "_migrate_fn"):
            self._migrate_fn = jax.jit(self._smap(
                self._migrate_body, out_specs=(self._specs(), P())))
        st, n_mig = self._migrate_fn(st)
        self.migrated += int(n_mig)
        return st

    # ---------- thermostat / barostat pieces (replicated math) ----------
    def _q_particle(self, dtype):
        return I.nhc_masses(self.ndof, self.cfg.t_target, self.cfg.tau_t,
                            self.cfg.nhc_len, dtype)

    def _n_couple(self):
        return max(1, sum(bool(p) for p in self.cfg.p_couple))

    def _baro_q(self, dtype):
        return I.nhc_masses(self._n_couple(), self.cfg.t_target,
                            self.cfg.tau_p, self.cfg.pchain, dtype)

    def _global_ke2(self, v):
        return jax.lax.psum(MVV2E * jnp.sum(self.m * v * v), "dp")

    def _nhc_half(self, v, nhc, dt):
        scale, nhc = I.nhc_propagate(
            self._global_ke2(v), nhc, self._q_particle(v.dtype),
            BOLTZ * self.cfg.t_target, self.ndof, dt)
        return v * scale, nhc

    def _baro_thermo(self, v_eps, baro_nhc, dt, dtype):
        cfg = self.cfg
        couple = jnp.asarray(cfg.p_couple, dtype=dtype)
        w_mass = I.npt_baro_masses(self.n, cfg.t_target, cfg.tau_p, dtype)
        ke2 = w_mass * jnp.sum(v_eps * v_eps * couple)
        scale, bnhc = I.nhc_propagate(ke2, baro_nhc, self._baro_q(dtype),
                                      BOLTZ * cfg.t_target, self._n_couple(),
                                      dt)
        return v_eps * scale, bnhc

    def _baro_half(self, v, v_eps, box, virial, dtype):
        cfg = self.cfg
        dt2 = 0.5 * cfg.dt
        couple = jnp.asarray(cfg.p_couple, dtype=dtype)
        p_ext = jnp.asarray(cfg.p_target, dtype=dtype) / NKTV2P
        w_mass = I.npt_baro_masses(self.n, cfg.t_target, cfg.tau_p, dtype)
        vol = box[0] * box[1] * box[2]
        kin = jax.lax.psum(MVV2E * jnp.sum(self.m * v * v, axis=0), "dp")
        p_int = (kin + jnp.diagonal(virial)) / vol
        ke2 = jnp.sum(kin)
        n_couple = jnp.maximum(jnp.sum(couple), 1.0)
        g_eps = (vol * (p_int - p_ext) + (ke2 / self.ndof) * couple
                 / n_couple) / w_mass
        v_eps = v_eps + dt2 * g_eps * couple
        tr = jnp.sum(v_eps * couple)
        scale = jnp.exp(-dt2 * (v_eps + tr / self.ndof))
        v = v * jnp.where(couple > 0, scale, 1.0)[None, :]
        return v, v_eps

    # ---------- one velocity-Verlet step (inside shard_map) ----------
    def _step_device(self, st: ShardState) -> ShardState:
        """Layout-independent: the halo layout lives entirely behind
        `_exchange_and_force` (overridden by the 2-D driver)."""
        cfg = self.cfg
        dt = cfg.dt
        m = self.m
        x, v, f = st.x_loc[0], st.v_loc[0], st.f_loc[0]
        ref = st.ref_loc[0]
        box, virial = st.box, st.virial
        nhc, v_eps, bnhc = st.nhc, st.v_eps, st.baro_nhc
        dtype = x.dtype

        if cfg.ensemble in ("nvt", "npt"):
            v, nhc = self._nhc_half(v, nhc, dt)
        if cfg.ensemble == "npt":
            v_eps, bnhc = self._baro_thermo(v_eps, bnhc, dt, dtype)
            v, v_eps = self._baro_half(v, v_eps, box, virial, dtype)

        v = v + (0.5 * dt / MVV2E) * f / m
        if cfg.ensemble == "npt":
            couple = jnp.asarray(cfg.p_couple, dtype=dtype)
            ex = jnp.where(couple > 0, jnp.exp(dt * v_eps), 1.0)
            box = box * ex
            x = x * ex[None, :] + npt_drift_vcoef(v_eps, couple, dt) * v
        else:
            x = x + dt * v

        msq = self._max_displacement_sq(x, ref, box)
        stale = st.stale[0] | (msq > (0.5 * cfg.stale_factor
                                      * cfg.skin) ** 2)
        unsafe = st.unsafe[0] | (msq > (0.5 * cfg.skin) ** 2)
        if self._is_short:
            # exact dangerous-build bound for the frame short-list epoch:
            # a pair beyond rc + short_delta can enter the cutoff unseen
            # only after two half-delta moves since the refresh
            msq_s = self._max_displacement_sq(x, st.short.ref[0], box)
            unsafe = unsafe | (msq_s > (0.5 * self.model.short_delta) ** 2)

        halo_up, pe, f, w = self._exchange_and_force(st, x, box)
        virial = jax.lax.psum(w, "dp")
        v = v + (0.5 * dt / MVV2E) * f / m

        if cfg.ensemble == "npt":
            v, v_eps = self._baro_half(v, v_eps, box, virial, dtype)
            v_eps, bnhc = self._baro_thermo(v_eps, bnhc, dt, dtype)
        if cfg.ensemble in ("nvt", "npt"):
            v, nhc = self._nhc_half(v, nhc, dt)

        return st._replace(
            x_loc=x[None], v_loc=v[None], f_loc=f[None], pe=pe[None],
            box=box, virial=virial, nhc=nhc, v_eps=v_eps, baro_nhc=bnhc,
            step=st.step + 1, stale=stale[None], unsafe=unsafe[None],
            **halo_up)

    # ---------- thermo (inside shard_map; every output replicated) ----------
    def _thermo_device(self, st: ShardState) -> Thermo:
        cfg = self.cfg
        v = st.v_loc[0]
        ke = 0.5 * self._global_ke2(v)
        temp = 2.0 * ke / (self.ndof * BOLTZ)
        pe = jax.lax.psum(st.pe[0], "dp")
        box = st.box
        vol = box[0] * box[1] * box[2]
        kin = jax.lax.psum(MVV2E * jnp.sum(self.m * v * v, axis=0), "dp")
        press = (jnp.sum((kin + jnp.diagonal(st.virial)) / vol) / 3.0) \
            * NKTV2P
        conserved = pe + ke
        if cfg.ensemble in ("nvt", "npt"):
            conserved = conserved + I.nhc_conserved(
                st.nhc, self._q_particle(v.dtype), cfg.t_target, self.ndof)
        if cfg.ensemble == "npt":
            couple = jnp.asarray(cfg.p_couple, v.dtype)
            w_mass = I.npt_baro_masses(self.n, cfg.t_target, cfg.tau_p,
                                       v.dtype)
            conserved = conserved + 0.5 * w_mass * jnp.sum(
                st.v_eps * st.v_eps * couple)
            conserved = conserved + I.nhc_conserved(
                st.baro_nhc, self._baro_q(v.dtype), cfg.t_target,
                self._n_couple())
            p_hydro = (jnp.sum(jnp.asarray(cfg.p_target, v.dtype) * couple)
                       / self._n_couple()) / NKTV2P
            conserved = conserved + p_hydro * vol
        return Thermo(step=st.step, temp=temp, pe=pe, ke=ke, press=press,
                      vol=vol, conserved=conserved)

    # ---------- run ----------
    def make_run(self, n_blocks: int):
        """Jitted sharded runner: n_blocks x thermo_every steps on FIXED
        neighbor tables; returns (state, Thermo stacked [n_blocks])."""
        cfg = self.cfg
        th_spec = Thermo(*([P()] * 7))

        def dev_fn(st: ShardState):
            def block(s, _):
                s = jax.lax.fori_loop(
                    0, cfg.thermo_every,
                    lambda k, ss: self._step_device(ss), s)
                return s, self._thermo_device(s)

            return jax.lax.scan(block, st, None, length=n_blocks)

        return jax.jit(self._smap(dev_fn, out_specs=(self._specs(),
                                                     th_spec)))

    def run(self, st: ShardState, n_blocks: int):
        """Advance n_blocks x thermo_every steps with in-run neighbor
        rebuilds at block boundaries (one host bool sync per block) -- the
        sharded equivalent of md.simulation.Simulator.run."""
        if not hasattr(self, "_run1"):
            self._run1 = self.make_run(1)
        thermos = []
        self.rebuild_count = 0
        self.migrated = 0
        fresh = True      # distribute()/rebuild() just refreshed the epoch
        for b in range(n_blocks):
            if self._is_short and not fresh:
                st = self.refresh_short(st)      # per-block epoch refresh
            fresh = False
            st, th = self._run1(st)
            thermos.append(th)
            if bool(jnp.any(st.stale)):
                if self.cfg.migrate_b:
                    st = self.migrate(st)
                st = self.rebuild(st)
                self.rebuild_count += 1
                fresh = True
        return st, jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *thermos)

    # ---------- convenience ----------
    def gather_positions(self, st: ShardState, order=None):
        """Back to the original (unsorted) order, replicated [N, 3].

        Uses the state's own gid rows (which track migration); the legacy
        `order` argument is accepted and ignored."""
        xs = st.x_loc.reshape(-1, 3)
        inv = jnp.argsort(st.gid.reshape(-1))
        return xs[inv]

    def redistribute(self, st: ShardState, order=None):
        """Re-sort the atom->device assignment (host-level; for diffusive
        scenes when the rebuild coverage proof starts flagging drift --
        prefer cfg.migrate_b for in-run maintenance).
        Thermostat/barostat state carries over; sticky flags are kept."""
        inv = jnp.argsort(st.gid.reshape(-1))
        x = st.x_loc.reshape(-1, 3)[inv]
        v = st.v_loc.reshape(-1, 3)[inv]
        st2, order2 = self.distribute(x, v, box=np.asarray(st.box))
        st2 = st2._replace(
            nhc=st.nhc, v_eps=st.v_eps, baro_nhc=st.baro_nhc, step=st.step,
            unsafe=st2.unsafe | jnp.any(st.unsafe),
            overflow=st2.overflow | jnp.max(st.overflow))
        return st2, order2
