"""Device-resident MD driver.

Replaces the reference's LAMMPS driver layer (Verlet run loop, fix nvt/npt,
thermo output, neighbor rebuild cadence). The entire run -- integration,
neighbor rebuilds, thermostats, thermo reduction -- is one jitted `lax.scan`:
positions never leave HBM between thermo blocks (SURVEY.md section 7, "no
per-step host round trips", in contrast to the reference's per-step
device<->host sync, fe/lib/lal_annp.cpp:548-553).

Neighbor rebuilds use the safe-displacement criterion (> skin/2 since last
build) via `lax.cond` inside the step, replacing the benchmark's fixed
`neigh_modify every 5` (in.st_test:10).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..system.neighbors import (NeighborList, build_neighbors_cell,
                                build_neighbors_n2, cell_grid_dims,
                                max_displacement_sq)
from ..units import BOLTZ, MVV2E, NKTV2P
from . import integrate as I


class MDState(NamedTuple):
    x: jax.Array          # [N,3] positions (A)
    v: jax.Array          # [N,3] velocities (A/ps)
    f: jax.Array          # [N,3] forces (eV/A)
    box: jax.Array        # [3]
    pe: jax.Array         # potential energy (eV)
    virial: jax.Array     # [3,3] (eV)
    nbrs: NeighborList
    nhc: I.NHCState
    v_eps: jax.Array      # [3] barostat strain rates
    baro_nhc: I.NHCState
    key: jax.Array
    step: jax.Array
    overflow: jax.Array   # sticky neighbor-capacity overflow flag
    stale: jax.Array      # neighbor list needs a rebuild (host acts on it)
    unsafe: jax.Array     # sticky: some atom moved > skin/2 before a rebuild
                          # landed (pairs may have been missed -- the failure
                          # LAMMPS calls a "dangerous build")
    short: Any            # refresh-static short list (model-owned pytree
                          # with .ref_x and .overflow; None when disabled)


class Thermo(NamedTuple):
    step: jax.Array
    temp: jax.Array
    pe: jax.Array
    ke: jax.Array
    press: jax.Array
    vol: jax.Array
    conserved: jax.Array


@dataclasses.dataclass(frozen=True)
class MDConfig:
    dt: float                       # ps
    cutoff: float                   # model cutoff (A)
    skin: float = 2.0
    capacity: int = 256
    nbr_method: str = "cell"        # "cell" | "n2"
    cell_dims: Optional[tuple] = None
    cell_capacity: int = 64
    ensemble: str = "nve"           # "nve" | "nvt" | "npt" | "langevin"
    t_target: float = 300.0
    tau_t: float = 0.1              # ps (LAMMPS Tdamp)
    damp: float = 0.1               # ps (Langevin)
    p_target: tuple = (0.0, 0.0, 0.0)   # bar, per axis
    p_couple: tuple = (False, False, False)
    tau_p: float = 1.0              # ps (LAMMPS Pdamp)
    nhc_len: int = 3                # particle chain (LAMMPS tchain)
    pchain: int = 3                 # barostat thermostat chain (LAMMPS
                                    # fix npt pchain default)
    thermo_every: int = 10
    with_rev: bool = False          # build reverse-slot maps (Pallas force path)
    pbc: tuple = (True, True, True)
    stale_factor: float = 0.8       # flag staleness at stale_factor*skin/2
                                    # displacement; the (1-f)*skin/2 margin
                                    # must absorb the drift until the next
                                    # block-boundary rebuild -- lower it for
                                    # hot scenes or large thermo_every
    short_every: int = 0            # refresh the model's short list every
                                    # this many steps inside the jitted block
                                    # (0 disables; must divide thermo_every).
                                    # The fixed in-scan cadence replaces a
                                    # lax.cond (XLA runs both branches) --
                                    # the LAMMPS analogue is `neigh_modify
                                    # every N` for the inner list epoch
    short_skin: float = 0.0         # the model's short_delta: an atom moving
                                    # > short_skin/2 since the last refresh
                                    # can let a pair enter the cutoff unseen
                                    # -- latched into `unsafe`
    short_host_refresh: bool = False  # refresh the short list from the HOST
                                    # at every block boundary instead of
                                    # in-scan (requires short_every ==
                                    # thermo_every). Lets the driver pick
                                    # the colored or banded delivery per
                                    # epoch (the colored compaction reports
                                    # color_bad; a lax.cond between the two
                                    # step programs would run both)


def npt_drift_vcoef(v_eps, couple, dt):
    """Velocity coefficient of the exact MTK barostat drift, per axis [3].

    The drift ODE xdot = v_eps x + v integrates exactly to
        x' = x e^{dt v_eps} + dt v e^{y} sinh(y)/y,  y = dt v_eps / 2,
    (Tuckerman MTK; LAMMPS fix_nh evaluates the same sinh(y)/y factor by
    its even Taylor polynomial). In a production run |y| ~ 1e-7, so the
    series 1 + y^2/6 (1 + y^2/20 (1 + y^2/42)) is exact to machine
    precision for any |y| < 0.3 -- far beyond a stable barostat."""
    y = jnp.where(couple > 0, 0.5 * dt * v_eps, 0.0)
    y2 = y * y
    sinhx_x = 1.0 + y2 / 6.0 * (1.0 + y2 / 20.0 * (1.0 + y2 / 42.0))
    return (dt * jnp.exp(y) * sinhx_x)[None, :]


def create_velocities(key, masses, t_target, dtype=jnp.float32):
    """Maxwell-Boltzmann draw with drift removal and exact-T rescale
    (LAMMPS `velocity all create T seed mom yes`)."""
    n = masses.shape[0]
    sigma = jnp.sqrt(BOLTZ * t_target / (masses[:, None] * MVV2E))
    v = sigma * jax.random.normal(key, (n, 3), dtype=dtype)
    v = I.remove_drift(v, masses)
    ndof = 3 * n - 3
    t_now = I.temperature(v, masses, ndof)
    return v * jnp.sqrt(t_target / t_now)


class Simulator:
    """MD driver bound to a force model.

    force_fn(x, box, nbrs: NeighborList) -> (pe, forces, virial[3,3])
    """

    def __init__(self, force_fn: Callable, masses, cfg: MDConfig,
                 short_build: Optional[Callable] = None,
                 short_build_colored: Optional[Callable] = None,
                 force_fn_light: Optional[Callable] = None,
                 image_shifts=None):
        """short_build(x, box, nbrs) -> short-list pytree (with .ref_x and
        .overflow leaves) enables the refresh-static short-list fast path:
        force_fn is then called as force_fn(x, box, nbrs, short) and the
        short list is refreshed every cfg.short_every steps in-scan.

        short_build_colored (requires cfg.short_host_refresh): the colored
        variant (PallasAnnp.compact_short_colored). Each block, run() tries
        it first and falls back to short_build for the epoch when its
        color_bad flag trips (defected / incommensurate regions), with a
        2-block retry hysteresis. run_device re-specializes per mode from
        the short pytree structure.

        force_fn_light: same signature as force_fn but may return a zero
        virial cheaply (e.g. skipping the strain-gradient tallies). Used
        for every step whose virial nobody reads -- all but the last step
        of each thermo block, in non-NPT ensembles (NPT's barostat consumes
        the virial every step). The reference gates its ev_tally the same
        way (vflag, ni/src/pair_annp.cpp compute)."""
        self.force_fn = force_fn
        self.force_fn_light = force_fn_light
        self.masses = masses
        self.cfg = cfg
        self.short_build = short_build
        self.short_build_colored = short_build_colored
        if short_build is not None:
            assert cfg.short_every > 0 and cfg.short_skin > 0.0, \
                "short_build requires cfg.short_every and cfg.short_skin"
            assert cfg.thermo_every % cfg.short_every == 0, \
                "short_every must divide thermo_every"
        if short_build_colored is not None:
            assert short_build is not None, "colored needs a banded fallback"
            assert cfg.short_host_refresh and \
                cfg.short_every == cfg.thermo_every, \
                "colored delivery needs host-side per-block refresh"
        if cfg.short_host_refresh:
            assert cfg.short_every == cfg.thermo_every
        self._colored_skip = 0
        self.colored_blocks = 0
        self.banded_blocks = 0
        # thin-box mode (models.annp.image_shift_table): the neighbor build
        # runs over the image-extended position table and force_fn must be
        # image-aware (energy_forces_virial_images); cfg.pbc carries the
        # pbc_eff with thin dims OFF
        self.image_shifts = (None if image_shifts is None
                             else np.asarray(image_shifts))
        if self.image_shifts is not None:
            assert short_build is None and not cfg.with_rev, \
                "thin-box image mode uses the chunked gradient models"
        n = masses.shape[0]
        self.ndof = 3 * n - 3
        self.n = n

    # ---------- neighbor handling ----------
    def build_nbrs(self, x, box):
        c = self.cfg
        rlist = c.cutoff + c.skin
        if self.image_shifts is not None:
            # build over the image-extended table; only the first n rows'
            # lists are kept (centers = real atoms). Entries reference
            # extended rows r*n + i = atom i shifted by image_shifts[r].
            sh = jnp.asarray(self.image_shifts, x.dtype)
            x_ext = (x[None, :, :] + (sh * box)[:, None, :]).reshape(-1, 3)
            nl = build_neighbors_n2(x_ext, box, rlist, c.capacity,
                                    with_rev=False, pbc=c.pbc)
            return nl._replace(idx=nl.idx[:self.n], ref_x=x)
        if c.nbr_method == "n2":
            return build_neighbors_n2(x, box, rlist, c.capacity,
                                      with_rev=c.with_rev, pbc=c.pbc)
        dims = c.cell_dims
        assert dims is not None, "cell_dims required for cell neighbor method"
        if c.nbr_method == "rowsweep":
            # leaner peak memory than the cell-blocked build: no
            # [ncell, cell_cap, K] intermediate (which is ~2.8x the per-atom
            # table when cells run half-empty) -- the right choice at 2M atoms
            from ..system.neighbors import build_neighbors_cell_rowsweep
            return build_neighbors_cell_rowsweep(
                x, box, rlist, c.capacity, dims, c.cell_capacity,
                with_rev=c.with_rev, pbc=c.pbc)
        return build_neighbors_cell(x, box, rlist, c.capacity, dims,
                                    c.cell_capacity, with_rev=c.with_rev,
                                    pbc=c.pbc)

    # ---------- single step ----------
    def _eval_force(self, x, box, nbrs, short=None, light=False):
        fn = self.force_fn_light if (light and self.force_fn_light
                                     is not None) else self.force_fn
        if self.short_build is not None:
            return fn(x, box, nbrs, short)
        return fn(x, box, nbrs)

    def _refresh_short(self, s: MDState) -> MDState:
        if self.short_build is None:
            return s
        return s._replace(short=self.short_build(s.x, s.box, s.nbrs))

    def step(self, s: MDState, light: bool = False) -> MDState:
        c = self.cfg
        dt = c.dt
        m = self.masses
        if c.ensemble in ("nvt", "npt"):
            q = I.nhc_masses(self.ndof, c.t_target, c.tau_t, c.nhc_len,
                             s.v.dtype)
            v, nhc = I.nhc_step(s.v, m, s.nhc, q, c.t_target, self.ndof, dt)
            s = s._replace(v=v, nhc=nhc)
        if c.ensemble == "npt":
            # fix npt is thermostatted NPH: particle NHC above, plus the
            # barostat's own chain on v_eps, then the MTK barostat half-step
            # (LAMMPS fix_nh order: nhc_temp -> nhc_press -> omega_dot -> v).
            s = self._npt_baro_thermo(s, dt)
            s = self._npt_baro_half(s)

        v = I.vv_kick(s.v, s.f, m, 0.5 * dt)
        if c.ensemble == "npt":
            x, box = self._npt_drift(s.x, v, s.box, s.v_eps, dt)
        else:
            x, box = I.vv_drift(s.x, v, dt), s.box

        if c.ensemble == "langevin":
            key, sub = jax.random.split(s.key)
            v = I.langevin_ou(v, m, sub, c.t_target, c.damp, dt)
        else:
            key = s.key

        # No in-loop rebuild: a lax.cond around the (expensive) build gets
        # flattened inside while-loops by XLA and would run every step.
        # Instead flag staleness conservatively (0.4*skin instead of the
        # exact 0.5*skin bound, leaving drift margin for the steps until the
        # host rebuilds at the next block boundary, see run()). If drift
        # nevertheless crosses the true 0.5*skin safety bound while the list
        # is still in use, latch `unsafe` -- the sticky equivalent of a
        # LAMMPS "dangerous build" (pairs may have been silently missed).
        nbrs = s.nbrs
        msq = max_displacement_sq(nbrs, x, box, self.cfg.pbc)
        stale = s.stale | (msq > (0.5 * self.cfg.stale_factor
                                  * self.cfg.skin) ** 2)
        unsafe = s.unsafe | (msq > (0.5 * self.cfg.skin) ** 2)
        if self.short_build is not None:
            # exact dangerous-build criterion for the short-list epoch: an
            # atom moving > short_skin/2 since the refresh can carry a pair
            # into the cutoff unseen. Colored epochs also bound the drift
            # under which their dropped off-table pairs provably stay
            # outside the cutoff (ShortList.guard) -- take the tighter one.
            msq_s = max_displacement_sq(
                nbrs._replace(ref_x=s.short.ref_x), x, box, self.cfg.pbc)
            lim = jnp.asarray((0.5 * self.cfg.short_skin) ** 2, msq_s.dtype)
            g = getattr(s.short, "guard", None)
            if g is not None:
                lim = jnp.minimum(lim, g * g)
            unsafe = unsafe | (msq_s > lim)
        pe, f, w = self._eval_force(x, box, nbrs, s.short, light=light)
        v = I.vv_kick(v, f, m, 0.5 * dt)

        s = MDState(x=x, v=v, f=f, box=box, pe=pe, virial=w, nbrs=nbrs,
                    nhc=s.nhc, v_eps=s.v_eps, baro_nhc=s.baro_nhc, key=key,
                    step=s.step + 1, overflow=s.overflow | nbrs.overflow,
                    stale=stale, unsafe=unsafe, short=s.short)
        if c.ensemble == "npt":
            s = self._npt_baro_half(s)
            s = self._npt_baro_thermo(s, dt)
        if c.ensemble in ("nvt", "npt"):
            q = I.nhc_masses(self.ndof, c.t_target, c.tau_t, c.nhc_len,
                             s.v.dtype)
            v, nhc = I.nhc_step(s.v, m, s.nhc, q, c.t_target, self.ndof, dt)
            s = s._replace(v=v, nhc=nhc)
        return s

    # ---------- NPT pieces (MTK, per-axis couple) ----------
    def _pressure_diag(self, s: MDState):
        vol = s.box[0] * s.box[1] * s.box[2]
        kin = MVV2E * jnp.sum(self.masses[:, None] * s.v * s.v, axis=0)  # [3]
        return (kin + jnp.diagonal(s.virial)) / vol                      # eV/A^3

    def _n_couple(self):
        return max(1, sum(bool(p) for p in self.cfg.p_couple))

    def _baro_q(self, dtype):
        """Barostat-thermostat chain masses: ndof = coupled axes, damping
        tau_p (LAMMPS uses a separate tdamp for etap; tau_p is a fine default)."""
        return I.nhc_masses(self._n_couple(), self.cfg.t_target,
                            self.cfg.tau_p, self.cfg.pchain, dtype)

    def _npt_baro_thermo(self, s: MDState, dt) -> MDState:
        """Half-step NHC thermostat on the barostat strain rates v_eps."""
        c = self.cfg
        couple = jnp.asarray(c.p_couple, dtype=s.v.dtype)
        w_mass = I.npt_baro_masses(self.n, c.t_target, c.tau_p, s.v.dtype)
        ke2 = w_mass * jnp.sum(s.v_eps * s.v_eps * couple)
        scale, bnhc = I.nhc_propagate(ke2, s.baro_nhc, self._baro_q(s.v.dtype),
                                      BOLTZ * c.t_target, self._n_couple(), dt)
        return s._replace(v_eps=s.v_eps * scale, baro_nhc=bnhc)

    def _npt_baro_half(self, s: MDState) -> MDState:
        c = self.cfg
        dt2 = 0.5 * c.dt
        couple = jnp.asarray(c.p_couple, dtype=s.v.dtype)
        p_ext = jnp.asarray(c.p_target, dtype=s.v.dtype) / NKTV2P        # bar -> eV/A^3
        w_mass = I.npt_baro_masses(self.n, c.t_target, c.tau_p, s.v.dtype)
        vol = s.box[0] * s.box[1] * s.box[2]
        p_int = self._pressure_diag(s)
        ke2 = 2.0 * I.kinetic_energy(s.v, self.masses)
        n_couple = jnp.maximum(jnp.sum(couple), 1.0)
        g_eps = (vol * (p_int - p_ext) + (ke2 / self.ndof) * couple / n_couple) \
            / w_mass
        v_eps = s.v_eps + dt2 * g_eps * couple
        # MTK velocity correction
        tr = jnp.sum(v_eps * couple)
        scale = jnp.exp(-dt2 * (v_eps + tr / self.ndof))
        v = s.v * jnp.where(couple > 0, scale, 1.0)[None, :]
        return s._replace(v=v, v_eps=v_eps)

    def _npt_drift(self, x, v, box, v_eps, dt):
        c = self.cfg
        couple = jnp.asarray(c.p_couple, dtype=x.dtype)
        ex = jnp.where(couple > 0, jnp.exp(dt * v_eps), 1.0)
        box_new = box * ex
        x_new = x * ex[None, :] + npt_drift_vcoef(v_eps, couple, dt) * v
        return x_new, box_new

    # ---------- state init ----------
    def init_state(self, x, box, v=None, seed=0, t_init=None):
        rlist = self.cfg.cutoff + self.cfg.skin
        small = [float(b) for b, p in zip(np.asarray(box), self.cfg.pbc)
                 if p and float(b) < 2.0 * rlist]
        if small and self.image_shifts is None:
            raise ValueError(
                f"box edges {small} are below 2*(cutoff+skin)={2 * rlist:.2f} A: "
                "the single-image minimum-image convention would miss periodic "
                "images. Pass image_shifts (models.annp.image_shift_table + "
                "energy_forces_virial_images, with cfg.pbc = pbc_eff) or "
                "replicate the scene "
                "(meng_zhang_tpu.geometry.lattice.replicate_data).")
        dtype = x.dtype
        # own the buffers: run_device donates the state, so caller-held
        # arrays placed in it directly would be deleted under the caller
        x = jnp.array(x, copy=True)
        box = jnp.array(box, copy=True)
        key = jax.random.PRNGKey(seed)
        if v is None:
            key, sub = jax.random.split(key)
            t0 = self.cfg.t_target if t_init is None else t_init
            v = create_velocities(sub, self.masses.astype(dtype), t0, dtype)
        else:
            v = jnp.array(v, copy=True)
        nbrs = self.build_nbrs(x, box)
        # break the ref_x <-> x buffer aliasing: run_device donates the
        # state, and donating one buffer reachable through two leaves is a
        # runtime error
        nbrs = nbrs._replace(ref_x=jnp.copy(x))
        short = None
        if self.short_build is not None:
            short = jax.jit(self.short_build)(x, box, nbrs)
            short = short._replace(ref_x=jnp.copy(x))
        # jitted: run eagerly, a production-size force pipeline
        # materializes every chunk temporary at once (OOMs at 2M atoms)
        pe, f, w = jax.jit(self._eval_force)(x, box, nbrs, short)
        return MDState(
            x=x, v=v, f=f, box=box, pe=pe, virial=w, nbrs=nbrs,
            nhc=I.NHCState.zeros(self.cfg.nhc_len, dtype),
            v_eps=jnp.zeros(3, dtype), baro_nhc=I.NHCState.zeros(self.cfg.pchain, dtype),
            key=key, step=jnp.asarray(0, jnp.int32),
            overflow=jnp.copy(nbrs.overflow), stale=jnp.asarray(False),
            unsafe=jnp.asarray(False), short=short)

    # ---------- thermo ----------
    def thermo(self, s: MDState) -> Thermo:
        ke = I.kinetic_energy(s.v, self.masses)
        temp = 2.0 * ke / (self.ndof * BOLTZ)
        vol = s.box[0] * s.box[1] * s.box[2]
        press = (jnp.sum(self._pressure_diag(s)) / 3.0) * NKTV2P
        conserved = s.pe + ke
        if self.cfg.ensemble in ("nvt", "npt"):
            q = I.nhc_masses(self.ndof, self.cfg.t_target, self.cfg.tau_t,
                             self.cfg.nhc_len, s.v.dtype)
            conserved = conserved + I.nhc_conserved(s.nhc, q, self.cfg.t_target,
                                                    self.ndof)
        if self.cfg.ensemble == "npt":
            c = self.cfg
            couple = jnp.asarray(c.p_couple, dtype=s.v.dtype)
            w_mass = I.npt_baro_masses(self.n, c.t_target, c.tau_p, s.v.dtype)
            conserved = conserved + 0.5 * w_mass * jnp.sum(
                s.v_eps * s.v_eps * couple)
            conserved = conserved + I.nhc_conserved(
                s.baro_nhc, self._baro_q(s.v.dtype), c.t_target,
                self._n_couple())
            p_hydro = (jnp.sum(jnp.asarray(c.p_target, s.v.dtype) * couple)
                       / self._n_couple()) / NKTV2P
            conserved = conserved + p_hydro * vol
        return Thermo(step=s.step, temp=temp, pe=s.pe, ke=ke, press=press,
                      vol=vol, conserved=conserved)

    # ---------- run loop ----------
    @partial(jax.jit, static_argnums=(0, 2), donate_argnums=(1,))
    def run_device(self, state: MDState, n_blocks: int):
        """NOTE: donates `state` (the [N, K] neighbor tables double the
        footprint at 2M atoms otherwise) -- callers must rebind."""
        every = self.cfg.thermo_every
        # the virial is only read by the block-end thermo (NVE/NVT) or the
        # per-step barostat (NPT): with a light force variant, all but the
        # final step of each block skip the virial tallies in non-NPT runs
        light = (self.force_fn_light is not None
                 and self.cfg.ensemble != "npt")
        step_l = lambda i, ss: self.step(ss, light=light)  # noqa: E731

        def tail(s, m):
            """m steps, the LAST of which always computes the virial."""
            if light:
                s = jax.lax.fori_loop(0, m - 1, step_l, s)
                return self.step(s)
            return jax.lax.fori_loop(0, m, step_l, s)

        if self.short_build is None or self.cfg.short_host_refresh:
            # host-refresh mode: run() refreshes the short list at each
            # block top (it must read the colored compaction's color_bad)
            def block(s, _):
                s = tail(s, every)
                return s, self.thermo(s)
        else:
            # refresh the short list on a fixed in-scan cadence every
            # short_every steps (an unconditional refresh -- a lax.cond
            # would run the refresh every step anyway once XLA flattens
            # it). Segments unroll statically so only the block's final
            # segment carries the full-virial tail step.
            se = self.cfg.short_every

            def block(s, _):
                for k in range(every // se):
                    s = self._refresh_short(s)
                    s = tail(s, se) if k == every // se - 1 \
                        else jax.lax.fori_loop(0, se, step_l, s)
                return s, self.thermo(s)

        return jax.lax.scan(block, state, None, length=n_blocks)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _rebuild(self, state: MDState) -> MDState:
        nbrs = self.build_nbrs(state.x, state.box)
        # optimization_barrier forces ref_x into a distinct output buffer
        # from the pass-through x (duplicate outputs may share one buffer,
        # which the donating run_device would then reject)
        nbrs = nbrs._replace(ref_x=jax.lax.optimization_barrier(state.x))
        state = state._replace(nbrs=nbrs, stale=jnp.asarray(False),
                               overflow=state.overflow | nbrs.overflow)
        if self.short_build is not None and not self.cfg.short_host_refresh:
            # short.ref_x is fixed up EAGERLY by the caller (run): a second
            # optimization_barrier(state.x) output here would be CSE'd into
            # the same buffer as nbrs.ref_x, which the donating run_device
            # then consumes twice. (Host-refresh mode rebuilds the short
            # list at the next block top instead.)
            state = state._replace(
                short=self.short_build(state.x, state.box, nbrs))
        return state

    # ---------- host-side short-list refresh (colored/banded pick) ----------
    def refresh_short_host(self, state: MDState) -> MDState:
        """Refresh the short list from the host, preferring the colored
        compaction and falling back to banded for the epoch when its
        color_bad flag trips (with an 8-block retry hysteresis). One scalar
        host readback per block -- the same sync cadence as the staleness
        check in run()."""
        if not hasattr(self, "_short_jit"):
            self._short_jit = jax.jit(self.short_build)
            if self.short_build_colored is not None:
                self._short_colored_jit = jax.jit(self.short_build_colored)
        if self.short_build_colored is not None:
            if self._colored_skip == 0:
                sh = self._short_colored_jit(state.x, state.box, state.nbrs)
                if not bool(sh.color_bad):
                    self.colored_blocks += 1
                    return state._replace(
                        short=sh._replace(ref_x=jnp.copy(state.x)))
                d = int(sh.diag) if sh.diag is not None else -1
                self.color_fallbacks = getattr(self, "color_fallbacks", [])
                self.color_fallbacks.append(
                    dict(step=int(state.step), dup=bool(d & 1),
                         res_ovf=bool(d & 2), max_res=(d >> 3) & 0x1FF))
                self._colored_skip = 2
            else:
                self._colored_skip -= 1
        sh = self._short_jit(state.x, state.box, state.nbrs)
        self.banded_blocks += 1
        return state._replace(short=sh._replace(ref_x=jnp.copy(state.x)))

    def run(self, state: MDState, n_blocks: int):
        """Advance n_blocks x thermo_every steps, rebuilding the neighbor
        list at block boundaries whenever a step flagged staleness. One
        device->host bool sync per block; everything else stays on device."""
        thermos = []
        self.rebuild_count = 0
        host_short = self.short_build is not None and \
            self.cfg.short_host_refresh
        for _ in range(n_blocks):
            if host_short:
                state = self.refresh_short_host(state)
            state, th = self.run_device(state, 1)
            thermos.append(th)
            if bool(state.stale):
                state = self._rebuild(state)
                if self.short_build is not None and not host_short:
                    # break the short.ref_x <-> x / nbrs.ref_x buffer
                    # aliasing before the next donating run_device call
                    state = state._replace(short=state.short._replace(
                        ref_x=jnp.copy(state.x)))
                self.rebuild_count += 1
        return state, jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *thermos)
