"""MD driver tests: NVE conservation, NVT/Langevin thermostats, NPT, FIRE.

Energy conservation is the integration-level analogue of the reference's
golden-log validation (SURVEY.md section 4.2). The tight NVE check runs the
fe ANNP model in f64; the ensemble checks use ANNA-ADP (cheaper: pairwise
forces, 5.055 A cutoff) -- note ANNA's frozen-(d2,q2) force definition is
deliberately not exactly conservative, so its tests assert thermostat
behavior, not drift.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meng_zhang_tpu.md.minimize import fire_minimize
from meng_zhang_tpu.md.simulation import MDConfig, Simulator
from meng_zhang_tpu.models import anna_adp
from meng_zhang_tpu.models.annp import make_annp, energy_forces
from meng_zhang_tpu.units import MASS_FE


def bcc(n, a=2.8553, dtype=jnp.float64):
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    cells = np.array([[i, j, k] for i in range(n)
                      for j in range(n) for k in range(n)])
    x = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a
    return jnp.asarray(x, dtype), jnp.asarray([n * a] * 3, dtype)


@pytest.fixture(scope="module")
def anna_system(anna_pot):
    cfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float32)
    x, box = bcc(4, dtype=jnp.float32)            # box 11.42 > 2*(5.055+0.5)

    def force_fn(xx, bb, nbrs):
        return anna_adp.energy_forces_virial(cfg, params, xx, bb, nbrs.idx)

    masses = jnp.full(x.shape[0], MASS_FE, jnp.float32)
    return force_fn, x, box, masses


def _sim(force_fn, masses, ensemble, cutoff, skin=0.5, capacity=96,
         thermo_every=10, **kw):
    cfg = MDConfig(dt=0.001, cutoff=cutoff, skin=skin, capacity=capacity,
                   nbr_method="n2", ensemble=ensemble,
                   thermo_every=thermo_every, **kw)
    return Simulator(force_fn, masses, cfg)


def test_nve_energy_conservation_fe(fe_pot):
    mcfg, params = make_annp(fe_pot, dtype=jnp.float64)
    # drop the constant -4479 eV/atom shift: same dynamics, conservation
    # check not drowned by f.p. cancellation in the total
    mcfg = dataclasses.replace(mcfg, e_shift=0.0)
    x, box = bcc(5)

    def force_fn(xx, bb, nbrs):
        e, f = energy_forces(mcfg, params, xx, bb, nbrs.idx)
        return e, f, jnp.zeros((3, 3), xx.dtype)

    masses = jnp.full(x.shape[0], MASS_FE, jnp.float64)
    sim = _sim(force_fn, masses, "nve", cutoff=6.5, skin=0.6, capacity=160)
    st = sim.init_state(x, box, seed=1, t_init=300.0)
    st, th = sim.run(st, 5)                     # 50 steps, 1 fs
    assert not bool(st.overflow)
    e = np.asarray(th.conserved)
    assert np.max(np.abs(e - e[0])) < 5e-3      # eV total over 250 atoms
    assert 100 < float(th.temp[-1]) < 400


def test_nvt_thermostat(anna_system):
    force_fn, x, box, masses = anna_system
    sim = _sim(force_fn, masses, "nvt", cutoff=5.055,
               t_target=300.0, tau_t=0.02)
    st = sim.init_state(x, box, seed=2, t_init=120.0)
    # equipartition halves the initial 120 K into PE within ~100 fs; the
    # thermostat must pull the system back up toward 300 K from there
    st, th = sim.run(st, 25)                    # 250 steps
    assert not bool(st.overflow)
    t = np.asarray(th.temp)
    assert np.all(np.isfinite(t))
    assert t[-1] > 140.0 and t[-1] > t[5]       # heating past the dip


def test_langevin_thermalizes(anna_system):
    force_fn, x, box, masses = anna_system
    sim = _sim(force_fn, masses, "langevin", cutoff=5.055,
               t_target=300.0, damp=0.02)
    st = sim.init_state(x, box, seed=3, t_init=10.0)
    st, th = sim.run(st, 15)
    t = np.asarray(th.temp)
    assert abs(np.mean(t[-5:]) - 300.0) < 120.0


def test_npt_stable(anna_system):
    force_fn, x, box, masses = anna_system
    sim = _sim(force_fn, masses, "npt", cutoff=5.055,
               t_target=300.0, p_target=(0.0, 0.0, 0.0),
               p_couple=(True, True, True), tau_p=0.5)
    st = sim.init_state(x, box, seed=4, t_init=300.0)
    st, th = sim.run(st, 12)
    assert not bool(st.overflow)
    assert np.all(np.isfinite(np.asarray(th.press)))
    v = np.asarray(th.vol)
    assert 0.85 < v[-1] / v[0] < 1.15           # bounded box response


def test_npt_holds_temperature(anna_system):
    """fix npt is thermostatted (MTK), not NPH: starting cold, the particle
    NHC must pull T up toward t_target while the barostat runs (this failed
    before round 2 — the npt branch applied only barostat half-steps and T
    was uncontrolled)."""
    force_fn, x, box, masses = anna_system
    sim = _sim(force_fn, masses, "npt", cutoff=5.055,
               t_target=300.0, tau_t=0.02, p_target=(0.0, 0.0, 0.0),
               p_couple=(True, True, True), tau_p=0.5)
    st = sim.init_state(x, box, seed=6, t_init=120.0)
    st, th = sim.run(st, 25)                    # 250 steps
    assert not bool(st.overflow)
    t = np.asarray(th.temp)
    assert np.all(np.isfinite(t))
    # equipartition alone would leave T ~ 60 K; the thermostat must heat it
    assert t[-1] > 140.0 and t[-1] > t[5]


def test_npt_axis_couple_only_y(anna_system):
    """Benchmark-style selective coupling (`fix npt ... y 0 0 1`)."""
    force_fn, x, box, masses = anna_system
    sim = _sim(force_fn, masses, "npt", cutoff=5.055,
               t_target=300.0, p_target=(0.0, 0.0, 0.0),
               p_couple=(False, True, False), tau_p=0.5)
    st = sim.init_state(x, box, seed=5, t_init=300.0)
    st, th = sim.run(st, 6)
    assert float(st.box[0]) == float(box[0])    # uncoupled axes frozen
    assert float(st.box[2]) == float(box[2])
    assert np.all(np.isfinite(np.asarray(th.press)))


def test_cg_minimizer(anna_pot):
    """Polak-Ribiere CG (LAMMPS min_style cg) reaches the FIRE minimum in
    far fewer force evaluations -- the reference benchmark's minimizer
    (in.st_test:20-21)."""
    from meng_zhang_tpu.md.minimize import cg_minimize
    cfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float64)
    x, box = bcc(4, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    x = x + jnp.asarray(rng.normal(scale=0.08, size=x.shape))
    from meng_zhang_tpu.system.neighbors import build_neighbors_n2
    nbrs = build_neighbors_n2(x, box, cfg.cut + 0.5, 96)

    def force_fn(xx, bb, idx):
        return anna_adp.energy_forces(cfg, params, xx, bb, idx)

    e0, _ = force_fn(x, box, nbrs.idx)
    st = cg_minimize(force_fn, x, box, nbrs.idx, etol=0.0, ftol=1e-3,
                     max_iter=80)
    assert float(st.pe) < float(e0)
    fire = fire_minimize(force_fn, x, box, nbrs.idx, f_tol=5e-3,
                         max_iter=400)
    # same minimum (or better), and with fewer evaluations than FIRE steps
    assert float(st.pe) <= float(fire.pe) + 1e-3
    assert st.n_evals < int(fire.n_iter)


def test_cg_single_iteration_is_steepest_descent_linemin(anna_pot):
    """max_iter=1 replays the reference benchmark's effective minimize: one
    steepest-descent line minimization (its etol=1e-6 stops LAMMPS CG after
    a single iteration, log_relaxing_new.lammps minimize table)."""
    from meng_zhang_tpu.md.minimize import cg_minimize
    cfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float64)
    x, box = bcc(4, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    x = x + jnp.asarray(rng.normal(scale=0.05, size=x.shape))
    from meng_zhang_tpu.system.neighbors import build_neighbors_n2
    nbrs = build_neighbors_n2(x, box, cfg.cut + 0.5, 96)

    def force_fn(xx, bb, idx):
        return anna_adp.energy_forces(cfg, params, xx, bb, idx)

    e0, f0 = force_fn(x, box, nbrs.idx)
    st = cg_minimize(force_fn, x, box, nbrs.idx, etol=0.0, ftol=0.0,
                     max_iter=1)
    assert st.n_iter == 1
    assert float(st.pe) < float(e0)
    # the step moved along f0 only (steepest descent): displacement is
    # proportional to the initial force direction
    dx = np.asarray(st.x - x)
    f0n = np.asarray(f0)
    cosang = (np.sum(dx * f0n)
              / (np.linalg.norm(dx) * np.linalg.norm(f0n)))
    assert cosang > 0.999999


def test_fire_minimizer(anna_pot):
    cfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float32)
    x, box = bcc(4, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = x + jnp.asarray(rng.normal(scale=0.08, size=x.shape), jnp.float32)
    from meng_zhang_tpu.system.neighbors import build_neighbors_n2
    nbrs = build_neighbors_n2(x, box, cfg.cut + 0.5, 96)

    def force_fn(xx, bb, idx):      # fire_minimize passes the raw idx table
        return anna_adp.energy_forces(cfg, params, xx, bb, idx)

    e0, _ = force_fn(x, box, nbrs.idx)
    st = fire_minimize(force_fn, x, box, nbrs.idx, f_tol=5e-3, max_iter=800)
    assert float(st.fmax) < 5e-3
    assert float(st.pe) < float(e0)


def test_short_list_driver_matches_full_path(fe_pot):
    """Simulator with the refresh-static ShortList fast path (short_build +
    in-scan refresh cadence) reproduces the full-path trajectory, including
    across a mid-run refresh and a staleness rebuild."""
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp

    mcfg, params = make_annp(fe_pot, dtype=jnp.float64)
    x, box = bcc(5)
    masses = jnp.full(x.shape[0], MASS_FE, jnp.float64)
    pk = PallasAnnp(mcfg, params, k_short=160, short_delta=0.3)

    def force_full(xx, bb, nbrs):
        return pk.energy_forces(xx, bb, nbrs.idx, nbrs.rev, want_virial=True)

    def force_short(xx, bb, nbrs, short):
        return pk.energy_forces_short(xx, bb, short, want_virial=True)

    kw = dict(dt=0.001, cutoff=6.5, skin=0.6, capacity=256, nbr_method="n2",
              ensemble="nve", thermo_every=10, with_rev=True)
    sim0 = Simulator(force_full, masses, MDConfig(**kw))
    sim1 = Simulator(force_short, masses,
                     MDConfig(**kw, short_every=5, short_skin=0.3),
                     short_build=lambda xx, bb, nbrs: pk.compact_short(
                         xx, bb, nbrs.idx, nbrs.rev))
    st0 = sim0.init_state(x, box, seed=3, t_init=600.0)
    st1 = sim1.init_state(x, box, seed=3, t_init=600.0)
    np.testing.assert_allclose(np.asarray(st1.f), np.asarray(st0.f),
                               rtol=1e-9, atol=1e-11)
    st0, th0 = sim0.run(st0, 4)                 # 40 steps at 600 K
    st1, th1 = sim1.run(st1, 4)
    assert not bool(st1.overflow) and not bool(st1.unsafe)
    np.testing.assert_allclose(np.asarray(th1.pe), np.asarray(th0.pe),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(th1.temp), np.asarray(th0.temp),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st1.x), np.asarray(st0.x),
                               rtol=1e-9, atol=1e-9)


def test_chunked_short_light_matches_full_path(ni_pot):
    """The ni production trio (make_short_chunked_fns: amortized ShortRows
    repack + light no-virial steps) reproduces the plain per-step-compact
    trajectory exactly -- forces are identical whether the virial tallies
    run or not, and the thermo-step virial matches the full path."""
    from meng_zhang_tpu.geometry.lattice import FCC_BASIS, simple_lattice
    from meng_zhang_tpu.models.annp import (compact_neighbor_rows,
                                            effective_cutoff,
                                            energy_forces_virial_chunked,
                                            make_short_chunked_fns)

    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([4, 4, 4], 3.52, FCC_BASIS)
    rng = np.random.default_rng(2)
    x = jnp.asarray(x_np + rng.normal(scale=0.02, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    rc = effective_cutoff(ni_pot)
    m_ni = 58.6934
    masses = jnp.full(n, m_ni, jnp.float64)

    def force_full(xx, bb, nbrs):
        idx_s, ovf = compact_neighbor_rows(xx, bb, nbrs.idx, rc, 32)
        e, f, w = energy_forces_virial_chunked(mcfg, params, xx, bb, idx_s,
                                               chunk=64, shift=False)
        return jnp.where(ovf, jnp.nan, e), f, w

    force_fn, force_light, short_build = make_short_chunked_fns(
        mcfg, params, k_short=32, delta=0.3, chunk=64)
    kw = dict(dt=0.001, cutoff=rc, skin=0.5, capacity=64, nbr_method="n2",
              ensemble="nvt", t_target=800.0, thermo_every=10)
    sim0 = Simulator(force_full, masses, MDConfig(**kw))
    sim1 = Simulator(force_fn, masses,
                     MDConfig(**kw, short_every=5, short_skin=0.3),
                     short_build=short_build, force_fn_light=force_light)
    st0 = sim0.init_state(x, box, seed=3, t_init=800.0)
    st1 = sim1.init_state(x, box, seed=3, t_init=800.0)
    np.testing.assert_allclose(np.asarray(st1.f), np.asarray(st0.f),
                               rtol=1e-9, atol=1e-11)
    st0, th0 = sim0.run(st0, 3)                 # 30 steps at 800 K
    st1, th1 = sim1.run(st1, 3)
    assert not bool(st1.overflow) and not bool(st1.unsafe)
    np.testing.assert_allclose(np.asarray(th1.pe), np.asarray(th0.pe),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(th1.temp), np.asarray(th0.temp),
                               rtol=1e-8)
    # block-end thermo pressure needs the tail step's full virial
    np.testing.assert_allclose(np.asarray(th1.press), np.asarray(th0.press),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st1.x), np.asarray(st0.x),
                               rtol=1e-9, atol=1e-9)
    # a light step must really have skipped the tallies
    assert float(jnp.sum(jnp.abs(st1.virial))) > 0.0   # tail step is full


def test_short_rows_overflow_poisons(ni_pot):
    """Rows past k_short must NaN-poison the observables, never silently
    drop pairs (the Pallas short path's policy, applied to ShortRows)."""
    from meng_zhang_tpu.geometry.lattice import FCC_BASIS, simple_lattice
    from meng_zhang_tpu.models.annp import (effective_cutoff,
                                            make_short_chunked_fns)
    from meng_zhang_tpu.system.neighbors import build_neighbors_n2

    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([3, 3, 3], 3.52, FCC_BASIS)
    x, box = jnp.asarray(x_np), jnp.asarray(box_np)
    rc = effective_cutoff(ni_pot)
    force_fn, _, short_build = make_short_chunked_fns(
        mcfg, params, k_short=8, delta=0.3, chunk=64)   # 8 << 18 neighbors
    nbrs = build_neighbors_n2(x, box, rc + 0.5, 64)
    short = short_build(x, box, nbrs)
    assert bool(short.overflow)
    e, f, w = force_fn(x, box, nbrs, short)
    assert not np.isfinite(float(e))
    assert not np.all(np.isfinite(np.asarray(f)))


@pytest.fixture(scope="module")
def thin_box_pair(fe_pot):
    """Image-mode simulator + explicitly replicated reference simulator for
    a 1-cell-thick fully periodic box (every dim < 2*rlist). Shared by the
    static-parity test (default run) and the NVE trajectory-parity test
    (nightly) -- VERDICT round-3 item 8."""
    from meng_zhang_tpu.models.annp import (energy_forces_virial_chunked,
                                            energy_forces_virial_images,
                                            image_shift_table)
    cfg, params = make_annp(fe_pot, dtype=jnp.float64)
    # 1 x 4 x 4 bcc cells, fully periodic: every dim thinner than 2*rlist
    from meng_zhang_tpu.geometry.lattice import bcc as bcc_lat
    x_np, box_np = bcc_lat([1, 4, 4])
    rng = np.random.default_rng(2)
    x = jnp.asarray(x_np + rng.normal(scale=0.03, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    rlist = cfg.cut + 0.5
    shifts, pbc_eff = image_shift_table(np.asarray(box), rlist, (True,) * 3)
    assert shifts is not None and not any(pbc_eff)
    cfg_eff = dataclasses.replace(cfg, pbc=pbc_eff)
    ms = np.max(np.asarray(shifts), axis=0)    # images per side
    reps = 2 * ms + 1

    def force_thin(xx, bb, nbrs):
        return energy_forces_virial_images(cfg_eff, params, xx, bb,
                                           nbrs.idx, shifts, chunk=16,
                                           shift=False)

    mdc = MDConfig(dt=0.001, cutoff=cfg.cut, skin=0.5, capacity=192,
                   nbr_method="n2", ensemble="nve", thermo_every=2,
                   pbc=pbc_eff)
    sim = Simulator(force_thin, jnp.full(n, MASS_FE, jnp.float64), mdc,
                    image_shifts=shifts)
    v0 = jnp.asarray(rng.normal(scale=0.3, size=(n, 3)))
    st = sim.init_state(x, box, v=v0)
    assert not bool(st.overflow)

    # reference: the explicitly replicated scene (same image grid)
    import itertools
    cells = [np.asarray(s) for s in
             itertools.product(*[range(r) for r in reps])]
    x_rep = jnp.concatenate([x + jnp.asarray(c * np.asarray(box_np))
                             for c in cells])
    v_rep = jnp.concatenate([v0] * len(cells))
    box_rep = jnp.asarray(box_np * reps)
    nrep = x_rep.shape[0]

    def force_rep(xx, bb, nbrs):
        return energy_forces_virial_chunked(cfg, params, xx, bb, nbrs.idx,
                                            chunk=128, shift=False)

    mdc2 = MDConfig(dt=0.001, cutoff=cfg.cut, skin=0.5, capacity=192,
                    nbr_method="n2", ensemble="nve", thermo_every=2)
    sim2 = Simulator(force_rep, jnp.full(nrep, MASS_FE, jnp.float64), mdc2)
    st2 = sim2.init_state(x_rep, box_rep, v=v_rep)
    assert not bool(st2.overflow)
    return sim, st, sim2, st2, n, nrep, len(cells)


def test_thin_box_image_static_parity(thin_box_pair):
    """Image-mode energies/forces/virial match the explicitly replicated
    scene -- the TPU equivalent of LAMMPS' multi-image ghost handling."""
    sim, st, sim2, st2, n, nrep, ncells = thin_box_pair
    np.testing.assert_allclose(float(st.pe) / n, float(st2.pe) / nrep,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st.f), np.asarray(st2.f[:n]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.virial) * ncells,
                               np.asarray(st2.virial), rtol=1e-8, atol=1e-8)


@pytest.mark.nightly
def test_thin_box_image_nve_parity(thin_box_pair):
    """Dynamic parity: 8 image-mode NVE steps stay on the replicated
    scene's track (the expensive leg; static parity runs by default)."""
    sim, st, sim2, st2, n, nrep, _ = thin_box_pair
    st, _ = sim.run(st, 4)
    st2, _ = sim2.run(st2, 4)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(st2.x[:n]),
                               rtol=1e-7, atol=1e-9)
