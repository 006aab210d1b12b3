"""Multi-chip spatial decomposition: 1-vs-N parity on the virtual CPU mesh.

The acceptance criteria from SURVEY.md section 7.7 and the round-1 verdict:
same physics on 1 vs N shards (ghost-exchange correctness) for BOTH model
families, in-run neighbor rebuilds without any replicated global work, NHC
thermostat parity with the single-chip driver, and sharded NPT. Runs on the
CPU backend with --xla_force_host_platform_device_count=8 (conftest).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meng_zhang_tpu.geometry.lattice import bcc
from meng_zhang_tpu.md.simulation import MDConfig, Simulator
from meng_zhang_tpu.models import anna_adp
from meng_zhang_tpu.models.annp import make_annp
from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
from meng_zhang_tpu.parallel.domain import (AnnaFrameModel, ShardConfig,
                                            ShardedMD, XlaFrameModel)
from meng_zhang_tpu.system.neighbors import build_neighbors_n2
from meng_zhang_tpu.units import MASS_FE


@pytest.fixture(scope="module")
def scene(fe_pot):
    cfg, params = make_annp(fe_pot, dtype=jnp.float64)
    # long-x slab scene: 24x5x5 bcc = 1200 atoms, box (68.5, 14.3, 14.3) --
    # slab widths stay >= 2*(cutoff+skin) for up to 4 devices
    x_np, box_np = bcc([24, 5, 5])
    rng = np.random.default_rng(0)
    x = jnp.asarray(x_np + rng.normal(scale=0.05, size=x_np.shape))
    box = jnp.asarray(box_np)
    pk = PallasAnnp(cfg, params)
    nbrs = build_neighbors_n2(x, box, 6.5 + 0.6, 160, with_rev=True)
    e_ref, f_ref, w_ref = pk.energy_forces(x, box, nbrs.idx, nbrs.rev,
                                           want_virial=True)
    return (cfg, params, x, box, pk, float(e_ref), np.asarray(f_ref),
            np.asarray(w_ref))


def _scfg(n_dev, n, **kw):
    # bc = halo_b/2 center-extension rows must span >= rlist = 7.1 A in x:
    # the scene has ~17.5 atoms/A of x, so bc >= 125 -> halo_b = 280
    kw.setdefault("capacity", 160)
    kw.setdefault("cutoff", 6.5)
    kw.setdefault("skin", 0.6)
    kw.setdefault("halo_b", 280)
    return ShardConfig(n_devices=n_dev, c_loc=n // n_dev, dt=0.001, **kw)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_forces_match_single_chip(scene, n_dev):
    mcfg, params, x, box, pk, e_ref, f_ref, w_ref = scene
    n = x.shape[0]
    md = ShardedMD(pk, MASS_FE, box, _scfg(n_dev, n))
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))

    e_tot = float(jnp.sum(st.pe)) + n * md.model.e_shift
    f_sorted = np.asarray(st.f_loc).reshape(n, 3)
    inv = np.argsort(np.asarray(order))
    f_global = f_sorted[inv]
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(f_global - f_ref)) < 1e-9
    # the Pallas frame adapter drives the sharded NPT barostat through this
    # psum'd virial -- assert 1-vs-N parity, not just forces
    np.testing.assert_allclose(np.asarray(st.virial), w_ref,
                               rtol=1e-8, atol=1e-9)


def test_frame_short_forces_match_single_chip(scene):
    """The refresh-static frame short list (FrameShortModel, the sharded
    fast path: VERDICT round-4 item 2) reproduces the single-chip forces,
    energy and virial exactly -- kernels run at Ks instead of the skin
    width K, no reverse slots anywhere."""
    from meng_zhang_tpu.parallel.domain import FrameShortModel
    mcfg, params, x, box, pk, e_ref, f_ref, w_ref = scene
    n = x.shape[0]
    pks = PallasAnnp(mcfg, params, k_short=128, short_delta=0.3)
    md = ShardedMD(FrameShortModel(pks), MASS_FE, box, _scfg(4, n))
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow)), np.asarray(st.overflow)
    e_tot = float(jnp.sum(st.pe)) + n * md.model.e_shift
    inv = np.argsort(np.asarray(order))
    f_global = np.asarray(st.f_loc).reshape(n, 3)[inv]
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(f_global - f_ref)) < 1e-9
    np.testing.assert_allclose(np.asarray(st.virial), w_ref,
                               rtol=1e-8, atol=1e-9)


def test_frame_short_ni_forces(ni_pot):
    """PallasNi served from the sharded driver through the frame short
    list (there was no sharded ni fused path before round 5)."""
    from meng_zhang_tpu.models.annp import (effective_cutoff,
                                            energy_forces_virial_chunked)
    from meng_zhang_tpu.geometry.lattice import FCC_BASIS, simple_lattice
    from meng_zhang_tpu.ops.pallas_ni import PallasNi
    from meng_zhang_tpu.parallel.domain import FrameShortModel
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([24, 3, 3], 3.52, FCC_BASIS)
    rng = np.random.default_rng(5)
    x = jnp.asarray(x_np + rng.normal(scale=0.04, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)
    nbrs = build_neighbors_n2(x, box, cut + 0.5, 96)
    e_ref, f_ref, w_ref = energy_forces_virial_chunked(
        mcfg, params, x, box, nbrs.idx, chunk=128, shift=False)
    pk = PallasNi(mcfg, params)
    md = ShardedMD(FrameShortModel(pk), 58.6934, box,
                   ShardConfig(n_devices=4, c_loc=n // 4, capacity=96,
                               cutoff=cut, skin=0.5, dt=0.001))
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow)), np.asarray(st.overflow)
    e_tot = float(jnp.sum(st.pe))
    inv = np.argsort(np.asarray(order))
    f_global = np.asarray(st.f_loc).reshape(n, 3)[inv]
    np.testing.assert_allclose(e_tot, float(e_ref), rtol=1e-10)
    assert np.max(np.abs(f_global - np.asarray(f_ref))) < 1e-8
    np.testing.assert_allclose(np.asarray(st.virial), np.asarray(w_ref),
                               rtol=1e-7, atol=1e-9)


def test_frame_short_md_parity(scene):
    """A hot NVE run through the sharded fast path stays on the
    full-width sharded track: per-block epoch refreshes, in-run rebuilds,
    and the OVF_SHORT/unsafe guards all live."""
    from meng_zhang_tpu.parallel.domain import FrameShortModel
    from meng_zhang_tpu.md.simulation import create_velocities
    mcfg, params, x, box, pk, _, _, _ = scene
    n = x.shape[0]
    v0 = create_velocities(jax.random.PRNGKey(3),
                           jnp.full(n, MASS_FE, jnp.float64), 600.0,
                           jnp.float64)
    cfgs = _scfg(2, n, thermo_every=4)
    md_full = ShardedMD(pk, MASS_FE, box, cfgs)
    st1, _ = md_full.distribute(x, v0)
    st1, th1 = md_full.run(st1, 8)
    assert md_full.rebuild_count >= 1

    pks = PallasAnnp(mcfg, params, k_short=128, short_delta=0.3)
    md = ShardedMD(FrameShortModel(pks), MASS_FE, box, cfgs)
    st2, _ = md.distribute(x, v0)
    st2, th2 = md.run(st2, 8)
    assert not bool(jnp.any(st2.overflow))
    assert not bool(jnp.any(st2.unsafe))
    np.testing.assert_allclose(np.asarray(th2.pe), np.asarray(th1.pe),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(th2.temp), np.asarray(th1.temp),
                               rtol=1e-8)


def test_auto_sized_geometry(scene):
    """halo_b=None / capacity=None derive the sharded geometry from the
    scene (VERDICT round-2 weak #5: hand-computed halo_b everywhere); the
    derived sizes must reproduce the explicit-config forces exactly."""
    mcfg, params, x, box, pk, e_ref, f_ref, w_ref = scene
    n = x.shape[0]
    md = ShardedMD(pk, MASS_FE, box,
                   ShardConfig(n_devices=2, c_loc=n // 2, dt=0.001,
                               cutoff=6.5, skin=0.6))
    st, order = md.distribute(x)
    # scene has ~17.5 atoms/A of x; bc must span rlist+skin = 7.7 A
    assert md.cfg.halo_b >= 240, md.cfg.halo_b
    assert md.cfg.capacity >= 120, md.cfg.capacity
    assert not bool(jnp.any(st.overflow))
    e_tot = float(jnp.sum(st.pe)) + n * md.model.e_shift
    inv = np.argsort(np.asarray(order))
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(np.asarray(st.f_loc).reshape(n, 3)[inv]
                         - f_ref)) < 1e-9


def test_undersized_halo_trips_coverage_proof(scene):
    """A deliberately too-small halo_b must be caught by the rebuild-time
    coverage proof (sticky overflow), never pass silently."""
    mcfg, params, x, box, pk, _, _, _ = scene
    n = x.shape[0]
    md = ShardedMD(pk, MASS_FE, box,
                   ShardConfig(n_devices=2, c_loc=n // 2, halo_b=32,
                               capacity=160, dt=0.001, cutoff=6.5, skin=0.6))
    st, order = md.distribute(x)
    assert bool(jnp.any(st.overflow))


def test_sharded_md_steps_match_single_chip(scene):
    """NVE steps on 4 shards track the single-chip trajectory."""
    mcfg, params, x, box, pk, _, _, _ = scene
    n = x.shape[0]
    md = ShardedMD(pk, MASS_FE, box, _scfg(4, n, thermo_every=5))
    v0 = jnp.zeros_like(x)
    st, order = md.distribute(x, v0)
    st, th = md.run(st, 1)          # 5 steps
    x_shard = np.asarray(md.gather_positions(st, order))

    nbrs = build_neighbors_n2(x, box, 6.5 + 0.6, 160, with_rev=True)
    xs = np.asarray(x, dtype=np.float64)
    vs = np.zeros_like(xs)
    f = np.asarray(pk.energy_forces(x, box, nbrs.idx, nbrs.rev)[1])
    from meng_zhang_tpu.units import MVV2E
    dt = 0.001
    for _ in range(5):
        vs = vs + 0.5 * dt / MVV2E * f / MASS_FE
        xs = xs + dt * vs
        f = np.asarray(pk.energy_forces(jnp.asarray(xs), box, nbrs.idx,
                                        nbrs.rev)[1])
        vs = vs + 0.5 * dt / MVV2E * f / MASS_FE
    assert np.max(np.abs(x_shard - xs)) < 1e-8


@pytest.fixture(scope="module")
def cheap_scene(fe_pot):
    """Reduced-cutoff fe model (2.6 A) on 512 atoms: validates the sharded
    thermostat/barostat/rebuild MACHINERY with 25x less pair work than the
    full 6.5 A model (which the force-parity tests above already cover) --
    the full model at f64 runs ~12 s/step on the single-core CI host."""
    import dataclasses
    mcfg, params = make_annp(fe_pot, dtype=jnp.float64)
    mcfg = dataclasses.replace(mcfg, cut=2.6)
    x_np, box_np = bcc([16, 4, 4])          # 512 atoms, box_x = 45.7 A
    rng = np.random.default_rng(11)
    x = jnp.asarray(x_np + rng.normal(scale=0.03, size=x_np.shape))
    return mcfg, params, x, jnp.asarray(box_np)


def _single_chip_sim(mcfg, params, n, box, ensemble, thermo_every=5,
                     skin=0.4, **kw):
    from meng_zhang_tpu.models.annp import energy_forces_virial_chunked

    def force_fn(xx, bb, nbrs):
        return energy_forces_virial_chunked(mcfg, params, xx, bb, nbrs.idx,
                                            chunk=128, shift=False)

    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin, capacity=32,
                   nbr_method="n2", ensemble=ensemble, t_target=50.0,
                   tau_t=0.1, thermo_every=thermo_every, **kw)
    return Simulator(force_fn, jnp.full(n, MASS_FE, jnp.float64), cfg)


def _cheap_scfg(mcfg, n, skin=0.4, **kw):
    # 11.2 atoms/A of x; bc rows must span rlist plus hot-run drift margin
    kw.setdefault("thermo_every", 5)
    return ShardConfig(n_devices=4, c_loc=n // 4, halo_b=112, capacity=32,
                       cutoff=mcfg.cut, skin=skin, dt=0.001, **kw)


@pytest.mark.parametrize("ensemble,kw", [
    ("nvt", {}),
    ("npt", {"p_target": (0.0,) * 3, "p_couple": (False, True, False),
             "tau_p": 1.0}),
])
def test_sharded_thermo_parity_vs_single_chip(cheap_scene, ensemble, kw):
    """NVT (full Nose-Hoover chain) and NPT (MTK, y-coupled) on 4 shards
    reproduce the single-chip thermo trace -- the chain/barostat math is
    identical, driven by psum-reduced KE/virial."""
    mcfg, params, x, box = cheap_scene
    n = x.shape[0]

    sim = _single_chip_sim(mcfg, params, n, box, ensemble, **kw)
    key = jax.random.PRNGKey(7)
    from meng_zhang_tpu.md.simulation import create_velocities
    v0 = create_velocities(key, jnp.full(n, MASS_FE, jnp.float64), 50.0,
                           jnp.float64)
    st1 = sim.init_state(x, box, v=v0, seed=1)
    st1, th1 = sim.run(st1, 4)      # 20 steps

    md = ShardedMD(XlaFrameModel(mcfg, params, chunk=128), MASS_FE, box,
                   _cheap_scfg(mcfg, n, ensemble=ensemble, t_target=50.0,
                               tau_t=0.1, **kw))
    stn, order = md.distribute(x, v0)
    assert not bool(jnp.any(stn.overflow))
    stn, thn = md.run(stn, 4)

    np.testing.assert_allclose(np.asarray(thn.temp), np.asarray(th1.temp),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(thn.pe), np.asarray(th1.pe),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(thn.press), np.asarray(th1.press),
                               rtol=1e-6)
    if ensemble == "npt":
        np.testing.assert_allclose(float(stn.box[1]), float(st1.box[1]),
                                   rtol=1e-10)


def test_sharded_inrun_rebuild(ni_pot):
    """Hot NVE run long enough to trip staleness: the device-local rebuild
    must fire and the trajectory must stay on the single-chip track. Uses
    the fcc-Ni potential -- its descriptors genuinely vanish at 3.9 A, so
    the scene is cheap AND physically stable at 600 K (a cutoff-truncated
    fe model collapses and trips the dangerous-build flag for real)."""
    from meng_zhang_tpu.models.annp import effective_cutoff
    from meng_zhang_tpu.geometry.lattice import FCC_BASIS, simple_lattice
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([16, 4, 4], 3.52, FCC_BASIS)
    rng = np.random.default_rng(11)
    x = jnp.asarray(x_np + rng.normal(scale=0.02, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)
    m_ni = 58.6934
    key = jax.random.PRNGKey(3)
    from meng_zhang_tpu.md.simulation import create_velocities
    v0 = create_velocities(key, jnp.full(n, m_ni, jnp.float64), 600.0,
                           jnp.float64)
    from meng_zhang_tpu.models.annp import energy_forces_virial_chunked

    def force_fn(xx, bb, nbrs):
        return energy_forces_virial_chunked(mcfg, params, xx, bb, nbrs.idx,
                                            chunk=128, shift=False)

    cfg1 = MDConfig(dt=0.001, cutoff=cut, skin=0.5, capacity=48,
                    nbr_method="n2", ensemble="nve", thermo_every=4)
    sim = Simulator(force_fn, jnp.full(n, m_ni, jnp.float64), cfg1)
    st1 = sim.init_state(x, box, v=v0, seed=1)
    st1, th1 = sim.run(st1, 15)      # 60 steps at 600 K -> rebuilds happen
    assert sim.rebuild_count >= 1
    assert not bool(st1.unsafe)

    # 18.2 atoms/A of x; rlist = 4.4 -> bc >= 80 rows -> halo_b = 176
    scfg = ShardConfig(n_devices=4, c_loc=n // 4, halo_b=176, capacity=48,
                       cutoff=cut, skin=0.5, dt=0.001, thermo_every=4)
    md = ShardedMD(XlaFrameModel(mcfg, params, chunk=128), m_ni, box, scfg)
    stn, order = md.distribute(x, v0)
    stn, thn = md.run(stn, 15)
    assert md.rebuild_count >= 1
    assert not bool(jnp.any(stn.overflow))
    assert not bool(jnp.any(stn.unsafe))
    np.testing.assert_allclose(np.asarray(thn.pe), np.asarray(th1.pe),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(thn.temp[-1]),
                               np.asarray(th1.temp[-1]), rtol=1e-7)


def test_xla_frame_adapter_fe(scene):
    """The gradient-based XLA frame adapter (no reverse slots) matches the
    single-chip energies, forces, and virial."""
    from meng_zhang_tpu.models.annp import energy_forces_virial_chunked
    mcfg, params, x, box, pk, e_ref, f_ref, _ = scene
    n = x.shape[0]
    nbrs = build_neighbors_n2(x, box, 7.1, 160)
    _, _, w_ref = energy_forces_virial_chunked(mcfg, params, x, box,
                                               nbrs.idx, chunk=128)
    model = XlaFrameModel(mcfg, params, chunk=128)
    md = ShardedMD(model, MASS_FE, box, _scfg(2, n))
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))
    e_tot = float(jnp.sum(st.pe)) + n * mcfg.e_shift
    inv = np.argsort(np.asarray(order))
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(np.asarray(st.f_loc).reshape(n, 3)[inv]
                         - f_ref)) < 1e-9
    np.testing.assert_allclose(np.asarray(st.virial), np.asarray(w_ref),
                               rtol=1e-8, atol=1e-9)


def test_xla_frame_adapter_ni(ni_pot):
    """Sharded ni (Behler-Parrinello): 1-vs-N parity through the XLA frame
    adapter -- the ni capability row the round-1 verdict flagged."""
    from meng_zhang_tpu.models.annp import (effective_cutoff,
                                            energy_forces_virial_chunked)
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    from meng_zhang_tpu.geometry.lattice import FCC_BASIS, simple_lattice
    x_np, box_np = simple_lattice([16, 4, 4], 3.52, FCC_BASIS)
    rng = np.random.default_rng(2)
    x = jnp.asarray(x_np + rng.normal(scale=0.05, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)              # 3.90 A descriptor range
    nbrs = build_neighbors_n2(x, box, cut + 0.6, 96)
    # chunked reference (the vmap+virial path holds O(N K^2) f64 residuals)
    e_ref, f_ref, w_ref = energy_forces_virial_chunked(mcfg, params, x, box,
                                                       nbrs.idx, chunk=128)
    model = XlaFrameModel(mcfg, params, chunk=128)
    # ~18.2 atoms/A of x; rlist = 4.5 -> bc >= 82 rows -> halo_b = 200
    scfg = ShardConfig(n_devices=4, c_loc=n // 4, halo_b=200, capacity=96,
                       cutoff=cut, skin=0.6, dt=0.001)
    md = ShardedMD(model, 58.6934, box, scfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))
    e_tot = float(jnp.sum(st.pe))
    inv = np.argsort(np.asarray(order))
    np.testing.assert_allclose(e_tot, float(e_ref), rtol=1e-10)
    assert np.max(np.abs(np.asarray(st.f_loc).reshape(n, 3)[inv]
                         - np.asarray(f_ref))) < 1e-9
    np.testing.assert_allclose(np.asarray(st.virial), np.asarray(w_ref),
                               rtol=1e-8, atol=1e-9)


def test_migrate_unit(cheap_scene):
    """migrate() moves boundary crossers to the ring neighbor -- including
    across the periodic seam -- transports (x, v, f, gid) bit-exactly, and
    preserves equal per-device counts."""
    mcfg, params, x, box = cheap_scene
    n = x.shape[0]
    from meng_zhang_tpu.md.simulation import create_velocities
    v0 = create_velocities(jax.random.PRNGKey(5),
                           jnp.full(n, MASS_FE, jnp.float64), 50.0,
                           jnp.float64)
    md = ShardedMD(XlaFrameModel(mcfg, params, chunk=128), MASS_FE, box,
                   _cheap_scfg(mcfg, n, migrate_b=16))
    st, order = md.distribute(x, v0)
    C, D = md.cfg.c_loc, md.cfg.n_devices

    # displace the top-x atom of device 0 well into device 1's slab, and the
    # top-x atom of device D-1 across the periodic seam into device 0
    x_loc = np.asarray(st.x_loc).copy()
    gids = np.asarray(st.gid)
    cross_r = int(gids[0, C - 1])
    cross_seam = int(gids[D - 1, C - 1])
    x_loc[0, C - 1, 0] += 1.5
    x_loc[D - 1, C - 1, 0] += 1.5        # past box_x: unwrapped seam cross
    st = st._replace(x_loc=jnp.asarray(x_loc))

    def by_gid(stt):
        g = np.asarray(stt.gid).reshape(-1)
        o = np.argsort(g)
        return (g[o], np.asarray(stt.x_loc).reshape(n, 3)[o],
                np.asarray(stt.v_loc).reshape(n, 3)[o],
                np.asarray(stt.f_loc).reshape(n, 3)[o])

    g0, x0, vv0, f0 = by_gid(st)
    st2 = md.migrate(st)
    g2, x2, vv2, f2 = by_gid(st2)

    assert md.migrated >= 2
    np.testing.assert_array_equal(g0, np.arange(n))    # gid is a permutation
    np.testing.assert_array_equal(g2, np.arange(n))
    # migration only permutes rows -- payloads are transported bit-exactly,
    # except that seam crossers get ONE exact +-box_x patch shift
    np.testing.assert_array_equal(vv2, vv0)
    np.testing.assert_array_equal(f2, f0)
    dx = x2 - x0
    np.testing.assert_array_equal(dx[:, 1:], 0.0)
    shifts = dx[:, 0] / float(box[0])
    assert set(np.unique(shifts)) <= {-1.0, 0.0, 1.0}
    # the seam crosser wraps down (-L); equal counts push device 0's
    # marginal bottom atom back across the seam (+L)
    assert shifts[cross_seam] == -1.0
    assert np.count_nonzero(shifts) == 2
    assert float(np.sum(shifts)) == 0.0

    gids2 = np.asarray(st2.gid)
    assert cross_r in gids2[1], "right crosser must now live on device 1"
    assert cross_seam in gids2[0], "seam crosser must wrap to device 0"
    # migrate leaves neighbor tables stale by contract; rebuild must succeed
    st3 = md.rebuild(st2)
    assert not bool(jnp.any(st3.overflow))


@pytest.mark.nightly
def test_sharded_md_migration_parity(ni_pot):
    """Hot sharded run (fcc-Ni at 1200 K -- the config-2 melt leg) with
    migrate_b enabled: boundary migration fires in-run and the trajectory
    stays exactly on the single-chip track (migration is physics-neutral:
    it only re-assigns atom ownership).

    15 x-cells / 4 devices puts each slab boundary INSIDE an x-layer of the
    fcc crystal (240 atoms = 7.5 layers per device), where sorted-x ties
    are ~0.02 A apart and thermal motion genuinely reorders rank ownership
    -- a commensurate split (16 cells) parks every boundary in the 1.76 A
    inter-layer gap, which no solid-state dynamics will ever cross."""
    from meng_zhang_tpu.models.annp import (effective_cutoff,
                                            energy_forces_virial_chunked)
    from meng_zhang_tpu.geometry.lattice import FCC_BASIS, simple_lattice
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([15, 4, 4], 3.52, FCC_BASIS)
    rng = np.random.default_rng(11)
    x = jnp.asarray(x_np + rng.normal(scale=0.02, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)
    m_ni = 58.6934
    from meng_zhang_tpu.md.simulation import create_velocities
    v0 = create_velocities(jax.random.PRNGKey(9), jnp.full(n, m_ni,
                           jnp.float64), 1200.0, jnp.float64)

    def force_fn(xx, bb, nbrs):
        return energy_forces_virial_chunked(mcfg, params, xx, bb, nbrs.idx,
                                            chunk=128, shift=False)

    cfg1 = MDConfig(dt=0.001, cutoff=cut, skin=0.5, capacity=48,
                    nbr_method="n2", ensemble="nve", thermo_every=4)
    sim = Simulator(force_fn, jnp.full(n, m_ni, jnp.float64), cfg1)
    st1 = sim.init_state(x, box, v=v0, seed=1)
    st1, th1 = sim.run(st1, 15)      # 60 steps at 1200 K

    scfg = ShardConfig(n_devices=4, c_loc=n // 4, halo_b=176, capacity=48,
                       cutoff=cut, skin=0.5, dt=0.001, thermo_every=4,
                       migrate_b=16)
    md = ShardedMD(XlaFrameModel(mcfg, params, chunk=128), m_ni, box, scfg)
    stn, order = md.distribute(x, v0)
    stn, thn = md.run(stn, 15)
    assert md.rebuild_count >= 1
    assert md.migrated >= 1, "1200 K run must produce boundary rank swaps"
    assert not bool(jnp.any(stn.overflow))
    np.testing.assert_allclose(np.asarray(thn.pe), np.asarray(th1.pe),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(thn.temp), np.asarray(th1.temp),
                               rtol=1e-7)
    # ownership stayed a permutation through every migrate
    g = np.sort(np.asarray(stn.gid).reshape(-1))
    np.testing.assert_array_equal(g, np.arange(n))


@pytest.fixture(scope="module")
def anna_scene(anna_pot):
    mcfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float64)
    x_np, box_np = bcc([48, 4, 4])          # 1536 atoms, box_x = 137 A
    rng = np.random.default_rng(4)
    x = jnp.asarray(x_np + rng.normal(scale=0.05, size=x_np.shape))
    box = jnp.asarray(box_np)
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 0.6, 96)
    e_ref, f_ref, w_ref = anna_adp.energy_forces_virial(mcfg, params, x, box,
                                                        nbrs.idx, shift=False)
    return (mcfg, params, x, box, float(e_ref), np.asarray(f_ref),
            np.asarray(w_ref))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_anna_forces_match_single_chip(anna_scene, n_dev):
    """ANNA-ADP 1-vs-N force parity: the two-phase halo recompute replaces
    the reference's 12-field mid-step MPI exchange
    (src/pair_anna_adp_gpu.cpp:135-158)."""
    mcfg, params, x, box, e_ref, f_ref, w_ref = anna_scene
    n = x.shape[0]
    model = AnnaFrameModel(mcfg, params)
    # 11.2 atoms/A of x; rlist = 5.66 A -> bc >= 64 rows -> halo_b = 160
    scfg = ShardConfig(n_devices=n_dev, c_loc=n // n_dev, halo_b=160,
                       capacity=96, cutoff=mcfg.cut, skin=0.6, dt=0.001)
    md = ShardedMD(model, MASS_FE, box, scfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))
    e_tot = float(jnp.sum(st.pe))
    f_sorted = np.asarray(st.f_loc).reshape(n, 3)
    inv = np.argsort(np.asarray(order))
    np.testing.assert_allclose(e_tot, float(e_ref), rtol=1e-10)
    assert np.max(np.abs(f_sorted[inv] - f_ref)) < 1e-9
    # the ANNA frame virial feeds the sharded barostat -- assert it too
    np.testing.assert_allclose(np.asarray(st.virial), w_ref,
                               rtol=1e-8, atol=1e-9)


def test_sharded_anna_fast_frame(anna_scene):
    """The plane-layout ANNA fast path served from the sharded driver
    (AnnaFrameModel(fast=True)): forces/energy/virial match both the
    single-chip reference and the chunked frame path."""
    mcfg, params, x, box, e_ref, f_ref, w_ref = anna_scene
    n = x.shape[0]
    scfg = ShardConfig(n_devices=4, c_loc=n // 4, halo_b=160, capacity=96,
                       cutoff=mcfg.cut, skin=0.6, dt=0.001)
    md = ShardedMD(AnnaFrameModel(mcfg, params, fast=True), MASS_FE, box,
                   scfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))
    e_tot = float(jnp.sum(st.pe))
    inv = np.argsort(np.asarray(order))
    f_g = np.asarray(st.f_loc).reshape(n, 3)[inv]
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(f_g - f_ref)) < 1e-8
    np.testing.assert_allclose(np.asarray(st.virial), w_ref,
                               rtol=1e-7, atol=1e-8)


def test_sharded_anna_md_nvt(anna_scene):
    """Sharded ANNA dynamics run, rebuild in-run, and conserve the NVT
    invariant."""
    mcfg, params, x, box, _, _, _ = anna_scene
    n = x.shape[0]
    model = AnnaFrameModel(mcfg, params)
    scfg = ShardConfig(n_devices=4, c_loc=n // 4, halo_b=160, capacity=96,
                       cutoff=mcfg.cut, skin=0.6, dt=0.001, ensemble="nvt",
                       t_target=50.0, tau_t=0.1, thermo_every=5)
    md = ShardedMD(model, MASS_FE, box, scfg)
    st, order = md.distribute(x)
    st, th = md.run(st, 3)
    assert not bool(jnp.any(st.overflow))
    assert np.all(np.isfinite(np.asarray(th.temp)))
    # ANNA's force deliberately freezes the NN outputs (d2, q2) -- the
    # reference's PINN approximation -- so it is NOT the exact gradient of
    # the energy and the NVT invariant drifts at O(1e-4 eV/atom) per dozen
    # steps (SURVEY.md hard-parts). Assert the drift stays at that scale.
    cons = np.asarray(th.conserved)
    assert abs(cons[-1] - cons[0]) < 1e-3 * n
