"""2-D (x, y) domain decomposition: 1-vs-N parity on the virtual CPU mesh.

VERDICT round-2 item 5: generalize the sharded driver to a (Dx, Dy) mesh
with two-round staged halo exchange (corners ride the y-round), per-axis
coverage proofs, fe + ni parity. scripts/sharded2d_demo.py records the
>=10k-atom 2x4 evidence run; these tests pin correctness at CI scale.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meng_zhang_tpu.geometry.lattice import FCC_BASIS, bcc, simple_lattice
from meng_zhang_tpu.md.simulation import MDConfig, Simulator, create_velocities
from meng_zhang_tpu.models import anna_adp
from meng_zhang_tpu.models.annp import (effective_cutoff,
                                        energy_forces_virial_chunked,
                                        make_annp)
from meng_zhang_tpu.parallel.domain import AnnaFrameModel, XlaFrameModel
from meng_zhang_tpu.parallel.domain2d import Shard2DConfig, ShardedMD2D
from meng_zhang_tpu.system.neighbors import build_neighbors_n2
from meng_zhang_tpu.units import MASS_FE


@pytest.fixture(scope="module")
def fe_scene(fe_pot):
    """800-atom bcc-Fe cube-ish box: (28.6, 28.6, 11.4) A -- wide enough in
    x AND y for a 2x2 mesh at the full 6.5 A cutoff."""
    mcfg, params = make_annp(fe_pot, dtype=jnp.float64)
    x_np, box_np = bcc([10, 10, 4])
    rng = np.random.default_rng(3)
    x = jnp.asarray(x_np + rng.normal(scale=0.05, size=x_np.shape))
    box = jnp.asarray(box_np)
    nbrs = build_neighbors_n2(x, box, 6.5 + 0.6, 160)
    e_ref, f_ref, w_ref = energy_forces_virial_chunked(
        mcfg, params, x, box, nbrs.idx, chunk=128, shift=False)
    return (mcfg, params, x, box, float(e_ref), np.asarray(f_ref),
            np.asarray(w_ref))


def test_2d_forces_match_single_chip(fe_scene):
    mcfg, params, x, box, e_ref, f_ref, w_ref = fe_scene
    n = x.shape[0]
    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=6.5, skin=0.6, dt=0.001, capacity=160)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=128), MASS_FE, box,
                     cfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow)), np.asarray(st.overflow)
    e_tot = float(jnp.sum(st.pe))          # shift-free, like the reference
    f_g = np.asarray(md.gather_positions(st._replace(x_loc=st.f_loc)))
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(f_g - f_ref)) < 1e-9
    np.testing.assert_allclose(np.asarray(st.virial), w_ref,
                               rtol=1e-8, atol=1e-9)


def test_2d_forces_ni_2x4(ni_pot):
    """fcc-Ni on a 2x4 mesh (the VERDICT acceptance shape): parity with the
    single-chip chunked path, with the dy=4 far-device containment active."""
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([6, 12, 3], 3.52, FCC_BASIS)
    rng = np.random.default_rng(5)
    x = jnp.asarray(x_np + rng.normal(scale=0.04, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)
    nbrs = build_neighbors_n2(x, box, cut + 0.5, 96)
    e_ref, f_ref, w_ref = energy_forces_virial_chunked(
        mcfg, params, x, box, nbrs.idx, chunk=128)
    cfg = Shard2DConfig(n_devices=8, mesh_shape=(2, 4), c_loc=n // 8,
                        cutoff=cut, skin=0.5, dt=0.001, capacity=96)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=128), 58.6934, box,
                     cfg)
    st, order = md.distribute(x)
    assert md.m_contain_y is not None      # dy=4: diagonal guard is live
    assert not bool(jnp.any(st.overflow)), np.asarray(st.overflow)
    e_tot = float(jnp.sum(st.pe))
    f_g = np.asarray(md.gather_positions(st._replace(x_loc=st.f_loc)))
    np.testing.assert_allclose(e_tot, float(e_ref), rtol=1e-10)
    assert np.max(np.abs(f_g - np.asarray(f_ref))) < 1e-9
    np.testing.assert_allclose(np.asarray(st.virial), np.asarray(w_ref),
                               rtol=1e-8, atol=1e-9)


def test_2d_anna_forces(anna_pot):
    """ANNA-ADP two-phase halo recompute on a 2x2 mesh."""
    mcfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float64)
    x_np, box_np = bcc([8, 8, 3])
    rng = np.random.default_rng(6)
    x = jnp.asarray(x_np + rng.normal(scale=0.05, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 0.6, 96)
    e_ref, f_ref, w_ref = anna_adp.energy_forces_virial(
        mcfg, params, x, box, nbrs.idx, shift=False)
    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=mcfg.cut, skin=0.6, dt=0.001, capacity=96)
    md = ShardedMD2D(AnnaFrameModel(mcfg, params), MASS_FE, box, cfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow)), np.asarray(st.overflow)
    e_tot = float(jnp.sum(st.pe))
    f_g = np.asarray(md.gather_positions(st._replace(x_loc=st.f_loc)))
    np.testing.assert_allclose(e_tot, float(e_ref), rtol=1e-10)
    assert np.max(np.abs(f_g - np.asarray(f_ref))) < 1e-9


def test_2d_md_rebuild_and_thermo_parity(ni_pot):
    """Hot 2x2 NVE run with in-run device-local rebuilds tracks the
    single-chip trajectory (the 2-D analogue of the 1-D in-run test)."""
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([8, 8, 3], 3.52, FCC_BASIS)
    rng = np.random.default_rng(7)
    x = jnp.asarray(x_np + rng.normal(scale=0.02, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)
    m_ni = 58.6934
    v0 = create_velocities(jax.random.PRNGKey(4), jnp.full(n, m_ni,
                           jnp.float64), 600.0, jnp.float64)

    def force_fn(xx, bb, nbrs):
        return energy_forces_virial_chunked(mcfg, params, xx, bb, nbrs.idx,
                                            chunk=128, shift=False)

    cfg1 = MDConfig(dt=0.001, cutoff=cut, skin=0.5, capacity=48,
                    nbr_method="n2", ensemble="nve", thermo_every=4)
    sim = Simulator(force_fn, jnp.full(n, m_ni, jnp.float64), cfg1)
    st1 = sim.init_state(x, box, v=v0, seed=1)
    st1, th1 = sim.run(st1, 12)      # 48 steps at 600 K
    assert sim.rebuild_count >= 1

    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=cut, skin=0.5, dt=0.001, capacity=48,
                        thermo_every=4)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=128), m_ni, box, cfg)
    stn, order = md.distribute(x, v0)
    stn, thn = md.run(stn, 12)
    assert md.rebuild_count >= 1
    assert not bool(jnp.any(stn.overflow))
    np.testing.assert_allclose(np.asarray(thn.pe), np.asarray(th1.pe),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(thn.temp), np.asarray(th1.temp),
                               rtol=1e-7)


def test_2d_coverage_proof_trips(fe_scene):
    """An atom teleported into a face band it was never registered to send
    from must trip the sticky coverage proof at rebuild -- ghosts can never
    go missing silently.

    Uses a 3.0 A cutoff: at the full 6.5 A cutoff the w_send window covers
    the whole 14.3 A block on this scene, every atom is a send-set member,
    and no teleport can create a non-member (the proof is vacuously safe
    there -- full frames are shipped)."""
    mcfg, params, x, box, _, _, _ = fe_scene
    n = x.shape[0]
    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=3.0, skin=0.5, dt=0.001, capacity=64)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=128), MASS_FE, box,
                     cfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))
    # teleport a local atom of device (0, 0) that is OUTSIDE the y-hi send
    # set onto that face band
    x_loc = np.asarray(st.x_loc).copy()
    yhi = md.yb_frac[0, 1] * float(box[1])
    ys = x_loc[0, :, 1]
    outside = np.nonzero(ys < yhi - md.w_send - 0.5)[0]
    assert len(outside), "scene must have send-set non-members"
    victim = int(outside[0])
    x_loc[0, victim, 1] = yhi - 0.1
    st = st._replace(x_loc=jnp.asarray(x_loc))
    st = md.rebuild(st)
    assert bool(jnp.any(st.overflow))


def test_2d_pallas_forces_match_single_chip(fe_pot, fe_scene):
    """The Pallas reverse-slot model (AnnpFrameModel) served from the 2-D
    driver: the frame neighbor build emits reverse-slot maps, and the
    sort-involution delivery runs inside each device frame (VERDICT
    round-3 item 6)."""
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.parallel.domain import AnnpFrameModel
    mcfg, params, x, box, e_ref, f_ref, w_ref = fe_scene
    n = x.shape[0]
    pk = PallasAnnp(mcfg, params, k_short=None)
    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=6.5, skin=0.6, dt=0.001, capacity=160)
    md = ShardedMD2D(AnnpFrameModel(pk), MASS_FE, box, cfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))
    pe = float(jnp.sum(st.pe))
    np.testing.assert_allclose(pe, e_ref, rtol=1e-9)
    f = np.asarray(md.gather_positions(st._replace(x_loc=st.f_loc)))
    np.testing.assert_allclose(f, f_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.virial), w_ref, rtol=1e-7,
                               atol=1e-9)


def test_2d_frame_short_forces(fe_pot, fe_scene):
    """The frame short list on the 2-D mesh: the fused fe path at Ks with
    rev-free delivery matches the single-chip reference."""
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.parallel.domain import FrameShortModel
    mcfg, params, x, box, e_ref, f_ref, w_ref = fe_scene
    n = x.shape[0]
    pk = PallasAnnp(mcfg, params, k_short=128, short_delta=0.3)
    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=6.5, skin=0.6, dt=0.001, capacity=160)
    md = ShardedMD2D(FrameShortModel(pk), MASS_FE, box, cfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow)), np.asarray(st.overflow)
    pe = float(jnp.sum(st.pe))
    np.testing.assert_allclose(pe, e_ref, rtol=1e-9)
    f = np.asarray(md.gather_positions(st._replace(x_loc=st.f_loc)))
    np.testing.assert_allclose(f, f_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.virial), w_ref, rtol=1e-7,
                               atol=1e-9)


def test_2d_migrate_unit(fe_scene):
    """Unit coverage of the two-round (x then y) bounded migration on the
    2-D mesh, without the 1200 K integration leg (which runs nightly):
    boundary crossers move to the adjacent device along each axis, payloads
    transport bit-exactly up to one +-L seam patch shift, gid stays a
    permutation, and equal per-device counts are preserved."""
    mcfg, params, x, box, _, _, _ = fe_scene
    n = x.shape[0]
    cfg = Shard2DConfig(n_devices=4, mesh_shape=(2, 2), c_loc=n // 4,
                        cutoff=3.0, skin=0.5, dt=0.001, capacity=64,
                        migrate_b=8)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=128), MASS_FE, box,
                     cfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))

    # push one atom of device (0,0) across its x-hi rectangle boundary and
    # one across its y-hi boundary (each beyond the neighbor's edge atom)
    x_loc = np.asarray(st.x_loc).copy()
    gids = np.asarray(st.gid)
    xb = md.xb_frac[1] * float(box[0])
    yb = md.yb_frac[0, 1] * float(box[1])
    vic_x = int(np.argmax(x_loc[0, :, 0]))
    vic_y = int(np.argmax(x_loc[0, :, 1]))
    assert vic_x != vic_y
    gx, gy = int(gids[0, vic_x]), int(gids[0, vic_y])
    x_loc[0, vic_x, 0] = xb + 1.2
    x_loc[0, vic_y, 1] = yb + 1.2
    st = st._replace(x_loc=jnp.asarray(x_loc))

    def by_gid(stt):
        g = np.asarray(stt.gid).reshape(-1)
        o = np.argsort(g)
        return (g[o], np.asarray(stt.x_loc).reshape(n, 3)[o],
                np.asarray(stt.v_loc).reshape(n, 3)[o])

    g0, x0, v0 = by_gid(st)
    st2 = md.migrate(st)
    g2, x2, v2 = by_gid(st2)
    assert md.migrated >= 2
    np.testing.assert_array_equal(g0, np.arange(n))
    np.testing.assert_array_equal(g2, np.arange(n))
    np.testing.assert_array_equal(v2, v0)
    # transport is bit-exact up to one exact +-L patch shift per axis
    dx = x2 - x0
    for d in range(2):
        shifts = dx[:, d] / float(box[d])
        assert set(np.unique(shifts)) <= {-1.0, 0.0, 1.0}
    np.testing.assert_array_equal(dx[:, 2], 0.0)
    gids2 = np.asarray(st2.gid)
    assert gx in gids2[2], "x-crosser must now live on device (1, 0)"
    assert gy in gids2[1], "y-crosser must now live on device (0, 1)"
    # migrate leaves tables stale by contract; the replanning rebuild and a
    # force refill must both succeed on the new ownership
    st3 = md.refill_forces(md.rebuild(st2))
    assert not bool(jnp.any(st3.overflow))
    assert np.isfinite(float(jnp.sum(st3.pe)))


@pytest.mark.nightly
def test_2d_md_migration_parity(ni_pot):
    """Hot 2-D sharded run (fcc-Ni, 1200 K melt leg) with migrate_b: the
    two-round (x then y) bounded edge-block migration fires in-run, the
    dynamic send plan replans at every rebuild, and the trajectory stays
    exactly on the single-chip track (VERDICT round-3 item 6; the 2-D
    mirror of test_sharded_md_migration_parity).

    Equal-count migration fires on RANK inversions at a boundary, so a
    boundary must land inside an atom layer. With Dx=2 the x count-median
    of a perfect fcc lattice always falls in an inter-layer gap (layers
    per slab = cells_x, an integer); the y-split on a (2, 4) mesh gives
    6.5 y-layers per block -- boundaries mid-layer, where 1200 K motion
    genuinely reorders ownership."""
    from meng_zhang_tpu.models.annp import effective_cutoff
    mcfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x_np, box_np = simple_lattice([13, 13, 4], 3.52, FCC_BASIS)
    rng = np.random.default_rng(11)
    x = jnp.asarray(x_np + rng.normal(scale=0.02, size=x_np.shape))
    box = jnp.asarray(box_np)
    n = x.shape[0]
    cut = effective_cutoff(ni_pot)
    m_ni = 58.6934
    v0 = create_velocities(jax.random.PRNGKey(9),
                           jnp.full(n, m_ni, jnp.float64), 1200.0,
                           jnp.float64)

    def force_fn(xx, bb, nbrs):
        return energy_forces_virial_chunked(mcfg, params, xx, bb, nbrs.idx,
                                            chunk=128, shift=False)

    cfg1 = MDConfig(dt=0.001, cutoff=cut, skin=0.5, capacity=48,
                    nbr_method="n2", ensemble="nve", thermo_every=4)
    sim = Simulator(force_fn, jnp.full(n, m_ni, jnp.float64), cfg1)
    st1 = sim.init_state(x, box, v=v0, seed=1)
    st1, th1 = sim.run(st1, 12)      # 48 steps at 1200 K

    scfg = Shard2DConfig(n_devices=8, mesh_shape=(2, 4), c_loc=n // 8,
                         capacity=48, cutoff=cut, skin=0.5, dt=0.001,
                         thermo_every=4, migrate_b=16)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=128), m_ni, box,
                     scfg)
    stn, order = md.distribute(x, v0)
    stn, thn = md.run(stn, 12)
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
