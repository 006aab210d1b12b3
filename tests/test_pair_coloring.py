"""Symmetric pair-lane coloring + column-sorted delivery (ops/pair_coloring,
PallasAnnp.compact_short_colored / _assemble_colored).

Ground truth is the banded short path (itself tested against the full
evaluation and the f64 oracle in test_pallas_annp.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meng_zhang_tpu.geometry.lattice import bcc
from meng_zhang_tpu.io.potential import read_ann
from meng_zhang_tpu.models.annp import make_annp
from meng_zhang_tpu.ops.pair_coloring import A_BCC_FE, build_coloring
from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
from meng_zhang_tpu.system.neighbors import build_neighbors_n2

FE_ANN = "/root/reference/annp-gpu-lammps/fe/fe_annp_potential_2.ann"


@pytest.fixture(scope="module")
def fe_pot():
    pot = read_ann(FE_ANN)
    return make_annp(pot)


def _scene(cells, jitter=0.05, seed=0, pbc=(True, True, True)):
    x_np, box_np = bcc(cells)
    rng = np.random.default_rng(seed)
    x_np = x_np + rng.normal(scale=jitter, size=x_np.shape)
    return (jnp.asarray(x_np, jnp.float32), jnp.asarray(box_np, jnp.float32),
            pbc)


def test_build_coloring_palette():
    # 16 half-cells per dim (== 0 mod 8): every class 2-colors -> exactly
    # the max-degree palette of the shells-1..4 graph
    x, box, pbc = _scene([8, 8, 8])
    spec = build_coloring(pbc, np.asarray(box))
    assert spec.n_colors == 112
    # 12 half-cells (== 4 mod 8): only the pure-axis |o|=4 classes hit the
    # odd-cycle obstruction (15 chain steps around the box) and pay s=3
    x, box, _ = _scene([6, 6, 6])
    spec = build_coloring((True, True, True), np.asarray(box))
    assert spec.n_colors == 2 * 53 + 3 * 3
    # the benchmark's boundary (m p m): only y periodic
    spec = build_coloring((False, True, False), np.asarray(box))
    assert spec.n_colors == 2 * 55 + 3


@pytest.mark.parametrize("pbc", [(True, True, True), (False, True, False)])
def test_colored_matches_banded(fe_pot, pbc):
    mcfg, params = fe_pot
    cells = [8, 8, 8] if all(pbc) else [6, 6, 6]
    x, box, _ = _scene(cells, jitter=0.06, pbc=pbc)
    n = x.shape[0]
    spec = build_coloring(pbc, np.asarray(box))
    mcfg_p = mcfg._replace(pbc=pbc) if hasattr(mcfg, "_replace") else mcfg
    pk = PallasAnnp(mcfg_p, params, k_short=128, short_delta=0.4,
                    coloring=spec)
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 1.2, 192, with_rev=True,
                              pbc=pbc)
    assert not bool(nbrs.overflow)

    slb = pk.compact_short(x, box, nbrs.idx, nbrs.rev)
    slc = pk.compact_short_colored(x, box, nbrs.idx)
    assert not bool(slb.overflow)
    assert not bool(slc.color_bad), "clean 300K-like scene must color"
    assert float(slc.guard) > 0.05

    # the colored rows hold the same pair sets as the banded rows, minus
    # dropped off-table (5th-shell) pairs -- none at this jitter... allow a
    # few and check subset
    sb = np.asarray(slb.sidx)
    sc = np.asarray(slc.sidx)
    for row in range(0, n, max(1, n // 37)):
        bset = set(sb[row][sb[row] < n].tolist())
        cset = set(sc[row][sc[row] < n].tolist())
        assert cset <= bset
        assert len(bset - cset) <= 10

    # the delivery keys are a per-column permutation
    skey = np.asarray(slc.skey)
    p = skey.shape[0]
    for c in range(0, skey.shape[1], 17):
        assert np.array_equal(np.sort(skey[:, c]), np.arange(p))

    eb, fb, wb = pk.energy_forces_short(x, box, slb, want_virial=True)
    ec, fc, wc = pk.energy_forces_short(x, box, slc, want_virial=True)
    assert np.isfinite(float(ec))
    assert abs(float(eb) - float(ec)) < 5e-3 * n ** 0.5
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fb),
                               atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(wc), np.asarray(wb),
                               rtol=2e-4, atol=2e-2)


def test_colored_handles_defect(fe_pot):
    """An off-lattice interstitial's pairs ride the residual lanes: the
    colored delivery must still match the banded path exactly (or refuse
    via color_bad) -- never deliver silently wrong."""
    mcfg, params = fe_pot
    x, box, pbc = _scene([8, 8, 8], jitter=0.03)
    # shove one atom far off-lattice, halfway to a neighbor
    x = x.at[17].add(jnp.asarray([1.05, 0.7, 0.35], x.dtype))
    spec = build_coloring(pbc, np.asarray(box))
    pk = PallasAnnp(mcfg, params, k_short=128, short_delta=0.4, coloring=spec)
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 1.2, 192, with_rev=True,
                              pbc=pbc)
    slc = pk.compact_short_colored(x, box, nbrs.idx)
    if bool(slc.color_bad):
        return      # refusing is always legal
    slb = pk.compact_short(x, box, nbrs.idx, nbrs.rev)
    eb, fb = pk.energy_forces_short(x, box, slb)
    ec, fc = pk.energy_forces_short(x, box, slc)
    assert np.isfinite(float(ec))
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fb),
                               atol=3e-4, rtol=0)


def test_ambiguous_round_demotes_not_dups(fe_pot):
    """An atom parked near a half-grid offset (the q-misround boundary that
    produced the BENCH_r04 `dup` fallbacks) must be demoted to the residual
    lanes, not tripped as color_bad -- and the delivery must stay exact."""
    mcfg, params = fe_pot
    x, box, pbc = _scene([8, 8, 8], jitter=0.02)
    # h = a/2 = 1.4276; pull atom 40 and its +x second-shell neighbor
    # (lattice offset (a, 0, 0)) toward each other by 0.32 A each: THEIR
    # pair lands at |frac(dx/h)| ~ 0.45 on the x axis (the misround
    # boundary), while each atom's other pairs shift by only ~0.22 -- the
    # deterministic construction of the thermal two-atom tail event
    d = x - x[40]
    d = d - box * jnp.round(d / box)
    j = int(jnp.argmin(jnp.sum((d - jnp.asarray([A_BCC_FE, 0.0, 0.0],
                                                x.dtype)) ** 2, axis=1)))
    x = x.at[40, 0].add(jnp.asarray(0.32, x.dtype))
    x = x.at[j, 0].add(jnp.asarray(-0.32, x.dtype))
    spec = build_coloring(pbc, np.asarray(box))
    pk = PallasAnnp(mcfg, params, k_short=128, short_delta=0.4, coloring=spec)
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 1.2, 192, with_rev=True,
                              pbc=pbc)
    slc = pk.compact_short_colored(x, box, nbrs.idx)
    assert not bool(slc.color_bad), \
        f"ambiguous pairs must demote, diag={int(slc.diag)}"
    slb = pk.compact_short(x, box, nbrs.idx, nbrs.rev)
    eb, fb = pk.energy_forces_short(x, box, slb)
    ec, fc = pk.energy_forces_short(x, box, slc)
    assert np.isfinite(float(ec))
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fb),
                               atol=3e-4, rtol=0)


def test_residual_trim_guard(fe_pot):
    """res_delta trims far non-palette pairs (zero-force annulus) and the
    guard honestly reports the tightened drift bound."""
    mcfg, params = fe_pot
    x, box, pbc = _scene([8, 8, 8], jitter=0.06)
    spec = build_coloring(pbc, np.asarray(box))
    pk_wide = PallasAnnp(mcfg, params, k_short=128, short_delta=0.4,
                         coloring=spec, res_delta=0.4)
    pk_trim = PallasAnnp(mcfg, params, k_short=128, short_delta=0.4,
                         coloring=spec, res_delta=0.2)
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 1.2, 192, with_rev=True,
                              pbc=pbc)
    sl_w = pk_wide.compact_short_colored(x, box, nbrs.idx)
    sl_t = pk_trim.compact_short_colored(x, box, nbrs.idx)
    assert abs(float(sl_w.guard) - 0.2) < 1e-6
    assert abs(float(sl_t.guard) - 0.1) < 1e-6
    # trimming strictly reduces the residual population...
    res_w = int((np.asarray(sl_w.sidx)[:, spec.n_colors:]
                 < x.shape[0]).sum())
    res_t = int((np.asarray(sl_t.sidx)[:, spec.n_colors:]
                 < x.shape[0]).sum())
    assert res_t < res_w
    # ...without touching the forces (the annulus carries zero force)
    _, f_w = pk_wide.energy_forces_short(x, box, sl_w)
    _, f_t = pk_trim.energy_forces_short(x, box, sl_t)
    np.testing.assert_allclose(np.asarray(f_t), np.asarray(f_w),
                               atol=1e-5, rtol=0)


def test_badperm_poisons(fe_pot):
    """A corrupted skey (non-permutation column) must poison the forces."""
    mcfg, params = fe_pot
    x, box, pbc = _scene([8, 8, 8], jitter=0.02)
    spec = build_coloring(pbc, np.asarray(box))
    pk = PallasAnnp(mcfg, params, k_short=128, short_delta=0.4, coloring=spec)
    nbrs = build_neighbors_n2(x, box, mcfg.cut + 1.2, 192, with_rev=True,
                              pbc=pbc)
    slc = pk.compact_short_colored(x, box, nbrs.idx)
    bad = slc._replace(skey=slc.skey.at[3, 5].set(slc.skey[4, 5]))
    e, f = pk.energy_forces_short(x, box, bad)
    assert not np.isfinite(float(e))


def test_simulator_colored_matches_banded(fe_pot):
    """30 NVE steps: the host-refresh colored driver must track the in-scan
    banded driver (delivery is exact; only f32 summation order differs)."""
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator

    mcfg, params = fe_pot
    x, box, pbc = _scene([8, 8, 8], jitter=0.04)
    n = x.shape[0]
    spec = build_coloring(pbc, np.asarray(box))
    pk = PallasAnnp(mcfg, params, k_short=128, short_delta=0.4, coloring=spec)
    masses = jnp.full(n, 55.845, jnp.float32)

    def force_fn(xx, bb, nbrs, short):
        return pk.energy_forces_short(xx, bb, short, want_virial=True,
                                      shift=False)

    def banded(xx, bb, nbrs):
        return pk.compact_short(xx, bb, nbrs.idx, nbrs.rev)

    def colored(xx, bb, nbrs):
        return pk.compact_short_colored(xx, bb, nbrs.idx)

    base = dict(dt=0.001, cutoff=mcfg.cut, skin=1.2, capacity=192,
                nbr_method="n2", ensemble="nve", thermo_every=10,
                with_rev=True, pbc=pbc, short_every=10,
                short_skin=pk.short_delta)
    runs = {}
    for mode in ("banded", "colored"):
        cfg = MDConfig(**base, short_host_refresh=(mode == "colored"))
        sim = Simulator(force_fn, masses, cfg, short_build=banded,
                        short_build_colored=(colored if mode == "colored"
                                             else None))
        st = sim.init_state(x, box, seed=7, t_init=120.0)
        st, th = sim.run(st, 3)
        assert not bool(st.overflow) and not bool(st.unsafe)
        assert np.isfinite(float(th.pe[-1]))
        runs[mode] = th
        if mode == "colored":
            assert sim.colored_blocks == 3 and sim.banded_blocks == 0

    pe_b = np.asarray(runs["banded"].pe)
    pe_c = np.asarray(runs["colored"].pe)
    t_b = np.asarray(runs["banded"].temp)
    t_c = np.asarray(runs["colored"].temp)
    assert np.max(np.abs(pe_b - pe_c)) < 5e-3 * n ** 0.5
    assert np.max(np.abs(t_b - t_c)) < 0.05
