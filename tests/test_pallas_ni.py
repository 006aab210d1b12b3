"""Parity tests for the fused Behler-Parrinello (ni) Pallas kernels.

On CPU the kernels run in Pallas interpreter mode -- the same math as the
TPU kernels modulo Mosaic lowering. Parity chain: PallasNi (hand-VJP
forces, transposed [Ks, 128] layout) vs the autodiff vmap model
(models/annp.py) vs the hand-derivative numpy oracle
(tests/oracle_numpy.py, a transcription of ni/src/pair_annp.cpp:686-766).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import perturbed_fcc
from meng_zhang_tpu.models.annp import (NI_HARTREE_EV, energy_forces,
                                        energy_forces_virial, make_annp)
from meng_zhang_tpu.ops.pallas_ni import PallasNi
from meng_zhang_tpu.system.neighbors import build_neighbors_n2
import oracle_numpy


@pytest.fixture(scope="module")
def setup(ni_pot):
    cfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x, box = perturbed_fcc(n_cells=3)          # 108 atoms, box > 2*rc_a
    pk = PallasNi(cfg, params)
    nbrs = build_neighbors_n2(jnp.asarray(x), jnp.asarray(box),
                              pk.rc + 0.5, 64, with_rev=True)
    assert not bool(nbrs.overflow)
    return cfg, params, jnp.asarray(x), jnp.asarray(box), nbrs, pk


def test_ni_pallas_forces_vs_oracle(ni_pot, setup):
    cfg, params, x, box, nbrs, pk = setup
    e_ref_ha, f_ref, eat_ref = oracle_numpy.annp_ni_energy_forces(
        ni_pot, np.asarray(x), np.asarray(box))
    e_p, f_p = pk.energy_forces(x, box, nbrs.idx, nbrs.rev)
    np.testing.assert_allclose(float(e_p), e_ref_ha * NI_HARTREE_EV,
                               rtol=1e-10)
    assert np.max(np.abs(np.asarray(f_p) - f_ref)) < 1e-6


def test_ni_pallas_forces_vs_autodiff(setup):
    """Hand VJP == jax.grad of the vmap energy (tight f64 agreement)."""
    cfg, params, x, box, nbrs, pk = setup
    e_x, f_x = energy_forces(cfg, params, x, box, nbrs.idx)
    e_p, f_p = pk.energy_forces(x, box, nbrs.idx, nbrs.rev)
    np.testing.assert_allclose(float(e_p), float(e_x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x),
                               rtol=1e-8, atol=1e-10)


def test_ni_pallas_virial_vs_strain(setup):
    """Pairwise dx (x) Fj tally == the strain-derivative virial."""
    cfg, params, x, box, nbrs, pk = setup
    _, _, w_x = energy_forces_virial(cfg, params, x, box, nbrs.idx)
    _, _, w_p = pk.energy_forces(x, box, nbrs.idx, nbrs.rev,
                                 want_virial=True)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x),
                               rtol=1e-8, atol=1e-9)


def test_ni_pallas_momentum_conservation(setup):
    cfg, params, x, box, nbrs, pk = setup
    _, f = pk.energy_forces(x, box, nbrs.idx, nbrs.rev)
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), np.zeros(3),
                               atol=1e-10)


def test_ni_shortlist_epoch_drift(setup):
    """A ShortList built at x stays exact for drift < short_delta/2: pairs
    outside rc + delta cannot have entered rc, and kept entries beyond rc
    evaluate to zero through the fc masks."""
    cfg, params, x, box, nbrs, pk = setup
    sl = pk.compact_short(x, box, nbrs.idx, nbrs.rev)
    rng = np.random.default_rng(7)
    dx = rng.uniform(-1, 1, size=x.shape)
    dx *= 0.4 * pk.short_delta / 2 / np.abs(dx).max()
    x2 = x + jnp.asarray(dx)
    e_sl, f_sl = pk.energy_forces_short(x2, box, sl)
    # fresh reference at the displaced positions (new list, new compaction)
    nbrs2 = build_neighbors_n2(x2, box, pk.rc + 0.5, 64, with_rev=True)
    e_ref, f_ref = pk.energy_forces(x2, box, nbrs2.idx, nbrs2.rev)
    np.testing.assert_allclose(float(e_sl), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_sl), np.asarray(f_ref),
                               rtol=1e-9, atol=1e-10)


def test_ni_per_atom_tallies(setup):
    """ni per-atom energy/stress tallies: eatom matches the independent
    per-atom energies and both tallies sum to the global PE / virial."""
    from meng_zhang_tpu.models.annp import atom_energies
    cfg, params, x, box, nbrs, pk = setup
    n = x.shape[0]
    sl = pk.compact_short(x, box, nbrs.idx, None)
    assert not bool(sl.overflow)
    e, f, w, eat, vat = pk.energy_forces_short(x, box, sl, want_virial=True,
                                               per_atom=True)
    np.testing.assert_allclose(float(jnp.sum(eat)), float(e), rtol=1e-12)
    eat_ref = atom_energies(cfg, params, x, box, nbrs.idx)
    np.testing.assert_allclose(np.asarray(eat), np.asarray(eat_ref),
                               rtol=1e-8, atol=1e-10)
    vsum = np.asarray(jnp.sum(vat, axis=0))
    wr = np.asarray(w)
    ref6 = np.array([wr[0, 0], wr[1, 1], wr[2, 2],
                     wr[0, 1], wr[0, 2], wr[1, 2]])
    np.testing.assert_allclose(vsum, ref6, rtol=1e-6,
                               atol=1e-6 * max(np.abs(ref6).max(), 1e-30))


def test_ni_pallas_f32(ni_pot, setup):
    """TPU dtype: f32 forces within ~2e-3 eV/A of the f64 path."""
    cfg64, params64, x, box, nbrs, pk64 = setup
    cfg, params = make_annp(ni_pot, dtype=jnp.float32)
    pk = PallasNi(cfg, params)
    _, f64 = pk64.energy_forces(x, box, nbrs.idx, nbrs.rev)
    _, f32 = pk.energy_forces(x.astype(jnp.float32),
                              box.astype(jnp.float32), nbrs.idx, nbrs.rev)
    assert np.max(np.abs(np.asarray(f32) - np.asarray(f64))) < 2e-3
