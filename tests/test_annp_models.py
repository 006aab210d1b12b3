"""Parity + derivative tests for the ANNP JAX models.

Three-way agreement is required (the reference's own validation model,
SURVEY.md section 4, rebuilt as an automated pyramid):
  1. JAX model vs the hand-derivative numpy oracle (reference CPU math).
  2. Forces vs finite differences of the JAX energy.
  3. Virial vs finite differences w.r.t. a box strain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import perturbed_bcc, perturbed_fcc
from meng_zhang_tpu.models.annp import (atom_energies, energy, energy_forces,
                                        energy_forces_virial, make_annp)
from meng_zhang_tpu.system.neighbors import build_neighbors_n2
import oracle_numpy


@pytest.fixture(scope="module")
def fe_setup(fe_pot):
    cfg, params = make_annp(fe_pot, dtype=jnp.float64)
    x, box = perturbed_bcc(n_cells=2)
    nbrs = build_neighbors_n2(jnp.asarray(x), jnp.asarray(box), cfg.cut, 64)
    assert not bool(nbrs.overflow)
    return cfg, params, jnp.asarray(x), jnp.asarray(box), nbrs


def test_fe_energy_forces_vs_oracle(fe_pot, fe_setup):
    cfg, params, x, box, nbrs = fe_setup
    e_ref, f_ref, eat_ref = oracle_numpy.annp_fe_energy_forces(
        fe_pot, np.asarray(x), np.asarray(box))
    e, f = energy_forces(cfg, params, x, box, nbrs.idx)
    eat = atom_energies(cfg, params, x, box, nbrs.idx)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(eat), eat_ref, rtol=1e-10)
    # the headline parity bar: < 1e-6 eV/A
    assert np.max(np.abs(np.asarray(f) - f_ref)) < 1e-6


def test_fe_forces_vs_finite_difference(fe_setup):
    cfg, params, x, box, nbrs = fe_setup
    _, f = energy_forces(cfg, params, x, box, nbrs.idx)
    # drop the -4479 eV/atom constant shift: same gradient, far less
    # cancellation noise in the finite difference
    import dataclasses
    cfg0 = dataclasses.replace(cfg, e_shift=0.0)
    e_fn = jax.jit(lambda xx: energy(cfg0, params, xx, box, nbrs.idx))
    h = 1e-5
    rng = np.random.default_rng(1)
    for _ in range(4):
        i = int(rng.integers(x.shape[0]))
        d = int(rng.integers(3))
        f_fd = -(e_fn(x.at[i, d].add(h)) - e_fn(x.at[i, d].add(-h))) / (2 * h)
        np.testing.assert_allclose(float(f[i, d]), float(f_fd), rtol=5e-5, atol=1e-8)


def test_fe_virial_vs_strain_fd(fe_setup):
    cfg, params, x, box, nbrs = fe_setup
    e, f, w = energy_forces_virial(cfg, params, x, box, nbrs.idx)

    e_of_scale = jax.jit(lambda s: energy(cfg, params, x * s, box * s, nbrs.idx))
    h = 1e-6
    tr_fd = -(e_of_scale(1.0 + h) - e_of_scale(1.0 - h)) / (2 * h)
    # d E(s)/ds at s=1 equals sum of strain derivative trace
    np.testing.assert_allclose(float(jnp.trace(w)), float(tr_fd), rtol=1e-5)


def test_fe_translation_invariance(fe_setup):
    cfg, params, x, box, nbrs = fe_setup
    e0 = energy(cfg, params, x, box, nbrs.idx)
    e1 = energy(cfg, params, x + jnp.asarray([1.3, -0.7, 2.1]), box, nbrs.idx)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-12)
    _, f = energy_forces(cfg, params, x, box, nbrs.idx)
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), np.zeros(3),
                               atol=1e-9)


def test_ni_energy_forces_vs_oracle(ni_pot):
    cfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x, box = perturbed_fcc(n_cells=2)
    nbrs = build_neighbors_n2(jnp.asarray(x), jnp.asarray(box), cfg.cut, 96)
    assert not bool(nbrs.overflow)
    e_ref_ha, f_ref, eat_ref = oracle_numpy.annp_ni_energy_forces(
        ni_pot, x, box)
    e, f = energy_forces(cfg, params, jnp.asarray(x), jnp.asarray(box), nbrs.idx)
    from meng_zhang_tpu.models.annp import NI_HARTREE_EV
    np.testing.assert_allclose(float(e), e_ref_ha * NI_HARTREE_EV, rtol=1e-10)
    assert np.max(np.abs(np.asarray(f) - f_ref)) < 1e-6


def test_ni_forces_vs_finite_difference(ni_pot):
    cfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x, box = perturbed_fcc(n_cells=2, seed=3)
    xj, bj = jnp.asarray(x), jnp.asarray(box)
    nbrs = build_neighbors_n2(xj, bj, cfg.cut, 96)
    _, f = energy_forces(cfg, params, xj, bj, nbrs.idx)
    e_fn = jax.jit(lambda xx: energy(cfg, params, xx, bj, nbrs.idx))
    h = 1e-5
    for (i, d) in [(0, 0), (5, 2), (17, 1)]:
        f_fd = -(e_fn(xj.at[i, d].add(h)) - e_fn(xj.at[i, d].add(-h))) / (2 * h)
        np.testing.assert_allclose(float(f[i, d]), float(f_fd), rtol=5e-5, atol=1e-8)


def test_fe_f32_accuracy(fe_pot, fe_setup):
    """The TPU dtype must stay within ~1e-3 eV/A of the f64 oracle forces."""
    cfg64, _, x, box, nbrs = fe_setup
    cfg, params = make_annp(fe_pot, dtype=jnp.float32)
    e32, f32 = energy_forces(cfg, params, x.astype(jnp.float32),
                             box.astype(jnp.float32), nbrs.idx)
    _, f64 = energy_forces(cfg64, _params64(fe_pot), x, box, nbrs.idx)
    assert np.max(np.abs(np.asarray(f32) - np.asarray(f64))) < 2e-3


def _params64(pot):
    from meng_zhang_tpu.models.annp import make_annp as mk
    return mk(pot, dtype=jnp.float64)[1]


def test_energy_chunked_matches_vmap(fe_pot, fe_setup):
    from meng_zhang_tpu.models.annp import energy_chunked, energy_forces_chunked
    cfg, params, x, box, nbrs = fe_setup
    e_ref = energy(cfg, params, x, box, nbrs.idx)
    for chunk in (4, 16):
        e_c = energy_chunked(cfg, params, x, box, nbrs.idx, chunk=chunk)
        np.testing.assert_allclose(float(e_c), float(e_ref), rtol=1e-12)
    _, f_ref = energy_forces(cfg, params, x, box, nbrs.idx)
    _, f_c = energy_forces_chunked(cfg, params, x, box, nbrs.idx, chunk=16)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref), atol=1e-10)


def test_chunked_virial_matches_vmap(fe_pot, fe_setup):
    """The strain-derivative virial of the chunked path (the one NPT uses at
    production sizes) must match the vmap path's virial exactly."""
    from meng_zhang_tpu.models.annp import energy_forces_virial_chunked
    cfg, params, x, box, nbrs = fe_setup
    e_ref, f_ref, w_ref = energy_forces_virial(cfg, params, x, box, nbrs.idx)
    e_c, f_c, w_c = energy_forces_virial_chunked(cfg, params, x, box,
                                                 nbrs.idx, chunk=16)
    np.testing.assert_allclose(float(e_c), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_ref),
                               rtol=1e-9, atol=1e-10)
    # shift-free output + offset reconstructs the same total
    e_s, _, _ = energy_forces_virial_chunked(cfg, params, x, box, nbrs.idx,
                                             chunk=16, shift=False)
    np.testing.assert_allclose(float(e_s) + x.shape[0] * cfg.e_shift,
                               float(e_ref), rtol=1e-12)


def test_ni_chunked_virial_matches_vmap(ni_pot):
    """ni NPT at scale rides the chunked strain virial (VERDICT round-1 item:
    the vmap+virial path OOMs beyond ~1k atoms, run.py used to return a zero
    virial for chunked ni)."""
    from meng_zhang_tpu.models.annp import energy_forces_virial_chunked
    cfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x, box = perturbed_fcc(n_cells=2, seed=5)
    xj, bj = jnp.asarray(x), jnp.asarray(box)
    nbrs = build_neighbors_n2(xj, bj, cfg.cut, 96)
    e_ref, f_ref, w_ref = energy_forces_virial(cfg, params, xj, bj, nbrs.idx)
    e_c, f_c, w_c = energy_forces_virial_chunked(cfg, params, xj, bj,
                                                 nbrs.idx, chunk=16)
    np.testing.assert_allclose(float(e_c), float(e_ref), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_ref),
                               rtol=1e-8, atol=1e-9)


def test_compact_neighbor_rows_exact(fe_pot, fe_setup):
    """Per-eval short-neighbor repack preserves energy/forces/virial exactly
    (in-cutoff membership is exact at the eval positions; fc -> 0 at rc)."""
    from meng_zhang_tpu.models.annp import (compact_neighbor_rows,
                                            energy_forces_virial_chunked)
    cfg, params, x, box, nbrs = fe_setup
    # skin-padded list (rlist > rc), as production runs carry
    nb2 = build_neighbors_n2(x, box, cfg.cut + 1.2, 96)
    idx_s, ovf = compact_neighbor_rows(x, box, nb2.idx, cfg.cut, 64,
                                       cfg.pbc, row_chunk=32)
    assert not bool(ovf)
    e_ref, f_ref, w_ref = energy_forces_virial_chunked(cfg, params, x, box,
                                                       nb2.idx, chunk=16)
    e_s, f_s, w_s = energy_forces_virial_chunked(cfg, params, x, box,
                                                 idx_s, chunk=16)
    np.testing.assert_allclose(float(e_s), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_ref),
                               rtol=1e-10, atol=1e-10)
    # width-2 compaction must flag overflow
    _, ovf2 = compact_neighbor_rows(x, box, nb2.idx, cfg.cut, 2, cfg.pbc,
                                    row_chunk=32)
    assert bool(ovf2)


def test_ni_energy_chunked_matches_vmap(ni_pot):
    """The [C,K]-layout Behler path must match the vmap oracle path."""
    from meng_zhang_tpu.models.annp import energy_chunked, energy_forces_chunked
    cfg, params = make_annp(ni_pot, dtype=jnp.float64)
    x, box = perturbed_fcc(n_cells=2, seed=9)
    xj, bj = jnp.asarray(x), jnp.asarray(box)
    nbrs = build_neighbors_n2(xj, bj, cfg.cut, 96)
    e_ref = energy(cfg, params, xj, bj, nbrs.idx)
    for chunk in (8, 32):
        e_c = energy_chunked(cfg, params, xj, bj, nbrs.idx, chunk=chunk)
        np.testing.assert_allclose(float(e_c), float(e_ref), rtol=1e-11)
    _, f_ref = energy_forces(cfg, params, xj, bj, nbrs.idx)
    _, f_c = energy_forces_chunked(cfg, params, xj, bj, nbrs.idx, chunk=16)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref), atol=1e-9)


def test_multielement_chunked_matches_vmap(fe_pot):
    """Synthetic 2-element potential (two distinct networks, shared
    normalization -- the .ann header's layout): the chunked [C,K] paths
    select each atom's element network instead of dropping to the vmap
    oracle path, including the strained (virial) evaluation (VERDICT
    round-3 item 7; reference map/type dispatch
    fe/src/pair_annp.cpp:252-297)."""
    from meng_zhang_tpu.models.annp import (energy_chunked,
                                            energy_forces_virial_chunked)
    cfg, params = make_annp(fe_pot, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    params2 = dict(params)
    params2["w"] = tuple(
        jnp.concatenate([wl, wl * (1.0 + 0.1 * jnp.asarray(
            rng.uniform(-1, 1, wl.shape)))]) for wl in params["w"])
    params2["b"] = tuple(
        jnp.concatenate([bl, bl + 0.05 * jnp.asarray(
            rng.uniform(-1, 1, bl.shape))]) for bl in params["b"])
    x, box = perturbed_bcc(n_cells=2)
    x, box = jnp.asarray(x), jnp.asarray(box)
    n = x.shape[0]
    elems = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    nbrs = build_neighbors_n2(x, box, cfg.cut, 64)
    e_ref, f_ref, w_ref = energy_forces_virial(cfg, params2, x, box,
                                               nbrs.idx, elems)
    e_c = energy_chunked(cfg, params2, x, box, nbrs.idx, elems, chunk=8)
    np.testing.assert_allclose(float(e_c), float(e_ref), rtol=1e-12)
    e2, f2, w2 = energy_forces_virial_chunked(cfg, params2, x, box,
                                              nbrs.idx, elems, chunk=8)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                               rtol=1e-9, atol=1e-11)
    # the two element networks genuinely differ on this scene
    e_all0 = energy_chunked(cfg, params2, x, box, nbrs.idx,
                            jnp.zeros(n, jnp.int32), chunk=8)
    assert abs(float(e_all0) - float(e_c)) > 0.05
