"""ANNA-ADP parity tests: JAX model vs the reference-math numpy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import perturbed_bcc
from meng_zhang_tpu.models.anna_adp import (atom_energies, energy_forces,
                                            energy_forces_autodiff,
                                            energy_forces_virial, local_params,
                                            make_anna)
from meng_zhang_tpu.system.neighbors import build_neighbors_n2
import oracle_numpy


@pytest.fixture(scope="module")
def setup(anna_pot):
    cfg, params = make_anna(anna_pot, dtype=jnp.float64)
    x, box = perturbed_bcc(n_cells=2, disp=0.08, seed=7)
    nbrs = build_neighbors_n2(jnp.asarray(x), jnp.asarray(box), cfg.cut, 64)
    assert not bool(nbrs.overflow)
    return cfg, params, jnp.asarray(x), jnp.asarray(box), nbrs


def test_local_params_vs_oracle(anna_pot, setup):
    cfg, params, x, box, nbrs = setup
    _, _, _, lp_ref = oracle_numpy.anna_adp_energy_forces(
        anna_pot, np.asarray(x), np.asarray(box))
    lp = local_params(cfg, params, x, box, nbrs.idx)
    np.testing.assert_allclose(np.asarray(lp), lp_ref, rtol=1e-10)


def test_energy_vs_oracle(anna_pot, setup):
    cfg, params, x, box, nbrs = setup
    e_ref, _, eat_ref, _ = oracle_numpy.anna_adp_energy_forces(
        anna_pot, np.asarray(x), np.asarray(box))
    eat = atom_energies(cfg, params, x, box, nbrs.idx)
    np.testing.assert_allclose(np.asarray(eat), eat_ref, rtol=1e-10)


def test_forces_vs_oracle(anna_pot, setup):
    cfg, params, x, box, nbrs = setup
    _, f_ref, _, _ = oracle_numpy.anna_adp_energy_forces(
        anna_pot, np.asarray(x), np.asarray(box))
    _, f = energy_forces(cfg, params, x, box, nbrs.idx)
    assert np.max(np.abs(np.asarray(f) - f_ref)) < 1e-6


def test_autodiff_matches_hand_forces(setup):
    """The reference's hand-derived pair force is the exact frozen-(d2,q2)
    gradient (its d_rho gamma-terms differ algebraically from the true
    derivative by a step-function factor, but e^{-gamma(r-r0)} ~ 1e-11
    suppresses them below double precision)."""
    cfg, params, x, box, nbrs = setup
    _, f_ref = energy_forces(cfg, params, x, box, nbrs.idx)
    _, f_ad = energy_forces_autodiff(cfg, params, x, box, nbrs.idx)
    assert np.max(np.abs(np.asarray(f_ref) - np.asarray(f_ad))) < 1e-10


def test_autodiff_forces_vs_fd(setup):
    """The autodiff variant must be the exact gradient of the frozen-lp
    energy."""
    cfg, params, x, box, nbrs = setup
    from meng_zhang_tpu.models.anna_adp import atom_energies_fields
    lp = jax.lax.stop_gradient(local_params(cfg, params, x, box, nbrs.idx))
    e_fn = jax.jit(lambda xx: jnp.sum(
        atom_energies_fields(cfg, params, xx, box, nbrs.idx, lp)[0]))
    _, f = energy_forces_autodiff(cfg, params, x, box, nbrs.idx)
    h = 1e-6
    for (i, d) in [(0, 0), (7, 1), (13, 2)]:
        fd = -(e_fn(x.at[i, d].add(h)) - e_fn(x.at[i, d].add(-h))) / (2 * h)
        np.testing.assert_allclose(float(f[i, d]), float(fd), rtol=5e-5, atol=1e-9)


def test_momentum_conservation(setup):
    cfg, params, x, box, nbrs = setup
    _, f = energy_forces(cfg, params, x, box, nbrs.idx)
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), np.zeros(3),
                               atol=1e-9)


def test_virial_finite(setup):
    cfg, params, x, box, nbrs = setup
    e, f, w = energy_forces_virial(cfg, params, x, box, nbrs.idx)
    assert np.all(np.isfinite(np.asarray(w)))
    np.testing.assert_allclose(np.asarray(w), np.asarray(w).T)


def test_fast_path_matches_reference_layout(setup):
    """The TPU-layout fast path (make_anna_fast_fns: component planes,
    packed field gather) must reproduce the reference-shaped path's
    energy, forces, and virial to f.p. reordering."""
    from meng_zhang_tpu.models.anna_adp import make_anna_fast_fns
    cfg, params, x, box, nbrs = setup
    n = x.shape[0]
    e_ref, f_ref, w_ref = energy_forces_virial(cfg, params, x, box,
                                               nbrs.idx, shift=False)
    force_fn, force_fn_light, short_build = make_anna_fast_fns(
        cfg, params, k_short=64, delta=0.3, chunk=16)
    short = short_build(x, box, nbrs)
    assert not bool(short.overflow)
    e, f, w = force_fn(x, box, nbrs, short)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=1e-8, atol=1e-9)
    e_l, f_l, w_l = force_fn_light(x, box, nbrs, short)
    np.testing.assert_allclose(np.asarray(f_l), np.asarray(f),
                               rtol=1e-12, atol=1e-14)


def test_fast_path_vs_oracle(anna_pot, setup):
    """Fast path vs the numpy oracle directly (headline parity bar)."""
    from meng_zhang_tpu.models.anna_adp import make_anna_fast_fns
    cfg, params, x, box, nbrs = setup
    _, f_ref, _, _ = oracle_numpy.anna_adp_energy_forces(
        anna_pot, np.asarray(x), np.asarray(box))
    force_fn, _, short_build = make_anna_fast_fns(cfg, params, k_short=64,
                                                  delta=0.3, chunk=16)
    short = short_build(x, box, nbrs)
    _, f, _ = force_fn(x, box, nbrs, short)
    assert np.max(np.abs(np.asarray(f) - f_ref)) < 1e-6
