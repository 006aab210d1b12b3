"""Multi-chip spatial decomposition: 1-vs-N parity on the virtual CPU mesh.

The acceptance criterion from SURVEY.md section 7.7: same physics on 1 vs N
shards (ghost-exchange correctness), runnable on the CPU backend with
--xla_force_host_platform_device_count.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meng_zhang_tpu.geometry.lattice import bcc
from meng_zhang_tpu.models.annp import make_annp
from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
from meng_zhang_tpu.parallel.domain import ShardConfig, ShardedMD
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
    e_ref, f_ref = pk.energy_forces(x, box, nbrs.idx, nbrs.rev)
    return cfg, params, x, box, pk, float(e_ref), np.asarray(f_ref)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_forces_match_single_chip(scene, n_dev):
    mcfg, params, x, box, pk, e_ref, f_ref = scene
    n = x.shape[0]
    # halo must cover all atoms in a 2*rlist x-slab (~ n * 14.2/68.5 ~ 250)
    scfg = ShardConfig(n_devices=n_dev, c_loc=n // n_dev,
                       halo_b=280, capacity=160,
                       cutoff=6.5, skin=0.6, dt=0.001)
    md = ShardedMD(pk, MASS_FE, box, scfg)
    st, order = md.distribute(x)
    assert not bool(jnp.any(st.overflow))

    e_tot = float(jnp.sum(st.pe))
    f_sorted = np.asarray(st.f_loc).reshape(n, 3)
    inv = np.argsort(np.asarray(order))
    f_global = f_sorted[inv]
    np.testing.assert_allclose(e_tot, e_ref, rtol=1e-10)
    assert np.max(np.abs(f_global - f_ref)) < 1e-9


def test_sharded_md_steps_match_single_chip(scene):
    """A few NVE steps on 4 shards track the single-chip trajectory."""
    mcfg, params, x, box, pk, _, _ = scene
    n = x.shape[0]
    n_dev = 4
    scfg = ShardConfig(n_devices=n_dev, c_loc=n // n_dev,
                       halo_b=280, capacity=160,
                       cutoff=6.5, skin=0.6, dt=0.001)
    md = ShardedMD(pk, MASS_FE, box, scfg)
    v0 = jnp.zeros_like(x)
    st, order = md.distribute(x, v0)
    # fill forces
    run1 = md.make_run(1)
    for _ in range(5):
        st, ke = run1(st)
    x_shard = np.asarray(md.gather_positions(st, order))

    # single-chip reference: same leapfrog from zero velocities
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
