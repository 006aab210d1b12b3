#!/usr/bin/env python3
"""Per-phase TPU profile of the ni (Behler-Parrinello) production path.

The fe profile (scripts/profile_bench.py) is the template; this measures
where the ni step goes so optimization lands on the top item. Phases:

  compact     compact_neighbor_rows (per-STEP in the current ni path --
              the fe path amortizes its short repack over an epoch)
  forward     energy_chunked on the short rows (no grad)
  ef          energy_forces_chunked (autodiff forces, no virial)
  efv         energy_forces_virial_chunked (strained autodiff, the
              production force_fn)
  step_block  one thermo block (thermo_every steps) in the jitted runner
  rebuild     cell build

Run on the TPU: python scripts/profile_ni.py [--cells 40]
Writes artifacts/profile_ni.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")
NI_ANN = "/root/reference/annp-gpu-lammps/ni/ni_annp_potential_2.ann"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    """Host-readback fence (block_until_ready is a no-op under axon)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    return out


def timeit(fn, *args, reps=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=40)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--k-short", type=int, default=32)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from meng_zhang_tpu.geometry.lattice import fcc
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.models.annp import (compact_neighbor_rows,
                                            effective_cutoff, energy_chunked,
                                            energy_forces_chunked,
                                            energy_forces_virial_chunked,
                                            make_annp)
    from meng_zhang_tpu.system.neighbors import (build_neighbors_cell,
                                                 cell_grid_dims)
    from meng_zhang_tpu.units import MASS_NI

    pot = read_ann(NI_ANN)
    mcfg, params = make_annp(pot)
    rc = effective_cutoff(pot)
    x_np, box_np = fcc(args.cells, a=3.52)
    rng = np.random.default_rng(0)
    x_np = x_np + rng.normal(scale=0.05, size=x_np.shape)
    n = len(x_np)
    skin, capacity, k_short, chunk = 0.5, 64, args.k_short, args.chunk
    rlist = rc + skin
    dims = cell_grid_dims(np.asarray(box_np), rlist)
    log(f"scene: {n} atoms fcc-Ni, rc={rc:.3f} rlist={rlist:.2f} "
        f"K={capacity} Ks={k_short} chunk={chunk}")

    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)

    t = {}
    build = jax.jit(lambda xx, bb: build_neighbors_cell(
        xx, bb, rlist, capacity, dims, 48))
    t["rebuild"] = timeit(build, x, box)
    nbrs = build(x, box)
    assert not bool(nbrs.overflow)

    comp = jax.jit(lambda xx, bb, idx: compact_neighbor_rows(
        xx, bb, idx, rc, k_short))
    t["compact"] = timeit(comp, x, box, nbrs.idx)
    idx_s, ovf = comp(x, box, nbrs.idx)
    assert not bool(ovf)

    fwd = jax.jit(lambda xx, bb, idx: energy_chunked(
        mcfg, params, xx, bb, idx, chunk=chunk, shift=False))
    t["forward"] = timeit(fwd, x, box, idx_s)

    ef = jax.jit(lambda xx, bb, idx: energy_forces_chunked(
        mcfg, params, xx, bb, idx, chunk=chunk, shift=False))
    t["ef"] = timeit(ef, x, box, idx_s)

    efv = jax.jit(lambda xx, bb, idx: energy_forces_virial_chunked(
        mcfg, params, xx, bb, idx, chunk=chunk, shift=False))
    t["efv"] = timeit(efv, x, box, idx_s)

    # full production step block
    def force_fn(xx, bb, nb):
        i_s, o = compact_neighbor_rows(xx, bb, nb.idx, rc, k_short)
        e, f, w = energy_forces_virial_chunked(
            mcfg, params, xx, bb, i_s, chunk=chunk, shift=False)
        return jnp.where(o, jnp.nan, e), f, w

    thermo = 5
    cfg = MDConfig(dt=0.001, cutoff=rc, skin=skin, capacity=capacity,
                   nbr_method="cell", cell_dims=dims, cell_capacity=48,
                   ensemble="nvt", t_target=1200.0, tau_t=0.1,
                   thermo_every=thermo, stale_factor=0.5)
    sim = Simulator(force_fn, jnp.full(n, MASS_NI, jnp.float32), cfg)
    st = sim.init_state(x, box, seed=1, t_init=600.0)
    st, th = sim.run(st, 2)
    float(th.temp[-1])
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        st, th = sim.run(st, 1)
    float(th.temp[-1])
    t["step_block"] = (time.time() - t0) / reps
    step = t["step_block"] / thermo

    out = {
        "scene": f"fcc-Ni {n} atoms, rc={rc:.3f}, K={capacity}, "
                 f"Ks={k_short}, chunk={chunk}",
        "times_s": {k: round(v, 6) for k, v in t.items()},
        "share_of_step": {k: round(v / step, 4) for k, v in t.items()},
        "atom_steps_per_s_step": round(n / step, 1),
        "device": str(jax.devices()[0]),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "profile_ni.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
