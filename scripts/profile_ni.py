#!/usr/bin/env python3
"""Per-phase TPU profile of the ni (Behler-Parrinello) production path.

Profiles the fused transposed-block Pallas route (ops/pallas_ni.py, the
model_bench --model ni default since round 4). Phases:

  rebuild     cell-list build at rc + skin
  compact     PallasNi.compact_short (refresh-static ShortList, banded)
  gather      pair_dx_planes on the short rows
  g_kernel    _run_ni_g (forward G2/G4, [Ks, 128] blocks)
  mlp         XLA tiny-MLP forward + hand VJP
  f_kernel    _run_ni_force (hand-VJP per-pair forces)
  assemble    sort-involution delivery
  ef          energy_forces_short (no virial -- the light step)
  efv         energy_forces_short + pairwise virial (thermo step)
  step_block  one thermo block (thermo_every steps) in the jitted runner

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
    from meng_zhang_tpu.models.annp import effective_cutoff, make_annp
    from meng_zhang_tpu.ops.pallas_ni import (PallasNi, _run_ni_g,
                                              _run_ni_force)
    from meng_zhang_tpu.ops.pallas_annp import pair_dx_planes
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
    skin, capacity, k_short = 0.5, 64, args.k_short
    delta = 0.2
    rlist = rc + skin
    dims = cell_grid_dims(np.asarray(box_np), rlist)
    log(f"scene: {n} atoms fcc-Ni, rc={rc:.3f} rlist={rlist:.2f} "
        f"K={capacity} Ks={k_short}")

    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)
    pk = PallasNi(mcfg, params, k_short=k_short, short_delta=delta)

    t = {}
    build = jax.jit(lambda xx, bb: build_neighbors_cell(
        xx, bb, rlist, capacity, dims, 24, with_rev=True))
    t["rebuild"] = timeit(build, x, box)
    nbrs = build(x, box)
    assert not bool(nbrs.overflow)

    comp = jax.jit(lambda xx, bb, idx, rev: pk.compact_short(xx, bb, idx,
                                                             rev))
    t["compact"] = timeit(comp, x, box, nbrs.idx, nbrs.rev)
    sl = comp(x, box, nbrs.idx, nbrs.rev)
    assert not bool(sl.overflow)

    gath = jax.jit(lambda xx, bb, idx: pair_dx_planes(xx, bb, idx,
                                                      pk.pbc))
    t["gather"] = timeit(gath, x, box, sl.sidx)
    dxx, dxy, dxz = gath(x, box, sl.sidx)
    p = -(-dxx.shape[0] // 128) * 128
    trs = [jnp.transpose(jnp.pad(d, ((0, p - d.shape[0]), (0, 0)),
                                 constant_values=2e4))
           for d in (dxx, dxy, dxz)]
    gk = jax.jit(lambda a, b, c: _run_ni_g(a, b, c, pk.cfgn_key))
    t["g_kernel"] = timeit(gk, *trs)
    g_t = gk(*trs)
    mlpf = jax.jit(lambda gt: pk._mlp_eat_dedg(jnp.transpose(gt)))
    t["mlp"] = timeit(mlpf, g_t)
    _, dedg = mlpf(g_t)
    dedg_t = jnp.transpose(dedg)
    fk = jax.jit(lambda a, b, c, d: _run_ni_force(a, b, c, d, pk.cfgn_key))
    t["f_kernel"] = timeit(fk, trs[0], trs[1], trs[2], dedg_t)
    fj_t = fk(trs[0], trs[1], trs[2], dedg_t)
    fjs = [jnp.transpose(f)[:dxx.shape[0]] for f in fj_t]
    asm = jax.jit(lambda a, b, c, k: pk._assemble(a, b, c, k, n,
                                                     k_short))
    t["assemble"] = timeit(asm, fjs[0], fjs[1], fjs[2], sl.akey)

    ef = jax.jit(lambda xx, bb: pk.energy_forces_short(xx, bb, sl,
                                                       shift=False))
    t["ef"] = timeit(ef, x, box)
    efv = jax.jit(lambda xx, bb: pk.energy_forces_short(
        xx, bb, sl, want_virial=True, shift=False))
    t["efv"] = timeit(efv, x, box)

    # full production step block (model_bench wiring)
    def force_fn(xx, bb, nbr, short):
        return pk.energy_forces_short(xx, bb, short, want_virial=True,
                                      shift=False)

    def force_fn_light(xx, bb, nbr, short):
        e, f = pk.energy_forces_short(xx, bb, short, shift=False)
        return e, f, jnp.zeros((3, 3), xx.dtype)

    def short_build(xx, bb, nbr):
        return pk.compact_short(xx, bb, nbr.idx, nbr.rev)

    thermo = 5
    cfg = MDConfig(dt=0.001, cutoff=rc, skin=skin, capacity=capacity,
                   nbr_method="cell", cell_dims=dims, cell_capacity=24,
                   ensemble="nvt", t_target=1200.0, tau_t=0.1,
                   thermo_every=thermo, stale_factor=0.5,
                   short_every=thermo, short_skin=delta, with_rev=True)
    sim = Simulator(force_fn, jnp.full(n, MASS_NI, jnp.float32), cfg,
                    short_build=short_build, force_fn_light=force_fn_light)
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
                 f"Ks={k_short}, fused Pallas (ops/pallas_ni)",
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
