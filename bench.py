#!/usr/bin/env python3
"""Headline benchmark: bcc-Fe ANNP (Chebyshev) NVE throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's fe_v2 benchmark sustains
0.559 timesteps/s at 152,880 atoms on 2x RTX A5000-class GPUs
== 85,460 atom-steps/s aggregate. vs_baseline = our atom-steps/s / 85460.
"""
import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cells", type=int, default=24)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--skin", type=float, default=2.0)
    ap.add_argument("--engine", choices=("pallas", "xla"), default="pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from meng_zhang_tpu.geometry.lattice import bcc
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.models.annp import energy_forces_chunked, make_annp
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE

    log("devices:", jax.devices())
    pot = read_ann("/root/reference/annp-gpu-lammps/fe/fe_annp_potential_2.ann")
    mcfg, params = make_annp(pot, dtype=jnp.float32)

    x_np, box_np = bcc(args.n_cells)
    n = len(x_np)
    rng = np.random.default_rng(0)
    x_np = x_np + rng.normal(scale=0.03, size=x_np.shape)
    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)
    log(f"scene: {n} atoms, box {box_np}")

    if args.engine == "pallas":
        pk = PallasAnnp(mcfg, params)

        def force_fn(xx, bb, nbrs):
            e, f = pk.energy_forces(xx, bb, nbrs.idx, nbrs.rev)
            return e, f, jnp.zeros((3, 3), xx.dtype)
    else:
        def force_fn(xx, bb, nbrs):
            e, f = energy_forces_chunked(mcfg, params, xx, bb, nbrs.idx,
                                         chunk=args.chunk)
            return e, f, jnp.zeros((3, 3), xx.dtype)

    rlist = mcfg.cut + args.skin
    dims = cell_grid_dims(box_np, rlist)
    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=args.skin,
                   capacity=args.capacity, nbr_method="cell",
                   cell_dims=dims, cell_capacity=96,
                   ensemble="nve", thermo_every=5,
                   with_rev=(args.engine == "pallas"))
    masses = jnp.full(n, MASS_FE, jnp.float32)
    sim = Simulator(force_fn, masses, cfg)

    t0 = time.time()
    st = sim.init_state(x, box, seed=1, t_init=300.0)
    jax.block_until_ready(st.f)
    log(f"init (incl. nbr-build compile): {time.time() - t0:.1f}s; "
        f"overflow={bool(st.overflow)}")
    assert not bool(st.overflow), "neighbor capacity overflow"

    t0 = time.time()
    st, th = sim.run(st, 1)
    jax.block_until_ready(th)
    log(f"step compile + first block: {time.time() - t0:.1f}s")

    n_blocks = max(1, args.steps // cfg.thermo_every)
    t0 = time.time()
    st, th = sim.run(st, n_blocks)
    jax.block_until_ready(th)
    dt_wall = time.time() - t0
    steps = n_blocks * cfg.thermo_every
    aps = n * steps / dt_wall
    log(f"{steps} steps in {dt_wall:.2f}s -> {aps:,.0f} atom-steps/s; "
        f"T={float(th.temp[-1]):.1f}K E={float(th.conserved[-1]):.2f}eV "
        f"overflow={bool(st.overflow)}")

    baseline = 0.559 * 152880       # reference aggregate atom-steps/s
    print(json.dumps({
        "metric": "bcc-Fe annp NVE throughput",
        "value": round(aps, 1),
        "unit": "atom-steps/s",
        "vs_baseline": round(aps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
