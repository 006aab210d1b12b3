#!/usr/bin/env python3
"""2-D decomposition evidence run: >=10k-atom bcc-Fe on a 2x4 device mesh.

VERDICT round-2 item 5 acceptance: 1-vs-N parity on a 2x4 mesh for fe (and
ni, tests/test_multichip2d.py) at >=10k atoms, plus the halo-fraction table
(scripts/halo_fraction.py) showing 2-D beats 1-D slabs on a near-cubic box
at 8 devices.

Runs on the virtual CPU mesh (this host exposes ONE core; the step budget is
wall-clock-bound). Records force/energy/virial parity vs the single-chip
chunked path at distribute, then a short NVE leg with an in-run rebuild.
Writes artifacts/sharded2d.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FE_ANN = "/root/reference/annp-gpu-lammps/fe/fe_annp_potential_2.ann"
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=[18, 18, 16],
                    help="bcc cells (default 10,368 atoms)")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    import numpy as np
    from meng_zhang_tpu.geometry.lattice import bcc
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import create_velocities
    from meng_zhang_tpu.models.annp import (compact_neighbor_rows,
                                            energy_forces_virial_chunked,
                                            make_annp)
    from meng_zhang_tpu.parallel.domain import XlaFrameModel
    from meng_zhang_tpu.parallel.domain2d import Shard2DConfig, ShardedMD2D
    from meng_zhang_tpu.system.neighbors import build_neighbors_cell, \
        cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE

    pot = read_ann(FE_ANN)
    mcfg, params = make_annp(pot)
    x_np, box_np = bcc(args.cells)
    rng = np.random.default_rng(0)
    x_np = x_np + rng.normal(scale=0.03, size=x_np.shape)
    n = len(x_np)
    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)
    skin, k_short = 0.8, 128
    log(f"scene: {n} atoms, box {np.round(box_np, 1)}, mesh 2x4")

    cfg = Shard2DConfig(n_devices=8, mesh_shape=(2, 4), c_loc=n // 8,
                        cutoff=mcfg.cut, skin=skin, dt=0.001,
                        thermo_every=5, stale_factor=0.5)
    md = ShardedMD2D(XlaFrameModel(mcfg, params, chunk=512, k_short=k_short),
                     MASS_FE, box, cfg)
    v0 = create_velocities(jax.random.PRNGKey(12), jnp.full(n, MASS_FE,
                           jnp.float32), 300.0, jnp.float32)
    t0 = time.time()
    st, order = md.distribute(x, v0)
    ovf = int(jnp.max(st.overflow))
    assert ovf == 0, f"overflow bitmask={ovf}"
    log(f"distribute: {time.time() - t0:.1f}s  bx={md.bx} by={md.by} "
        f"c_ext={md.c_ext2d} (ghost fraction "
        f"{(md.c_ext2d - cfg.c_loc) / cfg.c_loc:.2f}) K={md.cfg.capacity}")

    # single-chip reference forces at t=0
    rlist = mcfg.cut + skin
    dims = cell_grid_dims(np.asarray(box_np), rlist)
    nbrs = build_neighbors_cell(x, box, rlist, md.cfg.capacity, dims, 96)
    idx_s, sovf = compact_neighbor_rows(x, box, nbrs.idx, mcfg.cut, k_short)
    e_ref, f_ref, w_ref = energy_forces_virial_chunked(
        mcfg, params, x, box, idx_s, chunk=512, shift=False)
    inv = np.argsort(np.asarray(st.gid).reshape(-1))
    f_g = np.asarray(st.f_loc).reshape(n, 3)[inv]
    d_f = float(np.max(np.abs(f_g - np.asarray(f_ref))))
    d_e = float(abs(float(jnp.sum(st.pe)) - float(e_ref)))
    d_w = float(np.max(np.abs(np.asarray(st.virial) - np.asarray(w_ref))))
    log(f"parity at t=0: |dF|max={d_f:.3g} eV/A  |dE|={d_e:.3g} eV "
        f"|dW|max={d_w:.3g}")
    assert d_f < 5e-4 and d_e < 5e-2     # f32 evaluation noise scale

    t0 = time.time()
    n_blocks = args.steps // 5
    st, th = md.run(st, n_blocks)
    wall = time.time() - t0
    aps = n * n_blocks * 5 / wall
    log(f"{n_blocks * 5} NVE steps in {wall:.1f}s -> {aps:,.0f} atom-steps/s"
        f" (1-core CPU mesh), rebuilds={md.rebuild_count}, "
        f"overflow={bool(jnp.any(st.overflow))}")
    assert not bool(jnp.any(st.overflow))

    out = {
        "scene": f"bcc-Fe {args.cells}", "atoms": n, "mesh": [2, 4],
        "steps": n_blocks * 5, "wall_s": round(wall, 1),
        "atom_steps_per_s": round(aps, 1), "rebuilds": md.rebuild_count,
        "ghost_rows_per_device": md.c_ext2d - cfg.c_loc,
        "ghost_fraction": round((md.c_ext2d - cfg.c_loc) / cfg.c_loc, 3),
        "parity_t0": {"f_max_abs": d_f, "e_abs": d_e, "w_max_abs": d_w},
        "final": {"temp": float(th.temp[-1]),
                  "pe": float(th.pe[-1]) + n * mcfg.e_shift},
        "note": "8 virtual devices on ONE host CPU core (test rig)",
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "sharded2d.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("atoms", "mesh", "steps",
                                          "ghost_fraction", "rebuilds")}))


if __name__ == "__main__":
    main()
