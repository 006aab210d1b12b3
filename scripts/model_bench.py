#!/usr/bin/env python3
"""TPU benchmark for the ni (Behler-Parrinello) and ANNA-ADP models.

The reference ships GPU builds of both (`annp-gpu-lammps/ni`,
`anna-gpu-lammps/bcc_fe`) but committed performance logs only for fe_v2;
these runs record what it never did -- a real device throughput figure for
each remaining model family, at production scale:

  --model ni   : fcc-Ni, BASELINE.json config 2's melt leg (NVT 1200 K)
                 at 256,000 atoms (40^3 fcc cells) through the repacked
                 chunked path (compact_neighbor_rows + energy_chunked,
                 models/annp.py) -- the production ni route.
  --model anna : bcc-Fe ANNA-ADP (fe_adp_potential_2310.anna) NVE 300 K at
                 128,000 atoms (40^3 bcc cells), frozen-(d2,q2) forces
                 (the reference definition, anna-gpu-lammps/bcc_fe).

Writes artifacts/scale_<model>.json with the measured atom-steps/s.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NI_ANN = "/root/reference/annp-gpu-lammps/ni/ni_annp_potential_2.ann"
ANNA_FILE = ("/root/reference/anna-gpu-lammps/bcc_fe/"
             "fe_adp_potential_2310.anna")
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("ni", "anna"), required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--cells", type=int, default=None)
    ap.add_argument("--k-short", type=int, default=32,
                    help="ni short-row capacity (solid fcc needs 18 + "
                         "thermal headroom; overflow NaN-poisons)")
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--no-write", action="store_true",
                    help="skip writing the artifact (parameter sweeps)")
    ap.add_argument("--backend", choices=("pallas", "chunked"),
                    default="pallas",
                    help="ni force path: fused Pallas kernels "
                         "(ops/pallas_ni.py) or the chunked XLA autodiff "
                         "route (models/annp.py)")
    ap.add_argument("--skin", type=float, default=None,
                    help="neighbor skin override (rebuild-cadence sweeps)")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE, MASS_NI

    thermo = 5
    if args.model == "ni":
        from meng_zhang_tpu.geometry.lattice import fcc
        from meng_zhang_tpu.io.potential import read_ann
        from meng_zhang_tpu.models.annp import (effective_cutoff, make_annp,
                                                make_short_chunked_fns)
        pot = read_ann(NI_ANN)
        mcfg, params = make_annp(pot)
        rc = effective_cutoff(pot)           # 3.90 A, not the 6.5 A list cut
        cells = args.cells or 40
        x_np, box_np = fcc(cells, a=3.52)    # 4*cells^3 atoms
        mass, skin, capacity = MASS_NI, 0.5, 64
        k_short, chunk, delta = args.k_short, args.chunk, 0.2
        ensemble, t_target = "nvt", 1200.0
        steps = args.steps or 100
        label = (f"fcc-Ni {len(x_np):,}-atom NVT 1200K melt leg "
                 "(config 2 scene)")
        e_shift = mcfg.e_shift
        if args.backend == "pallas":
            # fused transposed-block kernels (ops/pallas_ni.py): hand-VJP
            # forces + sort-involution delivery, short list refreshed every
            # thermo block in-scan
            from meng_zhang_tpu.ops.pallas_ni import PallasNi
            pk = PallasNi(mcfg, params, k_short=k_short, short_delta=delta)

            def force_fn(xx, bb, nbrs, short):
                return pk.energy_forces_short(xx, bb, short,
                                              want_virial=True, shift=False)

            def force_fn_light(xx, bb, nbrs, short):
                e, f = pk.energy_forces_short(xx, bb, short, shift=False)
                return e, f, jnp.zeros((3, 3), xx.dtype)

            def short_build(xx, bb, nbrs):
                return pk.compact_short(xx, bb, nbrs.idx, nbrs.rev)
        else:
            # amortized short repack (refresh every thermo block in-scan) +
            # light no-virial force on non-thermo steps
            force_fn, force_fn_light, short_build = make_short_chunked_fns(
                mcfg, params, k_short=k_short, delta=delta, chunk=chunk)
    else:
        from meng_zhang_tpu.geometry.lattice import bcc
        from meng_zhang_tpu.io.potential import read_anna
        from meng_zhang_tpu.models import anna_adp
        pot = read_anna(ANNA_FILE)
        mcfg, params = anna_adp.make_anna(pot)
        rc = mcfg.cut
        cells = args.cells or 40
        x_np, box_np = bcc([cells] * 3)      # 2*cells^3 atoms
        mass, skin, capacity = MASS_FE, 0.5, 96
        ensemble, t_target = "nve", 300.0
        steps = args.steps or 100
        label = (f"bcc-Fe ANNA-ADP {len(x_np):,}-atom NVE 300K "
                 "(anna-gpu-lammps scene class)")
        e_shift = mcfg.e_base
        if args.backend == "pallas":
            # TPU-layout fast path: component planes + packed field gather
            # (make_anna_fast_fns); shift-free energies, refresh-static
            # short rows
            # bcc-Fe has 58 neighbors within rc+delta = 5.26 A (next shell
            # 5.39 A); 72 leaves thermal headroom. Lanes pad to 128 either
            # way -- only the [C, K, K] phase-1 angular scales with K here
            k_short, delta = 72, 0.2
            force_fn, force_fn_light, short_build = \
                anna_adp.make_anna_fast_fns(mcfg, params, k_short=k_short,
                                            delta=delta, chunk=2048)
        else:
            e_shift = 0.0

            def force_fn(xx, bb, nbrs):
                e, f = anna_adp.energy_forces(mcfg, params, xx, bb, nbrs.idx)
                return e, f, jnp.zeros((3, 3), xx.dtype)

            force_fn_light = short_build = None
            delta = 0.0

    n = len(x_np)
    if args.skin is not None:
        skin = args.skin
    log(f"{label}: {n} atoms, box {np.round(box_np, 1)}, rc={rc:.3f}, "
        f"skin={skin}")
    rlist = rc + skin
    dims = cell_grid_dims(np.asarray(box_np), rlist)
    cfg = MDConfig(dt=0.001, cutoff=rc, skin=skin, capacity=capacity,
                   # ni's 4.4 A cells hold ~8 atoms; cc=24 keeps 3x headroom
                   # and cuts the [ncell, cc, K] build intermediate 2x
                   # (measured 2.2x faster rebuild on the v5e)
                   nbr_method="cell", cell_dims=dims,
                   cell_capacity=24 if args.model == "ni" else 48,
                   ensemble=ensemble, t_target=t_target, tau_t=0.1,
                   thermo_every=thermo, stale_factor=0.5,
                   short_every=thermo if short_build else 0,
                   short_skin=delta,
                   with_rev=args.model == "ni" and args.backend == "pallas")
    sim = Simulator(force_fn, jnp.full(n, mass, jnp.float32), cfg,
                    short_build=short_build, force_fn_light=force_fn_light)
    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)

    t0 = time.time()
    st = sim.init_state(x, box, seed=4928459, t_init=min(t_target, 600.0))
    jax.block_until_ready(st.f)
    log(f"init: {time.time() - t0:.1f}s overflow={bool(st.overflow)}")
    assert not bool(st.overflow), "neighbor/cell capacity overflow"
    t0 = time.time()
    st, th = sim.run(st, 2)                  # warmup (includes compiles)
    jax.block_until_ready(th)
    log(f"warmup: {time.time() - t0:.1f}s T={float(th.temp[-1]):.1f}")
    st = st._replace(unsafe=jnp.zeros_like(st.unsafe))

    n_blocks = steps // thermo
    t0 = time.time()
    st, th = sim.run(st, n_blocks)
    float(th.temp[-1])   # host readback: block_until_ready is a no-op
    wall = time.time() - t0   # fence under the axon remote-TPU plugin
    aps = n * n_blocks * thermo / wall
    pe_off = n * e_shift
    log(f"{n_blocks * thermo} steps in {wall:.1f}s -> {aps:,.0f} atom-steps/s"
        f"  T={float(th.temp[-1]):.1f}K PE={float(th.pe[-1]) + pe_off:.6e} eV"
        f"  rebuilds={sim.rebuild_count} overflow={bool(st.overflow)}"
        f" unsafe={bool(st.unsafe)}")
    assert not bool(st.overflow)
    # NaN-poisoned forces (short-row overflow) cascade into NaN velocities;
    # a later PE can look finite because NaN coordinates mask every pair out
    # -- temperature is the reliable sentinel
    assert np.isfinite(float(th.temp[-1])), "trajectory NaN-poisoned"
    assert np.isfinite(float(th.pe[-1]))

    out = {
        "model": args.model, "label": label, "atoms": n,
        "steps": n_blocks * thermo, "wall_s": round(wall, 2),
        "atom_steps_per_s": round(aps, 1),
        "temp_K": float(th.temp[-1]),
        "pe_eV": float(th.pe[-1]) + pe_off,
        "rebuilds": sim.rebuild_count,
        "unsafe": bool(st.unsafe),
        "device": str(jax.devices()[0]),
    }
    if not args.no_write:
        os.makedirs(ART, exist_ok=True)
        path = os.path.join(ART, f"scale_{args.model}.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
