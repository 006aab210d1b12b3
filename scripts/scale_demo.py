#!/usr/bin/env python3
"""Scale demonstrations on one TPU chip (BASELINE.json configs 3 and 5).

  --config 500k : bcc-Fe 500k-atom NPT thermal-expansion run (config 3) --
                  63^3 bcc cells (500,094 atoms), fe_v2 potential, NPT 300 K
                  isotropic 0 bar, measured post-warmup.
  --config 2m   : 2M-atom single-chip NVE (the north-star scale; config 5's
                  scene) -- a symmetric-tilt grain-boundary bicrystal from
                  the STGB generator, ~2.0M atoms, NVE at 300 K. Memory
                  budget: capacity 192 at skin 0.8 keeps idx+rev at 3.1 GB
                  and the K=128 repacked force arrays within v5e's 16 GB.

Writes artifacts/scale_<config>.json with the measured atom-steps/s.
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
    ap.add_argument("--config", choices=("500k", "2m"), required=True)
    ap.add_argument("--no-minimize", action="store_true",
                    help="skip the FIRE pre-relaxation of the 2m GB scene")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--size-scale", type=float, default=1.0,
                    help="2m scene linear scale factor")
    ap.add_argument("--no-short", action="store_true",
                    help="disable the refresh-static short-list fast path "
                         "(2m then runs the per-step repack pipeline)")
    ap.add_argument("--short", action="store_true",
                    help="deprecated no-op: the short path is the default "
                         "on every config since the rev-free compaction")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.models.annp import make_annp
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE

    if args.config == "500k":
        from meng_zhang_tpu.geometry.lattice import bcc
        x_np, box_np = bcc([63, 63, 63])                 # 500,094 atoms
        ensemble, couple = "npt", (True, True, True)     # thermal expansion
        skin, capacity, cell_cap = 1.2, 256, 96
        steps = args.steps or 200
        thermo = 5
        label = "bcc-Fe 500,094-atom NPT 300K (thermal expansion, config 3)"
    else:
        # overlap prune at 2.3 A ~ 0.93 r_nn (delete_atoms-overlap practice
        # for bcc-Fe GBs, nearest neighbor 2.47 A): pairs left at 2.0-2.2 A
        # store >10 eV -- their relaxation reaches ~80 A/ps and outruns the
        # 0.4 A skin/2 budget between block-boundary rebuilds (sticky
        # `unsafe` in the measured window); at 2.3 A the worst pair carries
        # a few eV and stays within the rebuild cadence
        cache = f"/tmp/mzt_stgb2m_{args.size_scale}_d23.npz"
        if os.path.exists(cache):
            log(f"loading cached STGB scene from {cache}")
            dd = np.load(cache)
            x_np, box_np = dd["x"], dd["box"]
        else:
            from meng_zhang_tpu.geometry.stgb import make_stgb
            log("building 2M-atom STGB bicrystal...")
            f = args.size_scale
            d = make_stgb(length_box=(230.0 * f, 325.0 * f, 212.0 * f),
                          delete_overlap=2.3)
            x_np, box_np = d.x, d.box
            np.savez(cache, x=x_np, box=box_np)
        ensemble, couple = "nve", (False,) * 3
        # cell_cap 48 covers bcc-Fe bulk (34 atoms per 7.3 A cell) + GB
        # margin; 64 put the [ncell, cc, K] build intermediate at 4 GB and
        # OOMed the chip. The rev-free short path (compact_short without
        # reverse slots) drops the [N, K] rev table AND the O(N K^2)
        # reverse_slots pass from every rebuild, which is what lets the
        # refresh-static ShortList fit 16 GB at 2M atoms
        skin, capacity, cell_cap = 0.8, 168, 48
        steps = args.steps or 100
        thermo = 10
        label = f"STGB bcc-Fe {len(x_np):,}-atom NVE 300K (config 5 scene)"

    n = len(x_np)
    log(f"{label}: {n} atoms, box {np.round(box_np, 1)}")
    pot = read_ann(FE_ANN)
    mcfg, params = make_annp(pot)
    # short_delta 0.4: the GB scene's hottest atoms drift up to ~0.2 A per
    # 10-step epoch (a 0.3 delta's 0.15 A guard latched unsafe in the
    # measured window); 0.4 restores the 0.2 A bound round 4 proved safe
    pk = PallasAnnp(mcfg, params, short_delta=0.4)
    want_virial = ensemble == "npt"     # at 2M atoms the virial tally keeps
                                        # the [N,K] dx planes alive through
                                        # force assembly (~3 GB extra peak)

    # refresh-static short list (the bench scene's fast path): the per-step
    # eval drops the distance repack; refreshed every `short_every` steps
    # in-scan with the exact short_skin dangerous-build guard. The 2m
    # config runs it REV-FREE (compact_short without reverse slots, the
    # two-sort delivery-key inversion): with_rev=False removes the [N, K]
    # rev table and the reverse_slots pass from every rebuild -- round 4's
    # OOM margin -- so the short path now serves the north-star scale too.
    use_short = not args.no_short
    rev_free = args.config == "2m"

    def force_fn_full(xx, bb, nbrs):
        out = pk.energy_forces(xx, bb, nbrs.idx, nbrs.rev,
                               want_virial=want_virial, shift=False)
        if want_virial:
            return out
        e, f = out
        return e, f, jnp.zeros((3, 3), xx.dtype)

    if use_short:
        def force_fn(xx, bb, nbrs, short):
            out = pk.energy_forces_short(xx, bb, short,
                                         want_virial=want_virial,
                                         shift=False)
            if want_virial:
                return out
            e, f = out
            return e, f, jnp.zeros((3, 3), xx.dtype)

        def short_build(xx, bb, nbrs):
            return pk.compact_short(xx, bb, nbrs.idx,
                                    None if rev_free else nbrs.rev)
    else:
        force_fn, short_build = force_fn_full, None

    rlist = mcfg.cut + skin
    dims_box = np.asarray(box_np) * (0.95 if ensemble == "npt" else 1.0)
    dims = cell_grid_dims(dims_box, rlist)
    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin, capacity=capacity,
                   nbr_method="cell",   # rowsweep faults the TPU worker >1.2M atoms
                   cell_dims=dims, cell_capacity=cell_cap,
                   ensemble=ensemble, t_target=300.0, tau_t=0.1,
                   p_target=(0.0,) * 3, p_couple=couple, tau_p=1.0,
                   thermo_every=thermo, with_rev=not rev_free,
                   stale_factor=0.5,
                   short_every=thermo if use_short else 0,
                   short_skin=pk.short_delta if use_short else 0.0,
                   # 2m: refresh the short list from the HOST so the
                   # 251M-element two-sort compaction lives in its own XLA
                   # arena -- fused into the 10-step block program it
                   # pushed the 16 GB v5e over the edge after the first
                   # in-run rebuild (ResourceExhausted, 2026-08-21)
                   short_host_refresh=rev_free and use_short)
    sim = Simulator(force_fn, jnp.full(n, MASS_FE, jnp.float32), cfg,
                    short_build=short_build)
    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)

    if args.config == "2m" and not args.no_minimize:
        # The GB bicrystal starts unrelaxed; close pairs left by the overlap
        # prune relax at ~80 A/ps and outrun any reasonable skin budget for
        # picoseconds of NVE (the round-2 artifact recorded sticky `unsafe`
        # for exactly this reason). The reference workflow minimizes before
        # dynamics (in.st_test: minimize 1e-6 ...); a short FIRE quench kills
        # the transient so the measured window has zero dangerous builds.
        min_cache = cache.replace(".npz", "_min.npz")
        if os.path.exists(min_cache):
            log(f"loading minimized positions from {min_cache}")
            x = jnp.asarray(np.load(min_cache)["x"], jnp.float32)
        else:
            from meng_zhang_tpu.md.minimize import fire_minimize
            t0 = time.time()
            nbrs = sim.build_nbrs(x, box)

            def ef(xx, bb, nbr):
                if rev_free:     # fresh rev-free compaction per eval
                    slm = pk.compact_short(xx, bb, nbr[0], None)
                    return pk.energy_forces_short(xx, bb, slm, shift=False)
                return pk.energy_forces(xx, bb, nbr[0], nbr[1], shift=False)

            fst = fire_minimize(ef, x, box, (nbrs.idx, nbrs.rev),
                                f_tol=5e-2, max_iter=100, dt0=5e-4,
                                dt_max=5e-3, block=10)
            x = fst.x
            log(f"minimize: {time.time() - t0:.1f}s "
                f"fmax={float(fst.fmax):.2e}"
                f" pe={float(fst.pe) + n * mcfg.e_shift:.6e}")
            np.savez(min_cache, x=np.asarray(x))
            # free the minimize-epoch neighbor tables (2.6 GB at 2M atoms)
            # BEFORE init_state builds its own: holding both plus the eager
            # first force eval's transients exhausts the chip
            del fst, nbrs

    t0 = time.time()
    st = sim.init_state(x, box, seed=4928459, t_init=300.0)
    jax.block_until_ready(st.f)
    log(f"init: {time.time() - t0:.1f}s overflow={bool(st.overflow)}")
    assert not bool(st.overflow), "neighbor/cell capacity overflow"
    t0 = time.time()
    st, th = sim.run(st, 10)                 # warmup (includes compiles)
    jax.block_until_ready(th)
    log(f"warmup: {time.time() - t0:.1f}s T={float(th.temp[-1]):.1f}"
        f" unsafe={bool(st.unsafe)}")
    # The GB bicrystal starts unrelaxed: the first blocks see violent local
    # relaxation (close pairs left by delete_overlap) that can outrun the
    # skin before a block-boundary rebuild. Those transients belong to the
    # warmup; reset the sticky flags so `unsafe` reports the MEASURED window.
    st = st._replace(unsafe=jnp.zeros_like(st.unsafe))

    n_blocks = steps // thermo
    t0 = time.time()
    st, th = sim.run(st, n_blocks)
    float(th.temp[-1])   # host readback: block_until_ready is a no-op
    wall = time.time() - t0   # fence under the axon remote-TPU plugin
    aps = n * n_blocks * thermo / wall
    pe_off = n * mcfg.e_shift
    log(f"{n_blocks * thermo} steps in {wall:.1f}s -> {aps:,.0f} atom-steps/s"
        f"  T={float(th.temp[-1]):.1f}K P={float(th.press[-1]):.0f} bar"
        f"  PE={float(th.pe[-1]) + pe_off:.6e} eV"
        f"  rebuilds={sim.rebuild_count} overflow={bool(st.overflow)}"
        f" unsafe={bool(st.unsafe)}")
    assert not bool(st.overflow)

    out = {
        "config": args.config, "label": label, "atoms": n,
        "steps": n_blocks * thermo, "wall_s": round(wall, 2),
        "atom_steps_per_s": round(aps, 1),
        "temp_K": float(th.temp[-1]), "press_bar": float(th.press[-1]),
        "pe_eV": float(th.pe[-1]) + pe_off,
        "vol_A3": float(th.vol[-1]),
        "rebuilds": sim.rebuild_count,
        "unsafe": bool(st.unsafe),
        "device": str(jax.devices()[0]),
    }
    os.makedirs(ART, exist_ok=True)
    path = os.path.join(ART, f"scale_{args.config}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
