#!/usr/bin/env python3
"""Production sharded-driver demonstration on the 8-device virtual CPU mesh.

Two modes:
  --scene small : 2,000-atom bcc-Fe, 1000-step NPT with in-run rebuilds,
                  plus a single-chip run of the same trajectory -- records
                  the full 1-vs-N thermo parity over a long run.
  --scene 100k  : 100,000-atom bcc-Fe NPT on 8 shards (the scale point;
                  this host exposes ONE CPU core, so the step budget is
                  wall-clock-bound -- the run proves memory, the device-
                  local rebuild, halo exchange, and NPT mechanics at scale).

Writes artifacts/sharded_<scene>.json.
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
    ap.add_argument("--scene", choices=("small", "100k"), default="small")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{args.devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    import numpy as np
    from meng_zhang_tpu.geometry.lattice import bcc
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import (MDConfig, Simulator,
                                              create_velocities)
    from meng_zhang_tpu.models.annp import make_annp
    from meng_zhang_tpu.parallel.domain import (ShardConfig, ShardedMD,
                                                XlaFrameModel)
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE

    pot = read_ann(FE_ANN)
    mcfg, params = make_annp(pot)
    D = args.devices
    k_short = 128

    # halo_b/capacity are auto-derived by ShardedMD._auto_geometry from the
    # scene (VERDICT r2 item 6: demos must not hand-compute halo sizes)
    skin = 0.8
    if args.scene == "small":
        # bcc 28x6x6 = 2016 atoms (y,z = 17.13 A > 2*rlist = 14.60 for the
        # single-chip single-image convention); 4 devices, c_loc = 504
        cells, steps = [28, 6, 6], args.steps or 1000
        chunk = 128
        D = min(D, 4)
    else:
        cells, steps = [125, 20, 20], args.steps or 30
        chunk = 512
    x_np, box_np = bcc(cells)
    n = len(x_np)
    thermo = 5
    log(f"scene: {n} atoms, box {np.round(box_np, 1)}, {D} devices, "
        f"{steps} NPT steps")

    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)
    masses = jnp.full(n, MASS_FE, jnp.float32)
    v0 = create_velocities(jax.random.PRNGKey(4928459), masses, 300.0,
                           jnp.float32)

    model = XlaFrameModel(mcfg, params, chunk=chunk, k_short=k_short)
    scfg = ShardConfig(
        n_devices=D, c_loc=n // D,
        cutoff=mcfg.cut, skin=skin, dt=0.001, ensemble="npt",
        t_target=300.0, tau_t=0.1, p_target=(0.0,) * 3,
        p_couple=(True, True, True), tau_p=1.0, thermo_every=thermo,
        stale_factor=0.5)
    md = ShardedMD(model, MASS_FE, box, scfg)
    t0 = time.time()
    st, order = md.distribute(x, v0)
    ovf = int(jnp.max(st.overflow))
    assert ovf == 0, f"coverage/capacity overflow bitmask={ovf}"
    log(f"distribute: {time.time() - t0:.1f}s  frame_wx={md.frame_wx:.1f}"
        f" dims={md.frame_dims}  halo_b={md.cfg.halo_b}"
        f" capacity={md.cfg.capacity}")
    t0 = time.time()
    st, th = md.run(st, 1)
    log(f"first block (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    n_blocks = steps // thermo - 1
    st, th = md.run(st, n_blocks)
    wall = time.time() - t0
    aps = n * n_blocks * thermo / wall
    log(f"{n_blocks * thermo} steps in {wall:.1f}s -> {aps:,.0f} "
        f"atom-steps/s (1-core CPU mesh), rebuilds={md.rebuild_count}, "
        f"overflow={bool(jnp.any(st.overflow))}, "
        f"unsafe={bool(jnp.any(st.unsafe))}")
    assert not bool(jnp.any(st.overflow))
    pe_off = n * mcfg.e_shift
    sharded = {
        "temp": [float(v) for v in th.temp],
        "pe": [float(v) + pe_off for v in th.pe],
        "press": [float(v) for v in th.press],
        "vol": [float(v) for v in th.vol],
    }
    out = {
        "scene": args.scene, "atoms": n, "devices": D,
        "steps": (n_blocks + 1) * thermo, "ensemble": "npt (xyz, 0 bar)",
        "wall_s": round(wall, 1), "atom_steps_per_s": round(aps, 1),
        "rebuilds": md.rebuild_count,
        "final": {k: v[-1] for k, v in sharded.items()},
        "note": "8 virtual devices on ONE host CPU core (test rig); "
                "wall-clock measures mechanics, not TPU performance",
    }

    if args.scene == "small":
        # single-chip reference trajectory for 1-vs-N parity
        rlist = mcfg.cut + skin
        dims = cell_grid_dims(np.asarray(box_np) * 0.95, rlist)
        cfg1 = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin,
                        capacity=md.cfg.capacity,
                        nbr_method="n2", ensemble="npt", t_target=300.0,
                        tau_t=0.1, p_target=(0.0,) * 3,
                        p_couple=(True, True, True), tau_p=1.0,
                        thermo_every=thermo, stale_factor=0.5)
        from meng_zhang_tpu.models.annp import (compact_neighbor_rows,
                                                energy_forces_virial_chunked)

        def force_fn(xx, bb, nbrs):
            idx_s, ovf = compact_neighbor_rows(xx, bb, nbrs.idx, mcfg.cut,
                                               k_short)
            e, f, w = energy_forces_virial_chunked(mcfg, params, xx, bb,
                                                   idx_s, chunk=chunk,
                                                   shift=False)
            return (jnp.where(ovf, jnp.nan, e), jnp.where(ovf, jnp.nan, f),
                    w)

        sim = Simulator(force_fn, masses, cfg1)
        st1 = sim.init_state(x, box, v=v0, seed=1)
        t0 = time.time()
        st1, th1 = sim.run(st1, n_blocks + 1)
        log(f"single-chip reference: {time.time() - t0:.1f}s, "
            f"rebuilds={sim.rebuild_count}")
        t1 = np.asarray(th1.temp)[1:]
        p1 = np.asarray(th1.pe)[1:] + pe_off
        ts = np.asarray(sharded["temp"])
        ps = np.asarray(sharded["pe"])
        tempd, ped = np.abs(t1 - ts), np.abs(p1 - ps)
        w = min(20, len(tempd))          # first 100 steps: deterministic
        out["parity"] = {
            # early window: the two f32 trajectories have not yet diverged
            # chaotically -- this is the 1-vs-N correctness check
            "first100_temp_max_abs_K": float(np.max(tempd[:w])),
            "first100_pe_max_abs_eV": float(np.max(ped[:w])),
            # full run: statistical agreement of the NPT ensembles (f32
            # chaos makes per-step max-abs meaningless at 1000 steps)
            "run_temp_mean_diff_K": float(np.mean(t1) - np.mean(ts)),
            "run_pe_mean_diff_eV": float(np.mean(p1) - np.mean(ps)),
            "run_temp_max_abs_K": float(np.max(tempd)),
            "single_chip_rebuilds": sim.rebuild_count,
        }
        log(f"parity: first100 dT_max="
            f"{out['parity']['first100_temp_max_abs_K']:.3g} K  "
            f"dPE_max={out['parity']['first100_pe_max_abs_eV']:.3g} eV; "
            f"run mean dT={out['parity']['run_temp_mean_diff_K']:.3g} K")

    os.makedirs(ART, exist_ok=True)
    path = os.path.join(ART, f"sharded_{args.scene}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    log(f"wrote {path}")
    print(json.dumps({k: out[k] for k in
                      ("scene", "atoms", "steps", "rebuilds",
                       "atom_steps_per_s")}))


if __name__ == "__main__":
    main()
