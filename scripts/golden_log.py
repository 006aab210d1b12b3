#!/usr/bin/env python3
"""Golden-log trajectory regression -- the reference's own validation method.

The reference authors demonstrated their fe_v2 rewrite preserved physics by
running the same 152,880-atom scene (minimize + 1000-step NPT at 300 K,
`in.st_test`) through both implementations and comparing the per-step thermo
traces (`performance test.zip` -> log_relaxing_{old,new}.lammps; they agree
to ~7 significant digits, SURVEY.md section 4.2). This script replays that
experiment on this engine:

  1. parse the scene + the reference NPT thermo table from the zip,
  2. CG-minimize with the reference's own etol (stops after one
     steepest-descent line minimization, exactly as its log shows),
  3. run the same NPT (300 K, tau_t 0.1, y-coupled barostat tau_p 1.0,
     dt 1 fs, 1000 steps),
  4. write artifacts/golden_log.json with both traces and the deviation
     statistics that tests/test_golden_log.py asserts on.

Identical 7-digit traces are unreachable across engines (different RNG
stream for `velocity create`, different arithmetic order, f32 vs f64), but
the macroscopic relaxation -- the temperature dip to ~47 K near step 34, the
recovery to ~263 K by step 1000, the y-box contraction, the pressure curve
-- is self-averaging over 152,880 atoms and must reproduce tightly.

Run on the TPU (about 10 min):  python scripts/golden_log.py
"""
import argparse
import json
import os
import sys
import time
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIP = "/root/reference/annp-gpu-lammps/fe_v2/performance test.zip"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "golden_log.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_lammps_npt_table(text):
    """Extract the (second) Step table: the 1000-step NPT run.

    Columns (in.st_test thermo_style custom):
    step temp pe ke lx ly lz press vol pxx pyy pzz
    """
    rows = []
    block = 0
    in_table = False
    header = None
    for line in text.splitlines():
        if line.startswith("Step"):
            block += 1
            in_table = block == 2
            if in_table:
                header = line.split()
            continue
        if in_table:
            parts = line.split()
            if len(parts) != len(header):
                in_table = False
                continue
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                in_table = False
    arr = np.asarray(rows)
    names = {"poteng": "pe", "kineng": "ke", "volume": "vol"}
    cols = [names.get(h.lower(), h.lower()) for h in header]
    return {c: arr[:, i] for i, c in enumerate(cols)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--thermo", type=int, default=10)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import tempfile
    from meng_zhang_tpu.io.lammps_data import read_data
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.models.annp import make_annp
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE

    tmp = tempfile.mkdtemp(prefix="mzgold")
    zipfile.ZipFile(ZIP).extractall(tmp)
    base = os.path.join(tmp, "performance comparsion")
    d = read_data(os.path.join(base, "fe_st.dat"))
    pot = read_ann(os.path.join(base, "fe_annp_potential_2.ann"))
    with open(os.path.join(base, "log_relaxing_new.lammps"),
              errors="replace") as fh:
        ref = parse_lammps_npt_table(fh.read())
    log(f"reference table: {len(ref['step'])} rows, "
        f"T[0]={ref['temp'][0]}, T[-1]={ref['temp'][-1]}")

    pbc = (False, True, False)                      # boundary m p m
    mcfg, params = make_annp(pot, pbc=pbc)
    pk = PallasAnnp(mcfg, params)
    n = d.n
    pe_off = n * mcfg.e_shift                       # f64 python constant

    x = jnp.asarray(d.x, jnp.float32)
    box = jnp.asarray(d.box, jnp.float32)
    skin = 1.2
    rlist = mcfg.cut + skin
    dims = cell_grid_dims(np.asarray(d.box) * 0.92, rlist)
    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin, capacity=256,
                   nbr_method="cell", cell_dims=dims, cell_capacity=96,
                   ensemble="npt", t_target=300.0, tau_t=0.1,
                   p_target=(0.0,) * 3, p_couple=(False, True, False),
                   tau_p=1.0, thermo_every=args.thermo, with_rev=True,
                   pbc=pbc)
    sim = Simulator(
        lambda xx, bb, nbrs: pk.energy_forces(xx, bb, nbrs.idx, nbrs.rev,
                                              want_virial=True, shift=False),
        jnp.full(n, MASS_FE, jnp.float32), cfg)

    # ---- minimize: replay the reference's `minimize 1e-6 1e-6 1000 10000`
    # with `min_style cg`. Its minimize table shows ONE iteration
    # (PE -6.8487629e8 -> -6.8487637e8, a -80 eV line minimization along
    # the initial force; |dE|/|E| = 1.2e-7 < etol = 1e-6 stops LAMMPS CG
    # immediately). cg_minimize with the same etol performs the identical
    # experiment: one steepest-descent line minimization from fe_st.dat. ----
    pe_ref_min = float(ref["pe"][0])         # NPT row 0 = post-minimize PE
    t0 = time.time()
    nbrs = sim.build_nbrs(x, box)
    assert not bool(nbrs.overflow)

    def ef(xx, bb, nbr):
        e, f = pk.energy_forces(xx, bb, nbr[0], nbr[1], shift=False)
        return e, f

    from meng_zhang_tpu.md.minimize import cg_minimize
    st = cg_minimize(ef, x, box, (nbrs.idx, nbrs.rev), etol=1.0e-6,
                     ftol=1.0e-6, max_iter=1000, dmax=0.1,
                     e_offset=pe_off)
    x = st.x
    pe_min = float(st.pe) + pe_off
    log(f"minimize (cg): {time.time() - t0:.0f}s  {st.n_iter} iters, "
        f"{st.n_evals} force evals, stop={st.converged}, "
        f"PE {pe_min:.8e} eV (reference stopped at {pe_ref_min:.8e})")

    # ---- NPT ----
    st = sim.init_state(x, box, seed=4928459, t_init=300.0)
    assert not bool(st.overflow)
    th0 = sim.thermo(st)
    trace = {k: [] for k in ("step", "temp", "pe", "press", "ly", "vol")}

    def record(step, th, bb):
        trace["step"].append(int(step))
        trace["temp"].append(float(th.temp))
        trace["pe"].append(float(th.pe) + pe_off)
        trace["press"].append(float(th.press))
        trace["ly"].append(float(bb[1]))
        trace["vol"].append(float(th.vol))

    record(0, th0, st.box)
    t0 = time.time()
    n_blocks = args.steps // args.thermo
    for b in range(n_blocks):
        st, th = sim.run(st, 1)
        last = jax.tree_util.tree_map(lambda a: a[-1], th)
        record(int(st.step), last, st.box)
        if (b + 1) % 10 == 0:
            log(f"  step {int(st.step)}: T={float(last.temp):.2f} "
                f"P={float(last.press):.0f} ly={float(st.box[1]):.4f}")
    wall = time.time() - t0
    log(f"NPT {args.steps} steps: {wall:.0f}s "
        f"({n * args.steps / wall:,.0f} atom-steps/s), "
        f"rebuilds={sim.rebuild_count}, overflow={bool(st.overflow)}, "
        f"unsafe={bool(st.unsafe)}")
    assert not bool(st.overflow)

    # ---- compare at matching steps ----
    ours = {k: np.asarray(v) for k, v in trace.items()}
    sel = ours["step"]
    ref_at = {k: ref[k][sel] for k in ("temp", "pe", "press", "ly")}
    dev = {
        "temp_max_abs": float(np.max(np.abs(ours["temp"] - ref_at["temp"]))),
        "temp_rms": float(np.sqrt(np.mean(
            (ours["temp"] - ref_at["temp"]) ** 2))),
        "pe_max_rel": float(np.max(np.abs(
            (ours["pe"] - ref_at["pe"]) / ref_at["pe"]))),
        "pe_per_atom_max_abs": float(np.max(np.abs(
            ours["pe"] - ref_at["pe"])) / n),
        "press_max_abs": float(np.max(np.abs(
            ours["press"] - ref_at["press"]))),
        "ly_max_rel": float(np.max(np.abs(
            (ours["ly"] - ref_at["ly"]) / ref_at["ly"]))),
        "temp_final_ours": float(ours["temp"][-1]),
        "temp_final_ref": float(ref_at["temp"][-1]),
        "temp_min_ours": float(np.min(ours["temp"])),
        "temp_min_ref": float(np.min(ref["temp"])),
        "pe_minimized_ours": pe_min,
        "pe_minimized_ref": float(ref["pe"][0]),
    }
    for k, v in dev.items():
        log(f"  {k}: {v:.6g}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump({
            "scene": "152880-atom bcc-Fe in.st_test (minimize + NPT 300K)",
            "steps": args.steps, "thermo_every": args.thermo,
            "engine_trace": {k: list(map(float, v)) for k, v in ours.items()},
            "reference_trace": {k: list(map(float, ref[k][sel]))
                                for k in ("temp", "pe", "press", "ly", "vol")},
            "deviation": dev,
            "atom_steps_per_s": n * args.steps / wall,
        }, fh)
    log(f"wrote {OUT}")
    print(json.dumps(dev))


if __name__ == "__main__":
    main()
