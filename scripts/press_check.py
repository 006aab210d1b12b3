#!/usr/bin/env python3
"""Zero-divergence pressure diagnostic for the golden-log comparison.

The reference log's FIRST thermo table (the minimize run,
log_relaxing_new.lammps:108) reports the pressure of the raw fe_st.dat
coordinates before any dynamics: P = -40423.638 bar at V = 1773495.9 A^3.
Evaluating our virial on those SAME coordinates isolates the
pressure-computation itself from every trajectory effect (minimizer path,
barostat formulation, RNG):

  * f64 chunked-XLA virial  -> is the virial MATH right?
  * f32 Pallas virial       -> how much does f32 accumulation cost at 153k?
  * LAMMPS volume convention: `boundary m p m` shrink-wraps x/z to the atom
    extents (the log's V=1773495.9 exceeds the data-file box 1773146.4), so
    the comparison uses the shrink-wrapped volume.

Writes artifacts/press_check.json. Run on the TPU (~2 min).
"""
import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIP = "/root/reference/annp-gpu-lammps/fe_v2/performance test.zip"
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")
P_REF = -40423.638          # minimize table row 0 (step 0), total pressure
V_REF = 1773495.9           # its Volume column


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _noise_floor():
    """How precisely CAN a 100-step windowed pressure agree between two
    independent trajectories of this scene? Quantified from the reference
    log itself: the in-window instantaneous std is 300-700 bar
    post-transient, so two decorrelated NPT trajectories differ in
    window-averaged P by hundreds of bar even with identical physics --
    the reference's own old-vs-new logs agree to 7 digits only because
    they follow the SAME trajectory step-for-step. Together with the
    step-0 static check (f64 |dP| ~ 10 bar: the pressure MATH is right;
    f32 adds ~41 bar), this pins the golden-log windowed |dP| <= 282 bar
    as trajectory decorrelation, not a pressure error."""
    z = zipfile.ZipFile(ZIP)
    name = [n for n in z.namelist()
            if n.endswith("log_relaxing_new.lammps")][0]
    rows, on, hdr = [], False, None
    for ln in z.read(name).decode("utf8", "replace").splitlines():
        t = ln.split()
        if len(t) >= 5 and t[0] == "Step":
            on, hdr = True, t
            continue
        if on:
            try:
                rows.append([float(v) for v in t[:len(hdr)]])
            except ValueError:
                on = False
    rows = np.array([r for r in rows if len(r) == len(hdr)])
    steps = rows[:, hdr.index("Step")]
    press = rows[:, hdr.index("Press")]
    sel = steps <= 1000
    steps, press = steps[sel], press[sel]
    wstd = []
    for w0 in range(200, 1000, 100):       # skip the violent transient
        m = (steps > w0) & (steps <= w0 + 100)
        wstd.append(float(press[m].std()))
    return {
        "ref_window_P_std_bar": [round(v, 1) for v in wstd],
        "ref_instantaneous_P_std_bar": round(
            float(press[steps > 200].std()), 1),
        "note": "in-window sigma(P) of the reference trajectory itself; "
                "windowed |dP| between decorrelated trajectories of this "
                "scene is bounded below by this scale",
    }


def main():
    # x64 mode breaks Mosaic lowering of the f32 Pallas kernels (i64 consts
    # leak into the kernel), so each precision runs in its own subprocess
    prec_env = os.environ.get("MZT_PRESS_PREC")
    if prec_env is None:
        import subprocess
        merged = {}
        for prec in ("f32", "f64"):
            env = dict(os.environ, MZT_PRESS_PREC=prec)
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True)
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode:
                raise SystemExit(f"{prec} pass failed rc={r.returncode}")
            merged.update(json.loads(r.stdout.strip().splitlines()[-1]))
        merged["f32_vs_f64_dP_bar"] = (merged["f32"]["press_bar"]
                                       - merged["f64"]["press_bar"])
        merged["trajectory_noise_floor"] = _noise_floor()
        os.makedirs(ART, exist_ok=True)
        with open(os.path.join(ART, "press_check.json"), "w") as fh:
            json.dump(merged, fh, indent=1)
        log("wrote artifacts/press_check.json")
        print(json.dumps(
            {"f32_vs_f64_dP_bar": merged["f32_vs_f64_dP_bar"],
             "dP_f64_vs_ref": merged["f64"]["dP_vs_ref_bar"],
             "dP_f32_vs_ref": merged["f32"]["dP_vs_ref_bar"]}))
        return

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if prec_env == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import tempfile
    from meng_zhang_tpu.io.lammps_data import read_data
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.models.annp import (compact_neighbor_rows,
                                            energy_forces_virial_chunked,
                                            make_annp)
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.system.neighbors import (build_neighbors_cell,
                                                 cell_grid_dims)
    from meng_zhang_tpu.units import NKTV2P

    tmp = tempfile.mkdtemp(prefix="mzpress")
    zipfile.ZipFile(ZIP).extractall(tmp)
    base = os.path.join(tmp, "performance comparsion")
    d = read_data(os.path.join(base, "fe_st.dat"))
    pot = read_ann(os.path.join(base, "fe_annp_potential_2.ann"))
    pbc = (False, True, False)
    n = d.n

    # LAMMPS `m` boundary: box face = shrink-wrapped to atom extent + SMALL,
    # but never inside the data-file bound
    ext = {}
    for axis, per in enumerate(pbc):
        if per:
            ext[axis] = float(d.box[axis])
        else:
            lo = min(0.0, float(np.min(d.x[:, axis])))
            hi = max(float(d.box[axis]), float(np.max(d.x[:, axis])))
            ext[axis] = hi - lo
    v_m = ext[0] * ext[1] * ext[2]
    log(f"shrink-wrapped volume: {v_m:.1f} A^3 (log says {V_REF}; "
        f"file box {float(np.prod(d.box)):.1f})")

    rlist = pot.cut + 0.6
    dims = cell_grid_dims(np.asarray(d.box), rlist)

    out = {"n": n, "vol_shrinkwrap": v_m, "vol_file": float(np.prod(d.box)),
           "vol_ref": V_REF, "press_ref_bar": P_REF}

    for prec, dtype in ((prec_env, jnp.float32 if prec_env == "f32"
                         else jnp.float64),):
        mcfg, params = make_annp(pot, dtype=dtype, pbc=pbc)
        x = jnp.asarray(d.x, dtype)
        box = jnp.asarray(d.box, dtype)
        nbrs = build_neighbors_cell(x, box, rlist, 192, dims, 96, pbc=pbc,
                                    with_rev=(prec == "f32"))
        assert not bool(nbrs.overflow)
        if prec == "f32":
            pk = PallasAnnp(mcfg, params)
            e, f, w = pk.energy_forces(x, box, nbrs.idx, nbrs.rev,
                                       want_virial=True, shift=False)
            e = float(e) + n * mcfg.e_shift
        else:
            idx_s, ovf = compact_neighbor_rows(x, box, nbrs.idx, mcfg.cut,
                                               128, pbc=pbc)
            assert not bool(ovf)
            e, f, w = energy_forces_virial_chunked(
                mcfg, params, x, box, idx_s, chunk=256, shift=True)
            e = float(e)
        w = np.asarray(w, np.float64)
        diag = np.diagonal(w)
        p_axis_m = diag / v_m * NKTV2P            # T = 0: no kinetic part
        p_tot_m = float(np.sum(p_axis_m) / 3.0)
        p_tot_file = float(np.sum(diag) / 3.0 / np.prod(d.box) * NKTV2P)
        log(f"{prec}: PE={e:.8e} eV  P(shrinkwrap V)={p_tot_m:.2f} bar "
            f"(ref {P_REF})  P(file V)={p_tot_file:.2f}  "
            f"[pxx,pyy,pzz]={np.round(p_axis_m, 1)}")
        out[prec] = {
            "pe_eV": e, "press_bar": p_tot_m, "press_file_vol_bar": p_tot_file,
            "p_axis_bar": [float(v) for v in p_axis_m],
            "dP_vs_ref_bar": p_tot_m - P_REF,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
