#!/usr/bin/env python3
"""Per-phase performance profile of the headline bench scene on the TPU.

The reference instruments every phase with UCL_Timers (time_sh/ca/up,
fe/lib/lal_annp.h:76-111); this is our equivalent measurement discipline.
Times each pipeline stage of the 152,880-atom NPT step in isolation with
block_until_ready fences and writes artifacts/profile_bench.json with
per-phase shares, so optimization effort lands on the top item instead of
a guess.

Phases:
  compact    compact_short (refresh of the static short list, amortized
             over cfg.short_every steps in production)
  gather     _pair_dx on the short list (the per-step position gather)
  g_kernel   _run_g_harm (radial Chebyshev + harmonic ladder, Pallas)
  mlp        _mlp_eat_dedg_harm (XLA tiny MLP + B coefficients)
  f_kernel   _run_force_harm (per-pair forces, Pallas)
  assemble   banded-sort force delivery
  virial     the pairwise virial reductions
  energy_forces  the full fused evaluation (sanity: ~= sum of the above)
  step       one full NPT step inside the jitted runner
  rebuild    cell build + reverse slots

Run on the TPU: python scripts/profile_bench.py
"""
import json
import os
import sys
import time
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIP = "/root/reference/annp-gpu-lammps/fe_v2/performance test.zip"
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    """True device fence. jax.block_until_ready returns at ENQUEUE under
    the axon remote-TPU plugin (it reported a 1.1 s cell rebuild as 0.06 ms)
    -- a one-element host readback is the only reliable fence; the TPU
    executes in order, so reading the last output syncs the whole queue."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    return out


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps, out


def main():
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
    from meng_zhang_tpu.ops import pallas_annp as P
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE

    tmp = tempfile.mkdtemp(prefix="mzprof")
    zipfile.ZipFile(ZIP).extractall(tmp)
    base = os.path.join(tmp, "performance comparsion")
    d = read_data(os.path.join(base, "fe_st.dat"))
    pot = read_ann(os.path.join(base, "fe_annp_potential_2.ann"))
    pbc = (False, True, False)
    mcfg, params = make_annp(pot, pbc=pbc)
    pk = P.PallasAnnp(mcfg, params, short_delta=0.3)
    n = d.n
    x = jnp.asarray(d.x, jnp.float32)
    box = jnp.asarray(d.box, jnp.float32)
    skin = 1.2
    rlist = mcfg.cut + skin
    dims = cell_grid_dims(np.asarray(d.box) * 0.92, rlist)
    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin, capacity=192,
                   nbr_method="cell", cell_dims=dims, cell_capacity=96,
                   ensemble="npt", t_target=300.0, tau_t=0.1,
                   p_target=(0.0,) * 3, p_couple=(False, True, False),
                   tau_p=1.0, thermo_every=10, with_rev=True, pbc=pbc,
                   short_every=10, short_skin=pk.short_delta)
    sim = Simulator(
        lambda xx, bb, nbrs, short: pk.energy_forces_short(
            xx, bb, short, want_virial=True, shift=False),
        jnp.full(n, MASS_FE, jnp.float32), cfg,
        short_build=lambda xx, bb, nbrs: pk.compact_short(xx, bb, nbrs.idx,
                                                          nbrs.rev))

    log(f"scene: {n} atoms; building neighbors...")
    t, nbrs = timeit(jax.jit(sim.build_nbrs), x, box, reps=5, warmup=1)
    res = {"rebuild": t}
    log(f"rebuild (cell build + reverse slots): {t * 1e3:.2f} ms")

    # --- phase-by-phase on the fused evaluator ---
    # neighbor tables ride as jit ARGUMENTS everywhere: a [152880,256] idx
    # captured as a closure constant is 156 MB baked into the program and
    # blows the axon remote-compile request limit (HTTP 413)
    comp = jax.jit(lambda xx, bb, ii, rr: pk.compact_short(xx, bb, ii, rr))
    t, sl = timeit(comp, x, box, nbrs.idx, nbrs.rev)
    res["compact"] = t
    log(f"compact_short (refresh): {t * 1e3:.1f} ms  "
        f"overflow={bool(sl.overflow)}")

    gat = jax.jit(lambda xx, bb, ss: pk._pair_dx(xx, bb, ss))
    t, (dxx, dxy, dxz) = timeit(gat, x, box, sl.sidx)
    res["gather"] = t
    akey = sl.akey
    ok = sl.sidx < n
    log(f"gather (short dx): {t * 1e3:.1f} ms")

    g = jax.jit(lambda a, b, c: P._run_g_harm(a, b, c, pk.cfg_key))
    t, (g_raw, a_pad) = timeit(g, dxx, dxy, dxz)
    res["g_kernel"] = t
    log(f"g_kernel: {t * 1e3:.1f} ms")

    mlp = jax.jit(pk._mlp_eat_dedg_harm)
    t, (eat, dedg_rad, b) = timeit(mlp, g_raw, a_pad)
    res["mlp"] = t
    log(f"mlp glue: {t * 1e3:.1f} ms")

    fk = jax.jit(lambda a, bb, c, dd, ee: P._run_force_harm(
        a, bb, c, dd, ee, pk.cfg_key))
    t, fj = timeit(fk, dxx, dxy, dxz, dedg_rad, b)
    res["f_kernel"] = t
    log(f"f_kernel: {t * 1e3:.1f} ms")

    asm = jax.jit(lambda fjx, fjy, fjz, ak: pk._assemble(
        fjx, fjy, fjz, ak, n, pk.k_short))
    t, _ = timeit(asm, *fj, akey)
    res["assemble"] = t
    log(f"assemble (banded): {t * 1e3:.1f} ms")

    # --- colored-delivery phases (the production path when the scene's
    # geometry admits the pair coloring; see ops/pair_coloring) ---
    from meng_zhang_tpu.ops.pair_coloring import build_coloring
    try:
        spec = build_coloring(pbc, np.asarray(d.box))
        pkc = P.PallasAnnp(mcfg, params, short_delta=pk.short_delta,
                           coloring=spec)
        compc = jax.jit(lambda xx, bb, ii: pkc.compact_short_colored(
            xx, bb, ii))
        t, slc = timeit(compc, x, box, nbrs.idx)
        res["compact_colored"] = t
        log(f"compact_short_colored: {t * 1e3:.1f} ms  "
            f"color_bad={bool(slc.color_bad)} diag={int(slc.diag)}")
        asmc = jax.jit(lambda fjx, fjy, fjz, ss: pkc._assemble_colored(
            fjx, fjy, fjz, ss, n)[0])
        t, _ = timeit(asmc, *fj, slc)
        res["assemble_colored"] = t
        log(f"assemble (colored): {t * 1e3:.1f} ms")
    except ValueError as e:
        log("coloring unavailable:", e)

    def virial_only(dxx, dxy, dxz, fjx, fjy, fjz, okk):
        m = okk[:n].astype(x.dtype)
        comps = []
        for da in (dxx, dxy, dxz):
            row = [-jnp.sum(da[:n] * fb[:n] * m) for fb in (fjx, fjy, fjz)]
            comps.append(row)
        w = jnp.asarray(comps)
        return 0.5 * (w + w.T)

    t, _ = timeit(jax.jit(virial_only), dxx, dxy, dxz, *fj, ok)
    res["virial"] = t
    log(f"virial: {t * 1e3:.1f} ms")

    ef = jax.jit(lambda xx, bb, ss: pk.energy_forces_short(
        xx, bb, ss, want_virial=True, shift=False))
    t, _ = timeit(ef, x, box, sl)
    res["energy_forces"] = t
    log(f"energy_forces (full): {t * 1e3:.1f} ms")

    # --- one full step inside the jitted runner (donates state: rebind) ---
    st = sim.init_state(x, box, seed=1, t_init=300.0)
    st, _ = sim.run_device(st, 1)                 # compile + warmup
    sync(st.x)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        st, _ = sim.run_device(st, 1)
    sync(st.x)
    t = (time.time() - t0) / reps
    res["step_block"] = t / cfg.thermo_every
    log(f"full NPT step (in 10-step block): {t / cfg.thermo_every * 1e3:.1f}"
        " ms")

    tot = res["step_block"]
    shares = {k: round(v / tot, 4) for k, v in res.items()}
    out = {
        "scene": f"{n}-atom in.st_test NPT, skin {skin}, K=192, static "
                 f"short Ks={pk.k_short} delta={pk.short_delta} every={cfg.short_every}",
        "times_s": {k: round(v, 6) for k, v in res.items()},
        "share_of_step": shares,
        "atom_steps_per_s_step": round(n / res["step_block"], 1),
        "device": str(jax.devices()[0]),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "profile_bench.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    log("wrote artifacts/profile_bench.json")
    print(json.dumps(out["times_s"]))


if __name__ == "__main__":
    main()
