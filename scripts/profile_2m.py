#!/usr/bin/env python3
"""Per-phase TPU profile of the 2M-atom north-star config (VERDICT round-4
item 1: "a profile_2m.json showing where the remaining time goes").

Same measurement discipline as profile_bench.py (host-readback fences; the
axon plugin's block_until_ready returns at enqueue), on the STGB bicrystal
scene of scale_demo --config 2m, short path (rev-free compaction).

Phases:
  rebuild        cell build WITHOUT reverse slots (the rev-free path)
  rebuild_rev    cell build + reverse_slots (what round 4 paid -- recorded
                 to document the win; skipped with --no-rev-baseline)
  compact        compact_short(idx, None): row compaction + two-sort akey
  pipeline       _eval_pipeline_sl (chunked gather + Pallas kernels + MLP)
  assemble       banded delivery (memory-lean 3x2-op flat sorts at this M)
  energy_forces  the full short evaluation
  step_block     one NVE step inside the jitted 10-step runner

Run on the TPU: python scripts/profile_2m.py
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
FE_ANN = "/root/reference/annp-gpu-lammps/fe/fe_annp_potential_2.ann"
CACHE = "/tmp/mzt_stgb2m_1.0_d23.npz"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    return out


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-rev-baseline", action="store_true",
                    help="skip the reverse_slots rebuild baseline phase")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.models.annp import make_annp
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.system.neighbors import cell_grid_dims, reverse_slots
    from meng_zhang_tpu.units import MASS_FE

    if not os.path.exists(CACHE):
        log(f"scene cache {CACHE} missing -- run scale_demo --config 2m "
            "once to build it")
        sys.exit(1)
    dd = np.load(CACHE)
    x_np, box_np = dd["x"], dd["box"]
    min_cache = CACHE.replace(".npz", "_min.npz")
    if os.path.exists(min_cache):
        x_np = np.load(min_cache)["x"]
        log("using minimized positions")
    n = len(x_np)
    log(f"STGB scene: {n} atoms, box {np.round(box_np, 1)}")

    pot = read_ann(FE_ANN)
    mcfg, params = make_annp(pot)
    pk = PallasAnnp(mcfg, params, short_delta=0.3)
    skin, capacity, cell_cap = 0.8, 168, 48
    rlist = mcfg.cut + skin
    dims = cell_grid_dims(box_np, rlist)
    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin, capacity=capacity,
                   nbr_method="cell", cell_dims=dims, cell_capacity=cell_cap,
                   ensemble="nve", t_target=300.0, thermo_every=10,
                   with_rev=False, stale_factor=0.5, short_every=10,
                   short_skin=pk.short_delta)

    def force_fn(xx, bb, nbrs, short):
        e, f = pk.energy_forces_short(xx, bb, short, shift=False)
        return e, f, jnp.zeros((3, 3), xx.dtype)

    def short_build(xx, bb, nbrs):
        return pk.compact_short(xx, bb, nbrs.idx, None)

    sim = Simulator(force_fn, jnp.full(n, MASS_FE, jnp.float32), cfg,
                    short_build=short_build)
    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)
    res = {}

    t, nbrs = timeit(jax.jit(sim.build_nbrs), x, box, reps=2, warmup=1)
    res["rebuild"] = t
    log(f"rebuild (cell, rev-free): {t:.3f} s overflow={bool(nbrs.overflow)}")

    if not args.no_rev_baseline:
        rev_fn = jax.jit(lambda nl: reverse_slots(nl))
        t, _rev = timeit(rev_fn, nbrs, reps=2, warmup=1)
        res["rev_slots_baseline"] = t
        log(f"reverse_slots (round-4 rebuild extra): {t:.3f} s")
        del _rev

    comp = jax.jit(lambda xx, bb, ii: pk.compact_short(xx, bb, ii, None))
    t, sl = timeit(comp, x, box, nbrs.idx)
    res["compact"] = t
    log(f"compact_short (rev-free): {t:.3f} s overflow={bool(sl.overflow)}")
    assert not bool(sl.overflow)

    pipe = jax.jit(lambda xx, bb, ss: pk._eval_pipeline_sl(
        xx, bb, ss, False))
    t, outs = timeit(pipe, x, box, sl)
    res["pipeline"] = t
    log(f"pipeline (gather + kernels + MLP): {t:.3f} s")
    fjx, fjy, fjz = outs[1], outs[2], outs[3]

    # pipeline sub-phases (unchunked: the planes fit HBM at 2M now)
    gat = jax.jit(lambda xx, bb, ss: pk._pair_dx(xx, bb, ss))
    t, dplanes = timeit(gat, x, box, sl.sidx)
    res["gather"] = t
    log(f"gather (short dx planes): {t:.3f} s")
    kern = jax.jit(lambda a, b, c: pk._eval_fj(a, b, c))
    t, _ = timeit(kern, *dplanes)
    res["kernels_mlp"] = t
    log(f"kernels + MLP on planes: {t:.3f} s")
    del dplanes, _

    asm = jax.jit(lambda a, b, c, k: pk._assemble(a, b, c, k, n, pk.k_short))
    t, _ = timeit(asm, fjx, fjy, fjz, sl.akey)
    res["assemble"] = t
    log(f"assemble (lean flat sorts): {t:.3f} s")
    try:
        # the single 4-operand flat sort: ~2x the transient memory (fits
        # since the rev/ok tables are gone) but ONE sorting pass -- the
        # 153k microbench showed payload count barely moves sort cost
        pk4 = PallasAnnp(mcfg, params, short_delta=0.3)
        pk4.assemble_sort_elems = 1 << 30
        asm4 = jax.jit(lambda a, b, c, k: pk4._assemble(a, b, c, k, n,
                                                        pk4.k_short))
        t, _ = timeit(asm4, fjx, fjy, fjz, sl.akey)
        res["assemble_flat4"] = t
        log(f"assemble (one 4-op flat sort): {t:.3f} s")
    except Exception as e:
        log("assemble_flat4 failed:", repr(e))
    del fjx, fjy, fjz, outs, _

    ef = jax.jit(lambda xx, bb, ss: pk.energy_forces_short(
        xx, bb, ss, shift=False))
    t, _ = timeit(ef, x, box, sl)
    res["energy_forces"] = t
    log(f"energy_forces_short (full): {t:.3f} s")
    del _

    st = sim.init_state(x, box, seed=1, t_init=300.0)
    st, _ = sim.run_device(st, 1)
    sync(st.x)
    t0 = time.time()
    reps = 2
    for _ in range(reps):
        st, _ = sim.run_device(st, 1)
    sync(st.x)
    t = (time.time() - t0) / reps / cfg.thermo_every
    res["step_block"] = t
    log(f"full NVE step (in 10-step block): {t:.3f} s "
        f"-> {n / t:,.0f} atom-steps/s steady-state")

    tot = res["step_block"]
    out = {
        "scene": f"{n}-atom STGB NVE, skin {skin}, K={capacity}, rev-free "
                 f"short Ks={pk.k_short} delta={pk.short_delta} every=10",
        "times_s": {k: round(v, 4) for k, v in res.items()},
        "share_of_step": {k: round(v / tot, 4) for k, v in res.items()},
        "atom_steps_per_s_step": round(n / tot, 1),
        "device": str(jax.devices()[0]),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "profile_2m.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    log("wrote artifacts/profile_2m.json")
    print(json.dumps(out["times_s"]))


if __name__ == "__main__":
    main()
