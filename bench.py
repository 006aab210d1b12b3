#!/usr/bin/env python3
"""Headline benchmark. Prints ONE JSON line {"metric","value","unit","vs_baseline"}.

Default: THE reference benchmark itself -- the 152,880-atom bcc-Fe slab from
annp-gpu-lammps/fe_v2/"performance test.zip" (in.st_test: NPT 300 K,
`boundary m p m`, y-coupled barostat, skin 2.0), the exact scene behind
BASELINE.md's numbers. vs_baseline divides by the reference's aggregate
0.559 steps/s x 152,880 atoms = 85,460 atom-steps/s on 2x RTX A5000.

Budget-proofing (the round-3 driver run timed out inside the minimize
phase, BENCH_r03.json rc=124):
  * minimize replays the reference's own `minimize 1e-6 1e-6 1000 10000`
    with min_style cg -- which stops after ONE line minimization (~8 force
    evals), exactly like scripts/golden_log.py -- instead of a 60-eval FIRE;
  * the minimized positions are cached in artifacts/bench_minimized.npz
    (committed), keyed by a checksum of the data file + potential, so a
    driver run normally skips the phase entirely;
  * the persistent XLA compile cache lives in <repo>/.jax_cache so compiles
    from in-round runs carry over to the driver's end-of-round run;
  * every phase is guarded by a wall-clock deadline (MZT_BENCH_BUDGET
    seconds, default 1200): the measured window runs in chunks and stops
    early if needed, and the JSON line is printed from whatever was
    measured even if a later phase dies.

Falls back to a synthetic bcc-Fe NVE scene if the fixture is unavailable.
"""
import argparse
import hashlib
import json
import os
import sys
import time
import zipfile

BASELINE_APS = 0.559 * 152880
ZIP = "/root/reference/annp-gpu-lammps/fe_v2/performance test.zip"
FE_ANN = "/root/reference/annp-gpu-lammps/fe/fe_annp_potential_2.ann"
REPO = os.path.dirname(os.path.abspath(__file__))
MIN_NPZ = os.path.join(REPO, "artifacts", "bench_minimized.npz")
MIN_RECIPE = "cg-etol1e-6-v1"   # bump to invalidate the cached minimum

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("MZT_BENCH_BUDGET", "1200"))
# best-effort record of the measured window so main() can still print a
# JSON line if a phase after the first measured chunk dies
_partial = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return _BUDGET - (time.monotonic() - _T0)


def _scene_key(*paths):
    h = hashlib.sha256()
    h.update(MIN_RECIPE.encode())
    for p in paths:
        with open(p, "rb") as f:
            h.update(hashlib.sha256(f.read()).digest())
    return h.hexdigest()


def _load_minimized(key, n):
    import numpy as np
    try:
        z = np.load(MIN_NPZ, allow_pickle=False)
        if str(z["key"]) == key and z["x"].shape == (n, 3):
            return np.asarray(z["x"], np.float32)
        log("minimize cache: key/shape mismatch, re-minimizing")
    except FileNotFoundError:
        log("minimize cache: no artifact, minimizing fresh")
    except Exception as e:
        log("minimize cache: unreadable,", repr(e))
    return None


def _save_minimized(key, x_np):
    import numpy as np
    try:
        os.makedirs(os.path.dirname(MIN_NPZ), exist_ok=True)
        np.savez_compressed(MIN_NPZ, key=key, x=np.asarray(x_np, np.float32))
        log(f"minimize cache: saved {MIN_NPZ}")
    except OSError as e:
        log("minimize cache: save failed,", repr(e))


def run_md(x_np, box_np, pbc, ensemble, couple, steps, thermo, mcfg, params,
           capacity, skin, minimize_key=None):
    import jax
    import jax.numpy as jnp
    from meng_zhang_tpu.md.simulation import MDConfig, Simulator
    from meng_zhang_tpu.ops.pallas_annp import PallasAnnp
    from meng_zhang_tpu.system.neighbors import cell_grid_dims
    from meng_zhang_tpu.units import MASS_FE
    import numpy as np

    # short_delta=0.4 is free: bcc-Fe has no shell between 6.5 and
    # ~6.98 A (measured max in-6.9A count 112 on this scene), and
    # 0.2 A of drift covers the 10-step refresh epoch (thermal 5th-shell
    # pairs inside 6.9 A ride the colored path's residual lanes)
    coloring = None
    try:
        from meng_zhang_tpu.ops.pair_coloring import build_coloring
        coloring = build_coloring(pbc, np.asarray(box_np))
        log(f"pair coloring: palette {coloring.n_colors} colors, "
            f"grid {coloring.p0}")
    except ValueError as e:
        log(f"pair coloring unavailable ({e}); banded delivery")
    pk = PallasAnnp(mcfg, params, short_delta=0.4, coloring=coloring)

    def force_fn(xx, bb, nbrs, short):
        return pk.energy_forces_short(xx, bb, short, want_virial=True,
                                      shift=False)

    def short_build(xx, bb, nbrs):
        return pk.compact_short(xx, bb, nbrs.idx, nbrs.rev)

    short_build_colored = None
    if coloring is not None:
        def short_build_colored(xx, bb, nbrs):
            return pk.compact_short_colored(xx, bb, nbrs.idx)

    rlist = mcfg.cut + skin
    # NPT shrinks the box; size the static cell grid for up to ~8% shrink
    dims_box = np.asarray(box_np) * (0.92 if ensemble == "npt" else 1.0)
    dims = cell_grid_dims(dims_box, rlist)
    cfg = MDConfig(dt=0.001, cutoff=mcfg.cut, skin=skin, capacity=capacity,
                   nbr_method="cell", cell_dims=dims, cell_capacity=96,
                   ensemble=ensemble, t_target=300.0, tau_t=0.1,
                   p_target=(0.0,) * 3, p_couple=couple, tau_p=1.0,
                   thermo_every=thermo, with_rev=True, pbc=pbc,
                   short_every=thermo if coloring is not None else 10,
                   short_skin=pk.short_delta,
                   short_host_refresh=coloring is not None)
    n = len(x_np)
    sim = Simulator(force_fn, jnp.full(n, MASS_FE, jnp.float32), cfg,
                    short_build=short_build,
                    short_build_colored=short_build_colored)
    pe_off = n * mcfg.e_shift

    if minimize_key is not None:
        x_min = _load_minimized(minimize_key, n)
        if x_min is not None:
            x_np = x_min
            log("minimize: cached minimum loaded")
        elif remaining() < 240.0:
            log(f"minimize: SKIPPED ({remaining():.0f}s left < 240s); "
                "measuring the unminimized scene")
        else:
            # replay the reference's `minimize 1e-6 1e-6 1000 10000` with
            # min_style cg: stops after ONE steepest-descent line
            # minimization (|dE|/|E| ~ 1.2e-7 < etol), ~8 force evals --
            # the exact experiment scripts/golden_log.py replays
            from meng_zhang_tpu.md.minimize import cg_minimize
            t0 = time.time()
            x0 = jnp.asarray(x_np, jnp.float32)
            box0 = jnp.asarray(box_np, jnp.float32)
            nbrs = sim.build_nbrs(x0, box0)

            def ef(xx, bb, nbr):
                return pk.energy_forces(xx, bb, nbr[0], nbr[1], shift=False)

            st0 = cg_minimize(ef, x0, box0, (nbrs.idx, nbrs.rev), etol=1e-6,
                              ftol=1e-6, max_iter=1000, dmax=0.1,
                              e_offset=pe_off)
            x_np = np.asarray(st0.x)
            log(f"minimize (cg): {time.time() - t0:.1f}s {st0.n_iter} iters "
                f"{st0.n_evals} evals stop={st0.converged} "
                f"pe={float(st0.pe) + pe_off:.6e}")
            _save_minimized(minimize_key, x_np)

    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)

    t0 = time.time()
    st = sim.init_state(x, box, seed=4928459, t_init=300.0)
    jax.block_until_ready(st.f)
    log(f"init: {time.time() - t0:.1f}s overflow={bool(st.overflow)} "
        f"(budget left {remaining():.0f}s)")
    assert not bool(st.overflow)
    t0 = time.time()
    st, th = sim.run(st, 1)         # warmup block (includes step compile)
    jax.block_until_ready(th)
    # compile the rebuild path too: the first staleness rebuild otherwise
    # pays a ~30 s remote compile inside the measured window
    st = sim._rebuild(st)
    if sim.short_build is not None and not cfg.short_host_refresh:
        st = st._replace(short=st.short._replace(ref_x=jnp.copy(st.x)))
    if coloring is not None and remaining() > 180.0:
        # warm the banded-fallback block program too: a mid-measurement
        # color_bad epoch must not pay a fresh remote compile
        sim._colored_skip = 1
        st, th = sim.run(st, 1)
        sim._colored_skip = 0
    float(st.pe)
    log(f"warmup block + rebuild compile: {time.time() - t0:.1f}s "
        f"(budget left {remaining():.0f}s)")

    # ---- measured window, chunked against the deadline ----
    n_blocks = max(1, steps // thermo)
    chunk = 5                        # 50-step chunks between deadline checks
    done = 0
    wall = 0.0
    while done < n_blocks:
        nb = min(chunk, n_blocks - done)
        if done > 0:
            est = wall / done * nb
            if remaining() < est + 30.0:
                log(f"deadline: stopping after {done}/{n_blocks} blocks")
                break
        t0 = time.time()
        st, th = sim.run(st, nb)
        float(th.temp[-1])   # host readback: block_until_ready is a no-op
        wall += time.time() - t0  # fence under the axon remote-TPU plugin
        done += nb
        _partial["aps"] = n * done * thermo / wall
        _partial["steps"] = done * thermo
    aps = n * done * thermo / wall
    log(f"{done * thermo} steps in {wall:.2f}s -> {aps:,.0f} atom-steps/s"
        f"  T={float(th.temp[-1]):.1f}K PE={float(th.pe[-1]) + pe_off:.6e}"
        f"  rebuilds={sim.rebuild_count}"
        f" overflow={bool(st.overflow)} unsafe={bool(st.unsafe)}"
        + (f" colored/banded blocks={sim.colored_blocks}/{sim.banded_blocks}"
           if coloring is not None else ""))
    for fb in getattr(sim, "color_fallbacks", [])[:6]:
        log("  color fallback:", fb)
    assert not bool(st.overflow)
    return aps


def _emit(metric, aps):
    print(json.dumps({
        "metric": metric,
        "value": round(aps, 1),
        "unit": "atom-steps/s",
        "vs_baseline": round(aps / BASELINE_APS, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500,
                    help="measured steps (post-minimize, post-warmup)")
    # 10-step blocks: a 20-step epoch was measured to cross the colored
    # path's res_delta/2 drift guard on this scene (unsafe=True), so the
    # compaction amortization stays at 10
    ap.add_argument("--thermo", type=int, default=10)
    ap.add_argument("--no-minimize", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n-cells", type=int, default=24)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import numpy as np
    from meng_zhang_tpu.io.potential import read_ann
    from meng_zhang_tpu.models.annp import make_annp

    use_ref = (not args.synthetic) and os.path.exists(ZIP)
    metric = "reference 152880-atom bcc-Fe NPT (in.st_test scene)"
    if use_ref:
        try:
            import tempfile
            from meng_zhang_tpu.io.lammps_data import read_data
            tmp = tempfile.mkdtemp(prefix="mzbench")
            zipfile.ZipFile(ZIP).extractall(tmp)
            base = os.path.join(tmp, "performance comparsion")
            dat = os.path.join(base, "fe_st.dat")
            ann = os.path.join(base, "fe_annp_potential_2.ann")
            d = read_data(dat)
            pot = read_ann(ann)
            pbc = (False, True, False)           # boundary m p m
            mcfg, params = make_annp(pot, pbc=pbc)
            log(f"reference scene: {d.n} atoms, box {d.box}, NPT y-couple")
            key = None if args.no_minimize else _scene_key(dat, ann)
            aps = run_md(d.x, d.box, pbc, "npt", (False, True, False),
                         args.steps, args.thermo, mcfg, params,
                         capacity=192, skin=1.2, minimize_key=key)
            _emit(metric, aps)
            return
        except Exception as e:
            if _partial.get("aps"):
                # a later phase died after real blocks were measured:
                # report the measured partial window rather than nothing
                log(f"bench died after {_partial['steps']} measured steps:",
                    repr(e))
                _emit(metric, _partial["aps"])
                return
            log("reference-scene bench failed, falling back:", repr(e))

    from meng_zhang_tpu.geometry.lattice import bcc
    x_np, box_np = bcc(args.n_cells)
    rng = np.random.default_rng(0)
    x_np = x_np + rng.normal(scale=0.03, size=x_np.shape)
    pot = read_ann(FE_ANN)
    mcfg, params = make_annp(pot)
    log(f"synthetic scene: {len(x_np)} atoms NVE")
    aps = run_md(x_np, box_np, (True,) * 3, "nve", (False,) * 3,
                 args.steps, args.thermo, mcfg, params,
                 capacity=256, skin=2.0)
    _emit("bcc-Fe annp NVE throughput", aps)


if __name__ == "__main__":
    main()
