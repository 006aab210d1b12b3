"""Command-line MD runner -- the user-facing equivalent of the reference's
LAMMPS input scripts (in.st_test: units metal / read_data / pair_style annp /
pair_coeff / velocity create / fix npt / minimize / run N).

Example (the benchmark scene's workflow):
    python -m meng_zhang_tpu \
        --data fe_st.dat --potential fe_annp_potential_2.ann \
        --ensemble npt --temp 300 --pdamp 1.0 --couple y \
        --steps 1000 --dt 0.001 --thermo 10 --dump traj.lammpstrj
"""
from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_parser():
    ap = argparse.ArgumentParser(
        prog="meng_zhang_tpu",
        description="TPU-native MD with ANNP/ANNA-ADP neural-network potentials")
    src = ap.add_argument_group("scene")
    src.add_argument("--data", help="LAMMPS data file (atomic style)")
    src.add_argument("--lattice", choices=("bcc", "fcc"),
                     help="generate a perfect lattice instead of --data")
    src.add_argument("--cells", type=int, nargs=3, default=(10, 10, 10))
    src.add_argument("--lattice-a", type=float, default=2.8553)
    src.add_argument("--replicate", type=int, nargs=3,
                     help="replicate the scene (nx ny nz)")

    pot = ap.add_argument_group("potential")
    pot.add_argument("--potential", required=True, help=".ann or .anna file")
    pot.add_argument("--model", choices=("annp", "anna"), default=None,
                     help="default: by file extension")
    pot.add_argument("--engine", choices=("pallas", "xla"), default="pallas",
                     help="pallas: fused TPU kernels (Chebyshev annp only)")

    md = ap.add_argument_group("dynamics")
    md.add_argument("--ensemble", choices=("nve", "nvt", "npt", "langevin"),
                    default="nve")
    md.add_argument("--steps", type=int, default=100)
    md.add_argument("--dt", type=float, default=0.001, help="ps")
    md.add_argument("--temp", type=float, default=300.0)
    md.add_argument("--tdamp", type=float, default=0.1, help="ps")
    md.add_argument("--press", type=float, default=0.0, help="bar")
    md.add_argument("--pdamp", type=float, default=1.0, help="ps")
    md.add_argument("--couple", default="xyz",
                    help="NPT coupled axes, e.g. 'y' (in.st_test couples y)")
    md.add_argument("--seed", type=int, default=4928459)
    md.add_argument("--minimize", action="store_true",
                    help="FIRE relaxation before dynamics")
    md.add_argument("--min-ftol", type=float, default=1e-4)

    nb = ap.add_argument_group("neighbors")
    nb.add_argument("--skin", type=float, default=2.0, help="A (in.st_test:9)")
    nb.add_argument("--capacity", type=int, default=256)
    nb.add_argument("--boundary", default="p p p",
                    help="per-axis boundary like LAMMPS, e.g. 'm p m' "
                         "(the benchmark scene, in.st_test:7); "
                         "m/f/s = non-periodic, p = periodic")

    out = ap.add_argument_group("output")
    out.add_argument("--thermo", type=int, default=10, help="steps per row")
    out.add_argument("--dump", help="write .lammpstrj every thermo interval")
    out.add_argument("--dump-peratom", action="store_true",
                     help="add per-atom energy (c_pe) -- and per-atom "
                          "stress columns (c_stress[1..6], eV, LAMMPS "
                          "vatom order) on the pallas engine -- to --dump "
                          "(compute pe/atom + stress/atom)")
    out.add_argument("--checkpoint", help="write final state to .npz")
    out.add_argument("--restart", help="resume from a checkpoint .npz")
    out.add_argument("--profile", action="store_true")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mzt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from .geometry import lattice as L
    from .io.lammps_data import LammpsData, read_data
    from .io.potential import read_ann, read_anna
    from .md.simulation import MDConfig, Simulator
    from .models import anna_adp, annp
    from .system.neighbors import cell_grid_dims
    from . import profiling

    if args.profile:
        profiling.enable()

    # ---- scene ----
    types = None
    if args.data:
        data = read_data(args.data)
        if args.replicate:
            data = L.replicate_data(data, args.replicate)
        x_np, box_np, types = data.x, data.box, data.types
        masses_in = data.masses
    elif args.lattice:
        basis = L.BCC_BASIS if args.lattice == "bcc" else L.FCC_BASIS
        x_np, box_np = L.simple_lattice(args.cells, args.lattice_a, basis)
        masses_in = None
    else:
        sys.exit("error: provide --data or --lattice")

    # ---- potential/model ----
    btoks = args.boundary.split() if " " in args.boundary else list(args.boundary)
    pbc = tuple(t.lower().startswith("p") for t in btoks)
    if len(pbc) != 3:
        sys.exit("error: --boundary needs three axis letters, e.g. 'm p m'")
    is_anna = (args.model == "anna") if args.model else \
        args.potential.endswith(".anna")
    if is_anna:
        pot = read_anna(args.potential)
        mcfg, params = anna_adp.make_anna(pot, pbc=pbc)
        model_name = "anna_adp"
    else:
        pot = read_ann(args.potential)
        mcfg, params = annp.make_annp(pot, pbc=pbc)
        model_name = "annp-" + ("behler" if pot.sym_coerad is not None
                                else "chebyshev")
    # ---- species mapping: data-file atom types -> potential elements ----
    # LAMMPS maps types to elements via the pair_coeff line; here type t maps
    # to element t-1 (generator scenes use extra types for the same element,
    # e.g. the boundary shell -- those clamp to the last element with a note).
    ne = len(pot.elements)
    elems = None
    if types is not None and int(np.max(types)) > ne:
        if ne == 1:
            log(f"note: {int(np.max(types))} atom types mapped to the single "
                f"element {pot.elements[0]} (generator boundary-shell types)")
        else:
            sys.exit(f"error: data file has {int(np.max(types))} atom types "
                     f"but the potential defines only {ne} elements; "
                     "provide a type->element mapping scene")
    if ne > 1:
        if types is None:
            log(f"note: no atom types in scene; all atoms set to element 0 "
                f"({pot.elements[0]})")
        else:
            elems = jnp.asarray(np.minimum(types, ne) - 1, jnp.int32)
    # per-atom masses: Masses section if present, else the potential's mass
    if masses_in is not None and types is not None:
        masses_np = np.asarray(masses_in)[
            np.minimum(types, len(masses_in)) - 1]
    else:
        pmass = np.asarray(pot.masses)
        if types is not None and ne > 1:
            masses_np = pmass[np.minimum(types, ne) - 1]
        else:
            masses_np = np.full(len(x_np), float(pmass[0]))
    log(f"model: {model_name}  elements={pot.elements}  cut={mcfg.cut} A  "
        f"atoms={len(x_np)}  box={np.round(box_np, 3)}")

    use_pallas = args.engine == "pallas" and model_name == "annp-chebyshev"
    if args.engine == "pallas" and not use_pallas:
        log("note: pallas engine serves Chebyshev annp (any element "
            "count); falling back to xla for this model")

    x = jnp.asarray(x_np, jnp.float32)
    box = jnp.asarray(box_np, jnp.float32)

    # ---- neighbor cutoff (ni descriptors vanish at 3.9 A) ----
    cut = mcfg.cut
    if model_name == "annp-behler":
        from .models.annp import effective_cutoff
        cut = effective_cutoff(pot)
        log(f"neighbor cutoff {cut:.3f} A (descriptor range; header lists "
            f"{mcfg.cut})")

    # All paths return SHIFT-FREE per-run PE (sum of e_at - e_shift): the
    # per-atom shift is O(-4.5e3 eV), so the shifted total of a 152k-atom
    # scene sits where f32 ULP is ~64 eV and the thermo PE column would
    # quantize. The constant n*e_shift is added back in f64 at print time.
    n_atoms = len(x_np)
    if model_name == "anna_adp":
        pe_offset = n_atoms * mcfg.e_base
    else:
        pe_offset = n_atoms * mcfg.e_shift
    if use_pallas:
        from .ops.pallas_annp import PallasAnnp
        pk = PallasAnnp(mcfg, params, elems=elems)

        def force_fn(xx, bb, nbrs):
            return pk.energy_forces(xx, bb, nbrs.idx, nbrs.rev,
                                    want_virial=True, shift=False)
    elif model_name == "anna_adp":
        def force_fn(xx, bb, nbrs):
            return anna_adp.energy_forces_virial(mcfg, params, xx, bb,
                                                 nbrs.idx, elems, shift=False)
    elif ne == 1:
        # fe/ni XLA path at scale: per-eval short-neighbor repack (K drops
        # from the skin-list capacity to the in-cutoff count -- k_annp_
        # short_nbor's job), then the [C,K]-layout chunked energy with the
        # strain-derivative virial (bounded memory at any N)
        from .models.annp import compact_neighbor_rows
        from .system.neighbors import estimate_capacity
        k_short = min(args.capacity,
                      estimate_capacity(box_np, cut, len(x_np),
                                        headroom=1.4))
        log(f"short-neighbor repack width {k_short} (list capacity "
            f"{args.capacity})")

        def force_fn(xx, bb, nbrs):
            idx_s, ovf = compact_neighbor_rows(xx, bb, nbrs.idx, cut,
                                               k_short, pbc)
            e, f, w = annp.energy_forces_virial_chunked(
                mcfg, params, xx, bb, idx_s, elems, chunk=512, shift=False)
            # poison on short-list overflow: silently dropped pairs must
            # never pass (the Pallas path does the same)
            e = jnp.where(ovf, jnp.nan, e)
            f = jnp.where(ovf, jnp.nan, f)
            return e, f, w
    else:
        pe_offset = 0.0

        def force_fn(xx, bb, nbrs):
            return annp.energy_forces_virial(mcfg, params, xx, bb, nbrs.idx,
                                             elems)

    # ---- simulator ----
    rlist = cut + args.skin
    # NPT can shrink the box; size the static cell grid with ~8% margin
    dims_box = np.asarray(box_np) * (0.92 if args.ensemble == "npt" else 1.0)
    dims = cell_grid_dims(dims_box, rlist)
    nbr_method = "cell" if min(dims) >= 3 and len(x_np) > 4096 else "n2"
    couple = tuple(ax in args.couple.lower() for ax in "xyz")
    cfg = MDConfig(
        dt=args.dt, cutoff=cut, skin=args.skin, capacity=args.capacity,
        nbr_method=nbr_method, cell_dims=dims if nbr_method == "cell" else None,
        ensemble=args.ensemble, t_target=args.temp, tau_t=args.tdamp,
        damp=args.tdamp, p_target=(args.press,) * 3, p_couple=couple,
        tau_p=args.pdamp, thermo_every=args.thermo, with_rev=use_pallas,
        pbc=pbc)
    masses = jnp.asarray(masses_np, jnp.float32)
    sim = Simulator(force_fn, masses, cfg)

    # ---- minimize ----
    if args.minimize:
        from .md.minimize import fire_relax
        log("FIRE minimization...")
        if model_name == "anna_adp":
            def ef(xx, bb, idx):
                return anna_adp.energy_forces(mcfg, params, xx, bb, idx)
        else:
            def ef(xx, bb, idx):
                return annp.energy_forces_chunked(mcfg, params, xx, bb, idx,
                                                  chunk=256)

        x, fst = fire_relax(ef, lambda xx, bb: sim.build_nbrs(xx, bb),
                            x, box, f_tol=args.min_ftol)
        log(f"  fmax={float(fst.fmax):.3e}  pe={float(fst.pe):.6f}")

    # ---- run ----
    if args.restart:
        from .md.checkpoint import load_checkpoint
        st = load_checkpoint(args.restart, sim)
        log(f"restarted from {args.restart} at step {int(st.step)}")
    else:
        st = sim.init_state(x, box, seed=args.seed, t_init=args.temp)

    dump = None
    if args.dump:
        from .io.dump import DumpWriter
        dump = DumpWriter(args.dump, types=types)

    peratom_fn = None
    if args.dump_peratom:
        if not args.dump:
            sys.exit("error: --dump-peratom needs --dump")
        if use_pallas:
            @jax.jit
            def peratom_fn(ss):
                sl = pk.compact_short(ss.x, ss.box, ss.nbrs.idx, None)
                _, _, eat, vat = pk.energy_forces_short(
                    ss.x, ss.box, sl, per_atom=True)
                return {"c_pe": eat, "c_stress": vat}
        elif model_name == "anna_adp":
            @jax.jit
            def peratom_fn(ss):
                return {"c_pe": anna_adp.atom_energies(
                    mcfg, params, ss.x, ss.box, ss.nbrs.idx, elems)}
        else:
            @jax.jit
            def peratom_fn(ss):
                return {"c_pe": annp.atom_energies(
                    mcfg, params, ss.x, ss.box, ss.nbrs.idx, elems)}

    n_blocks = max(1, args.steps // args.thermo)
    print(f"{'Step':>8} {'Temp':>10} {'PotEng':>16} {'KinEng':>12} "
          f"{'Press':>12} {'Volume':>14}")
    th0 = sim.thermo(st)
    _print_thermo(int(st.step), th0, pe_offset)
    t0 = time.time()
    for b in range(n_blocks):
        with profiling.phase("md_block"):
            st, th = sim.run(st, 1)
        _print_thermo(int(st.step), _last(th), pe_offset)
        if dump:
            with profiling.phase("dump"):
                extra = None
                if peratom_fn is not None:
                    extra = {k: np.asarray(v)
                             for k, v in peratom_fn(st).items()}
                dump.write(int(st.step), np.asarray(st.x),
                           np.asarray(st.box), v=None, extra=extra)
    wall = time.time() - t0
    steps = n_blocks * args.thermo
    log(f"Loop time {wall:.2f} s for {steps} steps with {len(x_np)} atoms "
        f"({len(x_np) * steps / wall:,.0f} atom-steps/s, "
        f"{getattr(sim, 'rebuild_count', 0)} neighbor rebuilds)")
    if bool(st.overflow):
        log("WARNING: neighbor capacity overflow occurred (results unsafe); "
            "raise --capacity")
    if bool(st.unsafe):
        log("WARNING: dangerous neighbor builds -- an atom moved > skin/2 "
            "before a rebuild landed (pairs may have been missed); raise "
            "--skin or lower --thermo")

    if dump:
        dump.close()
    if args.checkpoint:
        from .md.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint, st)
        log(f"checkpoint written to {args.checkpoint}")
    if args.profile:
        log(profiling.report())


def _last(th):
    import jax
    return jax.tree_util.tree_map(lambda a: a[-1], th)


def _print_thermo(step, th, pe_offset=0.0):
    # pe arrives shift-free (f32, ~0.01 eV resolution); the constant
    # n*e_shift offset is re-applied here in python f64
    print(f"{step:>8d} {float(th.temp):>10.3f} "
          f"{float(th.pe) + pe_offset:>16.4f} "
          f"{float(th.ke):>12.4f} {float(th.press):>12.2f} "
          f"{float(th.vol):>14.3f}", flush=True)


if __name__ == "__main__":
    main()
