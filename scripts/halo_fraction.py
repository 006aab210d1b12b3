#!/usr/bin/env python3
"""Halo (ghost) fraction: 1-D slabs vs 2-D (x, y) mesh on a near-cubic box.

VERDICT round-2 item 5 deliverable: the table showing where the 2-D
decomposition wins. Ghost fraction = ghost rows per device / owned rows --
the per-step halo-exchange and frame-evaluation overhead of the sharded
drivers. Uses the drivers' own planning code (ShardedMD._auto_geometry /
ShardedMD2D._plan2d) on a 2M-atom-class cubic bcc-Fe scene; no MD is run.

Writes artifacts/halo_fraction.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _Stub:
    """Planning needs only the model's layout contract."""
    with_rev = False
    e_shift = 0.0


def main():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=64"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from meng_zhang_tpu.geometry.lattice import bcc
    from meng_zhang_tpu.parallel.domain import ShardConfig, ShardedMD
    from meng_zhang_tpu.parallel.domain2d import Shard2DConfig, ShardedMD2D
    from meng_zhang_tpu.parallel.domain3d import Shard3DConfig, ShardedMD3D

    cells = int(os.environ.get("HALO_CELLS", "100"))
    x_np, box_np = bcc([cells] * 3)          # 2,000,000 atoms at cells=100
    rng = np.random.default_rng(0)
    x_np = x_np + rng.normal(scale=0.03, size=x_np.shape)
    n = len(x_np)
    cutoff, skin = 6.5, 1.2
    log(f"scene: {n} atoms, cubic box {box_np[0]:.1f} A, rlist "
        f"{cutoff + skin}")

    rows = []

    def sort2d(dx):
        sx_n = n // dx
        o1 = np.argsort(x_np[:, 0], kind="stable")
        order = np.empty(n, np.int64)
        for s in range(dx):
            sl = o1[s * sx_n:(s + 1) * sx_n]
            order[s * sx_n:(s + 1) * sx_n] = sl[
                np.argsort(x_np[sl, 1], kind="stable")]
        return x_np[order]

    def sort3d(dx, dy):
        sx_n, sy_n = n // dx, n // (dx * dy)
        o1 = np.argsort(x_np[:, 0], kind="stable")
        order = np.empty(n, np.int64)
        for s in range(dx):
            sl = o1[s * sx_n:(s + 1) * sx_n]
            sl = sl[np.argsort(x_np[sl, 1], kind="stable")]
            for t in range(dy):
                bl = sl[t * sy_n:(t + 1) * sy_n]
                order[s * sx_n + t * sy_n: s * sx_n + (t + 1) * sy_n] = \
                    bl[np.argsort(x_np[bl, 2], kind="stable")]
        return x_np[order]

    xs_x = np.sort(x_np[:, 0])
    for d_tot, shapes in [(8, [None, (2, 4), (4, 2), (2, 2, 2)]),
                          (16, [None, (4, 4), (2, 2, 4)]),
                          (64, [None, (8, 8), (4, 4, 4)])]:
        c = n // d_tot
        for shape in shapes:
            if shape is not None and len(shape) == 3:
                cfg = Shard3DConfig(n_devices=d_tot, mesh_shape=shape,
                                    c_loc=c, cutoff=cutoff, skin=skin,
                                    dt=0.001)
                md = ShardedMD3D(_Stub(), 55.845, box_np, cfg)
                try:
                    md._plan3d(sort3d(shape[0], shape[1]), box_np)
                    ghost = md.c_ext3d - c
                    note = ""
                except ValueError as e:
                    ghost, note = None, str(e).split(":")[0]
                label = (f"{d_tot} dev, 3-D "
                         f"{shape[0]}x{shape[1]}x{shape[2]}")
            elif shape is None:
                cfg = ShardConfig(n_devices=d_tot, c_loc=c, cutoff=cutoff,
                                  skin=skin, dt=0.001)
                md = ShardedMD(_Stub(), 55.845, box_np, cfg)
                try:
                    md._auto_geometry(xs_x, box_np)
                    ghost = 2 * md.cfg.halo_b
                    note = ""
                except ValueError as e:
                    ghost, note = None, str(e).split(":")[0]
                label = f"{d_tot} dev, 1-D slabs"
            else:
                cfg = Shard2DConfig(n_devices=d_tot, mesh_shape=shape,
                                    c_loc=c, cutoff=cutoff, skin=skin,
                                    dt=0.001)
                md = ShardedMD2D(_Stub(), 55.845, box_np, cfg)
                try:
                    md._plan2d(sort2d(shape[0]), box_np)
                    ghost = md.c_ext2d - c
                    note = ""
                except ValueError as e:
                    ghost, note = None, str(e).split(":")[0]
                label = f"{d_tot} dev, 2-D {shape[0]}x{shape[1]}"
            frac = None if ghost is None else round(ghost / c, 3)
            rows.append({"decomp": label, "owned": c, "ghost_rows": ghost,
                         "ghost_fraction": frac, "note": note})
            log(f"{label:24s} owned={c:8d} ghost={ghost} frac={frac} {note}")

    out = {
        "scene": f"cubic bcc-Fe, {n} atoms, box {box_np[0]:.1f} A, "
                 f"rlist {cutoff + skin} A",
        "rows": rows,
        "note": "ghost fraction = frame rows beyond owned rows per device; "
                "1-D slab halo spans 2*(2*rlist+margin) of a box/D slab, "
                "2-D pays two thinner bands plus corners, 3-D pays six "
                "faces + edges/corners and overtakes 2-D at 64 devices",
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "halo_fraction.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
