#!/usr/bin/env python3
"""Convergence census for the symmetric pair-lane coloring (numpy oracle).

The per-step force-delivery sort is 55% of the bench step (flat banded
4-operand sort, 123 ms; artifacts/profile_bench.json). A column sort routes
the same delivery in 63 ms (artifacts/delivery_bench2.txt) IF every column of
the [P, Ks] pair table is a matching: pair (i, j) stored at the SAME lane c
in row i and row j, with per-column destination rows then distinct by
construction and filler cells self-keyed (key = own row) completing each
column to an exact permutation of [0, P).

That lane assignment is a proper edge coloring of the short-neighbor graph
with Ks = 128 colors (max degree ~112 at rc+0.4 on the bench scene). This
script measures, on the REAL 152,880-atom benchmark scene, how many rounds a
sort-friendly distributed greedy needs:

  round: each uncolored pair picks the lowest color free in BOTH endpoint
  rows, rotated by a pair-symmetric hash so siblings spread; a pick is kept
  only if unique in both rows this round (including against already-colored
  entries). All steps are expressible on TPU as row sorts + one flat
  akey-payload sort per round (the accept sync) + a [P, 4]-word bitmask
  gather.

Writes artifacts/color_census.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")
ZIP = "/root/reference/annp-gpu-lammps/fe_v2/performance test.zip"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pairs(rc_s):
    """(i, j) pairs within rc_s from the reference benchmark scene."""
    import tempfile
    import zipfile
    from meng_zhang_tpu.io.lammps_data import read_data
    tmp = tempfile.mkdtemp(prefix="mzcensus")
    zipfile.ZipFile(ZIP).extractall(tmp)
    d = read_data(os.path.join(tmp, "performance comparsion", "fe_st.dat"))
    x, box = d.x.astype(np.float64), d.box.astype(np.float64)
    # boundary m p m: y periodic only
    try:
        from scipy.spatial import cKDTree
        xw = x.copy()
        xw[:, 1] = np.mod(xw[:, 1], box[1])
        t = cKDTree(xw, boxsize=[box[0] * 4.0, box[1], box[2] * 4.0])
        pairs = t.query_pairs(rc_s, output_type="ndarray")
        return pairs.astype(np.int64), len(x)
    except ImportError:
        # cell-bin fallback
        log("no scipy; cell-bin pair build")
        dims = np.maximum((box / rc_s).astype(int), 1)
        cell = np.minimum((x / box * dims).astype(int), dims - 1)
        cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
        order = np.argsort(cid)
        pairs = []
        # brute per cell-neighborhood (slow but one-shot)
        from collections import defaultdict
        buckets = defaultdict(list)
        for idx in order:
            buckets[tuple(cell[idx])].append(idx)
        offs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
                for c in (-1, 0, 1)]
        for (cx, cy, cz), atoms in buckets.items():
            aa = np.asarray(atoms)
            for off in offs:
                nb = ((cx + off[0]), (cy + off[1]) % dims[1], (cz + off[2]))
                if nb not in buckets:
                    continue
                bb = np.asarray(buckets[nb])
                dx = x[aa][:, None, :] - x[bb][None, :, :]
                dx[:, :, 1] -= box[1] * np.round(dx[:, :, 1] / box[1])
                r2 = (dx * dx).sum(-1)
                ii, jj = np.nonzero((r2 < rc_s * rc_s) & (r2 > 1e-12))
                m = aa[ii] < bb[jj]
                pairs.append(np.stack([aa[ii][m], bb[jj][m]], 1))
        return np.concatenate(pairs), len(x)


def color_rounds(pairs, n, ncol, max_rounds, seed=0, greedy_low=True):
    """Distributed symmetric greedy coloring; returns per-round uncolored
    counts and the final colors (-1 = failed)."""
    e = len(pairs)
    colors = np.full(e, -1, np.int32)
    used = np.zeros((n, ncol), bool)
    deg = np.bincount(pairs.ravel(), minlength=n)
    rng = np.random.default_rng(seed)
    # pair-symmetric per-round rotation (both sides would compute the same)
    hist = []
    t0 = time.time()
    for rnd in range(max_rounds):
        todo = np.nonzero(colors < 0)[0]
        if len(todo) == 0:
            break
        i, j = pairs[todo, 0], pairs[todo, 1]
        free = ~(used[i] | used[j])                       # [t, ncol]
        rot = ((pairs[todo, 0] * 2654435761 + pairs[todo, 1] * 40503
                + rnd * 97) % ncol).astype(np.int64)
        if greedy_low:
            # k-th lowest free color where k = rot % min(4, nfree): prefers
            # low colors (compact palette) with a pair-symmetric tie-break
            nfree = free.sum(1)
            k = (rot % np.maximum(1, np.minimum(4, nfree))).astype(np.int64)
            csum = np.cumsum(free, axis=1)
            pick = np.argmax(csum == (k + 1)[:, None], axis=1)
            pick = np.where(nfree > 0, pick, -1)
        else:
            r = rng.random((len(todo), ncol))
            pick = np.argmax(np.where(free, r, -1.0), axis=1)
            pick = np.where(free.any(1), pick, -1)
        # winner per (row, color): unique pick across BOTH endpoint rows,
        # against siblings this round (already-colored handled via `free`)
        ok = pick >= 0
        key_i = i * ncol + pick
        key_j = j * ncol + pick
        allk = np.concatenate([key_i[ok], key_j[ok]])
        uniq, cnt = np.unique(allk, return_counts=True)
        bad = set(uniq[cnt > 1].tolist())
        keep = ok.copy()
        kk = np.nonzero(ok)[0]
        conflict = np.array([key_i[t] in bad or key_j[t] in bad for t in kk])
        keep[kk[conflict]] = False
        win = todo[keep]
        colors[win] = pick[keep]
        used[pairs[win, 0], pick[keep]] = True
        used[pairs[win, 1], pick[keep]] = True
        hist.append(int((colors < 0).sum()))
        log(f"round {rnd:2d}: uncolored {hist[-1]:8d}"
            f"  (placed {len(win)})")
        if hist[-1] == 0:
            break
    wall = time.time() - t0
    return colors, hist, deg, wall


def main():
    rc_s = float(sys.argv[1]) if len(sys.argv) > 1 else 6.9
    ncol = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    log(f"building pairs at rc_s={rc_s} ...")
    t0 = time.time()
    pairs, n = build_pairs(rc_s)
    deg = np.bincount(pairs.ravel(), minlength=n)
    log(f"{len(pairs)} pairs, {n} atoms, deg max={deg.max()} "
        f"mean={deg.mean():.1f}  ({time.time() - t0:.1f}s)")
    colors, hist, deg, wall = color_rounds(pairs, n, ncol, max_rounds=24)
    n_fail = int((colors < 0).sum())

    # validity check
    if n_fail == 0:
        key = pairs[:, 0].astype(np.int64) * ncol + colors
        key2 = pairs[:, 1].astype(np.int64) * ncol + colors
        assert len(np.unique(key)) == len(key), "row-i collision"
        assert len(np.unique(key2)) == len(key2), "row-j collision"
        log("coloring VALID (distinct per row, symmetric)")

    out = {
        "scene": f"152880-atom in.st_test pairs at rc_s={rc_s}",
        "pairs": int(len(pairs)), "deg_max": int(deg.max()),
        "deg_mean": float(round(deg.mean(), 2)), "ncolors": ncol,
        "rounds_to_converge": len(hist) if n_fail == 0 else None,
        "uncolored_per_round": hist, "failed": n_fail,
        "numpy_wall_s": round(wall, 1),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "color_census.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
