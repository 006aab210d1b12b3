#!/usr/bin/env python3
"""Microbenchmark: strategies for the per-step force delivery on TPU.

The force assembly must apply a permutation (known since the last neighbor
rebuild) to three f32 planes [P, Ks] and row-sum the result. The reference
solves this with a CUDA atomic scatter (k_annp_updat); on TPU the round-2
engine re-sorts by the banded key every step (43% of the step). This script
measures the candidates for a rebuild-static replacement on the real chip:

  sort4      one 4-operand flat sort (key + x,y,z)          [current]
  sort2x3    three 2-operand flat sorts
  argsort    2-operand (key, iota) sort                     [pack-time cost]
  gather_pw  pointwise v[perm] per component (x3)
  gather_r8  pack (x,y,z) into [M, 8] rows, one row gather
  rowsort    per-row 3-int-operand sort at K=256            [pack-time cost]
  dxg128     x8-row displacement gather at Ks=128           [per-step cost]
  dxg256     x8-row displacement gather at K=256            [old per-step]

Timing fences via one-element host readback (block_until_ready is a no-op
under the axon remote plugin, see CLAUDE.md).
"""
import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    fence(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=152880)
    ap.add_argument("--ks", type=int, default=128)
    ap.add_argument("--k", type=int, default=256)
    args = ap.parse_args()
    n, ks, k = args.n, args.ks, args.k
    p = -(-n // 8) * 8
    m = p * ks
    log(f"device={jax.devices()[0].device_kind} n={n} P={p} Ks={ks} M={m}")

    rng = np.random.default_rng(0)
    key_np = rng.permutation(m).astype(np.int32)  # banded keys ~ a permutation
    perm_np = np.argsort(key_np, kind="stable").astype(np.int32)
    akey = jnp.asarray(key_np)
    perm = jnp.asarray(perm_np)
    fx, fy, fz = (jnp.asarray(rng.standard_normal(m).astype(np.float32))
                  for _ in range(3))
    res = {}

    @jax.jit
    def sort4(ak, x, y, z):
        _, sx, sy, sz = jax.lax.sort((ak, x, y, z), num_keys=1)
        return (jnp.sum(sx.reshape(p, ks), axis=1)
                + jnp.sum(sy.reshape(p, ks), axis=1)
                + jnp.sum(sz.reshape(p, ks), axis=1))

    @jax.jit
    def sort2x3(ak, x, y, z):
        o = []
        for v in (x, y, z):
            o.append(jnp.sum(jax.lax.sort((ak, v), num_keys=1)[1]
                             .reshape(p, ks), axis=1))
        return o[0] + o[1] + o[2]

    @jax.jit
    def argsort(ak):
        return jax.lax.sort((ak, jnp.arange(m, dtype=jnp.int32)),
                            num_keys=1)[1]

    @jax.jit
    def gather_pw(pm, x, y, z):
        return (jnp.sum(x[pm].reshape(p, ks), axis=1)
                + jnp.sum(y[pm].reshape(p, ks), axis=1)
                + jnp.sum(z[pm].reshape(p, ks), axis=1))

    @jax.jit
    def gather_r8(pm, x, y, z):
        v8 = jnp.stack([x, y, z, x, y, z, x, y], axis=-1)      # [M, 8]
        g = v8[pm]                                              # [M, 8] rows
        return (jnp.sum(g[:, 0].reshape(p, ks), axis=1)
                + jnp.sum(g[:, 1].reshape(p, ks), axis=1)
                + jnp.sum(g[:, 2].reshape(p, ks), axis=1))

    res["sort4"] = timeit(sort4, akey, fx, fy, fz)
    log(f"sort4     {res['sort4']*1e3:9.2f} ms")
    res["sort2x3"] = timeit(sort2x3, akey, fx, fy, fz)
    log(f"sort2x3   {res['sort2x3']*1e3:9.2f} ms")
    res["argsort"] = timeit(argsort, akey)
    log(f"argsort   {res['argsort']*1e3:9.2f} ms")
    res["gather_pw"] = timeit(gather_pw, perm, fx, fy, fz)
    log(f"gather_pw {res['gather_pw']*1e3:9.2f} ms")
    try:
        res["gather_r8"] = timeit(gather_r8, perm, fx, fy, fz)
        log(f"gather_r8 {res['gather_r8']*1e3:9.2f} ms")
    except Exception as e:
        log("gather_r8 failed:", repr(e))

    # correctness cross-check (sums are permutation-invariant per band only
    # if bands align; with a random permutation just compare global sums)
    a = sort4(akey, fx, fy, fz)
    b = gather_pw(perm, fx, fy, fz)
    log(f"sort4 vs gather_pw max|d|={float(jnp.max(jnp.abs(a - b))):.2e}")

    # pack-time / per-step gather pieces
    idx_np = rng.integers(0, n, size=(p, k)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    sidx = jnp.asarray(idx_np[:, :ks])
    x3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    box = jnp.asarray([100.0, 100.0, 100.0], jnp.float32)

    def dxg(xx, bb, ii, row_chunk=8192):
        x8 = jnp.pad(xx, ((0, 1), (0, 5)))
        kk = ii.shape[1]
        nb = ii.shape[0] // row_chunk

        def block(a):
            ii_c, i0 = a
            xj = x8[jnp.minimum(ii_c, n)]
            rows = i0 + jnp.arange(row_chunk)
            xi = xx[jnp.minimum(rows, n - 1)]
            o = []
            for d in range(3):
                dd = xi[:, d][:, None] - xj[:, :, d]
                dd = dd - bb[d] * jnp.round(dd / bb[d])
                o.append(dd)
            return tuple(o)

        outs = jax.lax.map(block, (ii.reshape(nb, row_chunk, kk),
                                   jnp.arange(nb, dtype=jnp.int32) * row_chunk))
        return [o.reshape(-1, kk) for o in outs]

    dxg_j = jax.jit(functools.partial(dxg))
    pp = (p // 8192) * 8192
    res["dxg128"] = timeit(dxg_j, x3, box, sidx[:pp])
    log(f"dxg128    {res['dxg128']*1e3:9.2f} ms")
    res["dxg256"] = timeit(dxg_j, x3, box, idx[:pp])
    log(f"dxg256    {res['dxg256']*1e3:9.2f} ms")

    @jax.jit
    def rowsort(a, b, c):
        return jax.lax.sort((a, b, c), dimension=1, num_keys=1)

    keys_np = rng.integers(0, 2, size=(p, k)).astype(np.int32)
    res["rowsort"] = timeit(rowsort, jnp.asarray(keys_np), idx, idx)
    log(f"rowsort   {res['rowsort']*1e3:9.2f} ms")

    print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
