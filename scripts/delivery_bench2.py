#!/usr/bin/env python3
"""Follow-up delivery microbenchmark: column sorts and gather-width variants.

delivery_bench.py established that the per-step force delivery is sort-bound
(flat 4-operand banded sort, 123 ms at bench-scene sizes) and that static-
permutation gathers lose 5x. This run measures the remaining candidates:

  colsort4   lax.sort along dimension=0 of [P, Ks] (key + x,y,z planes).
             If the short list were edge-colored so every column is a
             matching (pair (i,j) occupies the same slot k in both rows),
             the whole delivery becomes ONE column sort with STATIC keys --
             network depth log^2(P) instead of log^2(P*Ks).
  colsort2x3 three 2-operand column sorts (memory-lean variant).
  dxg_w4     displacement gather from [N,4]-packed rows (16B) vs x8 (32B).
  dxg_w8_c   x8 gather at larger row chunks (gather throughput vs chunk).
"""
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
    n, ks = 152880, 128
    p = -(-n // 8) * 8
    log(f"device={jax.devices()[0].device_kind} n={n} P={p} Ks={ks}")
    rng = np.random.default_rng(0)

    # per-column permutation keys (each column = a matching -> a permutation
    # of rows within the column)
    keys_np = np.stack([rng.permutation(p) for _ in range(ks)],
                       axis=1).astype(np.int32)
    ckey = jnp.asarray(keys_np)
    fx, fy, fz = (jnp.asarray(
        rng.standard_normal((p, ks)).astype(np.float32)) for _ in range(3))
    res = {}

    @jax.jit
    def colsort4(k, x, y, z):
        _, sx, sy, sz = jax.lax.sort((k, x, y, z), dimension=0, num_keys=1)
        return sx + sy + sz

    @jax.jit
    def colsort2x3(k, x, y, z):
        o = [jax.lax.sort((k, v), dimension=0, num_keys=1)[1]
             for v in (x, y, z)]
        return o[0] + o[1] + o[2]

    res["colsort4"] = timeit(colsort4, ckey, fx, fy, fz)
    log(f"colsort4   {res['colsort4']*1e3:9.2f} ms")
    res["colsort2x3"] = timeit(colsort2x3, ckey, fx, fy, fz)
    log(f"colsort2x3 {res['colsort2x3']*1e3:9.2f} ms")

    # correctness: column sort by a per-column permutation key routes row
    # values to their key positions
    a = colsort4(ckey, fx, fy, fz)
    inv = np.empty_like(keys_np)
    cols = np.arange(ks)[None, :]
    inv[keys_np, cols] = np.arange(p)[:, None]
    b = (np.asarray(fx) + np.asarray(fy) + np.asarray(fz))[inv, cols]
    log(f"colsort4 routing max|d|={np.abs(np.asarray(a) - b).max():.2e}")

    # flat banded sort with (x,y) packed as a complex64 payload: one 2-op
    # sort + one 2-op f32 sort instead of the 4-operand sort
    m = p * ks
    akey = jnp.asarray(rng.permutation(m).astype(np.int32))
    gx, gy, gz = (jnp.asarray(rng.standard_normal(m).astype(np.float32))
                  for _ in range(3))

    @jax.jit
    def sortc(ak, x, y, z):
        xy = jax.lax.complex(x, y)
        _, sxy = jax.lax.sort((ak, xy), num_keys=1)
        _, sz = jax.lax.sort((ak, z), num_keys=1)
        return (jnp.sum(jnp.real(sxy).reshape(p, ks), axis=1)
                + jnp.sum(jnp.imag(sxy).reshape(p, ks), axis=1)
                + jnp.sum(sz.reshape(p, ks), axis=1))

    @jax.jit
    def sort4flat(ak, x, y, z):
        _, sx, sy, sz = jax.lax.sort((ak, x, y, z), num_keys=1)
        return (jnp.sum(sx.reshape(p, ks), axis=1)
                + jnp.sum(sy.reshape(p, ks), axis=1)
                + jnp.sum(sz.reshape(p, ks), axis=1))

    try:
        res["sortc"] = timeit(sortc, akey, gx, gy, gz)
        log(f"sortc      {res['sortc']*1e3:9.2f} ms")
        a = sortc(akey, gx, gy, gz)
        b = sort4flat(akey, gx, gy, gz)
        log(f"sortc vs sort4 max|d|={float(jnp.max(jnp.abs(a - b))):.2e}")
    except Exception as e:
        log("sortc failed:", repr(e))
    res["sort4flat"] = timeit(sort4flat, akey, gx, gy, gz)
    log(f"sort4flat  {res['sort4flat']*1e3:9.2f} ms")

    # gather-width variants for the per-step displacement gather
    idx_np = rng.integers(0, n, size=(p, ks)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    x3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    box = jnp.asarray([100.0, 100.0, 100.0], jnp.float32)

    def dxg(w, row_chunk, xx, bb, ii):
        xw = jnp.pad(xx, ((0, 1), (0, w - 3)))
        kk = ii.shape[1]
        nb = ii.shape[0] // row_chunk

        def block(a):
            ii_c, i0 = a
            xj = xw[jnp.minimum(ii_c, n)]
            rows = i0 + jnp.arange(row_chunk)
            xi = xx[jnp.minimum(rows, n - 1)]
            o = []
            for d in range(3):
                dd = xi[:, d][:, None] - xj[:, :, d]
                dd = dd - bb[d] * jnp.round(dd / bb[d])
                o.append(dd)
            return tuple(o)

        outs = jax.lax.map(block, (ii.reshape(nb, row_chunk, kk),
                                   jnp.arange(nb, dtype=jnp.int32)
                                   * row_chunk))
        return [o.reshape(-1, kk) for o in outs]

    for name, w, rc in (("dxg_w8_8k", 8, 8192), ("dxg_w4_8k", 4, 8192),
                        ("dxg_w8_32k", 8, 32768), ("dxg_w8_4k", 8, 4096)):
        pp = (p // rc) * rc
        f = jax.jit(functools.partial(dxg, w, rc))
        res[name] = timeit(f, x3, box, idx[:pp])
        log(f"{name:11s}{res[name]*1e3:9.2f} ms")

    print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
