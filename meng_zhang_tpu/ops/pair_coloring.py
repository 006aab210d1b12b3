"""Symmetric pair-lane coloring for the column-sorted force delivery.

The per-step force assembly of the fused ANNP path routes every pair's
partner contribution to the partner's row with ONE flat sort over the
[P, Ks] table (ops/pallas_annp._assemble, 123 ms at the 152,880-atom
benchmark -- 55% of the step; artifacts/profile_bench.json). Sorting the
table ALONG COLUMNS instead costs 62 ms (artifacts/delivery_bench2.txt),
but is only correct when every column's delivery keys form a permutation
of the row space -- i.e. when pair (i, j) occupies the SAME lane c in
row i and row j: lanes are colors of a proper edge coloring of the
short-neighbor graph, and empty cells self-deliver.

This module computes such a coloring DETERMINISTICALLY from lattice
geometry, with zero cross-row communication:

  * Positions quantize onto a box-tracking grid h_d = box_d / P0_d
    (P0 = the initial box in half-lattice units, so NPT breathing keeps
    the grid commensurate). Each short pair maps to a lattice offset
    q = round(dx/h); its +-q class owns a sub-palette of s_c in {2,3}
    cyclic colors indexed by the chain position of the pair along the
    class direction: m = floor(<tail_site_wrapped, w_c> / 2^lv) mod s_c,
    where the TAIL is the endpoint the canonical offset points away from
    (both rows pick the same atom), sites are wrapped into [0, P0_d) on
    periodic dims, and the integer functional w_c is solved per class so
    consecutive same-class pairs at an atom always alternate and the
    periodic wrap shifts m by a multiple of s_c. Only classes running
    purely along a periodic axis with an odd cycle count keep an
    s_c = 3 sub-palette (a genuine odd-cycle obstruction): bcc-Fe on the
    benchmark box needs 113 <= 128 colors.
  * 5th-shell offsets (|o| ~ 6.98 A > the 6.5 A cutoff, but inside
    rc + short_delta when thermally jittered) are RESIDUAL classes: they
    get no palette colors. Each row stores its residual pairs in the
    spare lanes [n_colors, Ks), ordered by the symmetric pair id, and
    their delivery is a small flat sort over just those lanes: since
    residual-ness is pair-symmetric, every row receives exactly as many
    residual values as it stores, and the (dest, pair-id) sort order
    aligns incoming values with the receiver's own lane order exactly.
    ~4.5 residual pairs/atom at 300 K (measured max 13 <= 15 spare
    lanes); a row exceeding the spare lanes trips color_bad.
  * Pairs whose offset is in NO table (6th shell and beyond, or defect
    environments) are dropped; the compaction returns the drift bound
    `guard` under which a dropped pair provably cannot reach the cutoff
    (in a thermal crystal no such pair exists and guard stays at its
    short_delta/2 cap).
  * Correctness never rests on the lattice assumptions: duplicate colors
    trip `color_bad` at compaction (the host falls back to the banded
    delivery for the epoch), and the per-step delivery sorts re-verify
    the permutation property against an iota for free, poisoning the
    forces NaN on violation. Colors are symmetric by construction: both
    rows compute them from the same (site_i, site_j, q), and
    q_ij = -q_ji exactly in f32 (negation and round are sign-symmetric).

There is no reference analogue: the reference scatters pair forces with
atomicAdd (fe/lib/lal_annp.cu k_annp force accumulation); this replaces
the TPU's sort-based substitute for those atomics with cheaper sort
shapes, not different physics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# lattice constant of the shipped bcc-Fe potentials; callers may override
A_BCC_FE = 2.8553

RES_BASE = 127            # base field sentinel marking a residual class


class ColoringSpec(NamedTuple):
    """Static coloring tables (jit constants) + grid geometry."""
    lut_lo: jax.Array    # [Mh] f32: low 16 bits of the packed class word
    lut_hi: jax.Array    # [Mh] f32: high bits
    hash_c: tuple        # perfect-hash coefficients (static ints)
    hash_mod: int        # Mh
    p0: tuple            # static cells-per-dim of the quantization grid
    pbc: tuple           # which dims wrap sites
    n_colors: int        # palette size (<= Ks); spare lanes are residual


# packed class word layout (must round-trip exactly through two f32 table
# columns: lo = low 16 bits <= 65535, hi = the rest <= 2^15)
_ENC_BITS = 11           # enc(q) in [0, 1331); 2047 = invalid sentinel
_BASE_SHIFT = 11         # 7 bits (127 = residual class)
_LV_SHIFT = 18           # 2 bits
_S_SHIFT = 20            # 2 bits (stores s - 2)
_W_SHIFT = 22            # 3 x 3 bits, each w + 2 in [0, 4]


def _enc_np(q):
    return (q[..., 0] + 5) * 121 + (q[..., 1] + 5) * 11 + (q[..., 2] + 5)


def _canon_np(q):
    s = np.where(q[..., 0] != 0, np.sign(q[..., 0]),
                 np.where(q[..., 1] != 0, np.sign(q[..., 1]),
                          np.sign(q[..., 2])))
    s = np.where(s == 0, 1, s)
    return q * s[..., None]


def _bcc_offsets(r2_max):
    """bcc lattice offsets (units a/2: all-even or all-odd parity) with
    0 < |o|^2 <= r2_max."""
    out = []
    for u in range(-5, 6):
        for v in range(-5, 6):
            for w in range(-5, 6):
                if (u, v, w) == (0, 0, 0):
                    continue
                if (u * u + v * v + w * w <= r2_max
                        and (u % 2, v % 2, w % 2) in ((0, 0, 0), (1, 1, 1))):
                    out.append((u, v, w))
    return np.asarray(out, np.int64)


def _v2(n):
    n = abs(int(n))
    k = 0
    while n % 2 == 0:
        n //= 2
        k += 1
    return k


def _solve_classes(classes, pbc, p0):
    """Per +-q class: (w_c, lv, s) for the tail-form chain coloring
    m = floor(<tail_site_wrapped, w_c> / 2^lv) mod s.

    Proper: the two same-class pairs at an atom have tails one class-step
    apart, so m differs by dot(o, w)/2^lv, required nonzero mod s.
    Wrap-invariant: a tail wrapping in periodic dim d shifts m by
    -P_d w_d / 2^lv, required to be an integer multiple of s."""
    ncls = len(classes)
    ws = np.zeros((ncls, 3), np.int64)
    lvs = np.zeros(ncls, np.int64)
    ss = np.zeros(ncls, np.int64)
    for ci, o in enumerate(classes):
        lv = min(_v2(c) for c in o if c != 0)
        lvs[ci] = lv
        found = None
        for s_sub in (2, 3):
            for wx in range(-2, 3):
                for wy in range(-2, 3):
                    for wz in range(-2, 3):
                        w = np.array([wx, wy, wz], np.int64)
                        dot = int(o @ w)
                        if dot % (1 << lv) != 0:
                            continue
                        if (dot >> lv) % s_sub == 0:
                            continue          # would not alternate
                        ok = True
                        for d in range(3):
                            if not pbc[d]:
                                continue
                            sh = p0[d] * int(w[d])   # tail wrap shift
                            if (sh % (1 << lv) != 0
                                    or (sh >> lv) % s_sub != 0):
                                ok = False
                                break
                        if ok:
                            found = (w, s_sub)
                            break
                    if found:
                        break
                if found:
                    break
            if found:
                break
        if found is None:
            raise ValueError(
                f"no chain functional for class {tuple(o)} with "
                f"pbc={pbc}, cells={p0} -- scene unsupported by the "
                "geometric coloring (use the banded delivery)")
        ws[ci], ss[ci] = found
    return ws, lvs, ss


def build_coloring(pbc, box0, a=A_BCC_FE, max_colors=128,
                   dtype=jnp.float32) -> ColoringSpec:
    """Host-side solver: class tables for a bcc lattice of constant `a`
    aligned with the box axes. Raises ValueError when the palette would
    exceed max_colors or a class has no valid chain functional; callers
    should fall back to the banded delivery then."""
    box0 = np.asarray(box0, np.float64)
    p0 = tuple(int(round(b / (a / 2.0))) for b in box0)
    if any(p < 2 for p in p0):
        raise ValueError(f"box {box0} too thin for the a={a} grid")
    base_offs = _bcc_offsets(20)          # shells 1-4 (within the cutoff)
    classes = np.unique(_canon_np(base_offs), axis=0)
    ws, lvs, ss = _solve_classes(classes, pbc, p0)
    bases = np.concatenate([[0], np.cumsum(ss)[:-1]])
    n_colors = int(ss.sum())
    if n_colors >= max_colors - 1:
        raise ValueError(f"palette {n_colors} leaves no residual lanes "
                         f"under {max_colors}")

    all_offs = _bcc_offsets(24)           # + shell 5 (residual classes)
    oc = _canon_np(all_offs)
    key_of = {tuple(c): k for k, c in enumerate(classes)}

    # perfect hash of the full offset set into [0, Mh)
    rng = np.random.default_rng(12345)
    hash_c = None
    for mh in (256, 512):
        for _ in range(300000):
            c = rng.integers(1, 1 << 20, 3)
            hh = (all_offs @ c) % mh
            if len(np.unique(hh)) == len(all_offs):
                hash_c, hash_mod = tuple(int(v) for v in c), mh
                break
        if hash_c is not None:
            break
    assert hash_c is not None, "no perfect hash found"

    lut = np.full(hash_mod, 2047, np.int64)     # invalid: enc sentinel 2047
    for oi, o in enumerate(all_offs):
        ci = key_of.get(tuple(oc[oi]))
        if ci is None:                          # residual (5th shell)
            word = int(_enc_np(o)) | (RES_BASE << _BASE_SHIFT)
        else:
            word = (int(_enc_np(o))
                    | int(bases[ci]) << _BASE_SHIFT
                    | int(lvs[ci]) << _LV_SHIFT
                    | (int(ss[ci]) - 2) << _S_SHIFT)
            for d in range(3):
                word |= (int(ws[ci][d]) + 2) << (_W_SHIFT + 3 * d)
        lut[(o @ np.asarray(hash_c)) % hash_mod] = word
    return ColoringSpec(
        lut_lo=jnp.asarray(lut & 0xFFFF, dtype),
        lut_hi=jnp.asarray(lut >> 16, dtype),
        hash_c=hash_c, hash_mod=hash_mod, p0=p0, pbc=tuple(bool(b)
                                                           for b in pbc),
        n_colors=n_colors)


def pair_colors(spec: ColoringSpec, site_i, site_j, q, mm_rows=16384,
                amb_i=None, amb_j=None):
    """Colors for a [C, K] pair block.

    site_i [C, 3], site_j [C, K, 3], q [C, K, 3]: int32 grid sites (raw,
    unwrapped) and quantized minimum-image offsets. Returns
    (col int32 [C, K] in [0, n_colors), kind int32 [C, K]) with kind
    0 = off-table, 1 = palette-colored, 2 = residual class.

    amb_i [C] / amb_j [C, K] (bool): atoms whose raw site quantization is
    ambiguous (|frac(x/h) - 1/2| small on some axis -- surface-relaxed
    layers straddling a half-grid plane). A pair whose TAIL atom is
    ambiguous is demoted to residual (kind 2): the chain position m reads
    the tail site, and a misrounded tail breaks the alternation proof
    (the recurring `dup` fallbacks). Both rows read the same tail atom,
    so the demotion is pair-symmetric.
    The table lookup runs as a one-hot matmul in row chunks (a plain
    gather from the small table costs 215 ms at the benchmark size on
    the v5e; the matmul form costs ~15 ms)."""
    c_, k_ = q.shape[:2]
    e = (q[..., 0] * spec.hash_c[0] + q[..., 1] * spec.hash_c[1]
         + q[..., 2] * spec.hash_c[2]) % spec.hash_mod    # [C, K]
    flat = e.reshape(-1)
    pad = (-flat.shape[0]) % mm_rows
    flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)]) if pad else flat
    tbl = jnp.stack([spec.lut_lo, spec.lut_hi], axis=1)     # [Mh, 2]

    def blk(ec):
        oh = jax.nn.one_hot(ec, spec.hash_mod, dtype=spec.lut_lo.dtype)
        return jnp.dot(oh, tbl, precision=jax.lax.Precision.HIGHEST)

    nb = flat.shape[0] // mm_rows
    if nb > 1:
        parts = jax.lax.map(blk, flat.reshape(nb, mm_rows, ))
        lohi = parts.reshape(nb * mm_rows, 2)
    else:
        lohi = blk(flat)
    word = (lohi[:, 0].astype(jnp.int32)
            + (lohi[:, 1].astype(jnp.int32) << 16))
    word = word[:c_ * k_].reshape(c_, k_)

    enc = ((q[..., 0] + 5) * 121 + (q[..., 1] + 5) * 11 + (q[..., 2] + 5))
    in_range = (jnp.abs(q) <= 5).all(-1)
    valid = in_range & ((word & 2047) == enc)
    base = (word >> _BASE_SHIFT) & 127
    residual = valid & (base == RES_BASE)

    # canonical sign of q (first nonzero component positive); the TAIL is
    # the endpoint the canonical offset points FROM: q = s_i - s_j, so
    # sgn=+1 (q == o) means i = j + o -> tail j; sgn=-1 -> tail i
    sx, sy, sz = q[..., 0], q[..., 1], q[..., 2]
    sgn = jnp.where(sx != 0, jnp.sign(sx),
                    jnp.where(sy != 0, jnp.sign(sy), jnp.sign(sz)))
    lv = (word >> _LV_SHIFT) & 3
    s = ((word >> _S_SHIFT) & 3) + 2
    psi = jnp.zeros(e.shape, jnp.int32)
    for d in range(3):
        td = jnp.where(sgn > 0, site_j[:, :, d], site_i[:, None, d])
        if spec.pbc[d]:
            td = jnp.mod(td, spec.p0[d])
        wd = ((word >> (_W_SHIFT + 3 * d)) & 7) - 2
        psi = psi + td * wd
    m = jax.lax.shift_right_arithmetic(psi, lv)
    col = base + jnp.mod(m, s)
    if amb_i is not None:
        tail_amb = jnp.where(sgn > 0, amb_j, amb_i[:, None])
        residual = residual | (valid & tail_amb)
    kind = jnp.where(residual, 2, jnp.where(valid, 1, 0)).astype(jnp.int32)
    return jnp.where(kind == 1, col, 0), kind
