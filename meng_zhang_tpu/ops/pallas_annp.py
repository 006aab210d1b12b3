"""Fused Pallas TPU kernels for the Chebyshev ANNP potential (fe/fe_v2).

TPU-native replacement for the reference's CUDA mega-kernels
(k_annp / k_annp_updat, fe/lib/lal_annp.cu:349-846), redesigned for the
hardware instead of translated:

  * `_fwd_kernel`: one atom per grid step -- descriptors + tiny MLP forward
    + analytic dE/dG. The angular work runs on a [K, K] cos matrix held in
    VMEM (k on sublanes, j on lanes) with the 19-term Chebyshev recurrence
    and its weighted reductions fused in-register; nothing the size of the
    reference's _dGij scratch ever exists.
  * `_force_kernel`: i-centered per-pair forces Fj [1, K]. The reference's
    serialized single-block scatter (k_annp_updat, launch
    fe/lib/lal_annp.cpp:596) becomes a *gather* outside the kernel: with
    symmetric neighbor lists, F_a = -sum_s Fj[a,s] + sum_s Fj[idx[a,s],
    rev[a,s]] where `rev` is the reverse-slot map
    (system/neighbors.reverse_slots). Pair antisymmetry is exact in f32
    because both sides of a pair read the same stored value.

Layout rules: per-pair arrays are [1, K] rows (K a multiple of 128);
positions travel as separate x/y/z components (a trailing dim of 3 would be
tile-padded to 128).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.potential import ActivationStyle
from .pair_coloring import ColoringSpec, pair_colors

_FE_A = 1.7159
_FE_B = 0.666666666666667
_FE_C = 0.1

NSF_PAD = 128


def _act_and_grad(z, flag: int, style: str):
    if flag == 0:
        return z, jnp.ones_like(z)
    if flag == 1:
        t = jnp.tanh(z)
        return t, 1.0 - t * t
    if flag == 2:
        s = 1.0 / (1.0 + jnp.exp(z))
        return s, s * (1.0 - s)
    if style == ActivationStyle.FE:
        t = jnp.tanh(_FE_B * z)
        if flag == 3:
            return _FE_A * t, _FE_A * _FE_B * (1.0 - t * t)
        return _FE_A * t + _FE_C * z, _FE_A * _FE_B * (1.0 - t * t) + _FE_C
    t = jnp.tanh(z)
    return t, 1.0 - t * t


def _pair_geometry(dxx, dxy, dxz, rc):
    """Per-pair scalars on [1, K] rows."""
    rsq = dxx * dxx + dxy * dxy + dxz * dxz
    mask = (rsq < rc * rc) & (rsq > 1.0e-12)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    fc = jnp.where(mask, 0.5 * (jnp.cos(jnp.pi / rc * r) + 1.0), 0.0)
    dfc = jnp.where(mask, -0.5 * jnp.pi / rc * jnp.sin(jnp.pi / rc * r), 0.0)
    inv_r = 1.0 / r
    m = mask.astype(r.dtype)
    ux = dxx * inv_r * m
    uy = dxy * inv_r * m
    uz = dxz * inv_r * m
    return r, fc, dfc, inv_r, m, ux, uy, uz


def _angular_matrices(ux, uy, uz, fc, k_sz):
    """cos[k, j] = u_k . u_j and weight fc_k fc_j with zeroed diagonal."""
    uxt, uyt, uzt = (jnp.transpose(v) for v in (ux, uy, uz))   # [K, 1]
    cos = uxt * ux + uyt * uy + uzt * uz                        # [K, K]
    w = jnp.transpose(fc) * fc
    kk = jax.lax.broadcasted_iota(jnp.int32, (k_sz, k_sz), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (k_sz, k_sz), 1)
    w = jnp.where(kk == jj, 0.0, w)
    return cos, w, (kk == jj)


def _row_g(dxx, dxy, dxz, cfg):
    """Raw descriptor vector [1, nsf] plus geometry for one atom row."""
    npsf, ntsf = cfg["npsf"], cfg["ntsf"]
    rc = cfg["rc"]
    k_sz = dxx.shape[1]
    r, fc, dfc, inv_r, m, ux, uy, uz = _pair_geometry(dxx, dxy, dxz, rc)

    # radial: g[m] = sum_j T_m(2r/rc - 1) fc
    xch = 2.0 * r / rc - 1.0
    tp, tc = m, xch * m
    g_cols = [jnp.sum(tp * fc).reshape(1, 1), jnp.sum(tc * fc).reshape(1, 1)]
    for _ in range(2, npsf):
        tp, tc = tc, 2.0 * xch * tc - tp
        g_cols.append(jnp.sum(tc * fc).reshape(1, 1))

    # angular: g[npsf+n] = 0.5 sum_{j!=k} T_n((cos+1)/2) fc_j fc_k
    cos, w, _diag = _angular_matrices(ux, uy, uz, fc, k_sz)
    xa = 0.5 * (cos + 1.0)
    tp = jnp.ones_like(xa)
    tc = xa
    g_cols.append((0.5 * jnp.sum(w)).reshape(1, 1))
    g_cols.append((0.5 * jnp.sum(w * tc)).reshape(1, 1))
    for _ in range(2, ntsf):
        tp, tc = tc, 2.0 * xa * tc - tp
        g_cols.append((0.5 * jnp.sum(w * tc)).reshape(1, 1))
    return jnp.concatenate(g_cols, axis=1)                      # [1, nsf]


def _g_kernel(dxx_ref, dxy_ref, dxz_ref, g_ref, *, cfg, tile):
    """Raw descriptor vectors for a tile of atoms -> g_ref [tile, NSF_PAD].

    The tiny MLP (+ its VJP) runs outside in XLA: Mosaic cannot lower the
    28x10 matmuls, and at ~500 FLOPs/atom they are negligible anyway.
    """
    nsf = cfg["npsf"] + cfg["ntsf"]
    rows = []
    for i in range(tile):
        rows.append(_row_g(dxx_ref[i:i + 1, :], dxy_ref[i:i + 1, :],
                           dxz_ref[i:i + 1, :], cfg))
    g_raw = jnp.concatenate(rows, axis=0)                       # [tile, nsf]
    g_ref[:] = jnp.pad(g_raw, ((0, 0), (0, NSF_PAD - nsf)))


def _row_force(dxx, dxy, dxz, wn, cfg):
    """Fj [1, K] for one atom row: force ON neighbor j from this atom's
    energy term (Fj = -sum_n dEdG_n dG_n/dx_j, fe/src/pair_annp.cpp:186-209;
    wn(n) reads the SMEM-resident dE/dG scalar, pre-multiplied by
    sf_scale * e_scale)."""
    npsf, ntsf = cfg["npsf"], cfg["ntsf"]
    rc = cfg["rc"]
    k_sz = dxx.shape[1]

    r, fc, dfc, inv_r, m, ux, uy, uz = _pair_geometry(dxx, dxy, dxz, rc)

    # ---- radial: coeff[1,K] = sum_m w_m (T'_m (2/rc) fc + T_m dfc) ----
    xch = 2.0 * r / rc - 1.0
    tp, tc = m, xch * m
    dp, dc = jnp.zeros_like(r), m
    coeff = wn(0) * (tp * dfc)
    coeff = coeff + wn(1) * (dc * (2.0 / rc) * fc + tc * dfc)
    for n in range(2, npsf):
        tp, tc, dp, dc = tc, 2.0 * xch * tc - tp, dc, \
            2.0 * tc + 2.0 * xch * dc - dp
        coeff = coeff + wn(n) * (dc * (2.0 / rc) * fc + tc * dfc)
    # dG_rad/dx_j = coeff * (-u_j); Fj = -dG => +coeff*u
    fjx = coeff * ux
    fjy = coeff * uy
    fjz = coeff * uz

    # ---- angular ----
    cos, w, diag = _angular_matrices(ux, uy, uz, fc, k_sz)
    xa = 0.5 * (cos + 1.0)
    tp = jnp.where(diag, 0.0, 1.0)
    tc = xa * tp
    dp = jnp.zeros_like(xa)
    dc = tp
    p_sum = wn(npsf) * tp
    dp_sum = jnp.zeros_like(xa)
    if ntsf > 1:
        p_sum = p_sum + wn(npsf + 1) * tc
        dp_sum = dp_sum + wn(npsf + 1) * dc
    for n in range(2, ntsf):
        tp, tc, dp, dc = tc, 2.0 * xa * tc - tp, dc, \
            2.0 * tc + 2.0 * xa * dc - dp
        p_sum = p_sum + wn(npsf + n) * tc
        dp_sum = dp_sum + wn(npsf + n) * dc

    # A[k,j] = 0.25 fc_k fc_j P'(x_kj)   (0.5 tally x 0.5 dx/dcos)
    a_mat = (0.5 * 0.5) * w * dp_sum
    # B[k,j] = dfc_j fc_k P(x_kj)        (j varies along lanes)
    b_mat = jnp.where(diag, 0.0, jnp.transpose(fc) * dfc) * p_sum

    sac = jnp.sum(a_mat * cos, axis=0).reshape(1, k_sz)
    sau_x = jnp.sum(a_mat * jnp.transpose(ux), axis=0).reshape(1, k_sz)
    sau_y = jnp.sum(a_mat * jnp.transpose(uy), axis=0).reshape(1, k_sz)
    sau_z = jnp.sum(a_mat * jnp.transpose(uz), axis=0).reshape(1, k_sz)
    sb = jnp.sum(b_mat, axis=0).reshape(1, k_sz)

    # dG_ang/dx_j = 2A*(cos u_j - u_k)/r_j - B u_j;   Fj -= dG/dx_j
    out_x = (fjx - ((sac * ux - sau_x) * 2.0 * inv_r - sb * ux)) * m
    out_y = (fjy - ((sac * uy - sau_y) * 2.0 * inv_r - sb * uy)) * m
    out_z = (fjz - ((sac * uz - sau_z) * 2.0 * inv_r - sb * uz)) * m
    return out_x, out_y, out_z


def _force_kernel(dxx_ref, dxy_ref, dxz_ref, dedg_ref,
                  fjx_ref, fjy_ref, fjz_ref, *, cfg, tile):
    for i in range(tile):
        ox, oy, oz = _row_force(dxx_ref[i:i + 1, :], dxy_ref[i:i + 1, :],
                                dxz_ref[i:i + 1, :],
                                lambda n, i=i: dedg_ref[i, n], cfg)
        fjx_ref[i:i + 1, :] = ox
        fjy_ref[i:i + 1, :] = oy
        fjz_ref[i:i + 1, :] = oz


TILE = 8

# ---------------------------------------------------------------------------
# Harmonic (power-spectrum) angular path.
#
# The Chebyshev angular descriptors are pair-pair sums of a degree-n
# polynomial of cos(theta_jk):
#     G_n = 0.5 sum_{j!=k} T_n((cos+1)/2) fc_j fc_k .
# Expanding T_n((c+1)/2) = sum_l a_nl P_l(c) (finite, exact -- degree-n
# polynomial) and applying the spherical-harmonic addition theorem
# P_l(u_j . u_k) = 4pi/(2l+1) sum_m Y_lm(u_j) Y_lm(u_k) gives
#     G_n = 0.5 ( sum_l c_nl S_l  -  F2 ),
#     S_l = sum_m A_lm^2,  A_lm = sum_j fc_j Y_lm(u_j),  F2 = sum_j fc_j^2,
# with c_nl = a_nl 4pi/(2l+1) and T_n(1) = 1 handling the j==k diagonal.
# The O(K^2) angular matrices disappear: per-pair work is the L=(ntsf-1)
# real-harmonic ladder (O(K L^2)), and forces contract per-atom coefficient
# vectors B_lm = (sum_n dE/dG_n c_nl) A_lm against per-pair harmonic
# gradients. This replaces the reference's j<k tiled loops
# (fe/lib/lal_annp.cu:460-588) with a formulation the VPU runs at O(K)
# instead of O(K^2) -- a TPU-native redesign, not a translation.
# ---------------------------------------------------------------------------

AB_PAD = 384     # 361 real harmonics for L=18, padded; col 361 carries 2q


def _cheb_legendre(ntsf):
    """c[n, l] with T_n((c+1)/2) = sum_l c_nl (2l+1)/(4pi) P_l... i.e.
    sum_{j,k} T_n fcfc = sum_l c_nl S_l. Exact via Gauss-Legendre (the
    integrand is a polynomial of degree <= 2(ntsf-1) < 2*64)."""
    import numpy as _np
    nodes, wts = _np.polynomial.legendre.leggauss(64)
    xs = 0.5 * (nodes + 1.0)
    t = _np.zeros((ntsf, 64))
    t[0] = 1.0
    if ntsf > 1:
        t[1] = xs
    for n in range(2, ntsf):
        t[n] = 2.0 * xs * t[n - 1] - t[n - 2]
    p = _np.zeros((ntsf, 64))
    p[0] = 1.0
    if ntsf > 1:
        p[1] = nodes
    for l in range(2, ntsf):
        p[l] = ((2 * l - 1) * nodes * p[l - 1] - (l - 1) * p[l - 2]) / l
    # c_nl = 2pi * integral T_n((c+1)/2) P_l(c) dc
    return 2.0 * _np.pi * _np.einsum("ni,li,i->nl", t, p, wts)


def _harm_tables(lmax):
    """Normalized real-harmonic recurrence coefficients (all O(1) values).

    H_lm(z) are defined so that Y_lm^c = H_lm(z) c_m(x, y) and
    Y_lm^s = H_lm(z) s_m(x, y) with c_m + i s_m = (x + i y)^m form an
    ORTHONORMAL real basis on the sphere (addition-theorem normalized):
    H_lm = k_m N_lm P_l^m(z) / sin^m(theta), k_0 = 1, k_m>0 = sqrt(2),
    N_lm = sqrt((2l+1)/(4pi) (l-m)!/(l+m)!). Recurrences derived from the
    unnormalized P_l^m ladder with the normalization folded in so f32
    intermediates never leave O(1)-O(10)."""
    import math
    alpha = {}
    for l in range(lmax + 1):
        for m in range(l + 1):
            nlm = math.sqrt((2 * l + 1) / (4 * math.pi)
                            * math.factorial(l - m) / math.factorial(l + m))
            alpha[(l, m)] = (math.sqrt(2.0) if m > 0 else 1.0) * nlm
    dfact = 1.0
    h0 = []
    for m in range(lmax + 1):
        if m > 0:
            dfact *= (2 * m - 1)
        h0.append(alpha[(m, m)] * dfact)
    d1 = [(2 * m + 1) * alpha[(m + 1, m)] / alpha[(m, m)]
          for m in range(lmax)]
    e1, e2 = {}, {}
    for m in range(lmax + 1):
        for l in range(m + 2, lmax + 1):
            e1[(l, m)] = ((2 * l - 1) / (l - m)) * alpha[(l, m)] \
                / alpha[(l - 1, m)]
            e2[(l, m)] = ((l + m - 1) / (l - m)) * alpha[(l, m)] \
                / alpha[(l - 2, m)]
    return h0, d1, e1, e2


def _harm_layout(lmax):
    """Column order of the A/B vectors: m-major, (l ascending), cosine then
    sine. Returns l index per column (for the XLA-side B construction)."""
    l_of_col = []
    for m in range(lmax + 1):
        for l in range(m, lmax + 1):
            l_of_col.append(l)
            if m > 0:
                l_of_col.append(l)
    return l_of_col


def _g_kernel_harm(dxx_ref, dxy_ref, dxz_ref, g_ref, a_ref, *, cfg):
    """Forward: radial Chebyshev G + angular power spectrum.

    g_ref row layout: [0:npsf] radial G, [npsf:npsf+ntsf] S_l power sums,
    [npsf+ntsf] F2; a_ref: A_lm in _harm_layout order."""
    npsf, ntsf = cfg["npsf"], cfg["ntsf"]
    rc = cfg["rc"]
    lmax = ntsf - 1
    h0, d1, e1, e2 = _harm_tables(lmax)
    dxx, dxy, dxz = dxx_ref[:], dxy_ref[:], dxz_ref[:]         # [T, K]
    r, fc, dfc, inv_r, m, ux, uy, uz = _pair_geometry(dxx, dxy, dxz, rc)

    xch = 2.0 * r / rc - 1.0
    tp, tc = m, xch * m
    cols = [jnp.sum(tp * fc, axis=1, keepdims=True),
            jnp.sum(tc * fc, axis=1, keepdims=True)]
    for _ in range(2, npsf):
        tp, tc = tc, 2.0 * xch * tc - tp
        cols.append(jnp.sum(tc * fc, axis=1, keepdims=True))

    a_ref[:] = jnp.zeros_like(a_ref)
    s_l = [None] * (lmax + 1)
    cm, sm = m, jnp.zeros_like(m)                    # (ux+iuy)^0, masked
    col = 0
    for mm in range(lmax + 1):
        if mm > 0:
            cm, sm = ux * cm - uy * sm, ux * sm + uy * cm
        h1 = h2 = None
        for ll in range(mm, lmax + 1):
            if ll == mm:
                h = h0[mm] * m
            elif ll == mm + 1:
                h = d1[mm] * uz * h1
            else:
                h = e1[(ll, mm)] * uz * h1 - e2[(ll, mm)] * h2
            w = fc * h
            ac = jnp.sum(w * cm, axis=1, keepdims=True)
            a_ref[:, col:col + 1] = ac
            col += 1
            ss = ac * ac
            if mm > 0:
                as_ = jnp.sum(w * sm, axis=1, keepdims=True)
                a_ref[:, col:col + 1] = as_
                col += 1
                ss = ss + as_ * as_
            s_l[ll] = ss if s_l[ll] is None else s_l[ll] + ss
            h2, h1 = h1, h
    cols.extend(s_l)
    cols.append(jnp.sum(fc * fc, axis=1, keepdims=True))       # F2
    g_raw = jnp.concatenate(cols, axis=1)
    g_ref[:] = jnp.pad(g_raw, ((0, 0), (0, NSF_PAD - g_raw.shape[1])))


def _force_kernel_harm(dxx_ref, dxy_ref, dxz_ref, dedg_ref, b_ref,
                       fjx_ref, fjy_ref, fjz_ref, *, cfg):
    """Per-pair force Fj = -dE_i/dx_j, harmonic angular path, whole tile
    batched (no [K, K] matrices; dedg_ref holds the radial dE/dG columns,
    b_ref the 361 B_lm coefficients + 2q at col 361)."""
    npsf, ntsf = cfg["npsf"], cfg["ntsf"]
    rc = cfg["rc"]
    lmax = ntsf - 1
    h0, d1, e1, e2 = _harm_tables(lmax)
    dxx, dxy, dxz = dxx_ref[:], dxy_ref[:], dxz_ref[:]
    r, fc, dfc, inv_r, m, ux, uy, uz = _pair_geometry(dxx, dxy, dxz, rc)

    def wn(n):
        return dedg_ref[:, n:n + 1]

    # radial: coeff = sum_n w_n (T'_n (2/rc) fc + T_n dfc)
    xch = 2.0 * r / rc - 1.0
    tp, tc = m, xch * m
    dp, dc = jnp.zeros_like(r), m
    coeff = wn(0) * (tp * dfc)
    coeff = coeff + wn(1) * (dc * (2.0 / rc) * fc + tc * dfc)
    for n in range(2, npsf):
        tp, tc, dp, dc = tc, 2.0 * xch * tc - tp, dc, \
            2.0 * tc + 2.0 * xch * dc - dp
        coeff = coeff + wn(n) * (dc * (2.0 / rc) * fc + tc * dfc)

    # angular: SY = sum B Y, (Gx,Gy,Gz) = sum B dY/du
    sy = jnp.zeros_like(r)
    gx = jnp.zeros_like(r)
    gy = jnp.zeros_like(r)
    gz = jnp.zeros_like(r)
    cm, sm = m, jnp.zeros_like(m)
    cm1 = sm1 = None
    col = 0
    for mm in range(lmax + 1):
        if mm > 0:
            cm1, sm1 = cm, sm
            cm, sm = ux * cm - uy * sm, ux * sm + uy * cm
        h1 = h2 = None
        hd1 = hd2 = None
        for ll in range(mm, lmax + 1):
            if ll == mm:
                h = h0[mm] * m
                hd = jnp.zeros_like(m)
            elif ll == mm + 1:
                h = d1[mm] * uz * h1
                hd = d1[mm] * h1
            else:
                h = e1[(ll, mm)] * uz * h1 - e2[(ll, mm)] * h2
                hd = e1[(ll, mm)] * (h1 + uz * hd1) - e2[(ll, mm)] * hd2
            bc = b_ref[:, col:col + 1]
            col += 1
            if mm > 0:
                bs = b_ref[:, col:col + 1]
                col += 1
                wc = bc * cm + bs * sm
                wx = bc * cm1 + bs * sm1
                wy = bs * cm1 - bc * sm1
                gx = gx + (mm * h) * wx
                gy = gy + (mm * h) * wy
            else:
                wc = bc * cm
            sy = sy + h * wc
            gz = gz + hd * wc
            h2, h1 = h1, h
            hd2, hd1 = hd1, hd
    q2 = b_ref[:, col:col + 1]
    udotg = ux * gx + uy * gy + uz * gz
    pref = dfc * (sy + q2 * fc) + fc * inv_r * (-udotg)
    fcr = fc * inv_r
    fjx_ref[:] = (coeff + pref) * ux + fcr * gx
    fjy_ref[:] = (coeff + pref) * uy + fcr * gy
    fjz_ref[:] = (coeff + pref) * uz + fcr * gz


def _tile_spec(t, k):
    return pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _interpret():
    """Interpreter mode off-TPU so the kernels are testable on CPU."""
    return jax.default_backend() != "tpu"


def _padr(a, rows, fill):
    return jnp.concatenate(
        [a, jnp.full((rows - a.shape[0],) + a.shape[1:], fill,
                     a.dtype)]) if rows != a.shape[0] else a


@functools.partial(jax.jit, static_argnames=("cfg_key",))
def _run_g(dxx, dxy, dxz, cfg_key):
    cfg = dict(cfg_key)
    n, k = dxx.shape
    kernel = functools.partial(_g_kernel, cfg=cfg, tile=TILE)
    flops_atom = k * k * (cfg["ntsf"] * 4 + 10) + k * cfg["npsf"] * 6
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[_tile_spec(TILE, k)] * 3,
        out_specs=_tile_spec(TILE, NSF_PAD),
        out_shape=jax.ShapeDtypeStruct((n, NSF_PAD), dxx.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n * flops_atom, bytes_accessed=n * k * 16,
            transcendentals=n * k * 2),
    )(dxx, dxy, dxz)


@functools.partial(jax.jit, static_argnames=("cfg_key",))
def _run_force(dxx, dxy, dxz, dedg, cfg_key):
    cfg = dict(cfg_key)
    n, k = dxx.shape
    kernel = functools.partial(_force_kernel, cfg=cfg, tile=TILE)
    flops_atom = k * k * (cfg["ntsf"] * 8 + 16) + k * cfg["npsf"] * 10
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[_tile_spec(TILE, k)] * 3 + [
            pl.BlockSpec((TILE, NSF_PAD), lambda i: (i, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=[_tile_spec(TILE, k)] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, k), dxx.dtype)] * 3,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n * flops_atom, bytes_accessed=n * k * 28,
            transcendentals=n * k * 2),
    )(dxx, dxy, dxz, dedg)


@functools.partial(jax.jit, static_argnames=("cfg_key",))
def _run_g_harm(dxx, dxy, dxz, cfg_key):
    cfg = dict(cfg_key)
    n, k = dxx.shape
    kernel = functools.partial(_g_kernel_harm, cfg=cfg)
    lsq = cfg["ntsf"] ** 2
    flops_atom = k * (lsq * 8 + cfg["npsf"] * 6 + 40)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[_tile_spec(TILE, k)] * 3,
        out_specs=[_tile_spec(TILE, NSF_PAD), _tile_spec(TILE, AB_PAD)],
        out_shape=[jax.ShapeDtypeStruct((n, NSF_PAD), dxx.dtype),
                   jax.ShapeDtypeStruct((n, AB_PAD), dxx.dtype)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n * flops_atom, bytes_accessed=n * (k * 12 + AB_PAD * 4),
            transcendentals=n * k * 2),
    )(dxx, dxy, dxz)


@functools.partial(jax.jit, static_argnames=("cfg_key",))
def _run_force_harm(dxx, dxy, dxz, dedg_rad, b, cfg_key):
    cfg = dict(cfg_key)
    n, k = dxx.shape
    kernel = functools.partial(_force_kernel_harm, cfg=cfg)
    lsq = cfg["ntsf"] ** 2
    flops_atom = k * (lsq * 14 + cfg["npsf"] * 10 + 60)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[_tile_spec(TILE, k)] * 3 + [
            _tile_spec(TILE, NSF_PAD), _tile_spec(TILE, AB_PAD)],
        out_specs=[_tile_spec(TILE, k)] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, k), dxx.dtype)] * 3,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n * flops_atom,
            bytes_accessed=n * (k * 24 + (NSF_PAD + AB_PAD) * 4),
            transcendentals=n * k * 2),
    )(dxx, dxy, dxz, dedg_rad, b)


class ShortList(NamedTuple):
    """Refresh-static short-neighbor list (see PallasAnnp.compact_short).

    Built every few steps from the skin list by compacting each row to its
    entries within rc + short_delta; between refreshes the per-step force
    evaluation is just gather + kernels + one delivery sort -- the per-step
    distance test and row compaction of the round-2 repack are gone.
    Measured on the v5e (artifacts/delivery_bench2.txt): the Ks=128 gather
    costs 55 ms where the per-step K=256 repack cost 124 ms.

    Two variants share the type (the populated fields select the delivery
    mode, and with it the jit specialization):
      * banded (compact_short): akey set, skey/guard/color_bad None; rows
        are in-cutoff prefixes, delivery is one flat 4-operand sort.
      * colored (compact_short_colored): akey None; lanes are palette
        colors of the symmetric pair coloring (ops/pair_coloring), and
        delivery is a per-column sort -- 62 ms vs 123 ms at the
        152,880-atom benchmark (artifacts/delivery_bench2.txt).
    """
    sidx: jax.Array      # [P, Ks] partner index, n for filler lanes
    akey: Optional[jax.Array]  # [P, Ks] banded delivery key (banded mode)
    ok: Optional[jax.Array]    # None -- validity is sidx < n (the field
                               # survives for pytree compatibility)
    ref_x: jax.Array     # [N, 3] positions at compaction (staleness check)
    overflow: jax.Array  # bool: some row had > Ks entries within rc+delta
    skey: Optional[jax.Array] = None   # [P, Ks] colored delivery key:
                                       # partner row for real lanes, own row
                                       # for fillers (colored mode)
    guard: Optional[jax.Array] = None  # f32 scalar: max per-atom drift (A)
                                       # under which dropped off-table pairs
                                       # provably stay outside the cutoff;
                                       # drivers fold it into the exact
                                       # dangerous-build displacement check
    color_bad: Optional[jax.Array] = None  # bool: duplicate color in some
                                           # row, residual-lane overflow, or
                                           # guard too thin -- the host must
                                           # fall back to a banded epoch
    res_dest: Optional[jax.Array] = None   # [P, Ks-nc] residual-lane dest
                                           # rows (own row for fillers)
    res_k2: Optional[jax.Array] = None     # [P, Ks-nc] residual delivery
                                           # tiebreak (sender pair-id order)
    diag: Optional[jax.Array] = None       # int32 diagnostics: bit 0 dup,
                                           # 1 res overflow, 2 thin guard;
                                           # bits 3.. max res count;
                                           # bits 12.. round(10*min_miss_r)


def pair_dx_planes(x, box, nbr_idx, pbc, row_chunk=4096):
    """[N_pad, K] displacement components; rows padded to TILE multiple.

    Neighbor coordinates come from row gathers of an [N+1, 8]-packed
    position table (one 8-float-row gather runs ~8x faster than three
    scalar gathers of the same slots). The gather's [C, K, 8] output is
    lane-padded 16x by TPU tiling, so it is produced in row chunks and
    immediately reduced to the three [C, K] components.
    """
    n = x.shape[0]
    k = nbr_idx.shape[1]
    n_pad = max(-(-n // TILE) * TILE, nbr_idx.shape[0])
    idx = nbr_idx
    if idx.shape[0] != n_pad:
        idx = jnp.concatenate(
            [idx, jnp.full((n_pad - idx.shape[0], idx.shape[1]), n,
                           jnp.int32)])
    xi_all = x if n_pad == n else jnp.concatenate(
        [x, jnp.zeros((n_pad - n, 3), x.dtype)])
    x8 = jnp.pad(x, ((0, 1), (0, 5)))                  # [N+1, 8]

    def block(idx_c, xi_c):
        xj = x8[jnp.minimum(idx_c, n)]                 # [C, K, 8]
        valid = idx_c < n
        out = []
        for d in range(3):
            dd = xi_c[:, d][:, None] - xj[:, :, d]
            if pbc[d]:
                dd = dd - box[d] * jnp.round(dd / box[d])
            out.append(jnp.where(valid, dd, 2.0 * box[d] + 10.0))
        return tuple(out)

    if n_pad <= row_chunk:
        return list(block(idx, xi_all))
    c_pad = -(-n_pad // row_chunk) * row_chunk
    if c_pad != n_pad:
        idx = jnp.concatenate(
            [idx, jnp.full((c_pad - n_pad, k), n, jnp.int32)])
        xi_all = jnp.concatenate(
            [xi_all, jnp.zeros((c_pad - n_pad, 3), x.dtype)])
    outs = jax.lax.map(lambda a: block(*a),
                       (idx.reshape(-1, row_chunk, k),
                        xi_all.reshape(-1, row_chunk, 3)))
    return [o.reshape(c_pad, k)[:n_pad] for o in outs]


class PairTableOps:
    """Shared machinery for fused pair-table evaluators (PallasAnnp and
    ops.pallas_ni.PallasNi): component-layout displacement gathers, the
    refresh-static short-list compaction (banded delivery keys), and the
    sort-involution force delivery. Subclasses provide `k_short`,
    `short_delta`, `pbc`, `assemble_sort_elems`, and the `short_rc`
    property (the cutoff the short list compacts against)."""

    @property
    def short_rc(self):
        raise NotImplementedError

    def _pair_dx(self, x, box, nbr_idx, row_chunk=4096):
        return pair_dx_planes(x, box, nbr_idx, self.pbc, row_chunk)

    def _assemble(self, fjx, fjy, fjz, akey, n, ks, want_parts=False):
        """F_a = -sum_s Fj[a,s] + sum(partner contributions) via ONE banded
        sort (see _pair_dx_repacked for the key construction). With
        want_parts also returns the delivered per-lane partner values
        [P, Ks] x3 (the per-atom virial tally needs them per pair)."""
        p = fjx.shape[0]
        if p * ks <= self.assemble_sort_elems:
            _, px, py, pz = jax.lax.sort(
                (akey.reshape(-1), fjx.reshape(-1), fjy.reshape(-1),
                 fjz.reshape(-1)), num_keys=1)
        else:
            # memory-lean: the 4-operand global sort doubles ~12 GB of
            # operands at 2M atoms; three 2-operand sorts halve the peak
            ak = akey.reshape(-1)
            px = jax.lax.sort((ak, fjx.reshape(-1)), num_keys=1)[1]
            py = jax.lax.sort((ak, fjy.reshape(-1)), num_keys=1)[1]
            pz = jax.lax.sort((ak, fjz.reshape(-1)), num_keys=1)[1]
        f, parts = [], []
        for fj, part in zip((fjx, fjy, fjz), (px, py, pz)):
            pr = part.reshape(p, ks)
            own = -jnp.sum(fj[:n], axis=1)
            f.append(own + jnp.sum(pr[:n], axis=1))
            if want_parts:
                parts.append(pr)
        fo = jnp.stack(f, axis=1)
        return (fo, parts) if want_parts else fo

    def _compact_block(self, x8, n, k, box, rc_s, idx_c, rev_c, xi_c, i0):
        """One row-chunk of compact_short: distance-test the skin rows at
        rc + short_delta and pack the hits to their in-cutoff prefix with a
        stable 2-operand row sort (no displacement payloads -- the per-step
        evaluation re-gathers positions anyway)."""
        ks = self.k_short
        xj = x8[jnp.minimum(idx_c, n)]                 # [C, K, 8]
        valid = idx_c < n
        rsq = jnp.zeros(idx_c.shape, x8.dtype)
        for d in range(3):
            c = xi_c[:, d][:, None] - xj[:, :, d]
            if self.pbc[d]:
                c = c - box[d] * jnp.round(c / box[d])
            c = jnp.where(valid, c, 2.0 * box[d] + 10.0)
            rsq = rsq + c * c
        mask = valid & (rsq < rc_s * rc_s) & (rsq > 1.0e-12)
        counts = jnp.sum(mask.astype(jnp.int32), axis=1)
        packed = jnp.minimum(idx_c, n) * 512 + jnp.minimum(rev_c, k)
        key = 1 - mask.astype(jnp.int32)
        _, pk_ = jax.lax.sort((key, packed), dimension=1, num_keys=1)
        pk_ = pk_[:, :ks]
        lane = jax.lax.broadcasted_iota(jnp.int32, (idx_c.shape[0], ks), 1)
        rows = i0 + jax.lax.broadcasted_iota(
            jnp.int32, (idx_c.shape[0], ks), 0)
        ok = lane < counts[:, None]
        j_c = pk_ // 512
        t_c = pk_ - j_c * 512
        akey = jnp.where(ok & (t_c < k),
                         j_c * (2 * k) + t_c,
                         rows * (2 * k) + k + lane)
        sidx = jnp.where(ok, jnp.minimum(j_c, n), n)
        return sidx, akey, ok, jnp.any(counts > ks)

    def _compact_block_norev(self, x8, n, k, box, rc_s, idx_c, xi_c):
        """Rev-free row compaction: distance-test the skin rows and pack the
        hits ascending by partner id with one row sort. No reverse-slot
        input -- the delivery key is built globally afterwards (see
        compact_short)."""
        ks = self.k_short
        xj = x8[jnp.minimum(idx_c, n)]                 # [C, K, 8]
        valid = idx_c < n
        rsq = jnp.zeros(idx_c.shape, x8.dtype)
        for d in range(3):
            c = xi_c[:, d][:, None] - xj[:, :, d]
            if self.pbc[d]:
                c = c - box[d] * jnp.round(c / box[d])
            c = jnp.where(valid, c, 2.0 * box[d] + 10.0)
            rsq = rsq + c * c
        mask = valid & (rsq < rc_s * rc_s) & (rsq > 1.0e-12)
        counts = jnp.sum(mask.astype(jnp.int32), axis=1)
        key = jnp.where(mask, jnp.minimum(idx_c, n), n + 1)
        sidx = jnp.minimum(jnp.sort(key, axis=1)[:, :ks], n)
        return sidx, jnp.any(counts > ks)

    def _akey_from_sidx(self, sidx, n):
        """Banded delivery keys from the partner-sorted short rows alone.

        The kept set is pair-symmetric (the rc + delta test is exact-f32
        symmetric) and every row stores its partners ascending by id, so
        receiver row j's lane t holds its t-th smallest partner. Two global
        sorts recover each entry's destination slot without any reverse-
        slot map: sort-1 orders all entries by (dest row, sender id) --
        landing each real entry exactly at its receiver's lane, fillers of
        row j keyed (j, n + lane) behind every sender -- and sort-2 inverts
        that permutation back to source order. The band-structure invariant
        (sorted dest rows == each row exactly Ks times) is checked for free
        and reported as overflow: an asymmetric or overflowing compaction
        can never deliver silently wrong sums.

        Replaces the reverse_slots build entirely for this path -- the
        O(N K^2) rev gather was the dominant rebuild cost at 2M atoms.
        """
        p, ks = sidx.shape
        ok = sidx < n
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, ks), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (p, ks), 1)
        key1 = jnp.where(ok, sidx, rows).reshape(-1)
        key2 = jnp.where(ok, rows, n + lane).reshape(-1)
        src = jnp.arange(p * ks, dtype=jnp.int32)
        k1s, _, perm = jax.lax.sort((key1, key2, src), num_keys=2)
        bad_band = jnp.any(k1s != src // ks)
        _, akey_flat = jax.lax.sort((perm, src), num_keys=1)
        return akey_flat.reshape(p, ks), bad_band

    def compact_short_frame(self, x_ext, box, idx, off, cc):
        """Frame variant of the rev-free compaction (sharded drivers).

        x_ext [C_ext, 3]: the device's position frame; idx [cc, K] skin
        rows of the cc center rows (frame indices); center row t sits at
        frame row off + t. Returns (sidx [P, Ks] frame indices ascending,
        C_ext for fillers; akey [P, Ks]; overflow).

        Delivery-key construction mirrors _akey_from_sidx with one frame
        twist: entries whose partner is NOT a center row self-key into
        their own band (their Fj must not be delivered -- the partner's
        force is computed by the owning device). Band j then holds
        A_j (deliveries) + X_j (self-keyed) + (Ks - count_j) fillers
        = Ks exactly, because within-frame symmetry gives A_j = (j's
        center partners) and count_j = A_j + X_j. Rows with X_j > 0 are
        frame-edge rows whose forces the driver discards; LOCAL rows have
        every partner in the center range (the rebuild coverage proof), so
        their received sums are exact -- and sums are what _assemble
        consumes, making the in-band order immaterial.
        """
        n_src = x_ext.shape[0]
        k = idx.shape[1]
        ks = min(self.k_short, k)    # a skin list narrower than Ks is
                                     # already its own short table
        rc_s = self.short_rc + self.short_delta
        p = -(-cc // TILE) * TILE
        idx_p = _padr(idx, p, n_src)
        x8 = jnp.pad(x_ext, ((0, 1), (0, 5)))
        xc = x_ext[off: off + cc]
        xc = _padr(xc, p, 0.0)

        xj = x8[jnp.minimum(idx_p, n_src)]
        valid = idx_p < n_src
        rsq = jnp.zeros(idx_p.shape, x_ext.dtype)
        for d in range(3):
            c = xc[:, d][:, None] - xj[:, :, d]
            if self.pbc[d]:
                c = c - box[d] * jnp.round(c / box[d])
            c = jnp.where(valid, c, 2.0 * box[d] + 10.0)
            rsq = rsq + c * c
        mask = valid & (rsq < rc_s * rc_s) & (rsq > 1.0e-12)
        counts = jnp.sum(mask.astype(jnp.int32), axis=1)
        key = jnp.where(mask, jnp.minimum(idx_p, n_src), n_src + 1)
        sidx = jnp.minimum(jnp.sort(key, axis=1)[:, :ks], n_src)
        overflow = jnp.any(counts > ks)

        ok = sidx < n_src
        t_center = sidx - off
        in_ctr = ok & (t_center >= 0) & (t_center < cc)
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, ks), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (p, ks), 1)
        key1 = jnp.where(in_ctr, jnp.clip(t_center, 0, cc - 1),
                         rows).reshape(-1)
        # senders order by own center row; self-keyed and filler entries
        # order behind every sender (any consistent order works: only the
        # per-band SUM is consumed)
        key2 = jnp.where(in_ctr, rows, p + lane).reshape(-1)
        src = jnp.arange(p * ks, dtype=jnp.int32)
        k1s, _, perm = jax.lax.sort((key1, key2, src), num_keys=2)
        bad_band = jnp.any(k1s != src // ks)
        _, akey_flat = jax.lax.sort((perm, src), num_keys=1)
        return sidx, akey_flat.reshape(p, ks), overflow | bad_band

    def energy_forces_frame_short(self, xc_pad, x_src, box, sidx, akey,
                                  cc, want_virial=False, vslice=None):
        """Per-step frame evaluation against a frame ShortList
        (compact_short_frame): gather + kernels + one banded delivery
        sort. Returns (eat [cc], forces [cc, 3][, w]); only rows whose
        partners are all center rows (every local row) are physical.

        want_virial: pairwise +-1/2 virial summed over center rows
        [vslice[0], vslice[1]) so a psum counts each pair once."""
        n_src = x_src.shape[0]
        p, ks = sidx.shape
        x8 = jnp.pad(x_src, ((0, 1), (0, 5)))
        xj = x8[jnp.minimum(sidx, n_src)]
        valid = sidx < n_src
        dd = []
        for d in range(3):
            c = xc_pad[:, d][:, None] - xj[:, :, d]
            if self.pbc[d]:
                c = c - box[d] * jnp.round(c / box[d])
            dd.append(jnp.where(valid, c, 2.0 * box[d] + 10.0))
        eat, (fjx, fjy, fjz) = self._eval_fj(*dd)
        forces = self._assemble(fjx, fjy, fjz, akey, cc, ks)
        if not want_virial:
            return eat[:cc], forces
        lo, hi = (0, cc) if vslice is None else vslice
        m = valid[lo:hi].astype(x_src.dtype)
        comps = []
        for da in dd:
            comps.append([-jnp.sum(da[lo:hi] * fb[lo:hi] * m)
                          for fb in (fjx, fjy, fjz)])
        w = jnp.asarray(comps)
        return eat[:cc], forces, 0.5 * (w + w.T)

    def compact_short(self, x, box, nbr_idx, rev_slots=None, row_chunk=8192):
        """Build the refresh-static ShortList from the skin list.

        Each skin row is compacted to its entries within rc + short_delta.
        The list stays valid while no atom has moved more
        than short_delta/2 since this call: a pair outside rc + delta needs
        two half-delta moves to enter rc, and entries that drift past rc
        merely evaluate to fc = 0. Callers refresh on that displacement
        criterion (md/simulation.py runs it on a fixed in-scan cadence with
        an exact per-step unsafe check).

        With rev_slots the delivery keys come from the original-slot
        banding (stable slot order, same construction as
        _pair_dx_repacked); without, rows pack ascending by partner id and
        the keys come from the two-sort inversion (_akey_from_sidx) -- the
        skin list then never needs reverse-slot maps at all (drop
        with_rev: at 2M atoms that removes the [N, K] rev table AND the
        O(N K^2) reverse_slots pass from every rebuild).

        TPU equivalent of running k_annp_short_nbor (fe/lib/lal_annp.cu:
        267-344) once per neighbor-list epoch instead of once per step.
        """
        n = x.shape[0]
        k = nbr_idx.shape[1]
        assert k <= 512, "int32 (row, slot) packing assumes capacity <= 512"
        rc_s = self.short_rc + self.short_delta
        n_pad = -(-n // TILE) * TILE
        c_pad = -(-n_pad // row_chunk) * row_chunk
        ks = self.k_short

        idx = _padr(nbr_idx, c_pad, n)
        xi_all = _padr(x, c_pad, 0.0)
        x8 = jnp.pad(x, ((0, 1), (0, 5)))

        if rev_slots is None:
            block = functools.partial(self._compact_block_norev, x8, n, k,
                                      box, rc_s)
            if c_pad <= row_chunk:
                sidx, ovf = block(idx, xi_all)
                sidx = sidx[:n_pad]
            else:
                nb = c_pad // row_chunk
                outs = jax.lax.map(
                    lambda a: block(*a),
                    (idx.reshape(nb, row_chunk, k),
                     xi_all.reshape(nb, row_chunk, 3)))
                sidx = outs[0].reshape(c_pad, ks)[:n_pad]
                ovf = jnp.any(outs[1])
            akey, bad_band = self._akey_from_sidx(sidx, n)
            return ShortList(sidx, akey, None, x, ovf | bad_band)

        rev = _padr(rev_slots, c_pad, k)
        block = functools.partial(self._compact_block, x8, n, k, box, rc_s)
        if c_pad <= row_chunk:
            sidx, akey, ok, ovf = block(idx, rev, xi_all,
                                        jnp.asarray(0, jnp.int32))
            return ShortList(sidx[:n_pad], akey[:n_pad], None, x, ovf)
        nb = c_pad // row_chunk
        outs = jax.lax.map(
            lambda a: block(*a),
            (idx.reshape(nb, row_chunk, k), rev.reshape(nb, row_chunk, k),
             xi_all.reshape(nb, row_chunk, 3),
             jnp.arange(nb, dtype=jnp.int32) * row_chunk))
        sidx, akey = (o.reshape(c_pad, ks)[:n_pad] for o in outs[:2])
        return ShortList(sidx, akey, None, x, jnp.any(outs[3]))


class PallasAnnp(PairTableOps):
    """Fused-kernel evaluator for a single-element Chebyshev ANNP model.

    k_short: per-step short-neighbor repack width (the TPU equivalent of the
    reference's k_annp_short_nbor, fe/lib/lal_annp.cu:267-344). The skin
    list carries ~160 neighbors at Rc+skin but only ~108 sit inside
    Rc=6.5 (bcc-Fe); compacting each row to its in-cutoff prefix lets the
    O(K^2) angular kernels run at K=128 (one lane tile) instead of 256 --
    a 4x FLOP cut on the dominant work. None disables the repack."""

    def __init__(self, cfg, params, k_short=128, angular="harmonic",
                 short_delta=0.3, coloring: Optional[ColoringSpec] = None,
                 res_delta=None, elems=None):
        self.k_short = k_short
        # symmetric pair-lane coloring tables (ops/pair_coloring) enabling
        # the column-sorted delivery; None keeps the banded flat sort
        self.coloring = coloring
        if coloring is not None:
            assert coloring.n_colors <= k_short, \
                "coloring palette must fit the short-lane width"
        # inner skin for the refresh-static short list (compact_short):
        # entries within rc + short_delta are kept, so the list stays valid
        # while no atom moves more than short_delta/2 since compaction
        self.short_delta = short_delta
        # colored-path residual-lane skin: non-palette pairs beyond
        # rc + res_delta are DROPPED at compaction instead of occupying a
        # scarce residual lane (such pairs carry exactly zero force -- fc
        # vanishes at rc) -- but dropping tightens the drift guard to
        # res_delta/2, and the reference NPT scene's measured per-epoch
        # drift EXCEEDS 0.15 A (a res_delta=0.3 trim latched `unsafe`
        # over 500 steps). Default: no trim (guard short_delta/2); pass a
        # smaller res_delta only for cold or short-epoch runs.
        self.res_delta = min(res_delta if res_delta is not None
                             else short_delta, short_delta)
        # memory-lean assembly threshold (elements); production crosses it
        # only above ~1.3M atoms, so tests/test_pallas_annp.py sets it to 0
        # to exercise the per-component-sort branch at small sizes
        self.assemble_sort_elems = 1 << 27
        # above this many atoms, energy_forces runs the fused chunked
        # pipeline (_eval_pipeline) so no [N, AB_PAD] scratch materializes;
        # tests set it to 0 to exercise the pipeline at small sizes
        self.pipeline_rows = 1 << 20
        self.angular = angular
        self.npsf, self.ntsf = cfg.npsf, cfg.ntsf
        if angular == "harmonic":
            dt_ = params["sf_scale"].dtype
            self.cmat = jnp.asarray(_cheb_legendre(cfg.ntsf), dt_)  # [n, l]
            layout = _harm_layout(cfg.ntsf - 1)
            self.n_harm = len(layout)
            self.l_of_col = jnp.asarray(layout, jnp.int32)
            assert self.n_harm <= AB_PAD - 1
        self.pbc = tuple(getattr(cfg, "pbc", (True, True, True)))
        nsf = cfg.nsf
        self.cfg_key = (
            ("npsf", cfg.npsf), ("ntsf", cfg.ntsf), ("rc", cfg.cut),
            ("flags", tuple(cfg.flagact)), ("style", cfg.act_style),
            ("e_scale", cfg.e_scale), ("e_shift", cfg.e_shift),
        )
        dt = params["sf_scale"].dtype
        pad = NSF_PAD - nsf
        self.scale = jnp.pad(params["sf_scale"], (0, pad)).reshape(1, NSF_PAD)
        self.shift = jnp.pad(params["sf_shift"], (0, pad)).reshape(1, NSF_PAD)
        # per-element network stacks; the descriptors and normalization are
        # element-independent in the .ann schema (one shared row pair,
        # fe/src/pair_annp.cpp:252-297), so multi-element only selects the
        # tiny MLP per center atom (see _mlp_eat_dedg)
        self.ne = params["w"][0].shape[0]
        self.w1e = [jnp.pad(params["w"][0][e],
                            ((0, 0), (0, NSF_PAD - params["w"][0].shape[2]))
                            ).astype(dt) for e in range(self.ne)]
        self.b1e = [params["b"][0][e].reshape(1, -1).astype(dt)
                    for e in range(self.ne)]
        self.w2e = [params["w"][1][e].astype(dt) for e in range(self.ne)]
        self.b2e = [params["b"][1][e].reshape(1, -1).astype(dt)
                    for e in range(self.ne)]
        self.w3e = [params["w"][2][e].astype(dt) for e in range(self.ne)]
        self.b3e = [params["b"][2][e].reshape(1, -1).astype(dt)
                    for e in range(self.ne)]
        self.w1, self.b1 = self.w1e[0], self.b1e[0]
        self.w2, self.b2 = self.w2e[0], self.b2e[0]
        self.w3, self.b3 = self.w3e[0], self.b3e[0]
        # per-atom element ids (int32 [N]); None = single-element scene
        self.elems = (None if elems is None
                      else jnp.asarray(elems, jnp.int32))

    @property
    def short_rc(self):
        return dict(self.cfg_key)["rc"]

    def _mlp_one(self, g, nsf, flags, style, e_scale, e_shift,
                 w1, b1, w2, b2, w3, b3):
        hi = jax.lax.Precision.HIGHEST
        z1 = jnp.dot(g, w1[:, :nsf].T, precision=hi) + b1
        h1, d1 = _act_and_grad(z1, flags[0], style)
        z2 = jnp.dot(h1, w2.T, precision=hi) + b2
        h2, d2 = _act_and_grad(z2, flags[1], style)
        z3 = jnp.dot(h2, w3.T, precision=hi) + b3
        out, d3 = _act_and_grad(z3, flags[2], style)
        eat = e_scale * out[:, 0] + e_shift
        v = d3 * w3
        v = jnp.dot(v * d2, w2, precision=hi)
        v = jnp.dot(v * d1, w1[:, :nsf], precision=hi)
        dedg = v * self.scale[:, :nsf] * e_scale
        return eat, dedg

    def _mlp_eat_dedg(self, g_pad, el=None):
        """XLA-side tiny MLP forward + hand VJP from padded raw
        descriptors. el [rows] (int32 element per row) selects each
        center's network for multi-element potentials: every (tiny)
        network runs on the chunk and a where-select keeps the row's own
        -- the dense analogue of the reference's per-type map dispatch."""
        cfg = dict(self.cfg_key)
        nsf = cfg["npsf"] + cfg["ntsf"]
        flags, style = cfg["flags"], cfg["style"]
        g = (g_pad[:, :nsf] - self.shift[:, :nsf]) * self.scale[:, :nsf]
        args = (nsf, flags, style, cfg["e_scale"], cfg["e_shift"])
        if self.ne == 1 or el is None:
            eat, dedg = self._mlp_one(g, *args, self.w1, self.b1, self.w2,
                                      self.b2, self.w3, self.b3)
        else:
            eat = jnp.zeros(g.shape[0], g.dtype)
            dedg = jnp.zeros_like(g)
            for e in range(self.ne):
                ea, de = self._mlp_one(g, *args, self.w1e[e], self.b1e[e],
                                       self.w2e[e], self.b2e[e],
                                       self.w3e[e], self.b3e[e])
                sel = el == e
                eat = jnp.where(sel, ea, eat)
                dedg = jnp.where(sel[:, None], de, dedg)
        dedg = jnp.pad(dedg, ((0, 0), (0, NSF_PAD - nsf)))
        return eat, dedg

    def _mlp_eat_dedg_harm(self, g_raw, a_pad, el=None):
        """Harmonic-path glue: S_l power sums -> angular G, MLP forward +
        VJP, then the per-atom force coefficients (radial dE/dG columns and
        the B_lm vector with 2q in its trailing column)."""
        cfg = dict(self.cfg_key)
        npsf, ntsf = cfg["npsf"], cfg["ntsf"]
        hi = jax.lax.Precision.HIGHEST
        s_l = g_raw[:, npsf:npsf + ntsf]
        f2 = g_raw[:, npsf + ntsf:npsf + ntsf + 1]
        g_ang = 0.5 * (jnp.dot(s_l, self.cmat.T, precision=hi) - f2)
        g_all = jnp.concatenate([g_raw[:, :npsf], g_ang], axis=1)
        eat, dedg = self._mlp_eat_dedg(
            jnp.pad(g_all, ((0, 0), (0, NSF_PAD - g_all.shape[1]))), el)
        dedg_ang = dedg[:, npsf:npsf + ntsf]
        # B_lm = (sum_n dE/dG_n c_nl) A_lm  (the 0.5 tally x d(S^2)=2A fold)
        bco = jnp.dot(dedg_ang, self.cmat, precision=hi)       # [N, l]
        b = a_pad[:, :self.n_harm] * bco[:, self.l_of_col]
        q2 = -jnp.sum(dedg_ang, axis=1, keepdims=True)         # 2q
        b = jnp.concatenate(
            [b, q2, jnp.zeros((b.shape[0], AB_PAD - self.n_harm - 1),
                              b.dtype)], axis=1)
        dedg_rad = jnp.pad(dedg[:, :npsf], ((0, 0), (0, NSF_PAD - npsf)))
        return eat, dedg_rad, b

    def _el_rows(self, p):
        """Per-row element ids padded to p rows (None = single-element)."""
        if self.elems is None or self.ne == 1:
            return None
        return _padr(self.elems, p, 0)

    def _eval_fj(self, dxx, dxy, dxz, el=None):
        """Run the fused pipeline on (compacted) displacement rows; returns
        (eat, (fjx, fjy, fjz)). el: optional per-row element ids."""
        if self.angular == "harmonic":
            g_raw, a_pad = _run_g_harm(dxx, dxy, dxz, self.cfg_key)
            eat, dedg_rad, b = self._mlp_eat_dedg_harm(g_raw, a_pad, el)
            fj = _run_force_harm(dxx, dxy, dxz, dedg_rad, b, self.cfg_key)
        else:
            g_pad = _run_g(dxx, dxy, dxz, self.cfg_key)
            eat, dedg = self._mlp_eat_dedg(g_pad, el)
            fj = _run_force(dxx, dxy, dxz, dedg, self.cfg_key)
        return eat, fj

    def _pair_dx_frame(self, xc, x_src, box, idx):
        """Displacements for center rows xc [Cc,3] whose neighbors index into
        x_src [C_ext,3] (the multi-chip halo frame). Rows padded to TILE."""
        cc = xc.shape[0]
        n_src = x_src.shape[0]
        n_pad = -(-cc // TILE) * TILE
        if n_pad != cc:
            idx = jnp.concatenate(
                [idx, jnp.full((n_pad - cc, idx.shape[1]), n_src, jnp.int32)])
        x8 = jnp.pad(x_src, ((0, 1), (0, 5)))
        xj = x8[jnp.minimum(idx, n_src)]
        valid = idx < n_src
        out = []
        for d in range(3):
            xi = xc[:, d] if n_pad == cc else jnp.concatenate(
                [xc[:, d], jnp.zeros((n_pad - cc,), xc.dtype)])
            dd = xi[:, None] - xj[:, :, d]
            if self.pbc[d]:
                dd = dd - box[d] * jnp.round(dd / box[d])
            dd = jnp.where(valid, dd, 2.0 * box[d] + 10.0)
            out.append(dd)
        return out

    def energy_forces_frame(self, xc, x_src, box, idx, rev, bc,
                            want_virial=False, vslice=None):
        """Sharded-frame evaluation: per-center-row energies and forces.

        xc [Cc, 3]: center-row positions; x_src [C_ext, 3]: position frame
        (Cc = C_ext - 2*bc, centers offset by bc); idx [Cc, K] indexes the
        position frame; rev [Cc, K] holds partner slots. Returns
        (eat [Cc], forces [Cc, 3]); only rows whose full neighbor-center
        context lies in the frame (the local slice) are physical.

        want_virial: also return the pairwise virial tally (same +-1/2-per-
        pair convention as `energy_forces`) summed over center rows
        [vslice[0], vslice[1]) -- callers pass the device-local row range so
        a psum over devices counts every pair exactly once.
        """
        cc, k = idx.shape
        dxx, dxy, dxz = self._pair_dx_frame(xc, x_src, box, idx)
        eat, (fjx, fjy, fjz) = self._eval_fj(dxx, dxy, dxz)
        # partner row in the center frame = position-frame index - bc
        n_src = x_src.shape[0]
        t_center = idx - bc
        ok = (idx < n_src) & (t_center >= 0) & (t_center < cc) & (rev < k)
        own_flat = jnp.arange(cc * k, dtype=jnp.int32).reshape(cc, k)
        dest = jnp.where(ok, jnp.clip(t_center, 0, cc - 1) * k + rev,
                         own_flat).reshape(-1)
        okf = ok.reshape(-1)
        pay = [jnp.where(okf, fj[:cc].reshape(-1), 0.0)
               for fj in (fjx, fjy, fjz)]
        _, px, py, pz = jax.lax.sort((dest, *pay), num_keys=1)
        f = []
        for fj, part in zip((fjx, fjy, fjz), (px, py, pz)):
            own = -jnp.sum(fj[:cc], axis=1)
            f.append(own + jnp.sum(part.reshape(cc, k), axis=1))
        if not want_virial:
            return eat[:cc], jnp.stack(f, axis=1)
        lo, hi = (0, cc) if vslice is None else vslice
        m = ok[lo:hi].astype(xc.dtype)
        comps = []
        for da in (dxx, dxy, dxz):
            row = []
            for fb in (fjx, fjy, fjz):
                row.append(-jnp.sum(da[lo:hi] * fb[lo:hi] * m))
            comps.append(row)
        w = jnp.asarray(comps)
        w = 0.5 * (w + w.T)
        return eat[:cc], jnp.stack(f, axis=1), w

    def _pair_dx_repacked(self, x, box, nbr_idx, rev_slots,
                          row_chunk=4096):
        """Fused chunked displacement gather + short-neighbor repack.

        The TPU equivalent of k_annp_short_nbor (fe/lib/lal_annp.cu:267-344):
        each skin-list row is compacted to its in-cutoff prefix by a stable
        row sort, sliced to k_short columns. Fused into the row-chunked
        gather so the full-width [N, K] displacement planes NEVER
        materialize -- at 2M atoms x K=192 the unfused flow held ~9 GB of
        sort operands, beyond the device budget.

        Returns (dxx, dxy, dxz [P, Ks], akey, ok, overflow); P = rows padded
        to TILE. `akey` is the force-assembly delivery key: row j owns key
        band [j*2K, (j+1)*2K). A real pair entry (i, s) whose partner sits
        at original slot t = rev[i, s] of row j gets key j*2K + t; filler
        lanes of row i get i*2K + K + lane. Band j then holds exactly
        count_j real keys (the cutoff test is symmetric) ordered by t --
        the stable-compaction lane order of row j -- so ONE sort by akey
        delivers every pair contribution to its partner\'s compacted slot
        (see _assemble). int32 keys cap N at 2^31 / 2K (~4.2M at K=256).
        """
        n = x.shape[0]
        k = nbr_idx.shape[1]
        ks = self.k_short
        assert k <= 512, "int32 (row, slot) packing assumes capacity <= 512"
        n_pad = -(-n // TILE) * TILE
        c_pad = -(-n_pad // row_chunk) * row_chunk

        idx = _padr(nbr_idx, c_pad, n)
        rev = _padr(rev_slots, c_pad, k)
        xi_all = _padr(x, c_pad, 0.0)
        x8 = jnp.pad(x, ((0, 1), (0, 5)))                  # [N+1, 8]
        block = functools.partial(self._repack_block, x8, n, k, box)

        if c_pad <= row_chunk:
            dxx, dxy, dxz, akey, ok, ovf = block(
                idx, rev, xi_all, jnp.asarray(0, jnp.int32))
            return (dxx[:n_pad], dxy[:n_pad], dxz[:n_pad], akey[:n_pad],
                    ok[:n_pad], ovf)
        nb = c_pad // row_chunk
        outs = jax.lax.map(
            lambda a: block(*a),
            (idx.reshape(nb, row_chunk, k), rev.reshape(nb, row_chunk, k),
             xi_all.reshape(nb, row_chunk, 3),
             jnp.arange(nb, dtype=jnp.int32) * row_chunk))
        dxx, dxy, dxz, akey, ok = (
            o.reshape(c_pad, ks)[:n_pad] for o in outs[:5])
        return dxx, dxy, dxz, akey, ok, jnp.any(outs[5])

    def _repack_block(self, x8, n, k, box, idx_c, rev_c, xi_c, i0):
        """One row-chunk of the fused gather + short-neighbor repack (see
        _pair_dx_repacked): returns (dxx, dxy, dxz, akey, ok, overflow) for
        the chunk, rows offset by i0 in the delivery-key construction."""
        ks = self.k_short
        rc = dict(self.cfg_key)["rc"]
        xj = x8[jnp.minimum(idx_c, n)]                 # [C, K, 8]
        valid = idx_c < n
        dd = []
        rsq = jnp.zeros(idx_c.shape, x8.dtype)
        for d in range(3):
            c = xi_c[:, d][:, None] - xj[:, :, d]
            if self.pbc[d]:
                c = c - box[d] * jnp.round(c / box[d])
            c = jnp.where(valid, c, 2.0 * box[d] + 10.0)
            dd.append(c)
            rsq = rsq + c * c
        mask = valid & (rsq < rc * rc) & (rsq > 1.0e-12)
        counts = jnp.sum(mask.astype(jnp.int32), axis=1)
        packed = jnp.minimum(idx_c, n) * 512 + jnp.minimum(rev_c, k)
        key = 1 - mask.astype(jnp.int32)
        _, ax, ay, az, pk_ = jax.lax.sort(
            (key, dd[0], dd[1], dd[2], packed), dimension=1, num_keys=1)
        sl = slice(None, ks)
        ax, ay, az, pk_ = ax[:, sl], ay[:, sl], az[:, sl], pk_[:, sl]
        lane = jax.lax.broadcasted_iota(jnp.int32, (idx_c.shape[0], ks), 1)
        rows = i0 + jax.lax.broadcasted_iota(
            jnp.int32, (idx_c.shape[0], ks), 0)
        ok = lane < counts[:, None]
        j_c = pk_ // 512
        t_c = pk_ - j_c * 512
        akey = jnp.where(ok & (t_c < k),
                         j_c * (2 * k) + t_c,
                         rows * (2 * k) + k + lane)
        return ax, ay, az, akey, ok, jnp.any(counts > ks)

    def _eval_pipeline(self, x, box, nbr_idx, rev_slots, want_virial,
                       row_chunk=65536):
        """Fully chunked evaluation for multi-million-atom scenes.

        Runs repack -> g kernel -> MLP glue -> force kernel per row chunk
        inside one lax.map, so the [N, AB_PAD] harmonic scratch and the
        [N, Ks] displacement planes never materialize at full size (at 2M
        atoms the unfused flow peaks ~6 GB over the v5e budget). The virial
        is accumulated per chunk for the same reason. Returns
        (eat [N], fjx, fjy, fjz [P, Ks], akey, ok, overflow, w|None)."""
        n = x.shape[0]
        k = nbr_idx.shape[1]
        ks = self.k_short
        assert k <= 512, "int32 (row, slot) packing assumes capacity <= 512"
        row_chunk = min(row_chunk, -(-n // TILE) * TILE)
        c_pad = -(-n // row_chunk) * row_chunk

        idx = _padr(nbr_idx, c_pad, n)
        rev = _padr(rev_slots, c_pad, k)
        xi_all = _padr(x, c_pad, 0.0)
        x8 = jnp.pad(x, ((0, 1), (0, 5)))
        nb = c_pad // row_chunk

        el_all = self._el_rows(c_pad)

        def block(args):
            idx_c, rev_c, xi_c, i0 = args[:4]
            ax, ay, az, akey, ok, ovf = self._repack_block(
                x8, n, k, box, idx_c, rev_c, xi_c, i0)
            eat, (fjx, fjy, fjz) = self._eval_fj(
                ax, ay, az, args[4] if el_all is not None else None)
            outs = [eat, fjx, fjy, fjz, akey, ok, ovf]
            if want_virial:
                m = ok.astype(x.dtype)
                comps = []
                for da in (ax, ay, az):
                    comps.append([-jnp.sum(da * fb * m)
                                  for fb in (fjx, fjy, fjz)])
                outs.append(jnp.asarray(comps))
            return tuple(outs)

        ops = (idx.reshape(nb, row_chunk, k), rev.reshape(nb, row_chunk, k),
               xi_all.reshape(nb, row_chunk, 3),
               jnp.arange(nb, dtype=jnp.int32) * row_chunk)
        if el_all is not None:
            ops = ops + (el_all.reshape(nb, row_chunk),)
        outs = jax.lax.map(block, ops)
        eat = outs[0].reshape(c_pad)[:n]
        fjx, fjy, fjz, akey = (o.reshape(c_pad, ks) for o in outs[1:5])
        ok = outs[5].reshape(c_pad, ks)
        overflow = jnp.any(outs[6])
        w = None
        if want_virial:
            w = jnp.sum(outs[7], axis=0)
            w = 0.5 * (w + w.T)
        return eat, fjx, fjy, fjz, akey, ok, overflow, w

    # ---------------- colored short list (column-sorted delivery) ----------
    def _compact_colored_block(self, x8, n, k, box, idx_c, xi_c, i0):
        """One row-chunk of compact_short_colored: distance test, pair
        colors (ops/pair_coloring), then placement -- lane c < n_colors of
        the output row holds the pair of palette color c (or a filler),
        lanes [n_colors, Ks) hold the row's residual (5th-shell) pairs in
        symmetric pair-id order. Built with two [C, K+Ks] row sorts by
        completing each row's used colors against an iota of all Ks lanes.
        Returns (sidx, skey, ok, res_dest, res_k2, bad, min_miss_rsq)."""
        ks = self.k_short
        rc = dict(self.cfg_key)["rc"]
        rc_s = rc + self.short_delta
        spec = self.coloring
        nc = spec.n_colors
        nres = ks - nc
        c_rows = idx_c.shape[0]
        h = box / jnp.asarray(spec.p0, box.dtype)

        xj = x8[jnp.minimum(idx_c, n)]                 # [C, K, 8]
        valid = idx_c < n
        dd = []
        rsq = jnp.zeros(idx_c.shape, x8.dtype)
        for d in range(3):
            c = xi_c[:, d][:, None] - xj[:, :, d]
            if self.pbc[d]:
                c = c - box[d] * jnp.round(c / box[d])
            c = jnp.where(valid, c, 2.0 * box[d] + 10.0)
            dd.append(c)
            rsq = rsq + c * c
        mask = valid & (rsq < rc_s * rc_s) & (rsq > 1.0e-12)

        q = jnp.stack([jnp.round(dd[d] / h[d]).astype(jnp.int32)
                       for d in range(3)], axis=-1)          # [C, K, 3]
        site_i = jnp.round(xi_c / h).astype(jnp.int32)       # [C, 3]
        site_j = jnp.stack([jnp.round(xj[:, :, d] / h[d]).astype(jnp.int32)
                            for d in range(3)], axis=-1)     # [C, K, 3]
        # NOTE on tail-site ambiguity: a demotion of pairs whose tail atom
        # quantizes near a half-grid plane was tried and REVERTED -- on
        # the free-surface benchmark scene the crystal drifts off the
        # box-locked grid, whole planes become "ambiguous", and the
        # residual lanes flood (max_res 48 > 15; BENCH run 2026-08-21).
        # The rare crossing-plane `dup` epochs fall back to banded
        # delivery instead, which is exact -- just slower for that epoch.
        col, kind = pair_colors(spec, site_i, site_j, q)
        # ambiguous-round demotion: a pair whose dx/h fractional residual
        # approaches 1/2 on any axis sits at a rounding boundary -- the 5
        # sigma thermal tail where q (and with it the palette color) can
        # misround and collide with a correctly-rounded same-color pair
        # (the BENCH_r04 `dup` fallbacks). Demote such pairs to the
        # residual lanes: the pair-id residual delivery is class-agnostic
        # (any pair-symmetric set routes exactly), and |frac| is
        # pair-symmetric because dx negates exactly between the two rows.
        amb = jnp.zeros(idx_c.shape, bool)
        for d in range(3):
            fr = dd[d] / h[d] - q[:, :, d].astype(dd[d].dtype)
            amb = amb | (jnp.abs(fr) > 0.4)
        # residual lanes take every remaining in-range pair -- 5th shell,
        # off-table (defects, strained surfaces), demoted-ambiguous -- but
        # only within rc + res_delta: beyond that a non-palette pair has
        # zero force and is dropped, guarded by res_delta/2 of drift (see
        # __init__). Pairs inside the cutoff are never dropped.
        rc_res = rc + self.res_delta
        real1 = mask & (kind == 1) & ~amb             # palette-colored
        real2 = mask & ((kind != 1) | amb) \
            & (rsq < rc_res * rc_res)                 # residual

        rows_g = i0 + jax.lax.broadcasted_iota(jnp.int32, (c_rows, k), 0)
        pj = jnp.minimum(idx_c, n).astype(jnp.int32)
        RB = jnp.asarray(1 << 23, jnp.int32)          # residual key band
        BIGK = jnp.asarray(1 << 26, jnp.int32)        # dropped entries
        # sort-1 bands: palette 2*col < 2^8 | iota 2c+1 | residual
        # RB + pair-id | dropped BIGK | demoted iota BIGK+1 | overflow +2
        key = jnp.where(
            real1, 2 * col,
            jnp.where(real2,
                      RB + (pj >= rows_g) * (1 << 21) + pj, BIGK))
        pay = jnp.where(real1 | real2, pj, n)
        r_count = jnp.sum(real2.astype(jnp.int32), axis=1)   # [C]
        iota_c = jnp.arange(ks, dtype=jnp.int32)
        taken = jnp.clip(r_count, 0, nres)[:, None]
        ikey = jnp.where((iota_c[None, :] >= nc)
                         & (iota_c[None, :] - nc < taken),
                         BIGK + 1, 2 * iota_c[None, :] + 1)
        ikey = jnp.broadcast_to(ikey, (c_rows, ks))
        keys = jnp.concatenate([key, ikey], axis=1)          # [C, K+Ks]
        pays = jnp.concatenate(
            [pay, jnp.full((c_rows, ks), n, jnp.int32)], axis=1)
        k1, p1 = jax.lax.sort((keys, pays), dimension=1, num_keys=1)
        prev = jnp.concatenate(
            [jnp.full((c_rows, 1), -9, jnp.int32), k1[:, :-1]], axis=1)
        dup = jnp.any((k1 < 2 * nc) & (k1 % 2 == 0) & (k1 == prev))
        used_iota = (k1 % 2 == 1) & (k1 < 2 * nc) & (prev == k1 - 1)
        isres = (k1 >= RB) & (k1 < BIGK)
        rank = jnp.cumsum(isres.astype(jnp.int32), axis=1) - 1
        k2 = jnp.where(used_iota, k1 + (1 << 27), k1)
        k2 = jnp.where(isres,
                       jnp.where(rank < nres, 2 * (nc + rank), BIGK + 2),
                       k2)
        ovf_res = jnp.any(r_count > nres)
        max_rcount = jnp.max(r_count)
        k3, p3 = jax.lax.sort((k2, p1), dimension=1, num_keys=1)
        k3, p3 = k3[:, :ks], p3[:, :ks]
        okl = (k3 % 2 == 0) & (k3 < 2 * ks)
        sidx = jnp.where(okl, p3, n)
        rows_s = i0 + jax.lax.broadcasted_iota(jnp.int32, (c_rows, ks), 0)
        lane_pal = iota_c[None, :] < nc
        skey = jnp.where(okl & lane_pal, p3, rows_s)
        # residual delivery tables for lanes [nc, ks): destination row and
        # the (sender >= dest, sender) tiebreak that aligns the incoming
        # sort order with the receiver's own pair-id lane order
        rlane = slice(nc, ks)
        res_ok = okl[:, rlane]
        res_p = p3[:, rlane]
        res_rows = rows_s[:, rlane]
        res_dest = jnp.where(res_ok, res_p, res_rows)
        res_k2 = jnp.where(
            res_ok, (res_rows >= res_p) * (1 << 21) + res_rows,
            (1 << 23) + (iota_c[None, rlane] - nc)
            + jnp.zeros_like(res_rows))
        badbits = (dup.astype(jnp.int32)
                   + 2 * ovf_res.astype(jnp.int32))
        return (sidx, skey, okl, res_dest, res_k2, badbits, max_rcount)

    def compact_short_colored(self, x, box, nbr_idx, row_chunk=8192):
        """Colored variant of compact_short: palette lanes + residual
        lanes of the symmetric pair coloring, enabling the column-sorted
        delivery (energy_forces_short picks the mode from the populated
        fields).

        Every in-range pair is kept: palette classes go to color lanes,
        everything else (5th shell, defects, strained regions) rides the
        residual lanes. `color_bad` means the epoch must run banded
        instead (duplicate palette colors or residual-lane overflow --
        heavily defected or incommensurate regions)."""
        assert self.coloring is not None, "construct PallasAnnp with coloring"
        n = x.shape[0]
        k = nbr_idx.shape[1]
        ks = self.k_short
        nres = ks - self.coloring.n_colors
        n_pad = -(-n // TILE) * TILE
        c_pad = -(-n_pad // row_chunk) * row_chunk

        idx = _padr(nbr_idx, c_pad, n)
        xi_all = _padr(x, c_pad, 0.0)
        x8 = jnp.pad(x, ((0, 1), (0, 5)))
        block = functools.partial(self._compact_colored_block, x8, n, k, box)

        if c_pad <= row_chunk:
            outs = block(idx, xi_all, jnp.asarray(0, jnp.int32))
            sidx, skey, ok = (o[:n_pad] for o in outs[:3])
            res_dest, res_k2 = (o[:n_pad] for o in outs[3:5])
            badbits, max_rc = outs[5], outs[6]
        else:
            nb = c_pad // row_chunk
            outs = jax.lax.map(
                lambda a: block(*a),
                (idx.reshape(nb, row_chunk, k),
                 xi_all.reshape(nb, row_chunk, 3),
                 jnp.arange(nb, dtype=jnp.int32) * row_chunk))
            sidx, skey = (o.reshape(c_pad, ks)[:n_pad] for o in outs[:2])
            ok = outs[2].reshape(c_pad, ks)[:n_pad]
            res_dest, res_k2 = (o.reshape(c_pad, nres)[:n_pad]
                                for o in outs[3:5])
            badbits = (jnp.any(outs[5] & 1 != 0).astype(jnp.int32)
                       | 2 * jnp.any(outs[5] & 2 != 0).astype(jnp.int32))
            max_rc = jnp.max(outs[6])
        # every dropped pair sits beyond rc + res_delta (palette pairs are
        # never dropped; in-cutoff pairs always land a lane), so a drift
        # under res_delta/2 per atom provably cannot carry one into the
        # cutoff -- the driver folds this guard into its exact
        # dangerous-build displacement check
        guard = jnp.asarray(0.5 * min(self.res_delta, self.short_delta),
                            x.dtype)
        # diag: bit 0 = duplicate palette color, bit 1 = residual-lane
        # overflow; bits 3.. = max residual count per row
        diag = (badbits | (max_rc << 3)).astype(jnp.int32)
        color_bad = diag & 7 != 0
        return ShortList(sidx, None, None, x, jnp.asarray(False),
                         skey=skey, guard=guard, color_bad=color_bad,
                         res_dest=res_dest, res_k2=res_k2, diag=diag)

    def _assemble_colored(self, fjx, fjy, fjz, sl, n, want_parts=False):
        """Column-sorted delivery. Palette lanes [0, nc): pair (i, j)
        occupies lane c in BOTH rows, so within each column the delivery
        keys (partner row; own row for fillers) are a permutation of
        [0, P) and one sort along axis 0 routes every partner
        contribution (62 ms vs the flat banded sort's 123 ms at the
        benchmark size). Residual lanes [nc, Ks): a small flat sort by
        (dest row, sender tiebreak) -- each row receives exactly as many
        residual values as it stores (residual-ness is pair-symmetric),
        aligned with its own lane order.

        Both sorts re-verify their permutation property against an iota
        for free (the sorted keys are a by-product); a violation (a
        construction bug or a misused color_bad epoch) poisons the forces
        NaN rather than delivering silently wrong sums."""
        nc = self.coloring.n_colors
        p = fjx.shape[0]
        sk = sl.skey[:, :nc]
        ks_, px, py, pz = jax.lax.sort(
            (sk, fjx[:, :nc], fjy[:, :nc], fjz[:, :nc]),
            dimension=0, num_keys=1)
        badperm = jnp.any(
            ks_ != jax.lax.broadcasted_iota(jnp.int32, ks_.shape, 0))
        rd, rk = sl.res_dest.reshape(-1), sl.res_k2.reshape(-1)
        nres = sl.res_dest.shape[1]
        rsorted = jax.lax.sort(
            (rd, rk, fjx[:, nc:].reshape(-1), fjy[:, nc:].reshape(-1),
             fjz[:, nc:].reshape(-1)), num_keys=2)
        badperm = badperm | jnp.any(
            rsorted[0].reshape(p, nres)
            != jax.lax.broadcasted_iota(jnp.int32, (p, nres), 0))
        f, parts = [], []
        for fj, part, rpart in zip((fjx, fjy, fjz), (px, py, pz),
                                   rsorted[2:]):
            rp = rpart.reshape(p, nres)
            f.append(-jnp.sum(fj[:n], axis=1) + jnp.sum(part[:n], axis=1)
                     + jnp.sum(rp[:n], axis=1))
            if want_parts:
                parts.append(jnp.concatenate([part, rp], axis=1))
        fo = jnp.stack(f, axis=1)
        return (fo, parts, badperm) if want_parts else (fo, badperm)

    def _eval_pipeline_sl(self, x, box, sl, want_virial, row_chunk=65536):
        """Chunked short-path evaluation for multi-million-atom scenes:
        gather + kernels + virial per row chunk inside one lax.map (same
        memory rationale as _eval_pipeline)."""
        n = x.shape[0]
        p = sl.sidx.shape[0]
        ks = sl.sidx.shape[1]
        row_chunk = min(row_chunk, p)
        c_pad = -(-p // row_chunk) * row_chunk
        sidx = _padr(sl.sidx, c_pad, n)
        x8 = jnp.pad(x, ((0, 1), (0, 5)))
        xi_all = _padr(x, c_pad, 0.0)
        nb = c_pad // row_chunk

        el_all = self._el_rows(c_pad)

        def block(args):
            idx_c, xi_c = args[:2]
            xj = x8[jnp.minimum(idx_c, n)]
            valid = idx_c < n
            dd = []
            for d in range(3):
                c = xi_c[:, d][:, None] - xj[:, :, d]
                if self.pbc[d]:
                    c = c - box[d] * jnp.round(c / box[d])
                dd.append(jnp.where(valid, c, 2.0 * box[d] + 10.0))
            eat, (fjx, fjy, fjz) = self._eval_fj(
                *dd, args[2] if el_all is not None else None)
            outs = [eat, fjx, fjy, fjz]
            if want_virial:
                m = valid.astype(x.dtype)
                outs.append(jnp.asarray(
                    [[-jnp.sum(da * fb * m) for fb in (fjx, fjy, fjz)]
                     for da in dd]))
            return tuple(outs)

        ops = (sidx.reshape(nb, row_chunk, ks),
               xi_all.reshape(nb, row_chunk, 3))
        if el_all is not None:
            ops = ops + (el_all.reshape(nb, row_chunk),)
        outs = jax.lax.map(block, ops)
        eat = outs[0].reshape(c_pad)[:p]
        fjx, fjy, fjz = (o.reshape(c_pad, ks)[:p] for o in outs[1:4])
        w = None
        if want_virial:
            w = jnp.sum(outs[4], axis=0)
            w = 0.5 * (w + w.T)
        return eat, fjx, fjy, fjz, w

    def energy_forces_short(self, x, box, sl: ShortList, want_virial=False,
                            shift=True, per_atom=False):
        """Per-step evaluation against a refresh-static ShortList: one
        position gather + kernels + one delivery sort. See compact_short
        for validity; short-list compaction overflow poisons the outputs
        (same contract as energy_forces).

        per_atom: additionally return (eatom [N], vatom [N, 6]) -- the
        per-atom energies and the +-1/2-per-pair virial tallies in LAMMPS
        vatom order (xx, yy, zz, xy, xz, yz), the `compute pe/atom` /
        `stress/atom` observables (reference tally fe/src/pair_annp.cpp:
        183,197-205; GPU fe/lib/lal_annp.cu:758-775). Per-pair, atom a
        receives 0.5 dx_a (x) f_pair_on_a with f_pair_on_a = delivered
        partner value - own Fj; both endpoints tally the identical value.
        Requires the unfused path (n <= pipeline_rows)."""
        n = x.shape[0]
        ks = sl.sidx.shape[1]
        if n > self.pipeline_rows:
            assert not per_atom, \
                "per-atom tallies need the unfused path (n <= pipeline_rows)"
            eat, fjx, fjy, fjz, w = self._eval_pipeline_sl(
                x, box, sl, want_virial)
        else:
            dxx, dxy, dxz = self._pair_dx(x, box, sl.sidx)
            eat, (fjx, fjy, fjz) = self._eval_fj(
                dxx, dxy, dxz, self._el_rows(dxx.shape[0]))
            w = None
            if want_virial:
                m = (sl.sidx < n).astype(x.dtype)
                w = jnp.asarray(
                    [[-jnp.sum(da * fb * m) for fb in (fjx, fjy, fjz)]
                     for da in (dxx, dxy, dxz)])
                w = 0.5 * (w + w.T)
        if sl.skey is not None:
            out = self._assemble_colored(fjx, fjy, fjz, sl, n,
                                         want_parts=per_atom)
            forces, badperm = out[0], out[-1]
            parts = out[1] if per_atom else None
            bad = sl.overflow | badperm | sl.color_bad
        else:
            out = self._assemble(fjx, fjy, fjz, sl.akey, n, ks,
                                 want_parts=per_atom)
            forces = out[0] if per_atom else out
            parts = out[1] if per_atom else None
            bad = sl.overflow
        e_shift = dict(self.cfg_key)["e_shift"]
        e = jnp.sum(eat[:n] - e_shift)
        if shift:
            e = e + n * e_shift
        e = jnp.where(bad, jnp.nan, e)
        forces = jnp.where(bad, jnp.nan, forces)
        outs = [e, forces]
        if want_virial:
            outs.append(w)
        if per_atom:
            m = (sl.sidx[:n] < n).astype(x.dtype)
            g = [(pr[:n] - fj[:n]) * m
                 for pr, fj in zip(parts, (fjx, fjy, fjz))]
            da = (dxx[:n], dxy[:n], dxz[:n])
            vat = 0.5 * jnp.stack(
                [jnp.sum(da[0] * g[0], axis=1),
                 jnp.sum(da[1] * g[1], axis=1),
                 jnp.sum(da[2] * g[2], axis=1),
                 jnp.sum(da[0] * g[1], axis=1),
                 jnp.sum(da[0] * g[2], axis=1),
                 jnp.sum(da[1] * g[2], axis=1)], axis=1)
            outs.append(jnp.where(bad, jnp.nan, eat[:n]))
            outs.append(jnp.where(bad, jnp.nan, vat))
        return tuple(outs) if len(outs) > 2 else (outs[0], outs[1])

    def energy_dedg(self, x, box, nbr_idx):
        n = x.shape[0]
        dxx, dxy, dxz = self._pair_dx(x, box, nbr_idx)
        g_pad = _run_g(dxx, dxy, dxz, self.cfg_key)
        eat, dedg = self._mlp_eat_dedg(g_pad, self._el_rows(dxx.shape[0]))
        return eat[:n], dedg[:n]

    def energy_forces(self, x, box, nbr_idx, rev_slots, want_virial=False,
                      shift=True):
        """Full fused evaluation. rev_slots from neighbors.reverse_slots.

        When k_short is set and smaller than the list width, rows are first
        compacted to their in-cutoff entries (see _pair_dx_repacked); the repack
        also reports capacity overflow as NaN-free poisoned forces would be
        silent, so it is folded into the returned energy via jnp.where."""
        n, k = nbr_idx.shape
        overflow = None
        if (self.k_short is not None and self.k_short < k
                and n > self.pipeline_rows):
            # fused chunked pipeline: nothing [N, AB_PAD]-sized ever exists
            eat, fjx, fjy, fjz, akey, ok, overflow, w = self._eval_pipeline(
                x, box, nbr_idx, rev_slots, want_virial)
            forces = self._assemble(fjx, fjy, fjz, akey, n, self.k_short)
            e_shift = dict(self.cfg_key)["e_shift"]
            e = jnp.sum(eat[:n] - e_shift)
            if shift:
                e = e + n * e_shift
            e = jnp.where(overflow, jnp.nan, e)
            forces = jnp.where(overflow, jnp.nan, forces)
            return (e, forces, w) if want_virial else (e, forces)
        if self.k_short is not None and self.k_short < k:
            (dxx, dxy, dxz, akey, ok, overflow) = self._pair_dx_repacked(
                x, box, nbr_idx, rev_slots)
            ks = self.k_short
        else:
            dxx, dxy, dxz = self._pair_dx(x, box, nbr_idx)
            p = dxx.shape[0]
            idx_s, rev_s = nbr_idx, rev_slots
            if idx_s.shape[0] != p:
                pad = p - idx_s.shape[0]
                idx_s = jnp.concatenate(
                    [idx_s, jnp.full((pad, k), n, jnp.int32)])
                rev_s = jnp.concatenate(
                    [rev_s, jnp.full((pad, k), k, jnp.int32)])
            ok = (idx_s < n) & (rev_s < k)
            lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (p, k), 0)
            # same banded key scheme, full width: filler = own (row, lane)
            # band position (real keys = partner slot, distinct from fillers
            # because a slot is either a real target or its own filler --
            # here ok entries' own slots are real targets of their partners)
            akey = jnp.where(ok, jnp.minimum(idx_s, n - 1) * (2 * k) + rev_s,
                             row * (2 * k) + k + lane)
            ks = k
        p = dxx.shape[0]
        eat, (fjx, fjy, fjz) = self._eval_fj(
            dxx, dxy, dxz, self._el_rows(p))
        forces = self._assemble(fjx, fjy, fjz, akey, n, ks)
        # shift-free summation: |e_shift| ~ 4.5e3 eV/atom would swamp f32.
        # shift=False returns the shift-free sum itself (resolution ~1e-2 eV
        # at 152k atoms vs the ~64 eV f32 ULP of the shifted total); callers
        # add n*e_shift back in f64 at readout (run.py thermo).
        e_shift = dict(self.cfg_key)["e_shift"]
        e = jnp.sum(eat[:n] - e_shift)
        if shift:
            e = e + n * e_shift
        if overflow is not None:
            # poison the outputs on short-list overflow so it cannot pass
            # silently (the neighbor-list overflow flag does not see this)
            e = jnp.where(overflow, jnp.nan, e)
            forces = jnp.where(overflow, jnp.nan, forces)
        if not want_virial:
            return e, forces
        # pairwise virial tally: W_ab = sum_(i,s) dx_a (x) f_(i<-pair)_b,
        # f on i from the pair = -Fj; both half-contributions summed i-centered
        mask = ok[:n].astype(x.dtype)
        comps = []
        for da in (dxx, dxy, dxz):
            row = []
            for fb in (fjx, fjy, fjz):
                row.append(-jnp.sum(da[:n] * fb[:n] * mask))
            comps.append(row)
        w = jnp.asarray(comps)
        w = 0.5 * (w + w.T)
        return e, forces, w
