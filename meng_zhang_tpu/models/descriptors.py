"""Symmetry-function descriptors: Chebyshev (Artrith-Urban) and
Behler-Parrinello, as batched masked reductions over padded neighbor arrays.

Only descriptor *values* are hand-written; all dG/dr derivatives come from
JAX autodiff of the per-atom energy, replacing the reference's ~500 lines of
hand-derived dG algebra (annp_symmetry_pair/trip, fe/src/pair_annp.cpp:623-685,
ni/src/pair_annp.cpp:686-766). Finite-difference tests pin the equivalence.

Conventions: dx[j] = x_i - x_j for the K (padded) neighbors of one atom;
mask[j] selects real in-cutoff neighbors. Angular sums run over unordered
pairs j<k, realized as 0.5 * a symmetric masked j!=k double sum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..units import CFLENGTH

# TPU matmuls default to bfloat16 passes; descriptor geometry needs full f32
_HI = jax.lax.Precision.HIGHEST


def cutoff_cos(r, rc):
    """fc(r) = 0.5*(cos(pi r / rc) + 1)  (fe/src/pair_annp.cpp:580-584)."""
    return 0.5 * (jnp.cos(jnp.pi / rc * r) + 1.0)


def chebyshev_t(x, n: int):
    """[..., n] Chebyshev polynomials T_0..T_{n-1} by recurrence
    (annp_Tx, fe/src/pair_annp.cpp:586-601)."""
    ts = [jnp.ones_like(x), x]
    for _ in range(2, n):
        ts.append(2.0 * x * ts[-1] - ts[-2])
    return jnp.stack(ts[:n], axis=-1)


def _safe_r(dx, mask):
    rsq = jnp.sum(dx * dx, axis=-1)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    return jnp.where(mask, r, 1.0)


def chebyshev_g(dx, mask, npsf: int, ntsf: int, rc):
    """Raw (unnormalized) Chebyshev descriptor vector of one atom.

    G[m]      = sum_j  T_m(2 r_ij/Rc - 1) fc(r_ij)            m < npsf
    G[npsf+n] = sum_{j<k} T_n((cos t_jik + 1)/2) fc_ij fc_ik  n < ntsf
    (fe/src/pair_annp.cpp:623-685; ANNA uses the same raw sums,
    pair_anna_adp.cpp:653-680.)

    Args: dx [K, 3], mask [K] (True for real neighbors with r < Rc).
    Returns: [npsf + ntsf].
    """
    r = _safe_r(dx, mask)                               # [K]
    fc = jnp.where(mask, cutoff_cos(r, rc), 0.0)
    tp = chebyshev_t(2.0 * r / rc - 1.0, npsf)          # [K, npsf]
    g_rad = jnp.sum(jnp.where(mask[:, None], tp, 0.0) * fc[:, None], axis=0)

    # zero masked unit vectors: padded slots would otherwise feed |cos| >> 1
    # into the Chebyshev recurrence and overflow f32 (T_19 grows ~(2x)^19)
    u = jnp.where(mask[:, None], dx / r[:, None], 0.0)  # unit vectors
    cosjk = jnp.einsum("jd,kd->jk", u, u, precision=_HI)   # [K, K]
    pair_m = (mask[:, None] & mask[None, :])
    pair_m &= ~jnp.eye(mask.shape[0], dtype=bool)
    wjk = jnp.where(pair_m, fc[:, None] * fc[None, :], 0.0)
    # running Chebyshev recurrence: accumulate each weighted T_n reduction
    # without materializing the [K, K, ntsf] stack
    xa = 0.5 * (cosjk + 1.0)
    t_prev = jnp.ones_like(xa)
    t_cur = xa
    sums = [jnp.sum(wjk * t_prev)]
    if ntsf > 1:
        sums.append(jnp.sum(wjk * t_cur))
    for _ in range(2, ntsf):
        t_prev, t_cur = t_cur, 2.0 * xa * t_cur - t_prev
        sums.append(jnp.sum(wjk * t_cur))
    g_ang = 0.5 * jnp.stack(sums)
    return jnp.concatenate([g_rad, g_ang])


def behler_g(dx, mask, coerad, coeang):
    """Raw Behler-Parrinello descriptor vector of one atom (ni variant).

    Lengths enter in Bohr (r_m = r * CFLENGTH). Radial G2 (ignoring the
    parsed-but-unused rs column, ni/src/pair_annp.cpp:686-710):
        G[m] = sum_j exp(-eta_m r_m^2) fc(r_m, Rc_m)          for r_m < Rc_m
    Angular G4 with the j-k leg (ni/src/pair_annp.cpp:711-766):
        G[npsf+n] = sum_{j<k} 2^(1-zeta)(1+lambda cos t)^zeta
                    * exp(-eta (rij^2+rik^2+rjk^2)) fc fc fc
        for all three legs < Rc; terms with (1+lambda cos t) <= 0 skipped.

    Args:
      dx [K, 3] in Angstrom, mask [K];
      coerad [npsf, 3] (eta, rs, Rc) and coeang [ntsf, 4]
      (eta, lambda, zeta, Rc), all in atomic units.
    Returns: [npsf + ntsf].
    """
    r = _safe_r(dx, mask)
    rm = r * CFLENGTH                                   # Bohr
    # radial
    eta_r = coerad[:, 0]
    rc_r = coerad[:, 2]
    in_r = mask[:, None] & (rm[:, None] < rc_r[None, :])        # [K, npsf]
    fc_r = cutoff_cos(rm[:, None], rc_r[None, :])
    g_rad = jnp.sum(jnp.where(in_r, jnp.exp(-eta_r * rm[:, None] ** 2) * fc_r, 0.0),
                    axis=0)

    # angular (masked unit vectors zeroed, see chebyshev_g)
    u = jnp.where(mask[:, None], dx / r[:, None], 0.0)
    cosjk = jnp.einsum("jd,kd->jk", u, u, precision=_HI)
    k_sz = mask.shape[0]
    pair_m = (mask[:, None] & mask[None, :]) & ~jnp.eye(k_sz, dtype=bool)
    # r_jk from the displacement difference: x_j - x_k = dx_k - dx_j
    djk = dx[None, :, :] - dx[:, None, :]
    rjk = jnp.sqrt(jnp.where(pair_m, jnp.sum(djk * djk, axis=-1), 1.0))
    rjk_m = jnp.where(pair_m, rjk * CFLENGTH, 1.0)

    eta_a = coeang[:, 0]
    lam_a = coeang[:, 1]
    zet_a = coeang[:, 2]
    rc_a = coeang[0, 3]
    legs = pair_m & (rm[:, None] < rc_a) & (rm[None, :] < rc_a) & (rjk_m < rc_a)
    r2sum = rm[:, None] ** 2 + rm[None, :] ** 2 + rjk_m ** 2    # [K, K]
    fcfcfc = (cutoff_cos(rm[:, None], rc_a) * cutoff_cos(rm[None, :], rc_a)
              * cutoff_cos(rjk_m, rc_a))
    flag = 1.0 + lam_a[None, None, :] * cosjk[:, :, None]       # [K, K, ntsf]
    ok = legs[:, :, None] & (flag > 0.0)
    term = (2.0 ** (1.0 - zet_a) * jnp.where(ok, flag, 1.0) ** zet_a
            * jnp.exp(-eta_a * r2sum[:, :, None]) * fcfcfc[:, :, None])
    g_ang = 0.5 * jnp.sum(jnp.where(ok, term, 0.0), axis=(0, 1))
    return jnp.concatenate([g_rad, g_ang])
