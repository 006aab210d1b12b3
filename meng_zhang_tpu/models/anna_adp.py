"""ANNA-ADP: physically-informed NN potential (anna-gpu-lammps/bcc_fe).

The MLP does not output energy. Per atom it maps raw Chebyshev descriptors to
two local ADP parameters (d2, q2) (pair_anna_adp.cpp:166-167,720-751); energy
and forces come from an analytic angular-dependent potential:

  step(r)   = x^4/(1+x^4),  x = (r - Rc)/hc                 (:181-182)
  rho_i     = sum_j step * (A0 (r-r0)^yy e^-gz (1+e^-gz) + C0)   (:193-195)
  embed_i   = c1F sqrt(rho_i) + c2F rho_i^2                  (:212)
  repul_i   = sum_j step * (V0/(b2-b1) (b2/z^b1 - b1/z^b2) + delta), z=r/r1
  u(r)      = step (d1 e^{-d2 r} + d3);   mu_i     = sum_j u * x_ij
  w(r)      = step (q1 e^{-q2 r} + q3);   lambda_i = sum_j w * x_ij x_ij^T
  E_i = 0.5 repul_i + embed_i + 0.5|mu_i|^2 + 0.5||lambda_i||_F^2
        - (1/6) tr(lambda_i)^2 + e_base                      (:211-214)

Forces deliberately treat the NN outputs (d2, q2) as constants -- the PINN
approximation (:216-272). Here that is `lax.stop_gradient` around the
network outputs before differentiating the analytic energy; autodiff then
reproduces the reference's hand-derived pair forces exactly (tested against
a transcription of its formulas).

The reference's two-phase GPU execution with 12 mid-step MPI ghost-field
exchanges (pair_anna_adp_gpu.cpp:135-158) collapses on a single chip into
one differentiable graph; the multi-chip path exchanges halo fields
in-graph instead (meng_zhang_tpu.parallel).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.potential import AnnaPotential
from ..system.cell import min_image
from .descriptors import chebyshev_g
from .mlp import mlp_apply


@dataclasses.dataclass(frozen=True)
class AnnaConfig:
    npsf: int
    ntsf: int
    cut: float
    flagact: tuple
    act_style: str
    e_base: float
    e_scale: float
    pbc: tuple = (True, True, True)


def make_anna(pot: AnnaPotential, dtype=jnp.float32,
              pbc=(True, True, True)):
    cfg = AnnaConfig(npsf=pot.npsf, ntsf=pot.ntsf, cut=pot.cut,
                     flagact=pot.networks[0].flagact,
                     act_style=pot.networks[0].act_style,
                     e_base=pot.e_base, e_scale=pot.e_scale, pbc=tuple(pbc))
    ne = len(pot.elements)
    nl = pot.networks[0].n_layers
    params = {
        "w": tuple(jnp.asarray(np.stack([pot.networks[e].weights[l] for e in range(ne)]),
                               dtype=dtype) for l in range(nl)),
        "b": tuple(jnp.asarray(np.stack([pot.networks[e].biases[l] for e in range(ne)]),
                               dtype=dtype) for l in range(nl)),
        "gp": jnp.asarray(pot.gparams, dtype=dtype),
    }
    return cfg, params


def _gather_dx(x, box, nbr_idx, pbc=(True, True, True)):
    n = x.shape[0]
    x_pad = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)
    dx = min_image(x[:, None, :] - x_pad[nbr_idx], box, pbc)
    mask = nbr_idx < n
    return dx, mask


def local_params(cfg: AnnaConfig, params, x, box, nbr_idx, elems=None,
                 chunk=512, x_src=None):
    """Phase 1: per-atom (d2, q2) from raw Chebyshev descriptors, [N, 2].

    Atoms are processed in lax.map chunks so the O(chunk*K^2) angular
    intermediates stay bounded (the FCA-chunking analogue,
    SURVEY.md section 7). x_src (default x) is the gather source for
    neighbor positions -- the sharded frame path passes the halo frame."""
    n = x.shape[0]
    src = x if x_src is None else x_src
    n_src = src.shape[0]
    if elems is None:
        elems = jnp.zeros(n, dtype=jnp.int32)

    def one(dxi, mi, ei):
        rsq = jnp.sum(dxi * dxi, axis=-1)
        m = mi & (rsq < cfg.cut * cfg.cut)
        g = chebyshev_g(dxi, m, cfg.npsf, cfg.ntsf, cfg.cut)
        w = tuple(wl[ei] for wl in params["w"])
        b = tuple(bl[ei] for bl in params["b"])
        return mlp_apply(w, b, cfg.flagact, cfg.act_style, g)

    x_pad = jnp.concatenate([src, jnp.zeros((1, 3), src.dtype)], axis=0)
    if n <= chunk:
        dx = min_image(x[:, None, :] - x_pad[nbr_idx], box, cfg.pbc)
        return jax.vmap(one)(dx, nbr_idx < n_src, elems)

    n_pad = -(-n // chunk) * chunk
    idx_p = jnp.concatenate(
        [nbr_idx, jnp.full((n_pad - n, nbr_idx.shape[1]), n_src, jnp.int32)]) \
        if n_pad != n else nbr_idx
    xi_p = jnp.concatenate([x, jnp.zeros((n_pad - n, 3), x.dtype)]) \
        if n_pad != n else x
    el_p = jnp.concatenate([elems, jnp.zeros(n_pad - n, jnp.int32)]) \
        if n_pad != n else elems

    def chunk_fn(args):
        xi, idx, el = args
        dx = min_image(xi[:, None, :] - x_pad[idx], box, cfg.pbc)
        mask = idx < n_src
        return jax.vmap(one)(dx, mask, el)

    out = jax.lax.map(chunk_fn,
                      (xi_p.reshape(-1, chunk, 3),
                       idx_p.reshape(-1, chunk, nbr_idx.shape[1]),
                       el_p.reshape(-1, chunk)))
    return out.reshape(n_pad, -1)[:n]


def atom_energies_fields(cfg: AnnaConfig, params, x, box, nbr_idx, lparams,
                         eps=None, chunk=512, x_src=None):
    """Chunked wrapper around `_atom_energies_fields_block`. x_src (default
    x) is the neighbor-position gather source (sharded frames pass it)."""
    n = x.shape[0]
    src = x if x_src is None else x_src
    if n <= chunk:
        return _atom_energies_fields_block(cfg, params, x, src, box, nbr_idx,
                                           lparams, eps)
    n_pad = -(-n // chunk) * chunk

    def pad(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((n_pad - n,) + a.shape[1:], fill, a.dtype)]) \
            if n_pad != n else a

    xi = pad(x).reshape(-1, chunk, 3)
    idx = pad(nbr_idx, src.shape[0]).reshape(-1, chunk, nbr_idx.shape[1])
    lp = pad(lparams).reshape(-1, chunk, lparams.shape[1])

    def chunk_fn(args):
        xc, ic, lc = args
        return _atom_energies_fields_block(cfg, params, xc, src, box, ic, lc,
                                           eps)

    e, rho, mu, lam = jax.lax.map(chunk_fn, (xi, idx, lp))
    return (e.reshape(n_pad)[:n], rho.reshape(n_pad)[:n],
            mu.reshape(n_pad, 3)[:n], lam.reshape(n_pad, 3, 3)[:n])


def _atom_energies_fields_block(cfg: AnnaConfig, params, xc, x_all, box,
                                nbr_idx, lparams, eps=None):
    """Per-atom ADP energy given frozen local parameters.

    Returns (e_at [N], rho [N], mu [N,3], lam [N,3,3]) -- the fields the
    reference forward-communicates between its two GPU phases.
    """
    gp = params["gp"]
    A0, yy, gamma, C0 = gp[0], gp[1], gp[2], gp[3]
    c1F, c2F, V0, b1, b2 = gp[4], gp[5], gp[6], gp[7], gp[8]
    delta, r0, r1, hc = gp[9], gp[10], gp[11], gp[12]
    d1, q1, d3, q3 = gp[13], gp[14], gp[15], gp[16]
    rc = cfg.cut
    n_all = x_all.shape[0]
    x_pad = jnp.concatenate([x_all, jnp.zeros((1, 3), x_all.dtype)], axis=0)
    dx = min_image(xc[:, None, :] - x_pad[nbr_idx], box, cfg.pbc)
    mask = nbr_idx < n_all
    if eps is not None:
        dx = dx @ (jnp.eye(3, dtype=xc.dtype) + eps)

    def one(dxi, mi, lp):
        rsq = jnp.sum(dxi * dxi, axis=-1)
        m = mi & (rsq < rc * rc)
        r = jnp.sqrt(jnp.where(m, rsq, 1.0))
        stx = (r - rc) / hc
        st4 = stx ** 4
        step = jnp.where(m, st4 / (1.0 + st4), 0.0)

        d2, q2 = lp[0], lp[1]
        u = step * (d1 * jnp.exp(-d2 * r) + d3)
        w = step * (q1 * jnp.exp(-q2 * r) + q3)
        mu = jnp.sum(u[:, None] * dxi, axis=0)                       # [3]
        lam = jnp.sum(w[:, None, None] * dxi[:, :, None] * dxi[:, None, :],
                      axis=0)                                        # [3,3]

        z = r - r0
        ez = jnp.exp(-gamma * z)
        rho = jnp.sum(step * (A0 * jnp.where(m, z, 1.0) ** yy * ez * (1.0 + ez) + C0))
        zr = r / r1
        repul = jnp.sum(step * (V0 / (b2 - b1)
                                * (b2 / zr ** b1 - b1 / zr ** b2) + delta))

        rho_safe = jnp.where(rho > 1e-30, rho, 1.0)
        embed = jnp.where(rho > 1e-30,
                          c1F * jnp.sqrt(rho_safe) + c2F * rho * rho, 0.0)
        nu = jnp.trace(lam)
        angular = (0.5 * jnp.sum(mu * mu) + 0.5 * jnp.sum(lam * lam)
                   - nu * nu / 6.0)
        e = 0.5 * repul + embed + angular + cfg.e_base
        return e, rho, mu, lam

    return jax.vmap(one)(dx, mask, lparams)


def energy(cfg: AnnaConfig, params, x, box, nbr_idx, elems=None):
    lp = jax.lax.stop_gradient(local_params(cfg, params, x, box, nbr_idx, elems))
    e_at, _, _, _ = atom_energies_fields(cfg, params, x, box, nbr_idx, lp)
    return jnp.sum(e_at)


def atom_energies(cfg: AnnaConfig, params, x, box, nbr_idx, elems=None):
    lp = local_params(cfg, params, x, box, nbr_idx, elems)
    e_at, _, _, _ = atom_energies_fields(cfg, params, x, box, nbr_idx, lp)
    return e_at


def energy_forces_autodiff(cfg: AnnaConfig, params, x, box, nbr_idx, elems=None):
    """Total energy and the true frozen-(d2,q2) gradient forces via autodiff.

    Numerically identical (< 1e-10) to the hand-derived `energy_forces`:
    the reference's d_rho omits a step-function factor on its gamma terms
    (pair_anna_adp.cpp force loop == lal_anna_adp.cu:738), but those terms
    are suppressed by e^{-gamma(r-r0)} ~ 1e-11 for the shipped parameters.
    Kept as an independent cross-check and for autodiff-through-strain uses.
    """
    lp = jax.lax.stop_gradient(local_params(cfg, params, x, box, nbr_idx, elems))

    def etot(xx):
        e_at, _, _, _ = atom_energies_fields(cfg, params, xx, box, nbr_idx, lp)
        return jnp.sum(e_at)

    e, g = jax.value_and_grad(etot)(x)
    return e, -g


def _center_pair_force(gp, rho_c, mu_c, lam_c, d2_c, q2_c, dx, r, rc):
    """Reference pair force g(fields_of_center, x_ct) for displacement
    x_ct = x_center - x_target (vectorized over trailing pair axes).

    Transcribes the analytic form of pair_anna_adp.cpp:216-272 ==
    lal_anna_adp.cu:700-784, including its d_rho quirk.
    """
    A0, yy, gamma, C0 = gp[0], gp[1], gp[2], gp[3]
    c1F, c2F, V0, b1, b2 = gp[4], gp[5], gp[6], gp[7], gp[8]
    delta, r0, r1, hc = gp[9], gp[10], gp[11], gp[12]
    d1, q1, d3, q3 = gp[13], gp[14], gp[15], gp[16]

    stx = (r - rc) / hc
    t1 = 1.0 + stx ** 4
    stpf = stx ** 4 / t1
    dstpf = 4.0 * stx ** 3 / (t1 * t1) / hc

    z = r - r0
    ez = jnp.exp(-gamma * z)
    zyy = A0 * z ** yy
    gazyy = zyy * gamma
    drho = (ez * (1.0 + ez) * (zyy * (dstpf + stpf * yy / z) - gazyy)
            + C0 * dstpf - gazyy * ez * ez)
    rho_s = jnp.where(rho_c > 1e-30, rho_c, 1.0)
    dembed = (0.5 * c1F / jnp.sqrt(rho_s) + 2.0 * c2F * rho_c) * drho

    repc = V0 / (b2 - b1)
    zr = r / r1
    zb1 = zr ** b1
    zb2 = zr ** b2
    rep1 = repc * (b2 / zb1 - b1 / zb2) + delta
    drep = dstpf * rep1 + stpf * repc * (b2 * b1 / r1 / zr * (-1.0 / zb1 + 1.0 / zb2))

    ut = d1 * jnp.exp(-d2_c * r)
    wt = q1 * jnp.exp(-q2_c * r)
    au = stpf * (ut + d3)
    aw = 2.0 * stpf * (wt + q3)
    dau = dstpf * (ut + d3) + stpf * (-d2_c * ut)
    daw = dstpf * (wt + q3) + stpf * (-q2_c * wt)

    # elementwise forms (not einsum/matmul): keeps the arithmetic identical
    # between the self- and neighbor-centered paths on TPU, where matmuls
    # default to bfloat16 passes and would break pairwise cancellation
    lam_x = jnp.sum(lam_c * dx[..., None, :], axis=-1)
    lamq = jnp.sum(dx * lam_x, axis=-1)
    mu_x = jnp.sum(mu_c * dx, axis=-1)
    f_v = -jnp.trace(lam_c, axis1=-2, axis2=-1) / 3.0

    dterm1 = 0.5 * drep + dembed + dau * mu_x + daw * lamq
    dterm3 = f_v * (daw * r + aw)
    return (dterm1 / r + dterm3)[..., None] * dx + aw[..., None] * lam_x \
        + au[..., None] * mu_c


def energy_forces(cfg: AnnaConfig, params, x, box, nbr_idx, elems=None):
    """Total energy and reference-exact forces.

    Newton-off gather formulation (the anna_adp GPU kernel's own shape,
    lal_anna_adp.cu:642-804): per ordered pair (a, j),
      F_a += g(fields_j, x_j - x_a) - g(fields_a, x_a - x_j),
    with every field gathered -- no scatter. Also returns nothing else;
    see `energy_forces_virial` for the stress tensor.
    """
    e, f, _ = _ef_impl(cfg, params, x, box, nbr_idx, elems, want_virial=False)
    return e, f


def energy_forces_virial(cfg: AnnaConfig, params, x, box, nbr_idx, elems=None,
                         shift=True):
    return _ef_impl(cfg, params, x, box, nbr_idx, elems, want_virial=True,
                    shift=shift)


def _ef_impl(cfg: AnnaConfig, params, x, box, nbr_idx, elems, want_virial,
             chunk=512, shift=True):
    n = x.shape[0]
    gp = params["gp"]
    rc = cfg.cut
    lp = local_params(cfg, params, x, box, nbr_idx, elems)
    e_at, rho, mu, lam = atom_energies_fields(cfg, params, x, box, nbr_idx, lp)
    x_pad = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)

    def force_block(xc, idx, lpc, rhoc, muc, lamc):
        dx = min_image(xc[:, None, :] - x_pad[idx], box, cfg.pbc)  # [C,K,3]
        mask = idx < n
        rsq = jnp.sum(dx * dx, axis=-1)
        m = mask & (rsq < rc * rc)
        r = jnp.sqrt(jnp.where(m, rsq, 1.0))
        idx_c = jnp.minimum(idx, n - 1)
        g_self = _center_pair_force(gp, rhoc[:, None], muc[:, None, :],
                                    lamc[:, None], lpc[:, 0:1], lpc[:, 1:2],
                                    dx, r, rc)
        g_nbr = _center_pair_force(gp, rho[idx_c], mu[idx_c], lam[idx_c],
                                   lp[idx_c, 0], lp[idx_c, 1], -dx, r, rc)
        f_pair = jnp.where(m[..., None], g_nbr - g_self, 0.0)
        f = jnp.sum(f_pair, axis=1)
        wv = 0.5 * jnp.einsum("nka,nkb->ab",
                              dx * m[..., None].astype(dx.dtype), f_pair,
                              precision=jax.lax.Precision.HIGHEST)
        return f, wv

    if n <= chunk:
        f, w = force_block(x, nbr_idx, lp, rho, mu, lam)
    else:
        n_pad = -(-n // chunk) * chunk

        def pad(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((n_pad - n,) + a.shape[1:], fill, a.dtype)]) \
                if n_pad != n else a

        args = (pad(x).reshape(-1, chunk, 3),
                pad(nbr_idx, n).reshape(-1, chunk, nbr_idx.shape[1]),
                pad(lp).reshape(-1, chunk, lp.shape[1]),
                pad(rho).reshape(-1, chunk),
                pad(mu).reshape(-1, chunk, 3),
                pad(lam).reshape(-1, chunk, 3, 3))
        f_c, w_c = jax.lax.map(lambda a: force_block(*a), args)
        f = f_c.reshape(n_pad, 3)[:n]
        w = jnp.sum(w_c, axis=0)
    if want_virial:
        w = 0.5 * (w + w.T)
    else:
        w = None
    # shift-free sum: e_base = -4473 eV/atom; see PallasAnnp.energy_forces
    e = jnp.sum(e_at - cfg.e_base)
    if shift:
        e = e + n * cfg.e_base
    return e, f, w




# ---------------------------------------------------------------------------
# TPU-layout fast path.
#
# The paths above keep the reference-shaped [.., 3] / [.., 3, 3] arrays for
# oracle-parity clarity, but a trailing dim of 3 tile-pads to 128 lanes on
# TPU (42x memory/bandwidth waste -- the repo-wide layout rule). The fast
# path re-lays every per-pair and per-atom quantity as separate component
# planes: dx as three [C, K] planes, mu as three [N] columns, lambda as six
# [N] columns (symmetric), and the 12 per-atom fields the reference MPI
# round-trips between its two GPU phases (rho, mu, lambda, d2, q2;
# src/pair_anna_adp_gpu.cpp:135-158) packed into one [N, 16] row-gather
# table. Same formulas, same frozen-(d2,q2) force definition -- only the
# data layout changes (f64 parity ~1e-12 vs the reference-shaped path).
# ---------------------------------------------------------------------------


def _pair_dx_planes(xc, xpad, idx, box, pbc):
    """3 x [C, K] displacement planes + squared distance (component layout)."""
    dx = []
    rsq = jnp.zeros(idx.shape, xc[0].dtype)
    for d in range(3):
        dd = xc[d][:, None] - xpad[d][idx]
        if pbc[d]:
            dd = dd - box[d] * jnp.round(dd / box[d])
        dx.append(dd)
        rsq = rsq + dd * dd
    return dx, rsq


def _pair_force_planes(gp, rc, fields, dxx, dxy, dxz, r, stpf, dstpf):
    """`_center_pair_force` on component planes: force contribution
    g(fields_of_center, x_ct) for x_ct = (dxx, dxy, dxz). `fields` is a
    dict of broadcast-compatible planes (center: [C, 1]; neighbor: [C, K]).
    Returns (gx, gy, gz) planes."""
    A0, yy, gamma, C0 = gp[0], gp[1], gp[2], gp[3]
    c1F, c2F, V0, b1, b2 = gp[4], gp[5], gp[6], gp[7], gp[8]
    delta, r0, r1, hc = gp[9], gp[10], gp[11], gp[12]
    d1, q1, d3, q3 = gp[13], gp[14], gp[15], gp[16]

    z = r - r0
    ez = jnp.exp(-gamma * z)
    zyy = A0 * z ** yy
    gazyy = zyy * gamma
    drho = (ez * (1.0 + ez) * (zyy * (dstpf + stpf * yy / z) - gazyy)
            + C0 * dstpf - gazyy * ez * ez)
    rho_c = fields["rho"]
    rho_s = jnp.where(rho_c > 1e-30, rho_c, 1.0)
    dembed = (0.5 * c1F / jnp.sqrt(rho_s) + 2.0 * c2F * rho_c) * drho

    repc = V0 / (b2 - b1)
    zr = r / r1
    zb1 = zr ** b1
    zb2 = zr ** b2
    rep1 = repc * (b2 / zb1 - b1 / zb2) + delta
    drep = dstpf * rep1 + stpf * repc * (b2 * b1 / r1 / zr
                                         * (-1.0 / zb1 + 1.0 / zb2))

    d2_c, q2_c = fields["d2"], fields["q2"]
    ut = d1 * jnp.exp(-d2_c * r)
    wt = q1 * jnp.exp(-q2_c * r)
    au = stpf * (ut + d3)
    aw = 2.0 * stpf * (wt + q3)
    dau = dstpf * (ut + d3) + stpf * (-d2_c * ut)
    daw = dstpf * (wt + q3) + stpf * (-q2_c * wt)

    lxx, lyy, lzz = fields["lxx"], fields["lyy"], fields["lzz"]
    lxy, lxz, lyz = fields["lxy"], fields["lxz"], fields["lyz"]
    lam_xx = lxx * dxx + lxy * dxy + lxz * dxz     # (lam . dx) components
    lam_xy = lxy * dxx + lyy * dxy + lyz * dxz
    lam_xz = lxz * dxx + lyz * dxy + lzz * dxz
    lamq = dxx * lam_xx + dxy * lam_xy + dxz * lam_xz
    mux, muy, muz = fields["mux"], fields["muy"], fields["muz"]
    mu_x = mux * dxx + muy * dxy + muz * dxz
    f_v = -(lxx + lyy + lzz) / 3.0

    dterm1 = 0.5 * drep + dembed + dau * mu_x + daw * lamq
    s = dterm1 / r + f_v * (daw * r + aw)
    return (s * dxx + aw * lam_xx + au * mux,
            s * dxy + aw * lam_xy + au * muy,
            s * dxz + aw * lam_xz + au * muz)


def _fields_chunk(cfg, gp, xc, xpad, idx, box, lp_c):
    """Per-atom fields + energy for one row chunk, component layout.

    Returns (e_at [C], field planes dict of [C])."""
    A0, yy, gamma, C0 = gp[0], gp[1], gp[2], gp[3]
    c1F, c2F, V0, b1, b2 = gp[4], gp[5], gp[6], gp[7], gp[8]
    delta, r0, r1, hc = gp[9], gp[10], gp[11], gp[12]
    d1, q1, d3, q3 = gp[13], gp[14], gp[15], gp[16]
    rc = cfg.cut
    n = xpad[0].shape[0] - 1
    dx, rsq = _pair_dx_planes(xc, xpad, idx, box, cfg.pbc)
    m = (idx < n) & (rsq < rc * rc) & (rsq > 1.0e-12)
    r = jnp.sqrt(jnp.where(m, rsq, 1.0))
    stx = (r - rc) / hc
    st4 = stx ** 4
    step = jnp.where(m, st4 / (1.0 + st4), 0.0)

    d2, q2 = lp_c[:, 0:1], lp_c[:, 1:2]                  # [C, 1]
    u = step * (d1 * jnp.exp(-d2 * r) + d3)
    w = step * (q1 * jnp.exp(-q2 * r) + q3)
    f = {"d2": d2[:, 0], "q2": q2[:, 0]}
    f["mux"] = jnp.sum(u * dx[0], axis=1)
    f["muy"] = jnp.sum(u * dx[1], axis=1)
    f["muz"] = jnp.sum(u * dx[2], axis=1)
    f["lxx"] = jnp.sum(w * dx[0] * dx[0], axis=1)
    f["lyy"] = jnp.sum(w * dx[1] * dx[1], axis=1)
    f["lzz"] = jnp.sum(w * dx[2] * dx[2], axis=1)
    f["lxy"] = jnp.sum(w * dx[0] * dx[1], axis=1)
    f["lxz"] = jnp.sum(w * dx[0] * dx[2], axis=1)
    f["lyz"] = jnp.sum(w * dx[1] * dx[2], axis=1)

    z = r - r0
    ez = jnp.exp(-gamma * z)
    rho = jnp.sum(step * (A0 * jnp.where(m, z, 1.0) ** yy * ez * (1.0 + ez)
                          + C0), axis=1)
    f["rho"] = rho
    zr = r / r1
    repul = jnp.sum(step * (V0 / (b2 - b1)
                            * (b2 / zr ** b1 - b1 / zr ** b2) + delta),
                    axis=1)
    rho_safe = jnp.where(rho > 1e-30, rho, 1.0)
    embed = jnp.where(rho > 1e-30,
                      c1F * jnp.sqrt(rho_safe) + c2F * rho * rho, 0.0)
    nu = f["lxx"] + f["lyy"] + f["lzz"]
    musq = f["mux"] ** 2 + f["muy"] ** 2 + f["muz"] ** 2
    lamsq = (f["lxx"] ** 2 + f["lyy"] ** 2 + f["lzz"] ** 2
             + 2.0 * (f["lxy"] ** 2 + f["lxz"] ** 2 + f["lyz"] ** 2))
    e_at = 0.5 * repul + embed + 0.5 * musq + 0.5 * lamsq - nu * nu / 6.0
    return e_at, f


_FIELD_ORDER = ("rho", "mux", "muy", "muz", "lxx", "lyy", "lzz",
                "lxy", "lxz", "lyz", "d2", "q2")


def _force_chunk(cfg, gp, xc, xpad, idx, box, ftab, own, eps=None,
                 eps_mask=None):
    """Newton-off pair forces for one row chunk: both i- and j-centered
    contributions gathered (k_anna_adp's formulation, lal_anna_adp.cu:
    642-804). ftab [N+1, 16] packs _FIELD_ORDER; own: dict of this chunk's
    center field columns [C]. Returns (fx, fy, fz [C], virial [3, 3])."""
    rc = cfg.cut
    hc = gp[12]
    n = xpad[0].shape[0] - 1
    dx, rsq = _pair_dx_planes(xc, xpad, idx, box, cfg.pbc)
    if eps is not None:
        dx = [dx[a] + (eps_mask[:, None] if eps_mask is not None else 1.0)
              * sum(dx[b] * eps[b, a] for b in range(3)) for a in range(3)]
        rsq = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    m = (idx < n) & (rsq < rc * rc) & (rsq > 1.0e-12)
    mf = m.astype(xc[0].dtype)
    r = jnp.sqrt(jnp.where(m, rsq, 1.0))
    stx = (r - rc) / hc
    t1 = 1.0 + stx ** 4
    stpf = stx ** 4 / t1
    dstpf = 4.0 * stx ** 3 / (t1 * t1) / hc

    fj16 = ftab[jnp.minimum(idx, n)]                     # [C, K, 16]
    nbr = {k: fj16[:, :, c] for c, k in enumerate(_FIELD_ORDER)}
    ctr = {k: own[k][:, None] for k in _FIELD_ORDER}
    g_self = _pair_force_planes(gp, rc, ctr, dx[0], dx[1], dx[2], r,
                                stpf, dstpf)
    g_nbr = _pair_force_planes(gp, rc, nbr, -dx[0], -dx[1], -dx[2], r,
                               stpf, dstpf)
    fp = [(gn - gs) * mf for gn, gs in zip(g_nbr, g_self)]
    f = [jnp.sum(c, axis=1) for c in fp]
    wv = jnp.asarray([[0.5 * jnp.sum(dx[a] * fp[b] * mf) for b in range(3)]
                      for a in range(3)])
    return f[0], f[1], f[2], wv


class AnnaShort(NamedTuple):
    """Refresh-static compacted rows for the ANNA fast path (the chunked
    analogue of models.annp.ShortRows -- no delivery keys needed: the
    newton-off gather needs no assembly at all)."""
    idx: jax.Array
    ref_x: jax.Array
    overflow: jax.Array


def make_anna_fast_fns(cfg: AnnaConfig, params, k_short=64, delta=0.3,
                       chunk=2048):
    """Production force/short-build trio for the TPU-layout ANNA path.

    Per eval: (1) raw Chebyshev G via the shared [C, K]-plane chunk
    (models.annp.chunk_g_cheb -- ANNA's descriptors are the identical raw
    sums), MLP -> (d2, q2); (2) per-atom fields rho/mu/lambda + atom
    energies; (3) newton-off pair forces with partner fields fetched
    through one packed [N, 16] row gather -- the in-graph equivalent of
    the reference's 12 forward_comm ghost fields. Returns
    (force_fn, force_fn_light, short_build) for
    Simulator(..., short_build=..., force_fn_light=...) with
    cfg.short_every > 0, cfg.short_skin == delta."""
    from .annp import chunk_g_cheb, compact_neighbor_rows
    gp = params["gp"]
    rc = cfg.cut
    w1, w2, w3 = (params["w"][l][0] for l in range(3))
    b1_, b2_, b3_ = (params["b"][l][0] for l in range(3))

    def short_build(x, box, nbrs):
        idx_s, ovf = compact_neighbor_rows(x, box, nbrs.idx, rc + delta,
                                           k_short, pbc=cfg.pbc)
        return AnnaShort(idx=idx_s, ref_x=x, overflow=ovf)

    def _mlp2(g):
        # values only (forces freeze d2/q2): mlp_apply carries the ANNA
        # activation style (1.7 tanh(0.3 x), pair_anna_adp.cpp:695-717)
        return mlp_apply((w1, w2, w3), (b1_, b2_, b3_), cfg.flagact,
                         cfg.act_style, g)                # [C, 2]

    def _eval(x, box, idx, want_virial, eps=None):
        n = x.shape[0]
        k = idx.shape[1]
        n_pad = -(-n // chunk) * chunk
        xpad = tuple(jnp.concatenate([x[:, d], jnp.zeros((1,), x.dtype)])
                     for d in range(3))
        idx_p = _pad2(idx, n_pad, n).reshape(-1, chunk, k)
        xc = tuple(_pad2(x[:, d], n_pad, 0.0).reshape(-1, chunk)
                   for d in range(3))
        valid = (jnp.arange(n_pad) < n).reshape(-1, chunk)

        # phase 1+2: (d2, q2), fields, atom energies -- one chunked sweep
        @jax.checkpoint
        def p12(args):
            x0, x1, x2, ic, vc = args
            g = chunk_g_cheb(cfg.npsf, cfg.ntsf, rc, cfg.pbc, (x0, x1, x2),
                             xpad, ic, box)
            lp_c = _mlp2(g)
            e_at, f = _fields_chunk(cfg, gp, (x0, x1, x2), xpad, ic, box,
                                    lp_c)
            e_at = jnp.where(vc, e_at, 0.0)
            return e_at, jnp.stack([f[kk] for kk in _FIELD_ORDER], axis=1)

        e_at, fcols = jax.lax.map(p12, (xc[0], xc[1], xc[2], idx_p, valid))
        e_at = e_at.reshape(n_pad)[:n]
        fcols = fcols.reshape(n_pad, len(_FIELD_ORDER))
        ftab = jnp.pad(fcols[:n], ((0, 1), (0, 16 - len(_FIELD_ORDER))))

        # phase 3: newton-off pair forces from gathered fields
        owns = {kk: fcols[:, c] for c, kk in enumerate(_FIELD_ORDER)}

        def p3(args):
            x0, x1, x2, ic, oc, lc = args
            own = {kk: oc[:, c] for c, kk in enumerate(_FIELD_ORDER)}
            return _force_chunk(cfg, gp, (x0, x1, x2), xpad, ic, box, ftab,
                                own, eps=eps,
                                eps_mask=lc.astype(x.dtype)
                                if eps is not None else None)

        fx, fy, fz, wv = jax.lax.map(
            p3, (xc[0], xc[1], xc[2], idx_p,
                 fcols.reshape(-1, chunk, len(_FIELD_ORDER)), valid))
        f = jnp.stack([fx.reshape(n_pad)[:n], fy.reshape(n_pad)[:n],
                       fz.reshape(n_pad)[:n]], axis=1)
        w = None
        if want_virial:
            w = jnp.sum(wv, axis=0)
            w = 0.5 * (w + w.T)
        # shift-free sum (e_base = -4473 eV/atom; e_at excludes it here)
        e = jnp.sum(e_at)
        return e, f, w

    def _poison(e, f, ovf):
        nan = jnp.asarray(jnp.nan, f.dtype)
        return jnp.where(ovf, nan, e), jnp.where(ovf, nan, f)

    def force_fn(x, box, nbrs, short):
        e, f, w = _eval(x, box, short.idx, want_virial=True)
        e, f = _poison(e, f, short.overflow)
        return e, f, w

    def force_fn_light(x, box, nbrs, short):
        e, f, _ = _eval(x, box, short.idx, want_virial=False)
        e, f = _poison(e, f, short.overflow)
        return e, f, jnp.zeros((3, 3), x.dtype)

    return force_fn, force_fn_light, short_build


def _pad2(a, rows, fill):
    return jnp.concatenate(
        [a, jnp.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)]) \
        if rows != a.shape[0] else a


def energy_forces_frame(cfg: AnnaConfig, params, xc, x_src, box, idx, off,
                        vslice, want_virial=False, chunk=512):
    """Two-phase sharded-frame evaluation -- the halo-recompute form of the
    reference's GPU path (energy kernel -> 12-field MPI forward_comm ->
    force kernel, src/pair_anna_adp_gpu.cpp:92-159).

    xc [Cc, 3]: center-row positions (local atoms + a bc-row extension on
    each side); x_src [C_ext, 3]: the position frame (centers sit at offset
    `off`); idx [Cc, K]: neighbor rows indexing the frame (sentinel C_ext);
    vslice=(lo, hi): the device-local center rows.

    Phase 1 computes (d2, q2) and the ADP fields (rho, mu, lambda) for ALL
    center rows from frame positions -- every field the reference would MPI
    round-trip is recomputed locally instead. Phase 2 evaluates the
    newton-off pair force (both i- and j-centered terms gathered, exactly
    k_anna_adp's formulation, lal_anna_adp.cu:642-804) for the local rows,
    fetching partner fields through the frame->center-row map t = idx - off.
    Returns (eat [Cc], forces [Cc, 3] with rows outside vslice zero,
    virial [3,3] or None).
    """
    cc = xc.shape[0]
    n_src = x_src.shape[0]
    gp = params["gp"]
    rc = cfg.cut
    lo, hi = vslice

    lp = local_params(cfg, params, xc, box, idx, chunk=chunk, x_src=x_src)
    e_at, rho, mu, lam = atom_energies_fields(cfg, params, xc, box, idx, lp,
                                              chunk=chunk, x_src=x_src)

    x_pad = jnp.concatenate([x_src, jnp.zeros((1, 3), x_src.dtype)], axis=0)

    def force_block(xb, idxb, lpb, rhob, mub, lamb):
        dx = min_image(xb[:, None, :] - x_pad[idxb], box, cfg.pbc)  # [C,K,3]
        rsq = jnp.sum(dx * dx, axis=-1)
        t = idxb - off                       # partner's center row
        tm = (t >= 0) & (t < cc)
        m = (idxb < n_src) & (rsq < rc * rc) & tm
        r = jnp.sqrt(jnp.where(m, rsq, 1.0))
        t_c = jnp.clip(t, 0, cc - 1)
        g_self = _center_pair_force(gp, rhob[:, None], mub[:, None, :],
                                    lamb[:, None], lpb[:, 0:1], lpb[:, 1:2],
                                    dx, r, rc)
        g_nbr = _center_pair_force(gp, rho[t_c], mu[t_c], lam[t_c],
                                   lp[t_c, 0], lp[t_c, 1], -dx, r, rc)
        f_pair = jnp.where(m[..., None], g_nbr - g_self, 0.0)
        f = jnp.sum(f_pair, axis=1)
        wv = 0.5 * jnp.einsum("nka,nkb->ab",
                              dx * m[..., None].astype(dx.dtype), f_pair,
                              precision=jax.lax.Precision.HIGHEST)
        return f, wv

    n_loc = hi - lo
    if n_loc <= chunk:
        f_loc, w = force_block(xc[lo:hi], idx[lo:hi], lp[lo:hi], rho[lo:hi],
                               mu[lo:hi], lam[lo:hi])
    else:
        n_pad = -(-n_loc // chunk) * chunk

        def pad(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((n_pad - n_loc,) + a.shape[1:], fill, a.dtype)]) \
                if n_pad != n_loc else a

        args = (pad(xc[lo:hi]).reshape(-1, chunk, 3),
                pad(idx[lo:hi], n_src).reshape(-1, chunk, idx.shape[1]),
                pad(lp[lo:hi]).reshape(-1, chunk, lp.shape[1]),
                pad(rho[lo:hi]).reshape(-1, chunk),
                pad(mu[lo:hi]).reshape(-1, chunk, 3),
                pad(lam[lo:hi]).reshape(-1, chunk, 3, 3))
        f_c, w_c = jax.lax.map(lambda a: force_block(*a), args)
        f_loc = f_c.reshape(n_pad, 3)[:n_loc]
        w = jnp.sum(w_c, axis=0)

    forces = jnp.zeros((cc, 3), xc.dtype).at[lo:hi].set(f_loc)
    if want_virial:
        w = 0.5 * (w + w.T)
    else:
        w = None
    return e_at, forces, w
