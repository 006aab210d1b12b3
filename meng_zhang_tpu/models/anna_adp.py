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
# planes: dx as three [N, K] planes gathered ONCE per eval (the x8-packed
# row gather, ops.pallas_annp.pair_dx_planes), mu as three [N] columns,
# lambda as six [N] columns (symmetric), and the 12 per-atom fields the
# reference MPI round-trips between its two GPU phases (rho, mu, lambda,
# d2, q2; src/pair_anna_adp_gpu.cpp:135-158) packed into one [N, 16]
# row-gather table.
#
# Phase 1 (descriptors) rides the fe harmonic power-spectrum Pallas kernel
# (ops.pallas_annp._run_g_harm): ANNA's Chebyshev descriptors are the
# identical raw sums (pair_anna_adp.cpp:653-680), and ANNA needs VALUES
# only (forces freeze d2/q2), so the angular G reconstructs from the S_l
# power sums by one [ntsf, ntsf] matmul -- O(K L^2) per atom instead of
# the O(K^2 ntsf) cos-matrix chunk (measured 20x on the v5e).
# Same formulas, same frozen-(d2,q2) force definition -- only the data
# layout changes (f64 parity ~1e-12 vs the reference-shaped path).
# ---------------------------------------------------------------------------


def _pair_force_planes(gp, fields, dxx, dxy, dxz, r, stpf, dstpf, rsh):
    """`_center_pair_force` on component planes: force contribution
    g(fields_of_center, x_ct) for x_ct = (dxx, dxy, dxz). `fields` is a
    dict of broadcast-compatible planes (center: [C, 1]; neighbor: [C, K]);
    `rsh` carries the r-only terms shared between the self- and
    neighbor-centered calls (drho, rep via _force_r_shared)."""
    c1F, c2F = gp[4], gp[5]
    d1, q1, d3, q3 = gp[13], gp[14], gp[15], gp[16]

    rho_c = fields["rho"]
    rho_s = jnp.where(rho_c > 1e-30, rho_c, 1.0)
    dembed = (0.5 * c1F / jnp.sqrt(rho_s) + 2.0 * c2F * rho_c) * rsh["drho"]

    d2_c, q2_c = fields["d2"], fields["q2"]
    ut = d1 * jnp.exp(-d2_c * r)
    wt = q1 * jnp.exp(-q2_c * r)
    au = stpf * (ut + d3)
    aw = 2.0 * stpf * (wt + q3)
    dau = dstpf * (ut + d3) + stpf * (-d2_c * ut)
    daw = dstpf * (wt + q3) + stpf * (-q2_c * wt)

    lxx, lyy, lzz = fields["lxx"], fields["lyy"], fields["lzz"]
    lxy, lxz, lyz = fields["lxy"], fields["lxz"], fields["lyz"]
    lam_x = lxx * dxx + lxy * dxy + lxz * dxz     # (lam . dx) components
    lam_y = lxy * dxx + lyy * dxy + lyz * dxz
    lam_z = lxz * dxx + lyz * dxy + lzz * dxz
    lamq = dxx * lam_x + dxy * lam_y + dxz * lam_z
    mux, muy, muz = fields["mux"], fields["muy"], fields["muz"]
    mu_x = mux * dxx + muy * dxy + muz * dxz
    f_v = -(lxx + lyy + lzz) / 3.0

    dterm1 = rsh["drep_half"] + dembed + dau * mu_x + daw * lamq
    s = dterm1 / r + f_v * (daw * r + aw)
    return (s * dxx + aw * lam_x + au * mux,
            s * dxy + aw * lam_y + au * muy,
            s * dxz + aw * lam_z + au * muz)


def _force_r_shared(gp, r, stpf, dstpf):
    """Per-pair terms of the analytic force that depend on r ONLY --
    computed once and shared by the i- and j-centered contributions
    (halves the transcendental count of the newton-off force)."""
    A0, yy, gamma = gp[0], gp[1], gp[2]
    C0, V0, b1, b2 = gp[3], gp[6], gp[7], gp[8]
    delta, r0, r1 = gp[9], gp[10], gp[11]
    z = r - r0
    ez = jnp.exp(-gamma * z)
    zyy = A0 * z ** yy
    gazyy = zyy * gamma
    drho = (ez * (1.0 + ez) * (zyy * (dstpf + stpf * yy / z) - gazyy)
            + C0 * dstpf - gazyy * ez * ez)
    repc = V0 / (b2 - b1)
    zr = r / r1
    zb1 = zr ** b1
    zb2 = zr ** b2
    rep1 = repc * (b2 / zb1 - b1 / zb2) + delta
    drep = dstpf * rep1 + stpf * repc * (b2 * b1 / r1 / zr
                                         * (-1.0 / zb1 + 1.0 / zb2))
    return {"drho": drho, "drep_half": 0.5 * drep}


def _fields_from_planes(cfg, gp, dxx, dxy, dxz, lp_c):
    """Per-atom fields + energy from displacement planes [C, K].

    Returns (e_at [C] excluding e_base, field stack [C, 12])."""
    A0, yy, gamma, C0 = gp[0], gp[1], gp[2], gp[3]
    c1F, c2F, V0, b1, b2 = gp[4], gp[5], gp[6], gp[7], gp[8]
    delta, r0, r1, hc = gp[9], gp[10], gp[11], gp[12]
    d1, q1, d3, q3 = gp[13], gp[14], gp[15], gp[16]
    rc = cfg.cut
    rsq = dxx * dxx + dxy * dxy + dxz * dxz
    m = (rsq < rc * rc) & (rsq > 1.0e-12)       # plane fillers sit far out
    r = jnp.sqrt(jnp.where(m, rsq, 1.0))
    stx = (r - rc) / hc
    st4 = stx ** 4
    step = jnp.where(m, st4 / (1.0 + st4), 0.0)

    d2, q2 = lp_c[:, 0:1], lp_c[:, 1:2]                  # [C, 1]
    u = step * (d1 * jnp.exp(-d2 * r) + d3)
    w = step * (q1 * jnp.exp(-q2 * r) + q3)
    f = {"d2": d2[:, 0], "q2": q2[:, 0]}
    f["mux"] = jnp.sum(u * dxx, axis=1)
    f["muy"] = jnp.sum(u * dxy, axis=1)
    f["muz"] = jnp.sum(u * dxz, axis=1)
    f["lxx"] = jnp.sum(w * dxx * dxx, axis=1)
    f["lyy"] = jnp.sum(w * dxy * dxy, axis=1)
    f["lzz"] = jnp.sum(w * dxz * dxz, axis=1)
    f["lxy"] = jnp.sum(w * dxx * dxy, axis=1)
    f["lxz"] = jnp.sum(w * dxx * dxz, axis=1)
    f["lyz"] = jnp.sum(w * dxy * dxz, axis=1)

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
    return e_at, jnp.stack([f[k] for k in _FIELD_ORDER], axis=1)


_FIELD_ORDER = ("rho", "mux", "muy", "muz", "lxx", "lyy", "lzz",
                "lxy", "lxz", "lyz", "d2", "q2")


def _force_from_planes(cfg, gp, dxx, dxy, dxz, idx, ftab, own, want_virial):
    """Newton-off pair forces for one row chunk from displacement planes:
    both i- and j-centered contributions gathered (k_anna_adp's
    formulation, lal_anna_adp.cu:642-804), r-only terms computed once.
    ftab [N+1, 16] packs _FIELD_ORDER; own [C, 12] this chunk's center
    fields. Returns (fx, fy, fz [C], virial [3, 3])."""
    rc = cfg.cut
    hc = gp[12]
    n = ftab.shape[0] - 1
    rsq = dxx * dxx + dxy * dxy + dxz * dxz
    m = (idx < n) & (rsq < rc * rc) & (rsq > 1.0e-12)
    mf = m.astype(dxx.dtype)
    r = jnp.sqrt(jnp.where(m, rsq, 1.0))
    stx = (r - rc) / hc
    t1 = 1.0 + stx ** 4
    stpf = stx ** 4 / t1
    dstpf = 4.0 * stx ** 3 / (t1 * t1) / hc
    rsh = _force_r_shared(gp, r, stpf, dstpf)

    fj16 = ftab[jnp.minimum(idx, n)]                     # [C, K, 16]
    nbr = {k: fj16[:, :, c] for c, k in enumerate(_FIELD_ORDER)}
    ctr = {k: own[:, c][:, None] for c, k in enumerate(_FIELD_ORDER)}
    g_self = _pair_force_planes(gp, ctr, dxx, dxy, dxz, r, stpf, dstpf,
                                rsh)
    g_nbr = _pair_force_planes(gp, nbr, -dxx, -dxy, -dxz, r, stpf, dstpf,
                               rsh)
    fp = [(gn - gs) * mf for gn, gs in zip(g_nbr, g_self)]
    f = [jnp.sum(c, axis=1) for c in fp]
    if not want_virial:
        return f[0], f[1], f[2], jnp.zeros((3, 3), dxx.dtype)
    dx = (dxx, dxy, dxz)
    wv = jnp.asarray([[0.5 * jnp.sum(dx[a] * fp[b]) for b in range(3)]
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

    Per eval: (1) one x8-packed displacement gather -> [N, K] planes;
    raw Chebyshev G via the fe harmonic Pallas kernel + S_l -> G matmul,
    tiny MLP values-only -> (d2, q2); (2) per-atom fields rho/mu/lambda +
    atom energies from the same planes; (3) newton-off pair forces with
    partner fields fetched through one packed [N, 16] row gather -- the
    in-graph equivalent of the reference's 12 forward_comm ghost fields.
    Returns (force_fn, force_fn_light, short_build) for
    Simulator(..., short_build=..., force_fn_light=...) with
    cfg.short_every > 0, cfg.short_skin == delta."""
    from .annp import compact_neighbor_rows
    from ..ops.pallas_annp import (_cheb_legendre, _run_g_harm,
                                   pair_dx_planes)
    gp = params["gp"]
    rc = cfg.cut
    npsf, ntsf = cfg.npsf, cfg.ntsf
    w1, w2, w3 = (params["w"][l][0] for l in range(3))
    b1_, b2_, b3_ = (params["b"][l][0] for l in range(3))
    dt = params["gp"].dtype
    cmat = jnp.asarray(_cheb_legendre(ntsf), dt)
    cfgk = (("npsf", npsf), ("ntsf", ntsf), ("rc", rc))

    def short_build(x, box, nbrs):
        idx_s, ovf = compact_neighbor_rows(x, box, nbrs.idx, rc + delta,
                                           k_short, pbc=cfg.pbc)
        return AnnaShort(idx=idx_s, ref_x=x, overflow=ovf)

    def _mlp2(g):
        # values only (forces freeze d2/q2): mlp_apply carries the ANNA
        # activation style (1.7 tanh(0.3 x), pair_anna_adp.cpp:695-717)
        return mlp_apply((w1, w2, w3), (b1_, b2_, b3_), cfg.flagact,
                         cfg.act_style, g)                # [C, 2]

    def _eval(x, box, idx, want_virial):
        n = x.shape[0]
        k = idx.shape[1]
        hi = jax.lax.Precision.HIGHEST
        planes = pair_dx_planes(x, box, idx, cfg.pbc)      # [n8, K] x3

        # phase 1: harmonic-ladder descriptors -> (d2, q2)
        g_raw, _ = _run_g_harm(planes[0], planes[1], planes[2], cfgk)
        s_l = g_raw[:n, npsf:npsf + ntsf]
        f2 = g_raw[:n, npsf + ntsf:npsf + ntsf + 1]
        g = jnp.concatenate(
            [g_raw[:n, :npsf],
             0.5 * (jnp.dot(s_l, cmat.T, precision=hi) - f2)], axis=1)
        lp = _mlp2(g)

        n_pad = -(-n // chunk) * chunk
        dxp = [_pad2(p[:n], n_pad, 2.0e4).reshape(-1, chunk, k)
               for p in planes]
        idx_p = _pad2(idx, n_pad, n).reshape(-1, chunk, k)
        lp_p = _pad2(lp, n_pad, 0.0).reshape(-1, chunk, 2)

        # phase 2: fields + atom energies from the same planes
        def p2(args):
            xx, xy, xz, lpc = args
            return _fields_from_planes(cfg, gp, xx, xy, xz, lpc)

        e_at, fcols = jax.lax.map(p2, (dxp[0], dxp[1], dxp[2], lp_p))
        e_at = e_at.reshape(n_pad)[:n]
        fcols = fcols.reshape(n_pad, len(_FIELD_ORDER))
        ftab = jnp.pad(fcols[:n], ((0, 1), (0, 16 - len(_FIELD_ORDER))))

        # phase 3: newton-off pair forces from gathered fields
        def p3(args):
            xx, xy, xz, ic, oc = args
            return _force_from_planes(cfg, gp, xx, xy, xz, ic, ftab, oc,
                                      want_virial)

        fx, fy, fz, wv = jax.lax.map(
            p3, (dxp[0], dxp[1], dxp[2], idx_p,
                 fcols.reshape(-1, chunk, len(_FIELD_ORDER))))
        f = jnp.stack([fx.reshape(n_pad)[:n], fy.reshape(n_pad)[:n],
                       fz.reshape(n_pad)[:n]], axis=1)
        w = None
        if want_virial:
            w = jnp.sum(wv, axis=0)
            w = 0.5 * (w + w.T)
        # shift-free sum (e_base = -4473 eV/atom; e_at excludes it here)
        return jnp.sum(e_at), f, w

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


def _frame_planes(xc, x_src, box, idx, pbc):
    """Displacement planes [P8, K] x3 for center rows xc whose neighbors
    index x_src (the halo frame); rows padded to a multiple of 8 for the
    harmonic Pallas kernel, fillers parked far out."""
    cc, k = idx.shape
    n_src = x_src.shape[0]
    p = -(-cc // 8) * 8
    idx_p = _pad2(idx, p, n_src)
    xc_p = _pad2(xc, p, 0.0)
    x8 = jnp.pad(x_src, ((0, 1), (0, 5)))
    xj = x8[jnp.minimum(idx_p, n_src)]
    valid = idx_p < n_src
    out = []
    for d in range(3):
        dd = xc_p[:, d][:, None] - xj[:, :, d]
        if pbc[d]:
            dd = dd - box[d] * jnp.round(dd / box[d])
        out.append(jnp.where(valid, dd, 2.0 * box[d] + 10.0))
    return out


def energy_forces_frame_fast(cfg: AnnaConfig, params, xc, x_src, box, idx,
                             off, vslice, want_virial=False, chunk=2048):
    """Plane-layout (TPU fast path) sharded-frame evaluation -- the
    make_anna_fast_fns pipeline applied to a halo frame, replacing the
    [C, K, 3] chunked energy_forces_frame on the sharded drivers:
    harmonic-Pallas phase-1 descriptors, [*, 16]-packed field gathers, and
    shared r-only force terms. Same contract as energy_forces_frame
    (eat [Cc], forces [Cc, 3], virial summed over vslice rows or None);
    partner fields come from the recomputed center-row table, so rows with
    any non-center partner (frame-edge rows, discarded by the driver) are
    masked rather than exchanged -- the 12 MPI ghost fields of the
    reference stay zero-communication (src/pair_anna_adp_gpu.cpp:135-158).
    """
    from ..ops.pallas_annp import _cheb_legendre, _run_g_harm
    cc = xc.shape[0]
    k = idx.shape[1]
    gp = params["gp"]
    npsf, ntsf = cfg.npsf, cfg.ntsf
    hi_p = jax.lax.Precision.HIGHEST
    lo, hi = vslice
    cfgk = (("npsf", npsf), ("ntsf", ntsf), ("rc", cfg.cut))

    planes = _frame_planes(xc, x_src, box, idx, cfg.pbc)

    # phase 1: harmonic-ladder Chebyshev G -> (d2, q2)
    g_raw, _ = _run_g_harm(planes[0], planes[1], planes[2], cfgk)
    s_l = g_raw[:cc, npsf:npsf + ntsf]
    f2 = g_raw[:cc, npsf + ntsf:npsf + ntsf + 1]
    cmat = jnp.asarray(_cheb_legendre(ntsf), xc.dtype)
    g = jnp.concatenate(
        [g_raw[:cc, :npsf],
         0.5 * (jnp.dot(s_l, cmat.T, precision=hi_p) - f2)], axis=1)
    w1, w2, w3 = (params["w"][l][0] for l in range(3))
    b1_, b2_, b3_ = (params["b"][l][0] for l in range(3))
    lp = mlp_apply((w1, w2, w3), (b1_, b2_, b3_), cfg.flagact,
                   cfg.act_style, g)                      # [cc, 2]

    n_pad = -(-cc // chunk) * chunk
    dxp = [_pad2(p[:cc], n_pad, 2.0e4).reshape(-1, chunk, k)
           for p in planes]
    lp_p = _pad2(lp, n_pad, 0.0).reshape(-1, chunk, 2)

    # phase 2: fields + atom energies for every center row
    e_at, fcols = jax.lax.map(
        lambda a: _fields_from_planes(cfg, gp, a[0], a[1], a[2], a[3]),
        (dxp[0], dxp[1], dxp[2], lp_p))
    # _fields_from_planes excludes the per-atom base; the frame contract
    # (energy_forces_frame) returns eat INCLUDING it (drivers subtract)
    e_at = e_at.reshape(n_pad)[:cc] + cfg.e_base
    fcols = fcols.reshape(n_pad, len(_FIELD_ORDER))[:cc]
    ftab = jnp.pad(fcols, ((0, 1), (0, 16 - len(_FIELD_ORDER))))

    # phase 3: newton-off pair force; partner rows = frame index - off,
    # sentinel cc for out-of-center partners (their rows are discarded)
    t = idx - off
    ic = jnp.where((idx < x_src.shape[0]) & (t >= 0) & (t < cc),
                   jnp.clip(t, 0, cc - 1), cc)
    ic_p = _pad2(ic, n_pad, cc).reshape(-1, chunk, k)
    vm = ((jnp.arange(n_pad) >= lo)
          & (jnp.arange(n_pad) < hi)).astype(xc.dtype)
    vm_p = vm.reshape(-1, chunk)

    def p3(args):
        xx, xy, xz, icb, oc, vb = args
        rc_ = cfg.cut
        rsq = xx * xx + xy * xy + xz * xz
        m = (icb < cc) & (rsq < rc_ * rc_) & (rsq > 1.0e-12)
        mf = m.astype(xx.dtype)
        r = jnp.sqrt(jnp.where(m, rsq, 1.0))
        stx = (r - rc_) / gp[12]
        t1 = 1.0 + stx ** 4
        stpf = stx ** 4 / t1
        dstpf = 4.0 * stx ** 3 / (t1 * t1) / gp[12]
        rsh = _force_r_shared(gp, r, stpf, dstpf)
        fj16 = ftab[jnp.minimum(icb, cc)]
        nbr = {kk: fj16[:, :, c] for c, kk in enumerate(_FIELD_ORDER)}
        ctr = {kk: oc[:, c][:, None] for c, kk in enumerate(_FIELD_ORDER)}
        g_self = _pair_force_planes(gp, ctr, xx, xy, xz, r, stpf,
                                    dstpf, rsh)
        g_nbr = _pair_force_planes(gp, nbr, -xx, -xy, -xz, r, stpf,
                                   dstpf, rsh)
        fp = [(gn - gs) * mf for gn, gs in zip(g_nbr, g_self)]
        f = [jnp.sum(c, axis=1) for c in fp]
        if want_virial:
            dxs = (xx, xy, xz)
            vbm = vb[:, None]
            wv = jnp.asarray([[0.5 * jnp.sum(dxs[a] * fp[b] * vbm)
                               for b in range(3)] for a in range(3)])
        else:
            wv = jnp.zeros((3, 3), xx.dtype)
        return f[0], f[1], f[2], wv

    fx, fy, fz, wv = jax.lax.map(
        p3, (dxp[0], dxp[1], dxp[2], ic_p,
             _pad2(fcols, n_pad, 0.0).reshape(-1, chunk,
                                              len(_FIELD_ORDER)),
             vm_p))
    f = jnp.stack([fx.reshape(n_pad)[:cc], fy.reshape(n_pad)[:cc],
                   fz.reshape(n_pad)[:cc]], axis=1)
    if not want_virial:
        return e_at, f
    w = jnp.sum(wv, axis=0)
    return e_at, f, 0.5 * (w + w.T)



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
