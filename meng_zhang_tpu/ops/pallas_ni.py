"""Fused Pallas TPU kernels for the Behler-Parrinello ANNP potential (ni).

TPU-native replacement for the reference's ni CUDA mega-kernel
(k_annp, ni/lib/lal_annp.cu:349-707: G2/G4 descriptors + dG + MLP + force
projection), redesigned for the hardware rather than translated.

Layout redesign vs the fe kernels (ops/pallas_annp.py): ni's descriptors
vanish beyond the coefficient-table cutoff 7.3699 Bohr = 3.90 A
(ni/src/pair_annp.cpp:686-766), giving only ~20 neighbors -- the fe layout
(one atom per row, K neighbor lanes) would waste 4x of every 128-lane
vector register at Ks=32. These kernels instead run TRANSPOSED blocks
[Ks=32 sublanes, 128 atom lanes]:

  * every [Ks, 128] tile is a fully dense stack of 4 vregs;
  * the angular (j,k) double loop becomes a Ks-iteration unrolled loop of
    tile FMAs -- iteration q broadcasts row q (one neighbor of every atom
    in the block) against the whole tile, covering all (p, q) pairs;
  * the force kernel accumulates the u_p- and u_q-projected coefficients
    in four [Ks, 128] VMEM accumulators, so it needs NO in-loop reductions
    at all; the forward needs one sublane reduction per descriptor at the
    end of the block.

The j-k leg of G4 is reconstructed from the law of cosines
(rjk^2 = rj^2 + rk^2 - 2 rj rk cos), so no neighbor-neighbor gather is
needed. All angular zeta exponents in the shipped potential are powers of
two (1, 2, 4, 16; ni_annp_potential_2.ann trailer), so flag^zeta is
computed by repeated squaring; the eta values repeat across (lambda, zeta)
so each exp(-eta r2sum) is shared by 8 symmetry functions.

Forces are the exact hand VJP of the descriptors (the fe recipe): the MLP
forward + dE/dG runs in XLA between the two kernels, and per-pair forces
are delivered by the shared sort-involution assembly (PairTableOps).

Units: descriptor math runs in Bohr (r_Bohr = r_A * CFLENGTH); dE/dG
carries e_scale = CFFORCE/CFLENGTH (models/annp.py NI_HARTREE_EV), so
d(energy[eV])/d(G) * dG/d(r_Bohr) * CFLENGTH = force in eV/A, matching the
reference's CFFORCE force conversion (ni/lib/lal_annp.cu:567-568) exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import CFLENGTH
from .pallas_annp import (PairTableOps, ShortList, _act_and_grad, _interpret,
                          _padr)

AT = 128          # atoms per kernel block (lane dimension)
NSF_SUB = 32      # sublane pad of the descriptor/dedg planes (nsf = 27)


def _ni_cfg_key(coerad, coeang):
    """Hashable static kernel config from the parsed coefficient tables.

    radial: ((eta, rc), ...);  angular: (rc_a, groups) with groups =
    ((eta, ((lam, zeta, col), ...)), ...) -- col is the descriptor column
    npsf + n. Grouping by eta shares exp(-eta * r2sum) across the 2 lambda
    x 4 zeta functions of each eta (the shipped table's structure)."""
    coerad = np.asarray(coerad, np.float64)
    coeang = np.asarray(coeang, np.float64)
    rad = tuple((float(e), float(rc)) for e, _, rc in coerad)
    rc_a = float(coeang[0, 3])
    assert np.all(coeang[:, 3] == coeang[0, 3]), \
        "per-function angular cutoffs not supported in the fused ni kernel"
    groups = {}
    npsf = len(rad)
    for n, (eta, lam, zeta, _rc) in enumerate(coeang):
        groups.setdefault(float(eta), []).append(
            (float(lam), float(zeta), npsf + n))
    ang = tuple((eta, tuple(fns)) for eta, fns in groups.items())
    return ("rad", rad), ("rc_a", rc_a), ("ang", ang)


def _pow_zeta(f1, zeta):
    """flag^zeta and zeta*flag^(zeta-1) by repeated squaring (zeta a power
    of two in the shipped table; falls back to jnp power otherwise)."""
    zi = int(zeta)
    if zeta == zi and zi > 0 and (zi & (zi - 1)) == 0:
        powers = {1: f1}
        p = f1
        k = 1
        while k < zi:
            p = p * p
            k *= 2
            powers[k] = p
        fz = powers[zi]
        # f^(zeta-1): zeta-1 = zi-1 has bits 1..zi/2 set
        fzm = None
        k = 1
        while k < zi:
            fzm = powers[k] if fzm is None else fzm * powers[k]
            k *= 2
        if fzm is None:                    # zeta == 1
            fzm = jnp.ones_like(f1)
        return fz, zeta * fzm
    fz = f1 ** zeta
    return fz, zeta * f1 ** (zeta - 1.0)


def _ni_geometry(dxx, dxy, dxz, rc_a):
    """Shared per-pair scalars on [Ks, A] tiles (Bohr where angular)."""
    rsq = dxx * dxx + dxy * dxy + dxz * dxz
    valid = rsq > 1.0e-12                    # fillers carry huge dx
    r = jnp.sqrt(jnp.where(valid, rsq, 1.0))
    inv_r = 1.0 / r
    m = valid.astype(dxx.dtype)
    ux = dxx * inv_r * m
    uy = dxy * inv_r * m
    uz = dxz * inv_r * m
    rm_true = r * CFLENGTH
    in_a = valid & (rm_true < rc_a)
    # clamp the Bohr radius for masked lanes so downstream exp/sqrt stay
    # finite (fillers sit at 2*box+10 A)
    a = jnp.where(in_a, rm_true, rc_a + 1.0)
    fc_a = jnp.where(in_a, 0.5 * (jnp.cos(jnp.pi / rc_a * a) + 1.0), 0.0)
    dfc_a = jnp.where(in_a, -0.5 * jnp.pi / rc_a
                      * jnp.sin(jnp.pi / rc_a * a), 0.0)
    return r, inv_r, m, ux, uy, uz, rm_true, in_a, a, fc_a, dfc_a


def _ni_g_kernel(dxx_ref, dxy_ref, dxz_ref, g_ref, *, cfgn):
    """Forward: raw G2 + G4 for one block -> g_ref [NSF_SUB, AT]."""
    cfg = dict(cfgn)
    rad, rc_a, ang = cfg["rad"], cfg["rc_a"], cfg["ang"]
    ks = dxx_ref.shape[0]
    dxx, dxy, dxz = dxx_ref[:], dxy_ref[:], dxz_ref[:]
    (r, inv_r, m, ux, uy, uz, rm_true, in_a, a, fc_a,
     dfc_a) = _ni_geometry(dxx, dxy, dxz, rc_a)

    g_ref[:] = jnp.zeros_like(g_ref)
    # radial G2: per-function cutoff (all equal in the shipped file)
    for mi, (eta, rc_r) in enumerate(rad):
        in_r = (rm_true < rc_r) & (r > 1.0e-6)
        rr = jnp.where(in_r, rm_true, rc_r)
        fc_r = jnp.where(in_r, 0.5 * (jnp.cos(jnp.pi / rc_r * rr) + 1.0),
                         0.0)
        g_ref[mi:mi + 1, :] = jnp.sum(jnp.exp(-eta * rr * rr) * fc_r,
                                      axis=0, keepdims=True)

    # angular G4 accumulators, one [Ks, AT] tile per function
    acc = {col: jnp.zeros_like(dxx) for _, fns in ang for _, _, col in fns}
    rows = jax.lax.broadcasted_iota(jnp.int32, dxx.shape, 0)
    for q in range(ks):
        uqx, uqy, uqz = ux[q:q + 1, :], uy[q:q + 1, :], uz[q:q + 1, :]
        aq = a[q:q + 1, :]
        fcq = fc_a[q:q + 1, :]
        mq = in_a[q:q + 1, :]
        cos = ux * uqx + uy * uqy + uz * uqz
        rjk2 = a * a + aq * aq - 2.0 * a * aq * cos
        legs = in_a & mq & (rjk2 < rc_a * rc_a) & (rows != q)
        rjk = jnp.sqrt(jnp.where(legs, jnp.maximum(rjk2, 1.0e-12), 1.0))
        fc_jk = 0.5 * (jnp.cos(jnp.pi / rc_a * rjk) + 1.0)
        fc3 = jnp.where(legs, fc_a * fcq * fc_jk, 0.0)
        r2sum = a * a + aq * aq + jnp.where(legs, rjk2, 0.0)
        for eta, fns in ang:
            t_eta = jnp.exp(-eta * r2sum) * fc3
            for lam, zeta, col in fns:
                f1 = 1.0 + lam * cos
                fz, _ = _pow_zeta(f1, zeta)
                acc[col] = acc[col] + (2.0 ** (1.0 - zeta)) * fz * t_eta
    for col, v in acc.items():
        g_ref[col:col + 1, :] = 0.5 * jnp.sum(v, axis=0, keepdims=True)


def _ni_force_kernel(dxx_ref, dxy_ref, dxz_ref, dedg_ref,
                     fjx_ref, fjy_ref, fjz_ref, *, cfgn):
    """Hand VJP: per-pair Fj = -sum_n dE/dG_n dG_n/dx_j on [Ks, AT] tiles.

    Accumulates the u_p coefficient (acc1) and the u_q-projected vector
    (acc2*) across the q loop -- no reductions anywhere. dedg_ref holds
    dE/dG transposed [NSF_SUB, AT], pre-multiplied by sf_scale * e_scale.
    """
    cfg = dict(cfgn)
    rad, rc_a, ang = cfg["rad"], cfg["rc_a"], cfg["ang"]
    ks = dxx_ref.shape[0]
    dxx, dxy, dxz = dxx_ref[:], dxy_ref[:], dxz_ref[:]
    (r, inv_r, m, ux, uy, uz, rm_true, in_a, a, fc_a,
     dfc_a) = _ni_geometry(dxx, dxy, dxz, rc_a)

    # ---- radial: d(sum_m w_m G2_m)/d rm, projected on -u later ----
    coeff = jnp.zeros_like(dxx)
    for mi, (eta, rc_r) in enumerate(rad):
        in_r = (rm_true < rc_r) & (r > 1.0e-6)
        rr = jnp.where(in_r, rm_true, rc_r)
        fc_r = 0.5 * (jnp.cos(jnp.pi / rc_r * rr) + 1.0)
        dfc_r = -0.5 * jnp.pi / rc_r * jnp.sin(jnp.pi / rc_r * rr)
        e_r = jnp.exp(-eta * rr * rr)
        dg = jnp.where(in_r, e_r * (dfc_r - 2.0 * eta * rr * fc_r), 0.0)
        coeff = coeff + dedg_ref[mi:mi + 1, :] * dg
    # dG2/dx_j = dg * CFL * (-u_j);  Fj = -w dG => + CFL w dg u
    coeff = coeff * CFLENGTH

    # ---- angular: accumulate C1 (u_p) and C2 u_q across the q loop ----
    acc1 = jnp.zeros_like(dxx)
    acc2x = jnp.zeros_like(dxx)
    acc2y = jnp.zeros_like(dxx)
    acc2z = jnp.zeros_like(dxx)
    rows = jax.lax.broadcasted_iota(jnp.int32, dxx.shape, 0)
    for q in range(ks):
        uqx, uqy, uqz = ux[q:q + 1, :], uy[q:q + 1, :], uz[q:q + 1, :]
        aq = a[q:q + 1, :]
        fcq = fc_a[q:q + 1, :]
        mq = in_a[q:q + 1, :]
        cos = ux * uqx + uy * uqy + uz * uqz
        rjk2 = a * a + aq * aq - 2.0 * a * aq * cos
        legs = in_a & mq & (rjk2 < rc_a * rc_a) & (rows != q)
        rjk = jnp.sqrt(jnp.where(legs, jnp.maximum(rjk2, 1.0e-12), 1.0))
        ang_jk = jnp.pi / rc_a * rjk
        fc_jk = 0.5 * (jnp.cos(ang_jk) + 1.0)
        dfc_jk = -0.5 * jnp.pi / rc_a * jnp.sin(ang_jk)
        lm = legs.astype(dxx.dtype)
        fc3 = fc_a * fcq * fc_jk * lm
        r2sum = a * a + aq * aq + jnp.where(legs, rjk2, 0.0)

        p_a = jnp.zeros_like(dxx)     # sum_eta e_eta * S_A(eta)
        p_e = jnp.zeros_like(dxx)     # sum_eta eta * e_eta * S_A(eta)
        p_cs = jnp.zeros_like(dxx)    # sum_eta e_eta * S_C(eta)
        for eta, fns in ang:
            e_eta = jnp.exp(-eta * r2sum)
            s_a = jnp.zeros_like(dxx)
            s_c = jnp.zeros_like(dxx)
            for lam, zeta, col in fns:
                wv = dedg_ref[col:col + 1, :] * (2.0 ** (1.0 - zeta))
                f1 = 1.0 + lam * cos
                fz, dfz = _pow_zeta(f1, zeta)
                s_a = s_a + wv * fz
                s_c = s_c + (wv * lam) * dfz
            t_a = e_eta * s_a
            p_a = p_a + t_a
            p_e = p_e + eta * t_a
            p_cs = p_cs + e_eta * s_c
        # h-partials (independent vars c, a_p, rjk):
        p_c = fc3 * p_cs
        p_ap = -2.0 * a * p_e * fc3 + dfc_a * fcq * fc_jk * lm * p_a
        p_jk = -2.0 * rjk * p_e * fc3 + fc_a * fcq * dfc_jk * lm * p_a
        inv_rjk = jnp.where(legs, 1.0 / rjk, 0.0)
        # d(sum w G)/dx_p = C1 u_p + C2 u_q  (geometry gradients:
        # dc/dx_p = (c u_p - u_q)/r_p, da_p/dx_p = -CFL u_p,
        # drjk/dx_p = CFL (a_q u_q - a_p u_p)/rjk  [x_p - x_q = dx_q - dx_p])
        c1 = (p_c * cos * inv_r - CFLENGTH * p_ap
              - CFLENGTH * p_jk * a * inv_rjk)
        c2 = -p_c * inv_r + CFLENGTH * p_jk * aq * inv_rjk
        acc1 = acc1 + c1
        acc2x = acc2x + c2 * uqx
        acc2y = acc2y + c2 * uqy
        acc2z = acc2z + c2 * uqz

    # Fj = -(d sum w G / dx_j):  radial contributes +coeff u (sign folded
    # above), angular contributes -(acc1 u + acc2)
    fjx_ref[:] = (coeff - acc1) * ux - acc2x
    fjy_ref[:] = (coeff - acc1) * uy - acc2y
    fjz_ref[:] = (coeff - acc1) * uz - acc2z


def _block_spec(ks, at):
    return pl.BlockSpec((ks, at), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cfgn",))
def _run_ni_g(dxx_t, dxy_t, dxz_t, cfgn):
    ks, p = dxx_t.shape
    kernel = functools.partial(_ni_g_kernel, cfgn=cfgn)
    return pl.pallas_call(
        kernel,
        grid=(p // AT,),
        in_specs=[_block_spec(ks, AT)] * 3,
        out_specs=_block_spec(NSF_SUB, AT),
        out_shape=jax.ShapeDtypeStruct((NSF_SUB, p), dxx_t.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=p * ks * ks * 60, bytes_accessed=p * ks * 16,
            transcendentals=p * ks * ks * 6),
    )(dxx_t, dxy_t, dxz_t)


@functools.partial(jax.jit, static_argnames=("cfgn",))
def _run_ni_force(dxx_t, dxy_t, dxz_t, dedg_t, cfgn):
    ks, p = dxx_t.shape
    kernel = functools.partial(_ni_force_kernel, cfgn=cfgn)
    return pl.pallas_call(
        kernel,
        grid=(p // AT,),
        in_specs=[_block_spec(ks, AT)] * 3 + [_block_spec(NSF_SUB, AT)],
        out_specs=[_block_spec(ks, AT)] * 3,
        out_shape=[jax.ShapeDtypeStruct((ks, p), dxx_t.dtype)] * 3,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=p * ks * ks * 120, bytes_accessed=p * ks * 28,
            transcendentals=p * ks * ks * 6),
    )(dxx_t, dxy_t, dxz_t, dedg_t)


class PallasNi(PairTableOps):
    """Fused-kernel evaluator for the single-element BP (ni) model.

    Drives the same Simulator fast path as PallasAnnp: a refresh-static
    ShortList (compact_short against the 3.90 A descriptor cutoff +
    short_delta) and per-step energy_forces_short evaluations.
    """

    def __init__(self, cfg, params, k_short=32, short_delta=0.3):
        assert k_short % 8 == 0
        self.k_short = k_short
        self.short_delta = short_delta
        self.pbc = tuple(getattr(cfg, "pbc", (True, True, True)))
        self.assemble_sort_elems = 1 << 27
        self.cfgn_key = _ni_cfg_key(params["coerad"], params["coeang"])
        cfgd = dict(self.cfgn_key)
        self.rc = max(max(rc for _, rc in cfgd["rad"]),
                      cfgd["rc_a"]) / CFLENGTH      # Angstrom
        self.nsf = cfg.npsf + cfg.ntsf
        assert self.nsf <= NSF_SUB
        self.e_scale = cfg.e_scale          # NI_HARTREE_EV
        self.e_shift = cfg.e_shift          # 0.0 for the shipped file
        self.flagact = tuple(cfg.flagact)
        self.act_style = cfg.act_style
        dt = params["sf_scale"].dtype
        pad = NSF_SUB - self.nsf
        self.scale = jnp.pad(params["sf_scale"], (0, pad)).reshape(1, -1)
        self.shift = jnp.pad(params["sf_shift"], (0, pad)).reshape(1, -1)
        w1, w2, w3 = (params["w"][l][0] for l in range(3))
        b1, b2, b3 = (params["b"][l][0] for l in range(3))
        self.w1 = jnp.pad(w1, ((0, 0), (0, NSF_SUB - w1.shape[1]))).astype(dt)
        self.b1 = b1.reshape(1, -1).astype(dt)
        self.w2 = w2.astype(dt)
        self.b2 = b2.reshape(1, -1).astype(dt)
        self.w3 = w3.astype(dt)
        self.b3 = b3.reshape(1, -1).astype(dt)

    @property
    def short_rc(self):
        return self.rc

    def _mlp_eat_dedg(self, g_pad):
        """Min-max-normalized tiny MLP forward + hand VJP (same structure
        as PallasAnnp._mlp_eat_dedg; ni normalization is
        (G - min) * 1/(max - min), ni/src/pair_annp.cpp:168-170)."""
        nsf = self.nsf
        hi = jax.lax.Precision.HIGHEST
        g = (g_pad[:, :nsf] - self.shift[:, :nsf]) * self.scale[:, :nsf]
        z1 = jnp.dot(g, self.w1[:, :nsf].T, precision=hi) + self.b1
        h1, d1 = _act_and_grad(z1, self.flagact[0], self.act_style)
        z2 = jnp.dot(h1, self.w2.T, precision=hi) + self.b2
        h2, d2 = _act_and_grad(z2, self.flagact[1], self.act_style)
        z3 = jnp.dot(h2, self.w3.T, precision=hi) + self.b3
        out, d3 = _act_and_grad(z3, self.flagact[2], self.act_style)
        eat = self.e_scale * out[:, 0] + self.e_shift
        v = d3 * self.w3
        v = jnp.dot(v * d2, self.w2, precision=hi)
        v = jnp.dot(v * d1, self.w1[:, :nsf], precision=hi)
        dedg = v * self.scale[:, :nsf] * self.e_scale
        return eat, jnp.pad(dedg, ((0, 0), (0, NSF_SUB - nsf)))

    def _eval_fj(self, dxx, dxy, dxz):
        """eat [P], per-pair (fjx, fjy, fjz) [P, Ks] via the transposed
        block kernels."""
        p0, ks = dxx.shape
        p = -(-p0 // AT) * AT
        tr = [jnp.transpose(_padr(d, p, 2.0e4)) for d in (dxx, dxy, dxz)]
        g_t = _run_ni_g(tr[0], tr[1], tr[2], self.cfgn_key)
        eat, dedg = self._mlp_eat_dedg(jnp.transpose(g_t))
        fj_t = _run_ni_force(tr[0], tr[1], tr[2], jnp.transpose(dedg),
                             self.cfgn_key)
        fjs = [jnp.transpose(f)[:p0] for f in fj_t]
        return eat[:p0], fjs

    def energy_forces_short(self, x, box, sl: ShortList, want_virial=False,
                            shift=True, per_atom=False):
        """Per-step evaluation against a refresh-static ShortList (banded
        delivery). Same contract as PallasAnnp.energy_forces_short,
        including the per_atom (eatom, vatom[N, 6]) tallies."""
        n = x.shape[0]
        ks = sl.sidx.shape[1]
        dxx, dxy, dxz = self._pair_dx(x, box, sl.sidx)
        # fj sliced back to the ShortList's row padding (TILE multiple) so
        # the delivery keys line up; rows the kernels padded to the AT
        # block size carry only zero contributions
        eat, (fjx, fjy, fjz) = self._eval_fj(dxx, dxy, dxz)
        w = None
        if want_virial:
            m = (sl.sidx < n).astype(x.dtype)
            w = jnp.asarray(
                [[-jnp.sum(da * fb * m) for fb in (fjx, fjy, fjz)]
                 for da in (dxx, dxy, dxz)])
            w = 0.5 * (w + w.T)
        out = self._assemble(fjx, fjy, fjz, sl.akey, n, ks,
                             want_parts=per_atom)
        forces = out[0] if per_atom else out
        e = jnp.sum(eat[:n] - self.e_shift)
        if shift:
            e = e + n * self.e_shift
        e = jnp.where(sl.overflow, jnp.nan, e)
        forces = jnp.where(sl.overflow, jnp.nan, forces)
        outs = [e, forces]
        if want_virial:
            outs.append(w)
        if per_atom:
            parts = out[1]
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
            outs.append(jnp.where(sl.overflow, jnp.nan, eat[:n]))
            outs.append(jnp.where(sl.overflow, jnp.nan, vat))
        return tuple(outs) if len(outs) > 2 else (outs[0], outs[1])

    def energy_forces(self, x, box, nbr_idx, rev_slots, want_virial=False,
                      shift=True):
        """Full evaluation from a skin neighbor list: compact to the
        descriptor cutoff, then run the short path (used by minimizers and
        init; the MD loop holds the ShortList across steps instead)."""
        sl = self.compact_short(x, box, nbr_idx, rev_slots)
        return self.energy_forces_short(x, box, sl, want_virial=want_virial,
                                        shift=shift)
