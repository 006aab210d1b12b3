"""Double-precision numpy oracle: a faithful transcription of the reference
CPU pair styles' *mathematics* (loops + hand-coded analytic derivatives).

This plays the role the CPU pair styles play in the reference's own
validation model (SURVEY.md section 4): an independent slow implementation the
fast path must match. It deliberately mirrors the hand-derivative algebra
(fe/src/pair_annp.cpp:580-791, ni/src/pair_annp.cpp:640-900) rather than
using autodiff, so agreement with the JAX models is a real cross-check.

Known reference bugs consciously fixed here (SURVEY.md section 7):
  * ni CPU uses rik where rjk belongs in d(r2sum)/dx of the angular G4 term;
    the ni GPU kernel (ni/lib/lal_annp.cu:408-412) uses rjk -- we follow the
    GPU/correct form.
  * ni CPU mutates sf_max -> (max-min) in-place every compute() call; the
    intended normalization (G-min)/(max-min) is applied here.
"""
from __future__ import annotations

import numpy as np

CFLENGTH = 1.889726
CFFORCE = 51.422515


def min_image_np(dx, box):
    return dx - box * np.round(dx / box)


def cheb_t_dt(x, n):
    t = np.zeros(n)
    dt = np.zeros(n)
    t[0], dt[0] = 1.0, 0.0
    if n > 1:
        t[1], dt[1] = x, 1.0
    for m in range(2, n):
        t[m] = 2.0 * x * t[m - 1] - t[m - 2]
        dt[m] = 2.0 * t[m - 1] + 2.0 * x * dt[m - 1] - dt[m - 2]
    return t, dt


def fc_dfc(r, rc):
    a = np.pi / rc * r
    return 0.5 * (np.cos(a) + 1.0), -0.5 * np.pi / rc * np.sin(a)


def act(x, flag, style):
    if flag == 0:
        return x, 1.0
    if flag == 1:
        t = np.tanh(x)
        return t, 1.0 - t * t
    if flag == 2:
        s = 1.0 / (1.0 + np.exp(x))
        return s, s * (1.0 - s)
    if style == "fe":
        a, b, c = 1.7159, 0.666666666666667, 0.1
        t = np.tanh(b * x)
        if flag == 3:
            return a * t, a * (1.0 - t * t) * b
        return a * t + c * x, a * (1.0 - t * t) * b + c
    if style == "anna":
        a, b = 1.7, 0.3
        t = np.tanh(b * x)
        return a * t, a * (1.0 - t * t) * b
    t = np.tanh(x)
    return t, 1.0 - t * t


def feed_forward(net, g, style):
    """Returns (raw_out [nout], dOut_dG [nout, nsf]) via the layer-Jacobian
    product the reference carries (annp_feed_forward)."""
    h = np.asarray(g, dtype=np.float64)
    jac = np.eye(len(g))
    for w, b, flag in zip(net.weights, net.biases, net.flagact):
        z = w @ h + b
        h = np.empty_like(z)
        d = np.empty_like(z)
        for i, zi in enumerate(z):
            h[i], d[i] = act(zi, flag, style)
        jac = (d[:, None] * w) @ jac
    return h, jac


def _neighbors(x, box, rc):
    n = len(x)
    nbrs = [[] for _ in range(n)]
    for i in range(n):
        dx = min_image_np(x[i] - x, box)
        rsq = np.sum(dx * dx, axis=1)
        for j in range(n):
            if i != j and 1e-12 < rsq[j] < rc * rc:
                nbrs[i].append((j, dx[j]))
    return nbrs


def annp_fe_energy_forces(pot, x, box):
    """fe/fe_v2 Chebyshev ANNP: (E_total, F [N,3], per-atom E [N])."""
    n = len(x)
    npsf, ntsf, nsf, rc = pot.npsf, pot.ntsf, pot.nsf, pot.cut
    scale = pot.sf_scale
    avg = pot.sf_shift
    net = pot.networks[0]
    forces = np.zeros((n, 3))
    e_at = np.zeros(n)
    nbrs = _neighbors(x, box, rc)
    for i in range(n):
        lst = nbrs[i]
        g = np.zeros(nsf)
        dg = {j: np.zeros((nsf, 3)) for j, _ in lst}
        for a, (j, xij) in enumerate(lst):
            rij = np.linalg.norm(xij)
            fcij, dfcij = fc_dfc(rij, rc)
            dr_dj = -xij / rij
            t, dt = cheb_t_dt(2.0 * rij / rc - 1.0, npsf)
            for m in range(npsf):
                g[m] += scale[m] * t[m] * fcij
                dg[j][m] += scale[m] * (dt[m] * 2.0 / rc * fcij + t[m] * dfcij) * dr_dj
            for (k, xik) in [p for p in lst[a + 1:]]:
                rik = np.linalg.norm(xik)
                fcik, dfcik = fc_dfc(rik, rc)
                dr_dk = -xik / rik
                ct = float(xij @ xik / (rij * rik))
                dct_dj = -xik / (rij * rik) + ct * xij / rij ** 2
                dct_dk = -xij / (rij * rik) + ct * xik / rik ** 2
                ta, dta = cheb_t_dt(0.5 * (ct + 1.0), ntsf)
                for m in range(ntsf):
                    s = scale[npsf + m]
                    g[npsf + m] += s * ta[m] * fcij * fcik
                    t1 = dta[m] * 0.5 * fcij * fcik
                    dg[j][npsf + m] += s * (t1 * dct_dj + ta[m] * dfcij * fcik * dr_dj)
                    dg[k][npsf + m] += s * (t1 * dct_dk + ta[m] * fcij * dfcik * dr_dk)
        g -= scale * avg
        out, jac = feed_forward(net, g, "fe")
        e_at[i] = pot.e_scale * out[0] + pot.e_shift + pot.e_atom
        de_dg = jac[0]
        fi = np.zeros(3)
        for j, _ in lst:
            fj = -pot.e_scale * de_dg @ dg[j]
            forces[j] += fj
            fi += fj
        forces[i] -= fi
    return e_at.sum(), forces, e_at


def annp_ni_energy_forces(pot, x, box):
    """ni Behler-Parrinello ANNP.

    Returns (E_total_raw_hartree, F_eV_per_A [N,3], per-atom raw E [N]).
    """
    n = len(x)
    npsf, ntsf, nsf = pot.npsf, pot.ntsf, pot.nsf
    span = pot.norm_row1 - pot.norm_row0
    sfmin = pot.norm_row0
    net = pot.networks[0]
    coerad, coeang = pot.sym_coerad, pot.sym_coeang
    rc_r = coerad[0, 2]
    rc_a = coeang[0, 3]
    forces = np.zeros((n, 3))
    e_at = np.zeros(n)
    nbrs = _neighbors(x, box, pot.cut)
    for i in range(n):
        lst = nbrs[i]
        g = np.zeros(nsf)
        dg = {j: np.zeros((nsf, 3)) for j, _ in lst}
        for a, (j, xij) in enumerate(lst):
            rij = np.linalg.norm(xij)
            rij_m = rij * CFLENGTH
            dr_dj = -xij / rij
            if rij_m < rc_r:
                for m in range(npsf):
                    eta = coerad[m, 0]
                    fcij, dfcij = fc_dfc(rij_m, rc_r)
                    t1 = np.exp(-eta * rij_m ** 2)
                    g[m] += t1 * fcij
                    dg[j][m] += t1 * (-fcij * 2.0 * eta * rij_m + dfcij) * dr_dj
            for (k, xik) in [p for p in lst[a + 1:]]:
                rik = np.linalg.norm(xik)
                xjk = xik - xij            # x_j - x_k
                rjk = np.linalg.norm(xjk)
                rik_m, rjk_m = rik * CFLENGTH, rjk * CFLENGTH
                if not (rij_m < rc_a and rik_m < rc_a and rjk_m < rc_a):
                    continue
                ct = float(xij @ xik / (rij * rik))
                dct_dj = -xik / (rij * rik) + ct * xij / rij ** 2
                dct_dk = -xij / (rij * rik) + ct * xik / rik ** 2
                dr_dk = -xik / rik
                dr_djk = xjk / rjk         # d rjk / dx_j
                fcij, dfcij = fc_dfc(rij_m, rc_a)
                fcik, dfcik = fc_dfc(rik_m, rc_a)
                fcjk, dfcjk = fc_dfc(rjk_m, rc_a)
                term_fc = fcij * fcik * fcjk
                r2sum = rij_m ** 2 + rik_m ** 2 + rjk_m ** 2
                # d(r2sum)/dx and d(fc^3)/dx -- rjk leg per the GPU kernel
                # (ni/lib/lal_annp.cu:408-433)
                t2_drj = 2.0 * (rij_m * dr_dj + rjk_m * dr_djk)
                t2_drk = 2.0 * (rik_m * dr_dk - rjk_m * dr_djk)
                t3_drj = fcik * (dfcij * dr_dj * fcjk + fcij * dfcjk * dr_djk)
                t3_drk = fcij * (dfcik * dr_dk * fcjk - fcik * dfcjk * dr_djk)
                for m in range(ntsf):
                    eta, lam, zeta = coeang[m, 0], coeang[m, 1], coeang[m, 2]
                    flag = 1.0 + lam * ct
                    if flag <= 0.0:
                        continue
                    term_cot = 2.0 ** (1.0 - zeta) * flag ** zeta
                    term_exp = np.exp(-eta * r2sum)
                    g[npsf + m] += term_cot * term_exp * term_fc
                    t1 = lam * term_cot * term_exp * term_fc * zeta / flag / CFLENGTH
                    t3 = term_cot * term_exp
                    t2 = t3 * term_fc * eta
                    dg[j][npsf + m] += t1 * dct_dj - t2 * t2_drj + t3 * t3_drj
                    dg[k][npsf + m] += t1 * dct_dk - t2 * t2_drk + t3 * t3_drk
        g = (g - sfmin) / span
        out, jac = feed_forward(net, g, "ni")
        e_at[i] = out[0]
        de_dg = jac[0]
        fi = np.zeros(3)
        for j, _ in lst:
            fj = -(de_dg / span) @ dg[j] * CFFORCE
            forces[j] += fj
            fi += fj
        forces[i] -= fi
    return e_at.sum(), forces, e_at


def _mlp_forward_only(net, g, style):
    h = np.asarray(g, dtype=np.float64)
    for w, b, flag in zip(net.weights, net.biases, net.flagact):
        z = w @ h + b
        h = np.array([act(zi, flag, style)[0] for zi in z])
    return h


def anna_adp_energy_forces(pot, x, box):
    """ANNA-ADP oracle: energy + the reference's exact newton-on pair-force
    loop using i-centered fields (pair_anna_adp.cpp:74-290), including its
    hand-derivative d_rho quirk. Returns (E_total, F, per-atom E, lparams)."""
    n = len(x)
    gp = pot.gparams
    (A0, yy, gamma, C0, c1F, c2F, V0, b1, b2, delta,
     r0, r1, hc, d1, q1, d3, q3) = gp
    rc = pot.cut
    net = pot.networks[0]
    nbrs = _neighbors(x, box, rc)
    forces = np.zeros((n, 3))
    e_at = np.zeros(n)
    lparams = np.zeros((n, 2))
    for i in range(n):
        lst = nbrs[i]
        # phase 1: raw Chebyshev G -> (d2, q2)
        g = np.zeros(pot.nsf)
        for a, (j, xij) in enumerate(lst):
            rij = np.linalg.norm(xij)
            fcij = 0.5 * (np.cos(np.pi / rc * rij) + 1.0)
            t, _ = cheb_t_dt(2.0 * rij / rc - 1.0, pot.npsf)
            g[:pot.npsf] += t * fcij
            for (k, xik) in lst[a + 1:]:
                rik = np.linalg.norm(xik)
                fcik = 0.5 * (np.cos(np.pi / rc * rik) + 1.0)
                ct = float(xij @ xik / (rij * rik))
                ta, _ = cheb_t_dt(0.5 * (ct + 1.0), pot.ntsf)
                g[pot.npsf:] += ta * fcij * fcik
        d2, q2 = _mlp_forward_only(net, g, "anna")
        lparams[i] = (d2, q2)

        # fields + energy
        mu = np.zeros(3)
        lam = np.zeros((3, 3))
        rho = 0.0
        repul = 0.0
        for (j, xij) in lst:
            r = np.linalg.norm(xij)
            stx = (r - rc) / hc
            stpf = stx ** 4 / (1 + stx ** 4)
            u = stpf * (d1 * np.exp(-d2 * r) + d3)
            w = stpf * (q1 * np.exp(-q2 * r) + q3)
            mu += u * xij
            lam += w * np.outer(xij, xij)
            z = r - r0
            ez = np.exp(-gamma * z)
            rho += stpf * (A0 * z ** yy * ez * (1 + ez) + C0)
            zr = r / r1
            repul += stpf * (V0 / (b2 - b1) * (b2 / zr ** b1 - b1 / zr ** b2) + delta)
        nu = np.trace(lam)
        e_at[i] = (0.5 * repul + c1F * np.sqrt(rho) + c2F * rho ** 2
                   + 0.5 * mu @ mu + 0.5 * np.sum(lam * lam) - nu ** 2 / 6.0
                   + pot.e_base)

        # force loop (i-centered fields, newton-on +/- scatter)
        f_v = -nu / 3.0
        repc = V0 / (b2 - b1)
        for (j, xij) in lst:
            r = np.linalg.norm(xij)
            stx = (r - rc) / hc
            t1 = 1 + stx ** 4
            stpf = stx ** 4 / t1
            dstpf = 4 * stx ** 3 / t1 ** 2 / hc
            z = r - r0
            ez = np.exp(-gamma * z)
            zyy = A0 * z ** yy
            gazyy = zyy * gamma
            drho = (ez * (1 + ez) * (zyy * (dstpf + stpf * yy / z) - gazyy)
                    + C0 * dstpf - gazyy * ez * ez)
            dembed = (0.5 * c1F * rho ** -0.5 + 2.0 * c2F * rho) * drho
            zr = r / r1
            zb1, zb2 = zr ** b1, zr ** b2
            rep1 = repc * (b2 / zb1 - b1 / zb2) + delta
            drep = dstpf * rep1 + stpf * repc * (b2 * b1 / r1 / zr * (-1 / zb1 + 1 / zb2))
            ut = d1 * np.exp(-d2 * r)
            wt = q1 * np.exp(-q2 * r)
            au = stpf * (ut + d3)
            aw = 2.0 * stpf * (wt + q3)
            dau = dstpf * (ut + d3) + stpf * (-d2 * ut)
            daw = dstpf * (wt + q3) + stpf * (-q2 * wt)
            lam_x = lam @ xij
            lamq = xij @ lam_x
            dterm1 = 0.5 * drep + dembed + dau * (mu @ xij) + daw * lamq
            dterm3 = f_v * (daw * r + aw)
            fp = (dterm1 / r + dterm3) * xij + aw * lam_x + au * mu
            forces[i] -= fp
            forces[j] += fp
    return e_at.sum(), forces, e_at, lparams
