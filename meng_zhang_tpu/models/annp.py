"""ANNP neural-network potential (Chebyshev fe/fe_v2 and Behler-Parrinello ni
variants) as a pure-JAX energy model.

TPU-first redesign of the reference pair styles (fe/src/pair_annp.cpp:74-218,
ni/src/pair_annp.cpp:74-210): per-atom descriptor -> tiny MLP energies are
evaluated as one batched masked computation over fixed-capacity padded
neighbor arrays; forces and virials come from `jax.grad` of the total energy
(the newton-off gather formulation -- no scatter, no dG_dij scratch, see
SURVEY.md section 7).

Energy bookkeeping:
  fe:  E_i = e_scale * nn(G_i) + e_shift + e_atom   (pair_annp.cpp:778-781)
  ni:  nn output is in Hartree; the reference reports it raw and converts
       only forces via CFFORCE (ni/src/pair_annp.cpp:187-189). Here the
       per-atom energy is scaled by CFFORCE/CFLENGTH (== the reference's
       exact Hartree->eV factor) so E is in eV and -dE/dx reproduces the
       reference forces identically; `raw_nn_energy` recovers the reference's
       Hartree numbers for parity tests.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.potential import AnnpPotential, SYM_BEHLER, SYM_CHEBYSHEV
from ..system.cell import min_image
from ..units import CFFORCE, CFLENGTH
from .descriptors import behler_g, chebyshev_g
from .mlp import mlp_apply

NI_HARTREE_EV = CFFORCE / CFLENGTH   # 27.2115951; exact ratio the reference's
                                     # force conversion implies


@dataclasses.dataclass(frozen=True)
class AnnpConfig:
    """Static (trace-time) model configuration."""
    descriptor: int          # SYM_CHEBYSHEV or SYM_BEHLER
    npsf: int
    ntsf: int
    cut: float               # descriptor/neighbor cutoff in Angstrom
    flagact: tuple
    act_style: str
    e_scale: float
    e_shift: float           # includes e_atom for fe
    pbc: tuple = (True, True, True)

    @property
    def nsf(self) -> int:
        return self.npsf + self.ntsf


def make_annp(pot: AnnpPotential, dtype=jnp.float32,
              pbc=(True, True, True)):
    """Build (config, params-pytree) from a parsed `.ann` potential.

    The ni variant is selected by the presence of the symmetry-function
    coefficient trailer (the file's own "Chebyshev" label notwithstanding --
    the ni pair style evaluates Behler-Parrinello forms unconditionally,
    ni/src/pair_annp.cpp:686-766).
    """
    is_ni = pot.sym_coerad is not None
    if is_ni:
        cfg = AnnpConfig(
            descriptor=SYM_BEHLER, npsf=pot.npsf, ntsf=pot.ntsf, cut=pot.cut,
            flagact=pot.networks[0].flagact, act_style=pot.networks[0].act_style,
            e_scale=NI_HARTREE_EV, e_shift=0.0, pbc=tuple(pbc))
    else:
        cfg = AnnpConfig(
            descriptor=SYM_CHEBYSHEV, npsf=pot.npsf, ntsf=pot.ntsf, cut=pot.cut,
            flagact=pot.networks[0].flagact, act_style=pot.networks[0].act_style,
            e_scale=pot.e_scale, e_shift=pot.e_shift + pot.e_atom,
            pbc=tuple(pbc))

    ne = len(pot.elements)
    nl = pot.networks[0].n_layers
    params = {
        "w": tuple(jnp.asarray(np.stack([pot.networks[e].weights[l] for e in range(ne)]),
                               dtype=dtype) for l in range(nl)),
        "b": tuple(jnp.asarray(np.stack([pot.networks[e].biases[l] for e in range(ne)]),
                               dtype=dtype) for l in range(nl)),
        "sf_scale": jnp.asarray(pot.sf_scale, dtype=dtype),
        "sf_shift": jnp.asarray(pot.sf_shift, dtype=dtype),
    }
    if is_ni:
        params["coerad"] = jnp.asarray(pot.sym_coerad, dtype=dtype)
        params["coeang"] = jnp.asarray(pot.sym_coeang, dtype=dtype)
    return cfg, params


def effective_cutoff(pot: AnnpPotential) -> float:
    """Smallest neighbor-list cutoff that preserves the model exactly.

    The ni potential's header cutoff is 6.5 A (the LAMMPS list cutoff,
    ni_annp_potential_2.ann line 10) but its symmetry functions vanish beyond
    the coefficient-table Rc = 7.3699319 Bohr = 3.90 A
    (ni/src/pair_annp.cpp:686-766) -- a 6.5 A list carries ~9x more pairs
    than the descriptors use. For Chebyshev potentials this is just cut."""
    if pot.sym_coerad is None:
        return pot.cut
    rc_bohr = max(float(np.max(pot.sym_coerad[:, 2])),
                  float(np.max(pot.sym_coeang[:, 3])))
    return min(pot.cut, rc_bohr / CFLENGTH)


def atom_energy(cfg: AnnpConfig, params, dx, mask, elem):
    """Energy of one atom given neighbor displacements dx=[K,3], mask=[K]."""
    rsq = jnp.sum(dx * dx, axis=-1)
    if cfg.descriptor == SYM_CHEBYSHEV:
        m = mask & (rsq < cfg.cut * cfg.cut)
        g_raw = chebyshev_g(dx, m, cfg.npsf, cfg.ntsf, cfg.cut)
    else:
        g_raw = behler_g(dx, mask, params["coerad"], params["coeang"])
    g = (g_raw - params["sf_shift"]) * params["sf_scale"]
    w = tuple(wl[elem] for wl in params["w"])
    b = tuple(bl[elem] for bl in params["b"])
    out = mlp_apply(w, b, cfg.flagact, cfg.act_style, g)
    return cfg.e_scale * out[0] + cfg.e_shift


def raw_nn_energy(cfg: AnnpConfig, params, dx, mask, elem=0):
    """The unscaled network output (reference's `evdwl` before e-bookkeeping
    for fe; the raw Hartree value the ni variant reports)."""
    e = atom_energy(cfg, params, dx, mask, jnp.asarray(elem))
    return (e - cfg.e_shift) / cfg.e_scale


def _gather_dx(x, box, nbr_idx, pbc=(True, True, True)):
    n = x.shape[0]
    x_pad = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)
    dx = min_image(x[:, None, :] - x_pad[nbr_idx], box, pbc)
    mask = nbr_idx < n
    return dx, mask


def atom_energies(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    """Per-atom energies [N] from positions and a padded neighbor table."""
    dx, mask = _gather_dx(x, box, nbr_idx, cfg.pbc)
    if elems is None:
        elems = jnp.zeros(x.shape[0], dtype=jnp.int32)
    return jax.vmap(partial(atom_energy, cfg, params))(dx, mask, elems)


def energy(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    return jnp.sum(atom_energies(cfg, params, x, box, nbr_idx, elems))


def energy_forces(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    e, grads = jax.value_and_grad(energy, argnums=2)(cfg, params, x, box,
                                                     nbr_idx, elems)
    return e, -grads


def _pad_rows(a, rows, fill):
    return jnp.concatenate([a, jnp.full((rows,) + a.shape[1:], fill, a.dtype)])


def _strain_dx(dx, eps, mask=None):
    """Apply a linear strain to 3 x [C, K] displacement components:
    dx'_a = dx_a + sum_b dx_b * eps[b, a]  (row-vector dx @ (I + eps)).
    Differentiating the energy w.r.t. eps at 0 yields the virial. With a
    per-row `mask` [C], only masked rows are strained -- the eps-gradient
    then tallies only those rows' pairs (the sharded per-device virial)."""
    if eps is None:
        return dx
    if mask is None:
        return [dx[a] + sum(dx[b] * eps[b, a] for b in range(3))
                for a in range(3)]
    m = mask[:, None]
    return [dx[a] + m * sum(dx[b] * eps[b, a] for b in range(3))
            for a in range(3)]


def chunk_g_cheb(npsf, ntsf, rc, pbc, xc, xpad, idx, box,
                 eps=None, eps_mask=None):
    """Raw Chebyshev descriptors [C, nsf] in TPU-friendly [C, K] component
    layout (shared by the fe chunked energy and the ANNA-ADP fast path --
    ANNA evaluates the identical raw sums, pair_anna_adp.cpp:653-680).

    xc: 3 x [C] chunk coordinates; xpad: 3 x [N+1] padded coordinates;
    idx: [C, K]. All per-pair math runs on [C, K] / [C, K, K] arrays --
    never a trailing-3 axis, which TPU tiling would pad to 128.
    """
    n = xpad[0].shape[0] - 1
    mask = idx < n
    dx = []
    rsq0 = jnp.zeros(idx.shape, xc[0].dtype)
    for d in range(3):
        dd = xc[d][:, None] - xpad[d][idx]
        if pbc[d]:
            dd = dd - box[d] * jnp.round(dd / box[d])
        dx.append(dd)
        rsq0 = rsq0 + dd * dd
    dx = _strain_dx(dx, eps, eps_mask)
    rsq = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2] if eps is not None \
        else rsq0
    mask = mask & (rsq < rc * rc) & (rsq > 1.0e-12)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    fc = jnp.where(mask, 0.5 * (jnp.cos(jnp.pi / rc * r) + 1.0), 0.0)

    # radial: G[m] = sum_j T_m(2r/rc - 1) * fc     [C, npsf]
    xch = 2.0 * r / rc - 1.0
    t_prev = jnp.ones_like(xch)
    t_cur = xch
    g_rad = [jnp.sum(fc, axis=1)]
    if npsf > 1:
        g_rad.append(jnp.sum(t_cur * fc, axis=1))
    for _ in range(2, npsf):
        t_prev, t_cur = t_cur, 2.0 * xch * t_cur - t_prev
        g_rad.append(jnp.sum(t_cur * fc, axis=1))
    g_rad = jnp.stack(g_rad, axis=1)

    # angular: cos matrix from 3 outer products of unit components
    inv_r = 1.0 / r
    cosjk = jnp.zeros(idx.shape + (idx.shape[1],), xch.dtype)
    for d in range(3):
        ud = jnp.where(mask, dx[d] * inv_r, 0.0)
        cosjk = cosjk + ud[:, :, None] * ud[:, None, :]
    wjk = fc[:, :, None] * fc[:, None, :]
    wjk = wjk * (1.0 - jnp.eye(idx.shape[1], dtype=xch.dtype))
    xa = 0.5 * (cosjk + 1.0)
    t_prev = jnp.ones_like(xa)
    t_cur = xa
    g_ang = [jnp.sum(wjk, axis=(1, 2))]
    if ntsf > 1:
        g_ang.append(jnp.sum(wjk * t_cur, axis=(1, 2)))
    for _ in range(2, ntsf):
        t_prev, t_cur = t_cur, 2.0 * xa * t_cur - t_prev
        g_ang.append(jnp.sum(wjk * t_cur, axis=(1, 2)))
    g_ang = 0.5 * jnp.stack(g_ang, axis=1)
    return jnp.concatenate([g_rad, g_ang], axis=1)


def _chunk_mlp_eat(cfg, params, g, elems_c):
    """Per-atom energies from normalized descriptors, selecting each
    atom's element network. Multi-element runs every (tiny) network on the
    chunk and masks -- a dense select instead of gathering weight
    matrices, matching the reference's per-type map dispatch
    (fe/src/pair_annp.cpp:252-297). Normalization rows are shared across
    elements (one pair of rows in the .ann header, io/potential.py)."""
    ne = params["w"][0].shape[0]
    if ne == 1 or elems_c is None:
        w = tuple(wl[0] for wl in params["w"])
        b = tuple(bl[0] for bl in params["b"])
        out = mlp_apply(w, b, cfg.flagact, cfg.act_style, g)[:, 0]
    else:
        out = jnp.zeros(g.shape[0], g.dtype)
        for e in range(ne):
            w = tuple(wl[e] for wl in params["w"])
            b = tuple(bl[e] for bl in params["b"])
            o = mlp_apply(w, b, cfg.flagact, cfg.act_style, g)[:, 0]
            out = jnp.where(elems_c == e, o, out)
    return cfg.e_scale * out + cfg.e_shift


def _chunk_energy_cheb(cfg: AnnpConfig, params, xc, xpad, idx, box,
                       valid=None, eps=None, eps_mask=None, reduce=True,
                       elems_c=None):
    """Chebyshev chunk energy (see chunk_g_cheb for the layout rules)."""
    g = chunk_g_cheb(cfg.npsf, cfg.ntsf, cfg.cut, cfg.pbc, xc, xpad, idx,
                     box, eps, eps_mask)
    g = (g - params["sf_shift"]) * params["sf_scale"]
    e_at = _chunk_mlp_eat(cfg, params, g, elems_c)
    if valid is not None:
        e_at = jnp.where(valid, e_at, 0.0)
    return jnp.sum(e_at) if reduce else e_at


def _chunk_energy_behler(cfg: AnnpConfig, params, xc, xpad, idx, box,
                         valid=None, eps=None, eps_mask=None, reduce=True,
                         elems_c=None):
    """Behler-Parrinello chunk energy in [C, K] component layout (ni).

    Same layout rules as `_chunk_energy_cheb`; the G4 three-leg geometry
    (ni/lib/lal_annp.cu:360-460) is reconstructed from the law of cosines
    (rjk^2 = rj^2 + rk^2 - 2 rj rk cos) so no neighbor-neighbor gather is
    needed, and the 24 angular functions share exp(-eta r2sum) across their
    3 distinct eta values.
    """
    n = xpad[0].shape[0] - 1
    coerad = params["coerad"]
    coeang = np.asarray(params["coeang"])    # static small table
    rc_r = float(np.asarray(params["coerad"])[0, 2])
    rc_a = float(coeang[0, 3])
    mask = idx < n
    dx = []
    rsq = jnp.zeros(idx.shape, xc[0].dtype)
    for d in range(3):
        dd = xc[d][:, None] - xpad[d][idx]
        if cfg.pbc[d]:
            dd = dd - box[d] * jnp.round(dd / box[d])
        dx.append(dd)
    dx = _strain_dx(dx, eps, eps_mask)
    rsq = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    mask = mask & (rsq > 1.0e-12)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    rm = jnp.where(mask, r * CFLENGTH, 2.0 * rc_a + 10.0)   # Bohr

    # radial G2 (rs column unused, matching the reference)
    in_r = mask & (rm < rc_r)
    fc_r = jnp.where(in_r, 0.5 * (jnp.cos(jnp.pi / rc_r * rm) + 1.0), 0.0)
    g_rad = [jnp.sum(jnp.exp(-coerad[m, 0] * rm * rm) * fc_r, axis=1)
             for m in range(cfg.npsf)]

    # angular legs
    inv_r = 1.0 / r
    cosjk = jnp.zeros(idx.shape + (idx.shape[1],), r.dtype)
    for d in range(3):
        ud = jnp.where(mask, dx[d] * inv_r, 0.0)
        cosjk = cosjk + ud[:, :, None] * ud[:, None, :]
    k_sz = idx.shape[1]
    pair_m = (mask[:, :, None] & mask[:, None, :]) \
        & ~jnp.eye(k_sz, dtype=bool)[None]
    rjk2 = (rm[:, :, None] ** 2 + rm[:, None, :] ** 2
            - 2.0 * rm[:, :, None] * rm[:, None, :] * cosjk)
    rjk = jnp.sqrt(jnp.where(pair_m, jnp.maximum(rjk2, 1e-12), 1.0))
    legs = pair_m & (rm[:, :, None] < rc_a) & (rm[:, None, :] < rc_a) \
        & (rjk < rc_a)
    fc_j = jnp.where(rm < rc_a, 0.5 * (jnp.cos(jnp.pi / rc_a * rm) + 1.0), 0.0)
    fc3 = jnp.where(legs,
                    fc_j[:, :, None] * fc_j[:, None, :]
                    * (0.5 * (jnp.cos(jnp.pi / rc_a * rjk) + 1.0)), 0.0)
    r2sum = rm[:, :, None] ** 2 + rm[:, None, :] ** 2 + jnp.where(
        legs, rjk2, 0.0)

    g_ang = []
    last_eta = None
    exp_term = None
    for nfun in range(cfg.ntsf):
        eta, lam, zeta = (float(coeang[nfun, 0]), float(coeang[nfun, 1]),
                          float(coeang[nfun, 2]))
        if eta != last_eta:
            exp_term = jnp.exp(-eta * r2sum) * fc3
            last_eta = eta
        flag = 1.0 + lam * cosjk
        ok = legs & (flag > 0.0)
        term = 2.0 ** (1.0 - zeta) * jnp.where(ok, flag, 1.0) ** zeta
        g_ang.append(0.5 * jnp.sum(jnp.where(ok, term * exp_term, 0.0),
                                   axis=(1, 2)))

    g = jnp.stack(g_rad + g_ang, axis=1)
    g = (g - params["sf_shift"]) * params["sf_scale"]
    e_at = _chunk_mlp_eat(cfg, params, g, elems_c)
    if valid is not None:
        e_at = jnp.where(valid, e_at, 0.0)
    return jnp.sum(e_at) if reduce else e_at


def compact_neighbor_rows(x, box, idx, rc, k_short, pbc=(True, True, True),
                          row_chunk=8192):
    """Per-eval short-neighbor repack for the chunked XLA paths.

    The TPU equivalent of the reference's k_annp_short_nbor
    (fe/lib/lal_annp.cu:267-344): each skin-padded neighbor row (capacity K,
    ~rlist entries) is compacted to its in-cutoff prefix by a stable row
    sort and sliced to k_short columns, so the O(K^2) angular work runs at
    the physical neighbor count instead of the list capacity. The membership
    set is exact at the current positions; atoms at the cutoff boundary
    carry fc = 0, so energies/forces are unchanged.

    Returns (idx_short [N, k_short], overflow). Descriptor paths re-check
    the cutoff, so a stale-by-one-step compaction can only DROP pairs --
    which the overflow flag reports."""
    from ..system.neighbors import _compact_rows
    n, k = idx.shape
    xp = [jnp.concatenate([x[:, d], jnp.zeros((1,), x.dtype)])
          for d in range(3)]
    n_pad = -(-n // row_chunk) * row_chunk
    idx_p = _pad_rows(idx, n_pad - n, n)
    xi = tuple(_pad_rows(x[:, d], n_pad - n, 0.0).reshape(-1, row_chunk)
               for d in range(3))

    def chunk_fn(args):
        x0, x1, x2, ic = args
        rsq = jnp.zeros(ic.shape, x.dtype)
        for d, xd in enumerate((x0, x1, x2)):
            dd = xd[:, None] - xp[d][ic]
            if pbc[d]:
                dd = dd - box[d] * jnp.round(dd / box[d])
            rsq = rsq + dd * dd
        within = (ic < n) & (rsq < rc * rc)
        return _compact_rows(within, ic, k_short, n)

    idx_c, counts = jax.lax.map(
        chunk_fn, (xi[0], xi[1], xi[2],
                   idx_p.reshape(-1, row_chunk, k)))
    idx_short = idx_c.reshape(n_pad, k_short)[:n]
    overflow = jnp.any(counts.reshape(-1)[:n] > k_short)
    return idx_short, overflow


def descriptor_cutoff(cfg: AnnpConfig, params) -> float:
    """The radius beyond which the descriptors vanish (Angstrom): cfg.cut
    for Chebyshev; the coefficient-table Rc (Bohr -> A) for Behler."""
    if cfg.descriptor == SYM_CHEBYSHEV:
        return cfg.cut
    rc_bohr = max(float(np.max(np.asarray(params["coerad"])[:, 2])),
                  float(np.max(np.asarray(params["coeang"])[:, 3])))
    return min(cfg.cut, rc_bohr / CFLENGTH)


def energy_forces_virial_frame(cfg: AnnpConfig, params, x_src, box, idx,
                               off, vslice, chunk=512, k_short=None):
    """Sharded-frame evaluation via the chunked [C,K] paths (fe AND ni).

    The newton-off halo formulation: center rows (local atoms + an
    extension covering every atom within rlist of a local one) each get a
    complete per-atom energy from frame positions; forces on frame atoms are
    -d(sum of center energies)/dx, which is exact for the LOCAL rows because
    their full energy neighborhood is inside the center set. The virial
    applies the strain only to the local rows' displacements, so its
    eps-gradient tallies exactly this device's half-pairs -- one forward +
    one backward for energies, forces, and virial together.

    x_src [C_ext, 3]: frame positions (centers at rows [off, off+Cc));
    idx [Cc, K]: neighbor rows in frame indices (sentinel C_ext);
    vslice=(lo, hi): local center rows. Returns (eat [Cc] shifted,
    f_frame-sliced-to-centers [Cc, 3], virial [3,3]).
    """
    cc = idx.shape[0]
    lo, hi = vslice
    cfg0 = dataclasses.replace(cfg, e_shift=0.0)
    chunk_fn = (_chunk_energy_cheb if cfg.descriptor == SYM_CHEBYSHEV
                else _chunk_energy_behler)
    poison = None
    if k_short is not None and k_short < idx.shape[1]:
        # per-eval short repack (k_annp_short_nbor): membership computed at
        # the CURRENT positions outside the grad (index selection is
        # piecewise constant in x; fc -> 0 at the cutoff boundary)
        from ..system.neighbors import _compact_rows
        rc = descriptor_cutoff(cfg, params)
        xs = jax.lax.stop_gradient(x_src)
        xc0 = xs[off: off + cc]
        n_src = x_src.shape[0]
        xp = [jnp.concatenate([xs[:, d], jnp.zeros((1,), xs.dtype)])
              for d in range(3)]
        rsq = jnp.zeros(idx.shape, xs.dtype)
        for d in range(3):
            dd = xc0[:, d][:, None] - xp[d][idx]
            if cfg.pbc[d]:
                dd = dd - box[d] * jnp.round(dd / box[d])
            rsq = rsq + dd * dd
        within = (idx < n_src) & (rsq < rc * rc)
        idx, counts = _compact_rows(within, idx, k_short, n_src)
        poison = jnp.any(counts > k_short)
    cc_pad = -(-cc // chunk) * chunk
    idx_p = _pad_rows(idx, cc_pad - cc, x_src.shape[0])
    loc = ((jnp.arange(cc_pad) >= lo) & (jnp.arange(cc_pad) < hi))
    valid = jnp.arange(cc_pad) < cc

    def f(x_ext, eps):
        xpad = tuple(jnp.concatenate([x_ext[:, d],
                                      jnp.zeros((1,), x_ext.dtype)])
                     for d in range(3))
        xc_rows = x_ext[off: off + cc]
        xc = tuple(_pad_rows(xc_rows[:, d], cc_pad - cc, 0.0)
                   .reshape(-1, chunk) for d in range(3))
        idx_c = idx_p.reshape(-1, chunk, idx.shape[1])
        loc_c = loc.reshape(-1, chunk)
        val_c = valid.reshape(-1, chunk)

        @jax.checkpoint
        def body(carry, args):
            xc0, xc1, xc2, ic, lc, vc = args
            e_at = chunk_fn(cfg0, params, (xc0, xc1, xc2), xpad, ic, box,
                            valid=vc, eps=eps,
                            eps_mask=lc.astype(x_ext.dtype), reduce=False)
            return (carry[0] + jnp.sum(e_at),
                    carry[1] + jnp.sum(jnp.where(lc, e_at, 0.0))), e_at

        (e_all, e_loc), eat = jax.lax.scan(
            body, (jnp.zeros((), x_ext.dtype),) * 2,
            (xc[0], xc[1], xc[2], idx_c, loc_c, val_c))
        return e_all, (e_loc, eat.reshape(cc_pad)[:cc])

    eps0 = jnp.zeros((3, 3), x_src.dtype)
    (_, (_, eat)), (g_x, g_eps) = jax.value_and_grad(
        f, argnums=(0, 1), has_aux=True)(x_src, eps0)
    w = -0.5 * (g_eps + g_eps.T)
    f_cc = -g_x[off: off + cc]
    eat = eat + cfg.e_shift
    if poison is not None:
        # short-list overflow: silently dropped pairs must never pass
        eat = jnp.where(poison, jnp.nan, eat)
        f_cc = jnp.where(poison, jnp.nan, f_cc)
    return eat, f_cc, w


def energy_chunked(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None,
                   chunk=256, eps=None, shift=True):
    """Total energy with atoms processed in rematerialized chunks.

    The TPU analogue of the reference's FCA chunked launch loop
    (loop_annp, fe/lib/lal_annp.cpp:517-607): the O(chunk * K^2) angular
    intermediates never exceed one chunk's footprint; `jax.checkpoint`
    recomputes them in the backward pass instead of storing all chunks.
    Specialized [C, K]-layout paths for single-element Chebyshev (fe/fe_v2)
    and Behler-Parrinello (ni); falls back to the vmap path otherwise.
    """
    n = x.shape[0]
    multi_elem = elems is not None and bool(params["w"][0].shape[0] > 1)
    n_pad = -(-n // chunk) * chunk
    idx_p = _pad_rows(nbr_idx, n_pad - n, n)           # padded rows: all-sentinel
    xpad = tuple(jnp.concatenate([x[:, d], jnp.zeros((1,), x.dtype)])
                 for d in range(3))
    xc = tuple(_pad_rows(x[:, d], n_pad - n, 0.0).reshape(-1, chunk)
               for d in range(3))
    idx_c = idx_p.reshape(-1, chunk, nbr_idx.shape[1])
    valid_c = (jnp.arange(n_pad) < n).reshape(-1, chunk)
    el_c = (_pad_rows(elems, n_pad - n, 0).reshape(-1, chunk)
            if multi_elem else jnp.zeros((n_pad // chunk, chunk), jnp.int32))

    chunk_fn = (_chunk_energy_cheb if cfg.descriptor == SYM_CHEBYSHEV
                else _chunk_energy_behler)
    # Accumulate shift-free: e_shift is -4479 eV/atom, so a carry holding the
    # shifted total reaches ~-7e8 eV at 152k atoms where f32 ULP is ~64 eV
    # and each chunk add loses O(ULP). Sum (e_at - e_shift) instead (carry
    # stays O(N * 1 eV)) and add n*e_shift once at the end, as the Pallas
    # path does (ops/pallas_annp.py).
    cfg0 = dataclasses.replace(cfg, e_shift=0.0)

    @jax.checkpoint
    def chunk_e(carry, args):
        xc0, xc1, xc2, idx, valid, el = args
        e = chunk_fn(cfg0, params, (xc0, xc1, xc2), xpad, idx, box, valid,
                     eps, elems_c=el if multi_elem else None)
        return carry + e, None

    total, _ = jax.lax.scan(chunk_e, jnp.zeros((), x.dtype),
                            (xc[0], xc[1], xc[2], idx_c, valid_c, el_c))
    return total + n * cfg.e_shift if shift else total


def energy_forces_chunked(cfg: AnnpConfig, params, x, box, nbr_idx,
                          elems=None, chunk=256, shift=True):
    """Memory-bounded energy+forces for production-size scenes."""
    e, g = jax.value_and_grad(energy_chunked, argnums=2)(
        cfg, params, x, box, nbr_idx, elems, chunk, None, shift)
    return e, -g


def energy_forces_virial_chunked(cfg: AnnpConfig, params, x, box, nbr_idx,
                                 elems=None, chunk=256, shift=True):
    """Memory-bounded energy + forces + virial (fe and ni paths).

    The virial is the strain derivative W = -dE/d(eps) evaluated through the
    chunked energy (the same eps trick as `energy_forces_virial`, but without
    that path's O(N*K^2) un-chunked memory) -- this is what lets ni NPT run
    at production sizes, matching the reference's per-pair ev_tally_xyz
    accumulation (ni/src/pair_annp.cpp compute tally)."""
    def strained(eps, xx):
        return energy_chunked(cfg, params, xx, box, nbr_idx, elems, chunk,
                              eps, shift)

    eps0 = jnp.zeros((3, 3), dtype=x.dtype)
    e, (g_eps, g_x) = jax.value_and_grad(strained, argnums=(0, 1))(eps0, x)
    w = -0.5 * (g_eps + g_eps.T)
    return e, -g_x, w


def image_shift_table(box, rlist, pbc):
    """Integer image-shift table for boxes with periodic dims thinner than
    2*rlist (where the single-image minimum-image convention misses
    periodic self-images -- LAMMPS handles these with ghost atoms).

    Returns (shifts [R, 3] int array with shifts[0] == 0, pbc_eff): the
    neighbor build and the models then run over the image-extended
    position table x_ext = (x[None] + shifts*box).reshape(-1, 3) with the
    thin dims' periodicity OFF (images are explicit). R is bounded by the
    per-dim replication 2*ceil(rlist/L) + 1. Returns (None, pbc) when no
    dim is thin."""
    import itertools
    ms = [int(np.ceil(rlist / float(b)))
          if (p and float(b) < 2.0 * rlist) else 0
          for b, p in zip(np.asarray(box), pbc)]
    if not any(ms):
        return None, tuple(pbc)
    shifts = [np.zeros(3, np.int64)]
    for s in itertools.product(*[range(-m, m + 1) for m in ms]):
        if any(s):
            shifts.append(np.asarray(s, np.int64))
    pbc_eff = tuple(bool(p) and m == 0 for p, m in zip(pbc, ms))
    return np.stack(shifts), pbc_eff


def energy_forces_virial_images(cfg: AnnpConfig, params, x, box, nbr_idx,
                                shifts, elems=None, chunk=256, shift=True):
    """Energy/forces/virial on a thin periodic box via explicit images.

    nbr_idx [n, K] indexes the image-extended table (rows [0, R*n); row
    r*n + i is atom i shifted by shifts[r]); cfg.pbc must be the pbc_eff
    from `image_shift_table` (thin dims off). Forces are -dE/dx
    differentiated THROUGH the in-graph image construction, so an atom
    interacting with several images of the same partner (or of itself)
    tallies every image pair -- the single-chip equivalent of LAMMPS'
    ghost-image bookkeeping. The virial uses the same strained-displacement
    trick as the other chunked paths (image separations scale with the
    strain through dx directly)."""
    n = x.shape[0]
    sh = jnp.asarray(np.asarray(shifts), x.dtype)              # [R, 3]
    chunk_fn = (_chunk_energy_cheb if cfg.descriptor == SYM_CHEBYSHEV
                else _chunk_energy_behler)
    cfg0 = dataclasses.replace(cfg, e_shift=0.0)
    multi = elems is not None and bool(params["w"][0].shape[0] > 1)
    n_pad = -(-n // chunk) * chunk
    idx_p = _pad_rows(nbr_idx, n_pad - n, sh.shape[0] * n)
    idx_c = idx_p.reshape(-1, chunk, nbr_idx.shape[1])
    valid_c = (jnp.arange(n_pad) < n).reshape(-1, chunk)
    el_c = (_pad_rows(elems, n_pad - n, 0).reshape(-1, chunk)
            if multi else jnp.zeros((n_pad // chunk, chunk), jnp.int32))

    def f(xx, eps):
        off = sh * box                                          # [R, 3]
        x_ext = (xx[None, :, :] + off[:, None, :]).reshape(-1, 3)
        xpad = tuple(jnp.concatenate([x_ext[:, d],
                                      jnp.zeros((1,), xx.dtype)])
                     for d in range(3))
        xc = tuple(_pad_rows(xx[:, d], n_pad - n, 0.0).reshape(-1, chunk)
                   for d in range(3))

        @jax.checkpoint
        def chunk_e(carry, args):
            xc0, xc1, xc2, idx, valid, el = args
            e = chunk_fn(cfg0, params, (xc0, xc1, xc2), xpad, idx, box,
                         valid, eps, elems_c=el if multi else None)
            return carry + e, None

        total, _ = jax.lax.scan(chunk_e, jnp.zeros((), xx.dtype),
                                (xc[0], xc[1], xc[2], idx_c, valid_c, el_c))
        return total

    eps0 = jnp.zeros((3, 3), x.dtype)
    e, (g_x, g_eps) = jax.value_and_grad(f, argnums=(0, 1))(x, eps0)
    w = -0.5 * (g_eps + g_eps.T)
    if shift:
        e = e + n * cfg.e_shift
    return e, -g_x, w


class ShortRows(NamedTuple):
    """Refresh-static compacted neighbor rows for the chunked XLA paths
    (the ni analogue of the Pallas path's ShortList): rebuilt every
    cfg.short_every steps by the Simulator instead of per force eval."""
    idx: jax.Array        # [N, k_short] compacted rows (sentinel n)
    ref_x: jax.Array      # positions at refresh (drift guard)
    overflow: jax.Array   # bool: some row exceeded k_short (forces poisoned)


def make_short_chunked_fns(cfg: AnnpConfig, params, k_short=32, delta=0.3,
                           chunk=1024):
    """Production force/short-build trio for the chunked XLA models (ni).

    The reference ni kernel repacks the 6.5 A LAMMPS list to the 3.9 A
    descriptor cutoff INSIDE every force launch (k_annp_short_nbor,
    ni/lib/lal_annp.cu); doing that per step cost 23% of the ni step on the
    TPU (artifacts/profile_ni.json). Compacting instead against rc + delta
    once per short_every steps amortizes it, with the Simulator's
    short_skin drift guard latching `unsafe` if any atom moves > delta/2
    within the epoch (pairs beyond rc contribute exactly zero through the
    fc cutoff masks, so marginal extra rows are free).

    Returns (force_fn, force_fn_light, short_build) for
    Simulator(force_fn, ..., short_build=short_build,
    force_fn_light=force_fn_light) with cfg.short_every > 0 and
    cfg.short_skin == delta. The light variant skips the strain-virial
    tallies (~20% of the eval) on steps whose virial nobody reads --
    non-thermo NVE/NVT steps (ev_tally is likewise gated by vflag in the
    reference, ni/src/pair_annp.cpp).
    """
    rc = descriptor_cutoff(cfg, params)

    def short_build(x, box, nbrs):
        idx_s, ovf = compact_neighbor_rows(x, box, nbrs.idx, rc + delta,
                                           k_short, pbc=cfg.pbc)
        return ShortRows(idx=idx_s, ref_x=x, overflow=ovf)

    def _poison(e, f, ovf):
        # silently dropped rows must never pass (same policy as the Pallas
        # short path): NaN-poison the observables
        nan = jnp.asarray(jnp.nan, f.dtype)
        return jnp.where(ovf, nan, e), jnp.where(ovf, nan, f)

    def force_fn(x, box, nbrs, short):
        e, f, w = energy_forces_virial_chunked(cfg, params, x, box,
                                               short.idx, chunk=chunk,
                                               shift=False)
        e, f = _poison(e, f, short.overflow)
        return e, f, w

    def force_fn_light(x, box, nbrs, short):
        e, f = energy_forces_chunked(cfg, params, x, box, short.idx,
                                     chunk=chunk, shift=False)
        e, f = _poison(e, f, short.overflow)
        return e, f, jnp.zeros((3, 3), x.dtype)

    return force_fn, force_fn_light, short_build


def energy_forces_virial(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    """Total energy, forces, and the virial tensor W = -dE/d(strain).

    W equals the pairwise sum r_ij (x) F_ij the reference tallies per pair
    (ev_tally_xyz, fe/src/pair_annp.cpp:197-205); pressure follows as
    P = (N k_B T + tr(W)/3) / V.
    """
    if elems is None:
        elems = jnp.zeros(x.shape[0], dtype=jnp.int32)

    def strained(eps, xx):
        dx, mask = _gather_dx(xx, box, nbr_idx, cfg.pbc)
        dx = dx @ (jnp.eye(3, dtype=x.dtype) + eps)
        e_at = jax.vmap(partial(atom_energy, cfg, params))(dx, mask, elems)
        return jnp.sum(e_at)

    eps0 = jnp.zeros((3, 3), dtype=x.dtype)
    e, (g_eps, g_x) = jax.value_and_grad(strained, argnums=(0, 1))(eps0, x)
    w = -0.5 * (g_eps + g_eps.T)
    return e, -g_x, w
