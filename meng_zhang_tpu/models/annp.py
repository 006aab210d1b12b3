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

    @property
    def nsf(self) -> int:
        return self.npsf + self.ntsf


def make_annp(pot: AnnpPotential, dtype=jnp.float32):
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
            e_scale=NI_HARTREE_EV, e_shift=0.0)
    else:
        cfg = AnnpConfig(
            descriptor=SYM_CHEBYSHEV, npsf=pot.npsf, ntsf=pot.ntsf, cut=pot.cut,
            flagact=pot.networks[0].flagact, act_style=pot.networks[0].act_style,
            e_scale=pot.e_scale, e_shift=pot.e_shift + pot.e_atom)

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


def _gather_dx(x, box, nbr_idx):
    n = x.shape[0]
    x_pad = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)
    dx = min_image(x[:, None, :] - x_pad[nbr_idx], box)
    mask = nbr_idx < n
    return dx, mask


def atom_energies(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    """Per-atom energies [N] from positions and a padded neighbor table."""
    dx, mask = _gather_dx(x, box, nbr_idx)
    if elems is None:
        elems = jnp.zeros(x.shape[0], dtype=jnp.int32)
    return jax.vmap(partial(atom_energy, cfg, params))(dx, mask, elems)


def energy(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    return jnp.sum(atom_energies(cfg, params, x, box, nbr_idx, elems))


def energy_forces(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    e, grads = jax.value_and_grad(energy, argnums=2)(cfg, params, x, box,
                                                     nbr_idx, elems)
    return e, -grads


def energy_forces_virial(cfg: AnnpConfig, params, x, box, nbr_idx, elems=None):
    """Total energy, forces, and the virial tensor W = -dE/d(strain).

    W equals the pairwise sum r_ij (x) F_ij the reference tallies per pair
    (ev_tally_xyz, fe/src/pair_annp.cpp:197-205); pressure follows as
    P = (N k_B T + tr(W)/3) / V.
    """
    if elems is None:
        elems = jnp.zeros(x.shape[0], dtype=jnp.int32)

    def strained(eps, xx):
        dx, mask = _gather_dx(xx, box, nbr_idx)
        dx = dx @ (jnp.eye(3, dtype=x.dtype) + eps)
        e_at = jax.vmap(partial(atom_energy, cfg, params))(dx, mask, elems)
        return jnp.sum(e_at)

    eps0 = jnp.zeros((3, 3), dtype=x.dtype)
    e, (g_eps, g_x) = jax.value_and_grad(strained, argnums=(0, 1))(eps0, x)
    w = -0.5 * (g_eps + g_eps.T)
    return e, -g_x, w
