"""Time integrators and thermostats/barostats (LAMMPS metal units).

The reference delegates integration to LAMMPS (Verlet + fix nvt/npt; the
benchmark runs `fix npt ... temp 300 300 0.1 y 0 0 1`, in.st_test:27). This
engine owns integration so the whole MD loop stays device-resident:

  * velocity Verlet (NVE)
  * Langevin thermostat (BAOAB splitting)
  * Nose-Hoover chain NVT (Martyna-Klein-Tuckerman chains)
  * Nose-Hoover NPT: MTK barostat, isotropic or per-axis couple

All functions are pure: (state, ...) -> state, jit/scan-compatible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..units import BOLTZ, MVV2E


class NHCState(NamedTuple):
    """Nose-Hoover chain variables (positions xi are not needed for dynamics
    but kept for the conserved quantity)."""
    xi: jax.Array      # [M]
    v_xi: jax.Array    # [M]

    @staticmethod
    def zeros(m=3, dtype=jnp.float32):
        return NHCState(jnp.zeros(m, dtype), jnp.zeros(m, dtype))


def kinetic_energy(v, masses):
    """KE in eV; v in A/ps, masses in g/mol."""
    return 0.5 * MVV2E * jnp.sum(masses[:, None] * v * v)


def temperature(v, masses, ndof):
    return 2.0 * kinetic_energy(v, masses) / (ndof * BOLTZ)


def remove_drift(v, masses):
    p = jnp.sum(masses[:, None] * v, axis=0)
    return v - p / jnp.sum(masses)


def vv_kick(v, f, masses, dt):
    """Half/full kick: dv = F/m * dt / MVV2E (force eV/A -> A/ps^2)."""
    return v + (dt / MVV2E) * f / masses[:, None]


def vv_drift(x, v, dt):
    return x + dt * v


def nhc_masses(ndof, t_target, tau, m, dtype):
    q = jnp.full((m,), BOLTZ * t_target * tau * tau, dtype)
    return q.at[0].set(ndof * BOLTZ * t_target * tau * tau)


def nhc_propagate(ke2, nhc: NHCState, q, kt, ndof, dt):
    """Half-step Nose-Hoover chain update driven by 2*KE of the coupled
    degrees of freedom; returns (velocity scale factor, new chain).

    Standard MTK chain propagation (outer->inner->scale->inner->outer) with a
    single Suzuki-Yoshida term; adequate at MD timesteps of ~1 fs. Used both
    for the particle thermostat (ke2 = 2*KE of atoms) and for the barostat
    thermostat of fix npt (ke2 = W * sum v_eps^2, ndof = coupled axes).
    """
    m = q.shape[0]
    dt2, dt4, dt8 = dt / 2.0, dt / 4.0, dt / 8.0

    v_xi = nhc.v_xi
    xi = nhc.xi

    # update chain velocities inward
    g_last = (q[m - 2] * v_xi[m - 2] ** 2 - kt) / q[m - 1] if m > 1 else 0.0
    v_xi = v_xi.at[m - 1].add(dt4 * g_last)
    for k in range(m - 2, -1, -1):
        coupling = jnp.exp(-dt8 * v_xi[k + 1])
        g = ((ke2 - ndof * kt) / q[0] if k == 0
             else (q[k - 1] * v_xi[k - 1] ** 2 - kt) / q[k])
        v_xi = v_xi.at[k].set((v_xi[k] * coupling + dt4 * g) * coupling)

    # scale coupled velocities
    scale = jnp.exp(-dt2 * v_xi[0])
    ke2 = ke2 * scale * scale
    xi = xi + dt2 * v_xi

    # update chain velocities outward
    for k in range(m - 1):
        coupling = jnp.exp(-dt8 * v_xi[k + 1])
        g = ((ke2 - ndof * kt) / q[0] if k == 0
             else (q[k - 1] * v_xi[k - 1] ** 2 - kt) / q[k])
        v_xi = v_xi.at[k].set((v_xi[k] * coupling + dt4 * g) * coupling)
    g_last = (q[m - 2] * v_xi[m - 2] ** 2 - kt) / q[m - 1] if m > 1 else 0.0
    v_xi = v_xi.at[m - 1].add(dt4 * g_last)

    return scale, NHCState(xi, v_xi)


def nhc_step(v, masses, nhc: NHCState, q, t_target, ndof, dt):
    """Half-step particle Nose-Hoover chain; returns (scaled v, new chain)."""
    ke2 = 2.0 * kinetic_energy(v, masses)
    scale, nhc = nhc_propagate(ke2, nhc, q, BOLTZ * t_target, ndof, dt)
    return v * scale, nhc


def nhc_conserved(nhc: NHCState, q, t_target, ndof):
    """Thermostat contribution to the conserved quantity (eV)."""
    kt = BOLTZ * t_target
    e = 0.5 * jnp.sum(q * nhc.v_xi ** 2)
    e += ndof * kt * nhc.xi[0] + kt * jnp.sum(nhc.xi[1:])
    return e


def langevin_ou(v, masses, key, t_target, damp, dt):
    """Ornstein-Uhlenbeck half of BAOAB: v' = c1 v + c2 * sigma * xi."""
    c1 = jnp.exp(-dt / damp)
    sigma = jnp.sqrt(BOLTZ * t_target / (masses[:, None] * MVV2E))
    noise = jax.random.normal(key, v.shape, dtype=v.dtype)
    return c1 * v + jnp.sqrt(1.0 - c1 * c1) * sigma * noise


class BarostatState(NamedTuple):
    v_eps: jax.Array     # [3] per-axis strain rates (A/ps / A)
    nhc: NHCState        # barostat's own thermostat chain


def npt_baro_masses(n_atoms, t_target, tau_p, dtype):
    """MTK barostat mass W = (N+1) kB T tau_p^2 (per coupled axis)."""
    return jnp.asarray((n_atoms + 1) * BOLTZ * t_target * tau_p * tau_p, dtype)
