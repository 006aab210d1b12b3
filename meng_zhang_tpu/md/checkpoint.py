"""Checkpoint / restart.

The reference delegates restart to LAMMPS and opts out of pair-style restart
data (restartinfo = 0, fe/src/pair_annp.cpp:45) -- a restart only re-reads
the potential file. This engine owns integration, so it owns checkpointing:
positions, velocities, box, thermostat/barostat variables, RNG key, and step
counter (SURVEY.md section 5). Plain compressed-npz dumps; the neighbor list
is rebuilt on load rather than stored.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .simulation import MDState
from ..md import integrate as I

_FIELDS = ("x", "v", "box", "pe", "virial", "v_eps", "key", "step",
           "overflow", "stale", "unsafe")


def save_checkpoint(path: str, state: MDState) -> None:
    data = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    data["nhc_xi"] = np.asarray(state.nhc.xi)
    data["nhc_vxi"] = np.asarray(state.nhc.v_xi)
    data["baro_xi"] = np.asarray(state.baro_nhc.xi)
    data["baro_vxi"] = np.asarray(state.baro_nhc.v_xi)
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, simulator) -> MDState:
    """Restore an MDState; forces and the neighbor list are recomputed."""
    z = np.load(path)
    x = jnp.asarray(z["x"])
    box = jnp.asarray(z["box"])
    nbrs = simulator.build_nbrs(x, box)
    short = None
    if getattr(simulator, "short_build", None) is not None:
        short = simulator.short_build(x, box, nbrs)
    pe, f, w = simulator._eval_force(x, box, nbrs, short)
    return MDState(
        x=x, v=jnp.asarray(z["v"]), f=f, box=box, pe=pe, virial=w,
        nbrs=nbrs,
        nhc=I.NHCState(jnp.asarray(z["nhc_xi"]), jnp.asarray(z["nhc_vxi"])),
        v_eps=jnp.asarray(z["v_eps"]),
        baro_nhc=I.NHCState(jnp.asarray(z["baro_xi"]),
                            jnp.asarray(z["baro_vxi"])),
        key=jnp.asarray(z["key"]),
        step=jnp.asarray(int(z["step"]), jnp.int32),
        overflow=jnp.asarray(bool(z["overflow"])),
        stale=jnp.asarray(False),
        unsafe=jnp.asarray(bool(z["unsafe"]) if "unsafe" in z else False),
        short=short)
