"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on the host), double precision enabled for oracle parity."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # the axon TPU plugin overrides this...
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # ...so force it via config too
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402
import numpy as np  # noqa: E402

REF = "/root/reference"
FE_ANN = REF + "/annp-gpu-lammps/fe/fe_annp_potential_2.ann"
NI_ANN = REF + "/annp-gpu-lammps/ni/ni_annp_potential_2.ann"
ANNA_FILE = REF + "/anna-gpu-lammps/bcc_fe/fe_adp_potential_2310.anna"


@pytest.fixture(scope="session")
def fe_pot():
    from meng_zhang_tpu.io.potential import read_ann
    return read_ann(FE_ANN)


@pytest.fixture(scope="session")
def ni_pot():
    from meng_zhang_tpu.io.potential import read_ann
    return read_ann(NI_ANN)


@pytest.fixture(scope="session")
def anna_pot():
    from meng_zhang_tpu.io.potential import read_anna
    return read_anna(ANNA_FILE)


def perturbed_bcc(n_cells=2, a=2.8553, seed=0, disp=0.12):
    """Small periodic bcc box with random displacements (keeps forces nonzero)."""
    rng = np.random.default_rng(seed)
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    cells = np.array([[i, j, k] for i in range(n_cells)
                      for j in range(n_cells) for k in range(n_cells)])
    x = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a
    x += rng.normal(scale=disp, size=x.shape)
    box = np.full(3, n_cells * a)
    return x, box


def perturbed_fcc(n_cells=2, a=3.52, seed=0, disp=0.1):
    rng = np.random.default_rng(seed)
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                      [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    cells = np.array([[i, j, k] for i in range(n_cells)
                      for j in range(n_cells) for k in range(n_cells)])
    x = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a
    x += rng.normal(scale=disp, size=x.shape)
    box = np.full(3, n_cells * a)
    return x, box
