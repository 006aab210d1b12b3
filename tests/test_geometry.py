"""Geometry generator + LAMMPS data I/O tests."""
import numpy as np

from meng_zhang_tpu.geometry.lattice import (bcc, euler_matrix_reference,
                                             orient_box_lengths,
                                             orientation_matrix,
                                             oriented_crystal)
from meng_zhang_tpu.geometry.screw import (DEFAULT_NUM_LATTICE, DEFAULT_ORIENT,
                                           make_screw_dislocation,
                                           screw_displacement)
from meng_zhang_tpu.geometry.stgb import make_stgb
from meng_zhang_tpu.io.lammps_data import LammpsData, read_data, write_data
from meng_zhang_tpu.units import A_BCC_FE


def test_orientation_matrix_equiv_reference_euler():
    """Our row matrix R aligns each box axis with the *exact* requested
    crystal direction; the reference's Euler construction may pick a
    different member of the same <hkl> family (e.g. (-1,-1,2) for (-1,1,-2)),
    which yields a crystallographically equivalent box. Check both
    properties."""
    for orient in [DEFAULT_ORIENT, ((-1, 1, -2), (1, -1, -1), (1, 1, 0)),
                   ((1, 0, 0), (0, 1, 0), (0, 0, 1))]:
        o = np.asarray(orient, float)
        r = orientation_matrix(orient)
        # exact alignment for our construction
        for i in range(3):
            np.testing.assert_allclose(r @ (o[i] / np.linalg.norm(o[i])),
                                       np.eye(3)[i], atol=1e-12)
        # reference Euler path: proper rotation, axes in the same families
        e = euler_matrix_reference(r)
        np.testing.assert_allclose(e @ e.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(e), 1.0, atol=1e-12)
        for i in range(3):
            fam_ref = np.sort(np.abs(e.T @ np.eye(3)[i]) * np.linalg.norm(o[i]))
            fam_ours = np.sort(np.abs(o[i]))
            np.testing.assert_allclose(fam_ref, fam_ours, atol=1e-9)


def test_oriented_crystal_density():
    """Atom count should match bcc density * box volume."""
    orient = DEFAULT_ORIENT
    lb = orient_box_lengths(orient, (6, 6, 2))
    x = oriented_crystal(orient, lb)
    vol = np.prod(lb)
    expect = 2.0 / A_BCC_FE ** 3 * vol
    assert abs(len(x) - expect) / expect < 0.03
    assert np.all(x >= -1e-9) and np.all(x <= lb + 1e-9)


def test_oriented_crystal_preserves_nn_distance():
    """Rotation must preserve the bcc nearest-neighbor distance."""
    orient = DEFAULT_ORIENT
    lb = orient_box_lengths(orient, (4, 4, 1))
    x = oriented_crystal(orient, lb)
    # pick an interior atom, find its nearest neighbor
    center = lb / 2
    i = np.argmin(np.linalg.norm(x - center, axis=1))
    d = np.linalg.norm(x - x[i], axis=1)
    d[i] = 1e9
    nn = d.min()
    np.testing.assert_allclose(nn, np.sqrt(3) / 2 * A_BCC_FE, rtol=1e-6)


def test_screw_generator_counts_and_types():
    data = make_screw_dislocation(num_lattice=(8, 12, 0.5))
    lb = orient_box_lengths(DEFAULT_ORIENT, (8, 12, 0.5))
    np.testing.assert_allclose(data.box, lb)
    assert data.n > 500
    assert set(np.unique(data.types)) <= {1, 2}
    # boundary shell is type 2
    center = lb / 2
    dis = np.linalg.norm(data.x - center, axis=1)
    assert np.all(data.types[dis >= 60.0] == 2)
    assert np.all(data.types[dis < 60.0] == 1)


def test_screw_displacement_field():
    data = make_screw_dislocation(num_lattice=(6, 10, 0.5),
                                  with_dislocation=True)
    ref = make_screw_dislocation(num_lattice=(6, 10, 0.5))
    # same xy lattice, z displaced by at most |b|
    b = np.sqrt(3) / 2 * A_BCC_FE
    dz = np.abs(data.x[:, 2] - ref.x[:, 2])
    assert dz.max() <= b + 1e-9
    assert dz.max() > 0.5 * b          # winding reaches near-full Burgers
    np.testing.assert_allclose(data.x[:, :2], ref.x[:, :2])


def test_screw_displacement_winding():
    """u_z jumps by b across the branch cut: a loop around the core
    accumulates one Burgers vector."""
    b = np.sqrt(3) / 2 * A_BCC_FE
    th = np.linspace(0.01, 2 * np.pi - 0.01, 100)
    loop = np.stack([10 * np.cos(th) + 50, 10 * np.sin(th) + 50,
                     np.zeros_like(th)], axis=1)
    uz = screw_displacement(loop, np.array([50.0, 50.0]), b)
    assert abs((uz.max() - uz.min()) - b * (1 - 0.02 / (2 * np.pi))) < 0.01 * b


def test_stgb_mirror():
    data = make_stgb(length_box=(12.0, 14.0, 10.0))
    lx = 12.0
    g1 = data.x[data.types == 1]
    g2 = data.x[data.types == 2]
    assert len(g1) == len(g2)
    # mirror property: sorted x-coords reflect around Lx
    np.testing.assert_allclose(np.sort(2 * lx - g2[:, 0]), np.sort(g1[:, 0]),
                               atol=1e-9)
    assert data.box_hi[0] == 2 * lx


def test_stgb_overlap_pruning():
    raw = make_stgb(length_box=(12.0, 14.0, 10.0))
    pruned = make_stgb(length_box=(12.0, 14.0, 10.0), delete_overlap=1.2)
    assert pruned.n <= raw.n
    # no remaining pair closer than the cutoff across the boundary
    x = pruned.x
    box = pruned.box
    for xc in x[np.abs(x[:, 0] - 12.0) < 2.0]:
        d = x - xc
        d -= box * np.round(d / box)
        r2 = np.sum(d * d, axis=1)
        r2[r2 < 1e-12] = 1e9
        assert r2.min() > 1.2 ** 2 * 0.99


def test_lammps_data_roundtrip(tmp_path):
    data = make_screw_dislocation(num_lattice=(4, 6, 0.5))
    data.v = np.random.default_rng(0).normal(size=(data.n, 3))
    data.masses = np.array([55.847, 55.847])
    p = str(tmp_path / "t.dat")
    write_data(p, data)
    d2 = read_data(p)
    assert d2.n == data.n
    assert d2.n_types == 2
    np.testing.assert_allclose(d2.x, data.x, rtol=1e-9)
    np.testing.assert_array_equal(d2.types, data.types)
    np.testing.assert_allclose(d2.v, data.v, rtol=1e-9)
    np.testing.assert_allclose(d2.masses, data.masses)
    np.testing.assert_allclose(d2.box, data.box)


def test_read_data_nonzero_origin(tmp_path):
    """Boxes with nonzero xlo/ylo/zlo (shrink-wrapped/centered) must land in
    the engine's [0, box) frame on read and round-trip back exactly."""
    p = str(tmp_path / "o.dat")
    with open(p, "w") as f:
        f.write("# centered box\n2 atoms\n1 atom types\n"
                "-5.0 5.0 xlo xhi\n-2.5 7.5 ylo yhi\n-10.0 0.0 zlo zhi\n"
                "\nAtoms # atomic\n\n"
                "1 1 -4.0 -2.0 -9.0\n2 1 4.0 7.0 -1.0\n")
    d = read_data(p)
    np.testing.assert_allclose(d.box, [10.0, 10.0, 10.0])
    np.testing.assert_allclose(d.x, [[1.0, 0.5, 1.0], [9.0, 9.5, 9.0]])
    assert np.all(d.x >= 0.0) and np.all(d.x < d.box)
    p2 = str(tmp_path / "o2.dat")
    write_data(p2, d)
    d2 = read_data(p2)
    np.testing.assert_allclose(d2.x, d.x, rtol=1e-12)
    np.testing.assert_allclose(d2.box_lo, d.box_lo)


def test_native_reader_matches_python(tmp_path):
    """C++ reader (native/libmzt.so) vs the pure-Python parser."""
    from meng_zhang_tpu.io import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    import os
    data = make_screw_dislocation(num_lattice=(4, 6, 0.5))
    data.v = np.random.default_rng(1).normal(size=(data.n, 3))
    p = str(tmp_path / "n.dat")
    write_data(p, data)
    nat = native.read_data_native(p)
    assert nat is not None
    x, types, v, masses, lo, hi, ntypes = nat
    np.testing.assert_allclose(x, data.x, rtol=1e-9)
    np.testing.assert_array_equal(types, data.types)
    np.testing.assert_allclose(v, data.v, rtol=1e-9)
    assert ntypes == 2
