"""Golden-value tests for the `.ann`/`.anna` parsers against the shipped
reference potential files (values quoted from the files themselves)."""
import numpy as np

from meng_zhang_tpu.io.potential import (ActivationStyle, read_ann, write_ann,
                                         SYM_CHEBYSHEV)


def test_fe_header(fe_pot):
    p = fe_pot
    assert p.elements == ("Fe",)
    assert (p.ntl, p.nhl, p.nnod, p.nsf, p.npsf, p.ntsf) == (4, 2, 10, 28, 9, 19)
    assert p.cut == 6.5
    assert p.flagsym == SYM_CHEBYSHEV
    assert p.norm_style == "gaussian"
    assert p.networks[0].flagact == (4, 4, 0)
    assert p.networks[0].act_style == ActivationStyle.FE
    np.testing.assert_allclose(p.e_scale, 0.80684104305538540)
    np.testing.assert_allclose(p.e_shift, -1019.0781365280557)
    np.testing.assert_allclose(p.e_atom, -3460.0)
    # normalization row golden values (file lines 12-13)
    np.testing.assert_allclose(p.norm_row0[0], 347.367726795125)
    np.testing.assert_allclose(p.norm_row1[-1], 26.355680224296)
    # weight golden values
    np.testing.assert_allclose(p.networks[0].weights[0][0, 0], -0.146897379)
    np.testing.assert_allclose(p.networks[0].weights[2][0, 0], -1.304599506)
    np.testing.assert_allclose(p.networks[0].biases[2][0], 3.027010166)
    assert p.networks[0].weights[0].shape == (10, 28)
    assert p.networks[0].weights[1].shape == (10, 10)
    assert p.networks[0].weights[2].shape == (1, 10)


def test_fe_scale_matches_reference_formula(fe_pot):
    # scale = 1/sqrt(cov - avg^2)  (fe/src/pair_annp.cpp:98-108)
    var = fe_pot.norm_row0 - fe_pot.norm_row1 ** 2
    np.testing.assert_allclose(fe_pot.sf_scale, 1.0 / np.sqrt(var))


def test_fe_v2_identical_potential(fe_pot):
    p2 = read_ann("/root/reference/annp-gpu-lammps/fe_v2/fe_annp_potential_2.ann")
    for a, b in zip(p2.networks[0].weights, fe_pot.networks[0].weights):
        np.testing.assert_array_equal(a, b)


def test_ni_header(ni_pot):
    p = ni_pot
    assert p.elements == ("Ni",)
    assert (p.ntl, p.nnod, p.nsf, p.npsf, p.ntsf) == (4, 24, 27, 3, 24)
    assert p.norm_style == "minmax"
    assert p.networks[0].act_style == ActivationStyle.NI
    assert p.sym_coerad.shape == (3, 3)
    assert p.sym_coeang.shape == (24, 4)
    np.testing.assert_allclose(p.sym_coerad[:, 0], [0.01, 0.02, 0.05])
    np.testing.assert_allclose(p.sym_coerad[:, 2], 7.3699319)
    np.testing.assert_allclose(p.sym_coeang[-1], [0.05, 1.0, 16.0, 7.3699319])
    # min-max scale
    np.testing.assert_allclose(p.sf_scale, 1.0 / (p.norm_row1 - p.norm_row0))


def test_anna_header(anna_pot):
    p = anna_pot
    assert (p.ntl, p.nhl, p.nnod, p.nout, p.nsf, p.npsf, p.ntsf) == (4, 2, 6, 2, 28, 9, 19)
    assert p.cut == 5.055
    np.testing.assert_allclose(p.e_base, -4473.0075)
    np.testing.assert_allclose(p.e_scale, 1.0)
    assert p.gparams.shape == (17,)
    np.testing.assert_allclose(p.A0, -9.46e-04)
    np.testing.assert_allclose(p.hc, 1.65)
    np.testing.assert_allclose(p.q3, 0.1086)
    assert p.networks[0].weights[2].shape == (2, 6)
    assert p.networks[0].biases[2].shape == (2,)
    assert p.networks[0].act_style == ActivationStyle.ANNA


def test_ann_roundtrip(tmp_path, fe_pot):
    out = tmp_path / "rt.ann"
    write_ann(str(out), fe_pot)
    p2 = read_ann(str(out))
    assert p2.networks[0].flagact == fe_pot.networks[0].flagact
    assert p2.norm_style == fe_pot.norm_style
    np.testing.assert_allclose(p2.e_scale, fe_pot.e_scale)
    for a, b in zip(p2.networks[0].weights, fe_pot.networks[0].weights):
        np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(p2.norm_row0, fe_pot.norm_row0)


def test_ann_roundtrip_ni(tmp_path, ni_pot):
    out = tmp_path / "rt_ni.ann"
    write_ann(str(out), ni_pot)
    p2 = read_ann(str(out))
    assert p2.norm_style == "minmax"
    np.testing.assert_allclose(p2.sym_coeang, ni_pot.sym_coeang)
    for a, b in zip(p2.networks[0].weights, ni_pot.networks[0].weights):
        np.testing.assert_allclose(a, b)
