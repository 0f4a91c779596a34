"""Smoke tests for the example workflows (fast subset)."""
import os
import sys

import numpy as np
import pytest

EXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     'examples')
sys.path.insert(0, EXDIR)


def test_train_hill_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train_hill
    fem = train_hill.main(plot=False)
    assert np.isfinite(fem.glob['sig']).all()
    assert abs(fem.glob['eps'][1] - 0.002) < 1e-6


def test_train_j2_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train_j2
    mat = train_j2.main(plot=False)
    # exported UMAT parameter file written
    assert (tmp_path / 'models').exists()
    assert any(f.name.endswith('-svm.csv')
               for f in (tmp_path / 'models').iterdir())
    assert abs(mat.propJ2['stx']['ys'] - 60.) < 3.


def test_train_hardening_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train_hardening
    mat = train_hardening.main(plot=False)
    assert mat.whdat


def test_train_goss_barlat_example(tmp_path, monkeypatch):
    """The most fragile reference-mirroring workflow: Barlat Yld2004-18p
    yield stresses by fsolve, Data import, SVC training, inclusion FEA."""
    monkeypatch.chdir(tmp_path)
    import train_goss_barlat
    mat_ml = train_goss_barlat.main(plot=False)
    assert mat_ml.ML_yf
    # the learned locus reproduces the Barlat uniaxial-x yield stress
    from scipy.optimize import fsolve
    su = np.array([[1., 0., 0., 0., 0., 0.]])
    x = fsolve(mat_ml.find_yloc, np.array([50.]), args=(su,), xtol=1e-4)
    assert 35. < x[0] < 75.


def test_active_learning_qbc_example(tmp_path, monkeypatch):
    """Query-by-committee active learning (seeded, small committee)."""
    monkeypatch.chdir(tmp_path)
    import active_learning_qbc
    mat = active_learning_qbc.main(n_members=3, n_queries=1, Nlc_init=24,
                                   seed=42)
    assert mat.ML_yf and mat.svm_yf is not None


def test_train_texture_example(tmp_path, monkeypatch):
    """Texture-interpolating SVC over 5 GSH-described textures."""
    monkeypatch.chdir(tmp_path)
    import train_texture
    mat = train_texture.main(gridsearch=False)
    assert mat.Nset == 5
    from scipy.optimize import fsolve
    s = np.array([[1., 0., 0., 0., 0., 0.]])
    for tex, sy in [([0.25, 0.05, 0.00], 85.), ([0.00, 0.05, 0.35], 125.)]:
        x = fsolve(lambda t: mat.find_yloc(t, s, tex=np.asarray(tex)),
                   np.array([sy]), xtol=1e-4)
        assert abs(x[0] - sy) < 0.25 * sy


@pytest.mark.skipif(
    not os.path.exists('/root/reference/examples/Train_CPFEM/'
                       'Data_Random_Texture_Test.json'),
    reason='CPFEM dataset not available')
def test_train_cpfem_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train_cpfem
    mat = train_cpfem.main(plot=False)
    assert mat is not None and mat.ML_yf


def test_notebooks_execute(tmp_path, monkeypatch):
    """All notebooks are valid nbformat-4 JSON; the fast ones execute
    end-to-end (headless)."""
    import json
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, 'show', lambda *a, **k: plt.close('all'))
    monkeypatch.chdir(tmp_path)
    nbdir = os.path.join(os.path.dirname(EXDIR), 'notebooks')
    names = sorted(os.listdir(nbdir))
    assert len(names) >= 8
    for name in names:
        nb = json.load(open(os.path.join(nbdir, name)))
        assert nb['nbformat'] == 4 and len(nb['cells']) > 2
        if name.startswith(('01_', '06_', '07_')):  # fast, fully executable subset
            ns = {}
            for cell in nb['cells']:
                if cell['cell_type'] == 'code':
                    exec(''.join(cell['source']), ns)
    plt.close('all')


def test_elastic_coefficients_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import elastic_coefficients
    C = elastic_coefficients.main(plot=False)
    assert C.shape == (6, 6)
    np.testing.assert_allclose(C, C.T, atol=1e-8)
    assert C[0, 0] > C[3, 3] > 0.


def test_device_characterization_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import device_characterization
    mat = device_characterization.main(Nel=4, plot=False)
    for sel in ('stx', 'sty', 'et2', 'ect'):
        assert np.isfinite(mat.propJ2[sel]['ys'])
        assert 80. < mat.propJ2[sel]['ys'] < 160.


def test_calibrate_plasticity_example(tmp_path, monkeypatch):
    """Inverse identification: the example asserts the identified material
    reproduces the hidden truth's directional yield stresses."""
    monkeypatch.chdir(tmp_path)
    import calibrate_plasticity
    calibrate_plasticity.main()  # raises on identification failure


def test_box3d_inclusion_example(tmp_path, monkeypatch):
    """3-D hex8 inclusion workload (beyond-reference capability): the
    example itself asserts inclusion-elasticity and composite
    strengthening; small mesh + few steps here for CI cost."""
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp
    import box3d_inclusion
    state, hist = box3d_inclusion.main(N=8, nsteps=4, plot=False,
                                       dtype=jnp.float64)
    assert np.isfinite(np.asarray(state.sig)).all()


def test_umat_model_zoo_roundtrip():
    """The committed pre-trained UMAT zoo (examples/UMAT/models/, the
    analogue of the reference's abq_ML-*-svm.csv artifacts) loads through
    from_MLparam and classifies inside/outside stress states correctly."""
    import pylabfea_tpu as FE
    zoo = os.path.join(EXDIR, "UMAT", "models")
    for name, sy in [('abq_ML-J2_C15_G25', 60.),
                     ('abq_ML-Hill-p1_C15_G25', 50.),
                     ('abq_ML-Goss-Barlat_C15_G25', 50.)]:
        mat = FE.Material(name)
        mat.from_MLparam(name, path=zoo)
        su = FE.load_cases(6, 12)
        yf_in = mat.calc_yf(0.5 * sy * su)
        yf_out = mat.calc_yf(2.0 * sy * su)
        frac_in = np.mean(yf_in < 0.)
        frac_out = np.mean(yf_out > 0.)
        assert frac_in > 0.9, f'{name}: {frac_in:.0%} inside classified'
        assert frac_out > 0.9, f'{name}: {frac_out:.0%} outside classified'


def test_umat_plot_sig_eps(tmp_path):
    """plot_sig_eps analogue: generates block-model results with the
    native UMAT kernel and renders the PEEQ/equivalent-stress curves."""
    pytest.importorskip('matplotlib')
    sys.path.insert(0, os.path.join(EXDIR, "UMAT"))
    try:
        import plot_sig_eps as pse
    finally:
        sys.path.pop(0)
    res = tmp_path / 'res.csv'
    pse.generate_results(str(res))
    out = pse.main(results=str(res))
    assert os.path.exists(out)
    dat = np.genfromtxt(str(res), names=True, delimiter=';')
    assert dat['PEEQ'].max() > 1e-3       # plastic flow in the curves
    assert dat['MISES'].max() > 40.
