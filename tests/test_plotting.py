"""Smoke tests for the plotting layer (Agg backend, no display)."""
import matplotlib
matplotlib.use('Agg')

import numpy as np
import matplotlib.pyplot as plt

import pylabfea_tpu as FE


def _solved_model():
    mat1 = FE.Material(num=1)
    mat1.elasticity(E=100.e3, nu=0.3)
    mat2 = FE.Material(num=2)
    mat2.elasticity(E=200.e3, nu=0.3)
    mat2.plasticity(sy=150., khard=500., sdim=6)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom([1., 1.], LY=2.)
    fe.assign([mat1, mat2])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.02 * fe.leny, 'disp')
    fe.mesh(NX=4, NY=4)
    fe.solve()
    return fe


def test_model_field_plots(tmp_path):
    fe = _solved_model()
    for fsel in ('stress2', 'seq', 'seqJ2', 'peeq', 'etot', 'ux', 'uy',
                 'mat', 'strain1', 'plastic2', 'stress12'):
        fig, ax = fe.plot(fsel, mag=5, showfig=False)
        plt.close(fig)
    fe.plot('stress2', mag=5, showfig=False, file=str(tmp_path / 'field'))
    assert (tmp_path / 'field.pdf').exists()
    plt.close('all')


def test_model_plot_1d():
    mat = FE.Material()
    mat.elasticity(E=100.e3, nu=0.3)
    fe = FE.Model(dim=1)
    fe.geom([2.])
    fe.assign([mat])
    fe.bcleft(0.)
    fe.bcright(0.01 * fe.lenx, 'disp')
    fe.mesh(NX=5)
    fe.solve()
    fig, ax = fe.plot('stress1', showfig=False)
    plt.close(fig)
    plt.close('all')


def test_material_yield_locus_plot(tmp_path):
    mat = FE.Material('hill')
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., hill=[0.7, 1., 1.4], sdim=3)
    mat.plot_yield_locus(iso=True, file=str(tmp_path / 'yl'))
    assert (tmp_path / 'yl.pdf').exists()
    plt.close('all')


def test_polar_plot_and_ellipsis(tmp_path):
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=100., sdim=6)
    mat = FE.Material('ml')
    mat.dev_only = False
    mat.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=40, Nseq=4)
    mat.polar_plot_yl(Na=24, show=False, file=str(tmp_path / 'polar'))
    assert (tmp_path / 'polar.pdf').exists()
    x, y = mat.ellipsis(n=16)
    assert len(x) == len(y) > 16
    plt.close('all')


def test_stress_strain_plot():
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., khard=1000., sdim=3)
    mat.calc_properties(eps=0.01, load_cases=['stx'])
    mat.plot_stress_strain()
    plt.close('all')


def test_data_plot_methods():
    """Smoke the Data plotting suite on the CPFEM set (headless Agg):
    training-data scatter, stress-strain curves, yield-stress polar
    scatter, flow-stress locus, and the per-set overview."""
    import os
    import pytest
    DATA = ("/root/reference/examples/Train_CPFEM/"
            "Data_Random_Texture_Test.json")
    if not os.path.exists(DATA):
        pytest.skip("reference CPFEM dataset not available")
    import matplotlib.pyplot as plt
    db = FE.Data(DATA, epl_crit=2.e-3, epl_start=1.e-3, epl_max=0.03,
                 wh_data=True)
    for call in (db.plot_training_data,
                 db.plot_stress_strain,
                 db.plot_yield_stress,
                 db.plot_yield_locus,
                 db.plot_set):
        call()
        plt.close('all')
