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


@pytest.mark.skipif(
    not os.path.exists('/root/reference/examples/Train_CPFEM/'
                       'Data_Random_Texture_Test.json'),
    reason='CPFEM dataset not available')
def test_train_cpfem_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train_cpfem
    mat = train_cpfem.main(plot=False)
    assert mat is not None and mat.ML_yf
