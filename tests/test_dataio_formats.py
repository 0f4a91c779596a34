"""Data pipeline format coverage: legacy 'Results' JSON, new-schema JSON,
GPa unit conversion, 'cyl' yield-onset records, JS component convention, and
plastic-strain reconstruction when the data carries none."""
import json

import numpy as np
import pytest

import pylabfea_tpu as FE


def _make_curve(direction, sy=100., E=200.e3, nu=0.3, n=120, emax=0.01,
                khard=1500.):
    """Synthetic uniaxial-ish stress/strain curves along a unit Voigt
    direction with elastic-plastic transition (isotropic J2 hardening)."""
    mat = FE.Material()
    mat.elasticity(E=E, nu=nu)
    mat.plasticity(sy=sy, khard=khard, sdim=6)
    CV = mat.CV
    SV = np.linalg.inv(CV)
    d = np.asarray(direction) / FE.sig_eq_j2(np.asarray(direction))
    eps_t, sig, epl = [], [], []
    seq_y = sy
    for e in np.linspace(0., emax, n):
        # stress along d with bilinear seq(e) response
        ee = e
        seq_el = E * ee  # effective 1-D modulus along the path
        if seq_el <= sy:
            seq = seq_el
            pe = 0.
        else:
            seq = sy + (seq_el - sy) * khard / (E + khard)
            pe = (seq_el - seq) / E
        s = d * seq
        ep = d * pe * 1.5  # deviatoric-ish plastic strain along d
        et = SV @ s + ep
        sig.append(s)
        epl.append(ep)
        eps_t.append(et)
    return np.array(sig), np.array(eps_t), np.array(epl)


def _legacy_block(sig, eps, epl=None, comp3='23'):
    res = {}
    comps = ['11', '22', '33', comp3, '13', '12']
    for k, c in enumerate(comps):
        res[f'S{c}'] = sig[:, k].tolist()
        res[f'E{c}'] = eps[:, k].tolist()
        if epl is not None:
            res[f'Ep{c}'] = epl[:, k].tolist()
    return {'Results': res}


def _new_block(sig, eps, epl=None, unit='MPa'):
    f = 0.001 if unit == 'GPa' else 1.
    block = {
        'stress': {f's{c}': (sig[:, k] * f).tolist()
                   for k, c in enumerate(['11', '22', '33', '23', '13', '12'])},
        'total_strain': {f'e{c}': eps[:, k].tolist()
                         for k, c in enumerate(['11', '22', '33', '23', '13',
                                                '12'])},
        'units': {'Stress': unit},
    }
    if epl is not None:
        block['plastic_strain'] = {
            f'ep{c}': epl[:, k].tolist()
            for k, c in enumerate(['11', '22', '33', '23', '13', '12'])}
    return block


def _dirs():
    rng = np.random.default_rng(3)
    ds = rng.normal(size=(6, 6))
    ds[:, 3:] *= 0.3
    return ds


def test_legacy_format(tmp_path):
    db = {}
    for i, d in enumerate(_dirs()):
        sig, eps, epl = _make_curve(d)
        db[f'lc_{i}_a_b_tx'] = _legacy_block(sig, eps, epl)
    p = tmp_path / 'legacy.json'
    p.write_text(json.dumps(db))
    data = FE.Data(str(p), epl_crit=2.e-3, epl_start=1.e-3, epl_max=8.e-3)
    assert data.mat_data['Nlc'] == 6
    assert 80. < data.mat_data['sy_av'] < 120.
    assert abs(data.mat_data['elast_const'][0, 0] - 269230.77) < 2000.


def test_new_schema_gpa_units(tmp_path):
    db = {}
    for i, d in enumerate(_dirs()):
        sig, eps, epl = _make_curve(d)
        db[f'lc_{i}_a_b_tx'] = _new_block(sig, eps, epl, unit='GPa')
    p = tmp_path / 'new.json'
    p.write_text(json.dumps(db))
    data = FE.Data(str(p), epl_crit=2.e-3, epl_start=1.e-3, epl_max=8.e-3)
    # GPa values must be converted back to MPa
    assert 80. < data.mat_data['sy_av'] < 120.


def test_plastic_strain_reconstruction(tmp_path):
    """Without plastic strains in the data, they are reconstructed from the
    fitted compliance (read_data path, reference data.py:684-703)."""
    db = {}
    for i, d in enumerate(_dirs()):
        sig, eps, epl = _make_curve(d)
        db[f'lc_{i}_a_b_tx'] = _new_block(sig, eps, epl=None)
    p = tmp_path / 'noepl.json'
    p.write_text(json.dumps(db))
    data = FE.Data(str(p), epl_crit=2.e-3, epl_start=1.e-3, epl_max=8.e-3)
    key = list(data.lc_data.keys())[0]
    rec = data.lc_data[key]['Strain_Plastic']
    assert rec is not None and np.isfinite(rec).all()
    assert 70. < data.mat_data['sy_av'] < 130.


def test_cyl_records_counted(tmp_path):
    db = {}
    dirs = _dirs()
    for i, d in enumerate(dirs[:4]):
        sig, eps, epl = _make_curve(d)
        db[f'lc_{i}_a_b_tx'] = _legacy_block(sig, eps, epl)
    # two yield-onset-only 'cyl' records
    for i, d in enumerate(dirs[4:]):
        du = d / FE.sig_eq_j2(d)
        db[f'cyl_{i}_a_b_tx'] = {'Results': (du * 100.).tolist()}
    p = tmp_path / 'cyl.json'
    p.write_text(json.dumps(db))
    data = FE.Data(str(p), epl_crit=2.e-3, epl_start=1.e-3, epl_max=8.e-3)
    assert data.mat_data['Ncyl'] == 2
    assert len(data.mat_data['sig_ideal']) == 6  # 4 parsed + 2 cyl


def test_js_mode_component_swap(tmp_path):
    """mode='JS' reads S32 instead of S23 and parses 8-field keys."""
    d = _dirs()[0]
    sig, eps, epl = _make_curve(d)
    db = {'Us_A2_h1_512_8_o1_x_TxR': _legacy_block(sig, eps, epl,
                                                   comp3='32')}
    p = tmp_path / 'js.json'
    p.write_text(json.dumps(db))
    data = FE.Data(str(p), epl_crit=2.e-3, epl_start=1.e-3, epl_max=8.e-3,
                   mode='JS')
    assert data.mat_data['tx_key'] == 'o1'
    np.testing.assert_allclose(
        data.lc_data['Us_A2_h1_512_8_o1_x_TxR']['Stress'][-1], sig[-1],
        rtol=1e-12)
