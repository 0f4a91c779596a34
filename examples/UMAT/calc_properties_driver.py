"""Swept-angle property extraction through the Abaqus ``umat_`` entry point.

Replays the reference's Abaqus driver workflow (reference
examples/UMAT/calc_properties.py:1-235: loop over load angles in the
sigma_1-sigma_2 plane, run the single-element model, extract stress /
strain / SDV at the yield onset) WITHOUT Abaqus: the material point is
driven directly through the Fortran-ABI ``umat_`` symbol of
``native/libmlumat.so`` — the exact code an Abaqus build would call —
under mixed stress control (Newton on the consistent tangent holds the
stress ray at the target angle while the load grows).

For each angle the driver records the stress at the critical plastic
strain (epc from the exported metadata) — the yield locus the reference
plots from its ODB extraction.

Usage:  python calc_properties_driver.py <params.csv> [nang]
Writes ``umat_properties.json`` next to the CSV.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from pylabfea_tpu.utils import native  # noqa: E402


def drive_angle(nm, ang, epc, seq_max=350., nsteps=400):
    """Drive one material point along the stress ray (cos a, sin a) in the
    principal sigma_1-sigma_2 plane (Abaqus component order); returns the
    stress history and the stress at PEEQ = epc.

    The load is applied as elastic-compliance-proportional strain steps
    deps = S (dsig su): the stress follows the ray exactly while elastic
    and settles on the yield locus after onset (the consistent tangent of
    a non-hardening flow rule is singular along the flow direction, so
    direct Newton stress control cannot cross the locus — the same reason
    the reference's Abaqus runs are displacement/load-increment driven)."""
    target = np.array([np.cos(ang), np.sin(ang), 0., 0., 0., 0.])
    # elastic stiffness from a zero-increment probe (elastic branch tangent)
    _, _, CV, _, _ = nm.umat(np.zeros(6), np.zeros(14), np.zeros(6))
    deps_step = np.linalg.solve(CV, target * seq_max / nsteps)
    stress = np.zeros(6)
    statev = np.zeros(14)
    sse = spd = 0.
    hist = []
    sig_y = None
    # keep straining past nsteps (up to 10x) until the critical plastic
    # strain is crossed — non-hardening materials accumulate PEEQ slowly
    # right at onset
    for it in range(nsteps * 10):
        stress, statev, dd, sse, spd = nm.umat(stress, statev, deps_step,
                                               sse=sse, spd=spd)
        peeq = statev[6]
        hist.append((stress.copy(), peeq))
        if sig_y is None and peeq >= epc:
            sig_y = stress.copy()
        if peeq > 3. * epc or (sig_y is None and it >= nsteps
                               and peeq < 1e-12):
            break
    return hist, sig_y


def main(csv_path, nang=12):
    nm = native.NativeMLMaterial(csv_path)
    meta_path = csv_path.replace('-svm.csv', '-svm_meta.json')
    epc = 2.e-3
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            epc = float(json.load(fh).get('epc', epc))
    out = {'epc': epc, 'angles_deg': [], 'sig_yield': []}
    for k in range(nang):
        ang = 2. * np.pi * k / nang
        hist, sig_y = drive_angle(nm, ang, epc)
        out['angles_deg'].append(np.degrees(ang))
        out['sig_yield'].append(sig_y.tolist() if sig_y is not None
                                else None)
        sy_str = np.round(sig_y[:2], 2) if sig_y is not None else 'n/a'
        print(f'angle {np.degrees(ang):6.1f} deg: sig_yield = {sy_str}')
    dst = os.path.join(os.path.dirname(os.path.abspath(csv_path)),
                       'umat_properties.json')
    with open(dst, 'w') as fh:
        json.dump(out, fh, indent=1)
    print('wrote', dst)
    return out


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 12)
