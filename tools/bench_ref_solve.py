"""One-time measurement of the ACTUAL reference package's ``Model.solve()``
wall-clock on Hill-ML meshes (16^2 / 32^2 / 64^2), recorded to
``REF_SOLVE.json`` + ``REF_SOLVE_svc.npz`` at the repo root.

The reference (pyLabFEA v4.4.2, imported from /root/reference/src) executes
one Python-level substepped return map per element per equilibrium
iteration, plus dense-LU solves of the global system — a 64^2 ML solve
takes on the order of hours of single-core CPU, so this script is run ONCE
per machine and ``bench.py`` re-measures only the device side against the
recorded reference wall-clock (methodology recorded in the JSON).

The trained SVC parameters are exported so the device benchmark solves the
BVP with the IDENTICAL yield function (apples-to-apples), and the
reference's converged global stress is recorded for a parity check.

Run:  python tools/bench_ref_solve.py [N ...]     (default: 16 32 64)
"""
import json
import os
import sys
import time

import numpy as np

REF_SRC = '/root/reference/src'
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JSON_PATH = os.path.join(ROOT, 'REF_SOLVE.json')
SVC_PATH = os.path.join(ROOT, 'REF_SOLVE_svc.npz')

# benchmark BVP (matched by bench.py's device side):
# plane-strain square, uniaxial y-tension by displacement, Hill-ML SVC
EPS = 0.002
SY = 150.
HILL = [1.2, 1., 0.8, 1., 1., 1.]
E, NU = 200.e3, 0.3
SVC_C, SVC_G, NLC, NSEQ = 10., 2.5, 36, 4


def _import_reference():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    # the reference resolves its version from installed package metadata,
    # which a source-tree import does not have
    import importlib.metadata as _im
    _orig = _im.version
    _im.version = lambda name, _o=_orig: ('4.4.2' if name == 'pylabfea'
                                          else _o(name))
    import pylabfea as REF
    return REF


def train_reference_material(REF):
    mat_ref = REF.Material('Hill-ref')
    mat_ref.elasticity(E=E, nu=NU)
    mat_ref.plasticity(sy=SY, hill=HILL, sdim=6)
    mat_ml = REF.Material('Hill-ML')
    mat_ml.train_SVC(C=SVC_C, gamma=SVC_G, mat_ref=mat_ref, Nlc=NLC,
                     Nseq=NSEQ, Fe=0.6, Ce=0.99)
    return mat_ml


def export_svc(mat_ml):
    clf = mat_ml.svm_yf
    np.savez(SVC_PATH,
             support_vectors=clf.support_vectors_,
             dual_coef=clf.dual_coef_[0],
             intercept=float(clf.intercept_[0]),
             gamma=float(mat_ml.gam_yf),
             scale_seq=float(mat_ml.scale_seq),
             sy=SY, CV=np.asarray(mat_ml.CV, float),
             dev_only=bool(mat_ml.dev_only), eps=EPS)


def ref_solve_time(REF, mat_ml, N):
    fe = REF.Model(dim=2, planestress=False)
    fe.geom([2.], LY=2.)
    fe.assign([mat_ml])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(EPS * fe.leny, 'disp')
    fe.mesh(NX=N, NY=N)
    t0 = time.perf_counter()
    fe.solve()
    dt = time.perf_counter() - t0
    return dt, np.array(fe.glob['sig']), len(fe.sgl)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    REF = _import_reference()
    t0 = time.perf_counter()
    mat_ml = train_reference_material(REF)
    t_train = time.perf_counter() - t0
    export_svc(mat_ml)
    nsv = len(mat_ml.svm_yf.support_vectors_)
    print(f'reference SVC trained in {t_train:.1f}s, {nsv} SVs', flush=True)

    rec = {}
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as fh:
            rec = json.load(fh)
    rec.setdefault('methodology', (
        'wall-clock of pyLabFEA v4.4.2 Model.solve() (import from '
        '/root/reference/src) on an NxN plane-strain square, uniaxial '
        f'y-tension eps={EPS} by displacement, Hill-ML SVC material '
        f'(C={SVC_C}, gamma={SVC_G}, Nlc={NLC}, Nseq={NSEQ}); single '
        'process CPU as the reference ships. Measured once per machine by '
        'tools/bench_ref_solve.py; bench.py re-measures the device side '
        'each run against these recorded numbers.'))
    rec.setdefault('sizes', {})
    for N in sizes:
        dt, sig, nst = ref_solve_time(REF, mat_ml, N)
        # merge, don't replace: the per-size record may carry out-of-band
        # keys (notably 'converged_glob_sig', the faithful-f64 parity
        # anchor bench.py reads) that a re-run must not destroy
        rec['sizes'].setdefault(str(N), {}).update({
            'solve_s': round(dt, 2), 'glob_sig': sig.tolist(),
            'recorded_steps': nst, 'n_elements': N * N, 'nsv': nsv})
        print(f'reference N={N}: solve {dt:.1f}s ({nst} recorded steps), '
              f'glob sig={sig[:3]}', flush=True)
        with open(JSON_PATH, 'w') as fh:
            json.dump(rec, fh, indent=1)


if __name__ == '__main__':
    main()
