"""Experiment: does a denser-trained benchmark SVC shrink the fast-vs-
faithful FE-solve parity bar (VERDICT r4 item 7)?

Trains the REF_SOLVE benchmark SVC at several (Nlc, Nseq) densities using
the REFERENCE package's own trainer (same as tools/bench_ref_solve.py),
then solves the benchmark BVP with BOTH device paths — production fast-f32
(gated) and reference-faithful f64 — and reports the max-component global
stress deviation.  CPU-only (f64 needed); run with JAX_PLATFORMS=cpu.

Usage: python tools/dbg_ref_parity.py [N]   (default 16)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sys.path.insert(0, '/root/reference/src')
    import importlib.metadata as _im
    _orig = _im.version
    _im.version = lambda name, _o=_orig: ('4.4.2' if name == 'pylabfea'
                                          else _o(name))
    import pylabfea as REF

    import jax
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops.svc import SVCParams, reduce_svc

    EPS, SY, HILL = 0.002, 150., [1.2, 1., 0.8, 1., 1., 1.]

    def train(Nlc, Nseq, C=10., gam=2.5):
        mat_ref = REF.Material('Hill-ref')
        mat_ref.elasticity(E=200.e3, nu=0.3)
        mat_ref.plasticity(sy=SY, hill=HILL, sdim=6)
        mat_ml = REF.Material('Hill-ML')
        t0 = time.perf_counter()
        mat_ml.train_SVC(C=C, gamma=gam, mat_ref=mat_ref, Nlc=Nlc,
                         Nseq=Nseq, Fe=0.6, Ce=0.99)
        log(f'  trained Nlc={Nlc} Nseq={Nseq}: '
            f'{len(mat_ml.svm_yf.support_vectors_)} SVs '
            f'({time.perf_counter() - t0:.0f}s)')
        return mat_ml

    def solve_pair(mat_ml):
        p = SVCParams(support_vectors=np.array(mat_ml.svm_yf.support_vectors_),
                      dual_coef=np.array(mat_ml.svm_yf.dual_coef_[0]),
                      intercept=float(mat_ml.svm_yf.intercept_[0]),
                      gamma=float(mat_ml.gam_yf))
        host = FE.Material('m')
        host.elasticity(CV=np.asarray(mat_ml.CV, float))
        host.plasticity(sy=SY, sdim=6)
        host._svc = p
        host.ML_yf = True
        host.dev_only = bool(mat_ml.dev_only)
        host.scale_seq = float(mat_ml.scale_seq)
        host.Ndof = 6
        CV = np.asarray(mat_ml.CV, float)
        out = {}
        for tag, dtype, fast, compress in (
                ('fast-f32', jnp.float32, True, 'auto'),
                ('faithful-f64', jnp.float64, False, None)):
            dm = con.device_material_from(host, dtype=dtype,
                                          compress=compress)
            md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=EPS,
                               dtype=dtype)
            t0 = time.perf_counter()
            st, hist = fek.solve_uniaxial(md, dm, CV, nsteps=8, n_inner=2,
                                          dtype=dtype, gate=True,
                                          fast=fast)
            sig = np.asarray(hist[-1][0], float)
            out[tag] = sig
            nsv = dm.sv.shape[0]
            log(f'  {tag}: glob_sig[:3] = {sig[:3].round(4)} '
                f'(nsv {nsv}, {time.perf_counter() - t0:.0f}s)')
        d = np.abs(out['fast-f32'] - out['faithful-f64'])
        ref = max(1., np.abs(out['faithful-f64']).max())
        log(f'  parity: yy {d[1] / abs(out["faithful-f64"][1]):.2e}, '
            f'max {d.max() / ref:.2e}')
        return d.max() / ref

    for nlc, nseq in ((36, 4), (100, 6), (200, 8)):
        log(f'--- Nlc={nlc} Nseq={nseq}, mesh {N}x{N} ---')
        mat_ml = train(nlc, nseq)
        solve_pair(mat_ml)


if __name__ == '__main__':
    main()
