"""Precision-bisect harness for the 256^2 Hill-ML production workload.

Runs the ACCURACY.md tier-3 workload (256^2 uniaxial-y, eps_tot=0.004,
8 warm-started steps, n_inner=2) on the attached device in a configurable
precision mode and prints one JSON line with the final global stress and
wall time.  Used to locate the source of the f32 deviation (recorded
6.9e-3 vs the CPU-f64 ground truth 192.07449005) and to validate the
mixed-precision production configuration.

Modes (PYLABFEA_ACC_MODE):
  f32         production float32 (baseline)
  f32tol      float32 with a tightened CG tolerance (PYLABFEA_ACC_CGTOL)
  f64         full float64 (x64 enabled; TPU runs emulated f64)
  mixed       float32 kernels with the mixed-precision solver options

Run:  PYLABFEA_ACC_MODE=f64 python tools/acc_mixed.py [N]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

MODE = os.environ.get('PYLABFEA_ACC_MODE', 'f32')
CGTOL = os.environ.get('PYLABFEA_ACC_CGTOL')
NSUB = int(os.environ.get('PYLABFEA_ACC_NSUB', '4'))
GATE = os.environ.get('PYLABFEA_ACC_GATE') == '1'
N = int(sys.argv[1]) if len(sys.argv) > 1 else 256

import jax  # noqa: E402

if MODE in ('f64', 'mixed'):
    # 'mixed' keeps every array float32 but enables x64 so the
    # iterative-refinement residual (fe_kernels.refine_du) can widen
    jax.config.update('jax_enable_x64', True)
if os.environ.get('PYLABFEA_ACC_CPU') == '1':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# NOTE: the round-2 ACCURACY row compared a 128^2/10-step CPU-f64 run
# (192.074) against a 256^2/8-step TPU-f32 run (193.39) — different
# discretizations.  This harness runs IDENTICAL configs in every mode so
# deviations measure precision only.


def main():
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops import constitutive as con

    dtype = jnp.float64 if MODE == 'f64' else jnp.float32
    # the tier-3 verification material: analytic anisotropic Hill
    hmat = FE.Material()
    hmat.elasticity(E=200.e3, nu=0.3)
    hmat.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    mat = con.device_material_from(hmat, dtype=dtype)
    CV = np.asarray(hmat.CV)
    cg_tol = float(CGTOL) if CGTOL else None

    md = fek.rect_mesh(N, N, uniax='y', eps_tot=0.004, dtype=dtype)
    t0 = time.perf_counter()
    st, hist = fek.solve_uniaxial(md, mat, CV, nsteps=8, n_inner=2,
                                  dtype=dtype, cg_tol=cg_tol, nsub=NSUB,
                                  gate=GATE,
                                  n_refine=1 if MODE == 'mixed' else 0)
    sig = np.asarray(hist[-1][0], np.float64)
    dt = time.perf_counter() - t0
    print(json.dumps({
        'mode': MODE, 'N': N, 'cg_tol': cg_tol, 'nsub': NSUB, 'gate': GATE,
        'platform': jax.devices()[0].platform,
        'sig_yy': float(sig[1]), 'sig': sig.tolist(),
        'wall_s': round(dt, 2)}))


if __name__ == '__main__':
    main()
