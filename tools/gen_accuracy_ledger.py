"""Generate ACCURACY.md: the measured accuracy ledger of the device path.

Runs the reference's hardest golden workloads through the DEVICE solver
(jitted kernels, float64, adaptive host-mirroring driver) and records the
deviations against the reference golden values and the host parity profile.
The f32-on-TPU section collects the measured deviations of the production
(real-chip) configuration from BENCH_NOTES / verification runs.

Run from the repo root:  python tools/gen_accuracy_ledger.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu import bridge  # noqa: E402
from pylabfea_tpu.ops import constitutive as con  # noqa: E402


def bcnode_rows():
    NX = NY = 18
    el = np.ones((NX, NY))
    el[6:12, 6:12] = 2
    mat1 = FE.Material(num=1)
    mat1.elasticity(E=100.e3, nu=0.27)
    mat2 = FE.Material(num=2)
    mat2.elasticity(E=3.e3, nu=0.3)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom(sect=2, LX=4., LY=4.)
    fe.assign([mat1, mat2])
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bcleft(0., 'force')
    fe.bctop(0.01 * fe.leny, 'disp')
    fe.mesh(elmts=el, NX=NX, NY=NY)
    noc = np.nonzero([no in fe.nobot for no in fe.noleft])[0]
    fe.bcnode(noc, 0., 'disp', 'x')
    bridge.solve_on_device(fe, nsteps=1, n_inner=1, dtype=jnp.float64)
    gold = {
        'u[684]': (-9.730777232237817e-3, fe.u[684]),
        'element[0].sig[5]': (2.2990816342732256, fe.element[0].sig[5]),
        'element[97].sig[0]': (45.68020736256676, fe.element[5 * NY + 7].sig[0]),
        'element[115].sig[1]': (69.16252458086865, fe.element[6 * NY + 7].sig[1]),
    }
    rows = []
    for k, (ref, dev) in gold.items():
        rows.append((f'bcnode inclusion (2 materials, force edges): {k}',
                     ref, dev))
    return rows


def ml_shear_rows():
    E, nu, sy = 200.e3, 0.3, 150.
    hill = [1.4, 1., 0.7, 1.2, .8, 1.]
    mat_h = FE.Material(name='Hill-shear')
    mat_h.elasticity(E=E, nu=nu)
    mat_h.plasticity(sy=sy, hill=hill, sdim=6)
    mat_mlh = FE.Material('Hill-ML')
    mat_mlh.train_SVC(C=2, gamma=0.5, mat_ref=mat_h, Nseq=4, Nlc=300,
                      Fe=0.7, Ce=0.95)
    mat_mlh.dev_only = False

    def build():
        fem = FE.Model(dim=2, planestress=True)
        fem.geom([2], LY=2.)
        fem.assign([mat_mlh])
        fem.bcbot(0., bctype='disp', bcdir='y')
        fem.bcbot(0., bctype='disp', bcdir='x')
        fem.bcleft(0., bctype='force')
        fem.bcright(0., bctype='force')
        fem.bctop(0.006 * fem.leny, bctype='disp', bcdir='x')
        fem.bctop(0., bctype='disp', bcdir='y')
        fem.mesh(NX=6, NY=3)
        return fem

    dev = build()
    bridge.solve_on_device_adaptive(dev, dtype=jnp.float64, fast=False)
    return [
        ('ML-Hill-6D shear FEA: glob sig_12 (ref golden 77.5377888...)',
         77.53778881971623, dev.glob['sig'][5]),
        ('ML-Hill-6D shear FEA: element[3].epl[5]',
         0.003942707316047761, dev.element[3].epl[5]),
        ('ML-Hill-6D shear FEA: element[3].sig[1]',
         43.9060552472426, dev.element[3].sig[1]),
    ]


def inclusion3_rows():
    NX = NY = 12
    el = np.ones((NX, NY))
    el[6:12, :] = 2
    el[4:8, 4:8] = 3

    def build():
        mh = FE.Material(num=1)
        mh.elasticity(E=200.e3, nu=0.3)
        mh.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
        mj = FE.Material(num=2)
        mj.elasticity(E=200.e3, nu=0.3)
        mj.plasticity(sy=150., sdim=6)
        me = FE.Material(num=3)
        me.elasticity(E=1.e3, nu=0.27)
        fe = FE.Model(dim=2, planestress=False)
        fe.geom(sect=3, LX=4., LY=4.)
        fe.assign([mh, mj, me])
        fe.bcbot(0.)
        fe.bcleft(0., 'force')
        fe.bcright(0., 'force')
        fe.bctop(0.003 * fe.leny, 'disp')
        fe.mesh(elmts=el, NX=NX, NY=NY)
        noc = np.nonzero([no in fe.nobot for no in fe.noleft])[0]
        fe.bcnode(noc, 0., 'disp', 'x')
        return fe

    host = build()
    host.solve()
    dev = build()
    bridge.solve_on_device_adaptive(dev, dtype=jnp.float64, fast=False)
    sig_h = np.array([e.sig for e in host.element])
    sig_d = np.array([e.sig for e in dev.element])
    epl_h = np.array([e.epl for e in host.element])
    epl_d = np.array([e.epl for e in dev.element])
    return [
        ('3-material elastoplastic inclusion: max |d sig| / max |sig|',
         0., np.abs(sig_d - sig_h).max() / np.abs(sig_h).max()),
        ('3-material elastoplastic inclusion: max |d epl|',
         0., np.abs(epl_d - epl_h).max()),
        ('3-material elastoplastic inclusion: max |d u|',
         0., np.abs(dev.u - host.u).max()),
    ]


def returnmap_rows():
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., hill=[0.7, 1., 1.4, 1., 1.2, 0.8], khard=100.,
                   sdim=6)
    dm = con.device_material_from(mat, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    CV = mat.CV
    sig = rng.normal(0., 50., (256, 6))
    epl = rng.normal(0., 1e-3, (256, 6))
    deps = rng.normal(0., 2e-3, (256, 6))
    fy_h, s_h, dp_h, g_h, _ = mat.response_batch(sig, epl, deps, CV)
    fy_d, s_d, dp_d, g_d = con.response(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV))
    return [
        ('Gauss-point return map (Hill-6p + WH, 256 random states): '
         'max |d sig|', 0., float(np.abs(np.asarray(s_d) - s_h).max())),
        ('Gauss-point return map: max |d depl|', 0.,
         float(np.abs(np.asarray(dp_d) - dp_h).max())),
    ]


HEADER = """# ACCURACY — measured device-path ledger

Generated by `tools/gen_accuracy_ledger.py` (re-run it to refresh; the f64
section executes the workloads; the f32 section records measured real-TPU
runs).

The parity claim has three tiers:

1. **Host profile** (`pylabfea_tpu.femodel` / `materials`, numpy f64):
   reproduces the reference bitwise on its golden test suite — all golden
   values of `tests/test_basic.py` / `tests/test_ml.py` are asserted at the
   reference's own tolerances in `tests/test_model.py`, `tests/test_ml.py`.
2. **Device path, float64** (jitted kernels on CPU, adaptive
   host-mirroring driver `bridge.solve_on_device_adaptive`): table below —
   meets the <= 1e-6 relative north-star on the golden workloads.
3. **Device path, float32 on TPU** (production configuration): deviation
   table below — element-field agreement ~2.5e-4 with one
   iterative-refinement pass (`n_refine=1`), and ref-solve max-component
   parity 7.1e-6 vs the converged faithful-f64 anchor when
   `load_step_split(commit_faithful=True)` (the round-5 bench
   configuration) finishes each step with the reference-faithful
   substepped return map; bounded by f32 arithmetic (HIGHEST-precision
   matmuls), NOT by the algorithms.

## Known semantic caveats (device vs reference)

* **sdim=3 anisotropic materials at strongly rotated stress states**: the
  reference assigns principal stresses to material axes through the raw
  `np.linalg.eig` eigenvalue order (basic.py:153-173), which is
  LAPACK-internal and irreproducible; the device uses the optimal
  eigenvector-axis alignment (`ops/jtensors.py:sig_princ_device`).  The two
  agree on principal/coaxial inputs and near-axis-aligned states (all golden
  workloads); they may differ on strongly rotated states, where the
  reference's own answer depends on LAPACK internals
  (tests/test_multimat.py::test_sdim3_response_parity).
* Tresca/Barlat/LHS analytic criteria run on the host profile only (the
  reference has no analytic flow gradient for them either).

## Device float64 vs reference goldens / host profile

| workload / quantity | reference | device f64 | abs dev | rel dev |
|---|---|---|---|---|
"""

F32_SECTION = """
## Production float32 — precision ledger (identical configs, round 3)

Every row below runs the IDENTICAL mesh / step count / solver config in
both precisions (device kernels, `tools/acc_mixed.py` and inline
harnesses, 2026-08-17), so deviations measure arithmetic alone — unlike
the round-2 table, which compared different discretizations.  Uniaxial
workload: Hill [0.7,1,1.4], sy=150, eps_tot=0.004, 8 warm-started steps,
production n_inner=2 / nsub=4.

| quantity (f32 vs f64, same config) | f64 | f32 | rel dev |
|---|---|---|---|
| 48^2 3-material inclusion (well-posed, tools/acc_field48.py), glob sig_yy | 126.085604 | 126.090385 | **3.8e-5** |
| ... element stress field, max deviation / max stress (plain f32) | — | — | 7.8e-4 |
| ... element stress field, max deviation (f32 + `n_refine=1`) | — | — | **2.5e-4** |
| ... element stress field, max deviation (f32 + `n_refine=1` + `commit_f64`) | — | — | 2.5e-4 |
| 256^2 uniax glob sig_yy (cg_tol 1e-6) | 188.18354 | 188.08086 | 5.5e-4 |
| 256^2 uniax glob sig_yy (cg_tol 1e-8) | 188.18354 | 188.14532 | 2.0e-4 |
| 256^2 linear-solve displacement error (elastic, vs f64 operator) | — | 1.8e-4 | kappa * eps_f32 |
| ... with one `n_refine` mixed-precision pass | — | 6.9e-8 | f32 repr. floor |
| converged (gated) equilibrium `|sig_xx|/sig_yy`, 16^2 | 2e-8 | 8e-5 | — |

Field-level accuracy (round 4): `tools/acc_field48.py` is the
reproducible harness for the 48^2 3-material inclusion rows (4 steps,
n_inner=2, identical configs).  One `n_refine` pass brings the max
ELEMENT-level stress deviation to 2.5e-4 (<= the 5e-4 target); the
`commit_f64` knob (one float64 re-integration of the committed response
per step, `load_step_split`) changes nothing further — the residual
deviation is the f32 equilibrium-iteration path (tangent/branch
decisions), not response arithmetic.

The `n_refine` knob (`fe_kernels.refine_du`) evaluates the true residual
in float64 against the UNROUNDED operator and re-solves the correction
with the same f32 multigrid hierarchy: one pass removes the
kappa-amplified operator-rounding error that CG-tolerance tightening
cannot (requires `jax_enable_x64`; on TPU the f64 work is one widened
K-apply per pass, not an f64 solve).

**Bifurcation caveat**: the homogeneous free-edge uniaxial workload is
symmetry-degenerate — at >= 256^2 float32 noise seeds a real
localization mode (element sig_zz spread 72..76.3, std 0.99, vs a
uniform field in f64 / at 16^2), moving the MEAN out-of-plane stress by
~1.8% while in-plane equilibrium quantities stay at ~5e-4.  That is a
property of the workload (an eigenmode of the homogeneous problem), not
solver error; the well-posed inclusion row above is the representative
precision figure.

Real-TPU rows (v5e, to re-measure after the round-3 secant-tangent
change — the pre-secant values no longer represent the shipped solver):
SVC yield-onset stress vs CPU f64 ~3e-5 (HIGHEST-precision matmuls; the
bf16 default was rejected at 3.5% error, see BENCH_NOTES.md); f64-on-TPU
(emulated) matched CPU f64 to 2.4e-13 at 256^2 in 377 s.

For <= 1e-6 work run the same device kernels in float64 (CPU, or TPU
emulation at ~100x), as the tier-2 table above does.
"""


def main():
    rows = []
    rows += bcnode_rows()
    rows += returnmap_rows()
    rows += inclusion3_rows()
    rows += ml_shear_rows()
    lines = [HEADER]
    for name, ref, dev in rows:
        adev = abs(dev - ref)
        rdev = adev / max(abs(ref), 1e-30) if ref != 0. else adev
        ref_s = f'{ref:.12g}' if ref != 0. else '0 (host == device)'
        lines.append(f'| {name} | {ref_s} | {dev:.12g} | {adev:.2e} '
                     f'| {rdev:.2e} |')
    lines.append(F32_SECTION)
    out = os.path.join(os.path.dirname(__file__), '..', 'ACCURACY.md')
    with open(out, 'w') as fh:
        fh.write('\n'.join(lines))
    print('\n'.join(lines[-len(rows) - 2:]))
    print('wrote', os.path.abspath(out))


if __name__ == '__main__':
    main()
