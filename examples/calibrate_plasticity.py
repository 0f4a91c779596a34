"""Full inverse material identification from stress-strain paths.

The reference package identifies only the ELASTIC stiffness from data
(examples/Train_CPFEM/elastic_coefficients.py; reference data.py:84-348) —
plastic anisotropy is captured indirectly by computing yield stresses per
load case and training an SVC on them.  The TPU rebuild closes that loop
natively: ``ops.calibrate`` differentiates through the production return
map (forward-mode through the projection scan) and recovers the yield
strength, the six Hill coefficients and the hardening modulus DIRECTLY by
Levenberg-Marquardt on the stress misfit.

Workflow demonstrated:
  1. generate "experimental" stress paths from a hidden Hill material,
  2. identify the elastic stiffness from the pre-yield segments
     (``get_elastic_coefficients``, same as the reference workflow),
  3. identify {sy, hill, khard} with ``calibrate.fit_plasticity``,
  4. define a ``Material`` from the fit and verify its uniaxial yield
     stresses against the hidden truth.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax  # noqa: E402

if not any(d.platform == 'tpu' for d in jax.devices()):
    jax.config.update('jax_enable_x64', True)  # CPU: run the fit in f64

import jax.numpy as jnp  # noqa: E402

import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu.ops import calibrate, constitutive as con  # noqa: E402

HILL_TRUE = np.array([1.3, 0.85, 1.0, 1.0, 1.0, 1.0])
SY_TRUE, KHARD_TRUE = 180., 800.
E_TRUE, NU_TRUE = 200.e3, 0.3


def hidden_material():
    mat = FE.Material('hidden truth')
    mat.elasticity(E=E_TRUE, nu=NU_TRUE)
    mat.plasticity(sy=SY_TRUE, hill=list(HILL_TRUE), khard=KHARD_TRUE,
                   sdim=6)
    return mat


def experiment(mat, npaths=16, nsteps=30, seed=7):
    """Simulated 'measurements': proportional strain paths into the
    plastic range, stresses recorded after every increment.  The step
    schedule ramps like a real test protocol — fine increments through
    the elastic leg (so pre-yield states exist to fit C from), coarser
    ones in the plastic range."""
    dm = con.device_material_from(mat)
    CV = jnp.asarray(mat.CV)
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(npaths, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(nsteps, 1.8e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    z = jnp.zeros((npaths, 6), deps.dtype)

    def stp(carry, d):
        s, e = carry
        _, sn, dp, _ = con.response_fast(dm, (s, e), d, CV, 40, 1,
                                         fixed_trip=True)
        return (sn, e + dp), sn

    _, hist = jax.lax.scan(stp, (z, z), jnp.swapaxes(deps, 0, 1))
    return deps, jnp.swapaxes(hist, 0, 1)


def main():
    truth = hidden_material()
    deps, sig = experiment(truth)
    print(f'measured {deps.shape[0]} paths x {deps.shape[1]} steps')

    # 1) elastic stiffness from the pre-yield segments: per path, keep the
    #    prefix safely below the apparent stress ceiling (data-driven — no
    #    knowledge of the hidden sy)
    from pylabfea_tpu.ops import jtensors as jt
    seq = np.asarray(jt.seq_j2_voigt(sig))
    eps_c = np.asarray(jnp.cumsum(deps, 1))
    keep = seq < 0.5 * seq.max(axis=1, keepdims=True)
    eps_el = eps_c[keep]
    sig_el = np.asarray(sig)[keep]
    print(f'elastic fit on {len(eps_el)} pre-yield states')
    C_fit = FE.get_elastic_coefficients(eps_el, sig_el)
    errC = np.max(np.abs(C_fit - truth.CV)) / np.max(np.abs(truth.CV))
    print(f'elastic stiffness: max rel error {errC:.2e}')

    # 2) plastic parameters by AD through the return map
    params, info = calibrate.fit_plasticity(deps, sig, jnp.asarray(C_fit))
    print(f'LM cost {info["loss"][0]:.2e} -> {info["loss"][-1]:.2e} '
          f'in {len(info["loss"]) - 1} iterations')

    # compare in the uniax_x gauge the fit reports
    c = 0.5 * (HILL_TRUE[0] + HILL_TRUE[2])
    rc = np.sqrt(c)
    print(f"sy    fit {params['sy']:9.3f}   truth {SY_TRUE / rc:9.3f}")
    print(f"khard fit {params['khard']:9.2f}   truth {KHARD_TRUE / rc:9.2f}")
    print('hill  fit ', np.round(params['hill'], 4))
    print('      truth', np.round(HILL_TRUE / c, 4))

    # 3) the identified material predicts the truth's directional yield
    #    stresses (gauge-independent observable)
    ident = FE.Material('identified')
    ident.elasticity(CV=C_fit)
    ident.plasticity(sy=params['sy'], hill=list(params['hill']),
                     khard=params['khard'], sdim=6)
    worst = 0.
    for su in np.vstack([np.eye(3), [[1, -1, 0], [0, 1, -1]]]):
        s6 = np.zeros(6)
        s6[:3] = su / np.linalg.norm(su)
        ratio = (truth.calc_seq(s6[None, :]) / truth.sy) / \
                (ident.calc_seq(s6[None, :]) / ident.sy)
        worst = max(worst, abs(float(ratio) - 1.))
    print(f'worst directional yield-stress mismatch: {worst:.2e}')
    assert worst < 2.e-2, 'identification failed'
    print('identification OK')

    cpfem_surrogate()


CPFEM_DB = ('/root/reference/examples/Train_CPFEM/'
            'Data_Random_Texture_Test.json')


def cpfem_surrogate():
    """Best-fit Hill+Voce surrogate of a real CPFEM database — the
    interpretable counterpart of training an SVC on its yield stresses.
    Two real-data lessons are wired in: the database stores TENSOR shear
    strains (shear_convention='tensor'; the fitted C44/((C11-C12)/2) = 2.0
    on a random texture gives it away), and the fit is deviatoric (the
    finite-strain data carries O(eps^2) hydrostatic terms a small-strain
    model cannot represent)."""
    if not os.path.exists(CPFEM_DB):
        print('CPFEM database not mounted - skipping the surrogate fit')
        return
    print('\n--- Hill+Voce surrogate of the CPFEM random-texture set ---')
    db = FE.Data(CPFEM_DB, epl_crit=2.e-3, epl_start=1.e-3, epl_max=0.03,
                 wh_data=True)
    params, info = calibrate.fit_from_data(
        db, nsteps=25, shear_convention='tensor', hardening='voce')
    _, sig = calibrate.resample_paths(db.lc_data, 25)
    sig = np.asarray(sig)
    dev = lambda s: s - np.concatenate(
        [np.repeat(s[..., :3].mean(-1, keepdims=True), 3, -1),
         np.zeros_like(s[..., 3:])], -1)
    rms = np.sqrt(np.mean(dev(info['sim'] - sig) ** 2)) \
        / np.sqrt(np.mean(dev(sig) ** 2))
    print(f"sy {params['sy']:.2f}  khard {params['khard']:.0f}  "
          f"voce_r {params['voce_r']:.1f}  voce_b {params['voce_b']:.0f}")
    print('hill', np.round(params['hill'], 3))
    print(f'deviatoric relative stress RMS of the surrogate: {rms:.3f}')
    print(f"(pipeline's offset yield strength for comparison: "
          f"{db.mat_data['sy_av']:.2f} MPa)")


if __name__ == '__main__':
    main()
