"""Field-level f32 accuracy ledger harness (VERDICT r4 item 6).

Runs the 48^2 3-material inclusion workload (the bench inclusion physics:
Hill-6p matrix + sdim=3 J2 band + soft elastic inclusion, displacement-
controlled tension, corner pin — well-posed) in IDENTICAL configurations:

  f64          float64 ground truth
  f32          production float32
  f32+refine   float32 with n_refine=1 mixed-precision linear solves
  f32+commit   f32+refine plus ONE float64 response recomputation at each
               step commit (the committed element stress/plastic state is
               re-integrated in f64 from the entering state and the
               refined displacement increment; tangents stay f32)

and reports the global sig_yy and max element-field deviations vs f64.

Run:  python tools/acc_field48.py        (CPU; x64 enabled)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build(dtype):
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek

    N = 48
    mat_h = FE.Material(num=1)
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    mat_j = FE.Material(num=2)
    mat_j.elasticity(E=200.e3, nu=0.3)
    mat_j.plasticity(sy=150., sdim=3)
    mat_el = FE.Material(num=3)
    mat_el.elasticity(E=1.e3, nu=0.27)
    mat_map = np.zeros((N, N), dtype=int)
    mat_map[N // 2:, :] = 1
    mat_map[N // 3: 2 * N // 3, N // 3: 2 * N // 3] = 2
    bc = {'bot': {1: ('disp', 0.)}, 'left': {}, 'right': {},
          'top': {1: ('disp', 0.002 * 4.)},
          'nodes': ((0, 0, 0, 'disp', 0.),)}
    md = fek.rect_mesh(N, N, LX=4., LY=4., bc=bc, mat_map=mat_map,
                       dtype=dtype)
    dms = tuple(con.device_material_from(m, dtype=dtype)
                for m in (mat_h, mat_j, mat_el))
    CVs = tuple(np.asarray(m.CV, float) for m in (mat_h, mat_j, mat_el))
    return md, dms, CVs


def run(dtype, n_refine=0, commit_f64=False, nsteps=4):
    from pylabfea_tpu.ops import fe_kernels as fek

    md, dms, CVs = build(dtype)
    st = fek.init_state(md, CVs, dtype=dtype)
    du0 = kes0 = dst0 = None
    for _ in range(nsteps):
        st, d = fek.load_step_split(md, st, dms, CVs, 1. / nsteps,
                                    n_inner=2, du0=du0, kes0=kes0,
                                    dst0=dst0, n_refine=n_refine,
                                    commit_f64=commit_f64)
        du0, kes0, dst0 = d['du'], d.get('kes'), d['dstiff']
    return np.asarray(st.sig, float), np.asarray(d['glob_sig'], float)


def main():
    sig64, g64 = run(jnp.float64)
    print(f'f64        glob sig_yy {g64[1]:.6f}', flush=True)
    smax = np.abs(sig64).max()
    for tag, kw in (('f32', {}),
                    ('f32+refine', dict(n_refine=1)),
                    ('f32+commit', dict(n_refine=1, commit_f64=True))):
        sig, g = run(jnp.float32, **kw)
        dev_g = abs(g[1] - g64[1]) / abs(g64[1])
        dev_f = np.abs(sig - sig64).max() / smax
        print(f'{tag:11s} glob sig_yy {g[1]:.6f} (rel {dev_g:.2e})  '
              f'max element dev {dev_f:.2e}', flush=True)


if __name__ == '__main__':
    main()
