"""Round-5 parity experiment H: fast inner iterations + FAITHFUL COMMIT
(load_step_split(commit_faithful=True)) vs the faithful-f64 anchor.

Run (CPU): python tools/dbg_parity_commit.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops.svc import SVCParams

    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'REF_SOLVE_svc.npz'))
    mat = FE.Material('ref-ML')
    mat.elasticity(CV=np.asarray(z['CV'], dtype=float))
    mat.plasticity(sy=float(z['sy']), sdim=6)
    mat._svc = SVCParams(support_vectors=np.asarray(z['support_vectors']),
                         dual_coef=np.asarray(z['dual_coef']),
                         intercept=float(z['intercept']),
                         gamma=float(z['gamma']))
    mat.ML_yf = True
    mat.dev_only = bool(z['dev_only'])
    mat.scale_seq = float(z['scale_seq'])
    mat.Ndof = 6
    CV = np.asarray(z['CV'], float)
    eps = float(z['eps'])
    anchors = {
        8: np.array([-1.7970996899460516e-05, 136.84762384593188,
                     23.56452544949246, 3.8295040775998963,
                     5.12961191097818, 0.3509152939280177]),
        16: np.array([-2.2045897838843118e-05, 136.8308759006944,
                      23.559115412588678, 3.8474650281160816,
                      5.129451846108369, 0.1304107925121143]),
        32: np.array([-2.5851544093517813e-05, 136.82491798563024,
                      23.558629305803525, 3.853183134329265,
                      5.128772935674281, 0.05338343382854992]),
    }

    def solve(dtype, fast, nsub=4, commit_faithful=False):
        dm = con.device_material_from(mat, dtype=dtype)
        md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                           dtype=dtype)
        t0 = time.perf_counter()
        st, hist = fek.solve_uniaxial(md, dm, CV, nsteps=8, n_inner=2,
                                      dtype=dtype, gate=True, fast=fast,
                                      nsub=nsub,
                                      commit_faithful=commit_faithful)
        out = np.asarray(hist[-1][0], float)
        log(f'  [{time.perf_counter() - t0:6.0f}s] glob_sig = '
            f'{out.round(4)}')
        return out

    anchor = anchors[N]

    def par(a):
        return np.abs(a - anchor).max() / max(1., np.abs(anchor).max())

    log('H fast-f32 inner + faithful-f32 commit (nsub=4):')
    h = solve(jnp.float32, fast=True, nsub=4, commit_faithful=True)
    log('H16 same with nsub=16 inner:')
    h16 = solve(jnp.float32, fast=True, nsub=16, commit_faithful=True)
    log(f'H   commit-faithful nsub=4  vs anchor : {par(h):.2e}')
    log(f'H16 commit-faithful nsub=16 vs anchor : {par(h16):.2e}')


if __name__ == '__main__':
    main()
