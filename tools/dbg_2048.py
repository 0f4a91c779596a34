"""2048^2 production-step check (VERDICT r4 item 3): with the CG stall
exit, the step should stop burning 100 MG-CG iterations at the f32
residual floor.  Reports per-inner-iteration CG counts, residuals, and two
consecutive timed steps.  Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import flagship, sync
    from __graft_entry__ import _elastic_cv
    from pylabfea_tpu.ops import fe_kernels as fek

    dtype = jnp.float32
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dm, _ = flagship(dtype)
    CV = _elastic_cv(dtype)
    md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    t0 = time.perf_counter()
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    sync(st.sig)
    log(f'step 1 (cold): {time.perf_counter() - t0:.1f} s, cg_iters_hist '
        f'{[int(x) for x in d["cg_iters_hist"]]}, res {float(d["cg_res"]):.2e}')
    for k in (2, 3):
        t0 = time.perf_counter()
        st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2,
                                    du0=d['du'], kes0=d.get('kes'),
                                    dst0=d['dstiff'])
        sync(st.sig)
        log(f'step {k} (warm): {time.perf_counter() - t0:.3f} s, '
            f'cg_iters_hist {[int(x) for x in d["cg_iters_hist"]]}, '
            f'res {float(d["cg_res"]):.2e}')


if __name__ == '__main__':
    main()
