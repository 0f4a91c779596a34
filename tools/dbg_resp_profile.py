"""Break down the production-step response pass at 1024^2 (bench flagship,
yield-transition state): element_deps vs return map vs secant grad vs
elstiff_planes/compare.  Run on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flagship, sync
from __graft_entry__ import _elastic_cv
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops import constitutive as con


def timed(fn, reps=5):
    fn()  # compile
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    CV = _elastic_cv(dtype)
    dm, _ = flagship(dtype)
    md = fek.rect_mesh(1024, 1024, LX=1., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    sync(st.sig)
    # APPROXIMATION: st/du come from AFTER load_step_split returned, so the
    # profiled return map re-applies the converged du to the post-step state
    # rather than a true mid-iteration state.  Timing shapes/work are the
    # same; the per-lane regime (mostly-elastic vs yield-transition) can
    # differ slightly from the production inner iteration.
    du = d['du']

    deps_fn = jax.jit(lambda: fek.element_deps(md, du))
    deps = deps_fn()
    sync(deps)
    t_deps = timed(deps_fn)

    @jax.jit
    def map_only():
        return con.response_fast(dm, (st.sig, st.epl), deps, CV, maxiter=12,
                                 nsub=4)
    fy, sig_n, depl_n, grad = map_only()
    sync(sig_n)
    t_map = timed(map_only)

    @jax.jit
    def map_nsub1():
        return con.response_fast(dm, (st.sig, st.epl), deps, CV, maxiter=12,
                                 nsub=1)
    t_map1 = timed(map_nsub1)

    planes_fn = jax.jit(lambda: fek.elstiff_planes(md, grad))
    gP = planes_fn()
    sync(gP)
    t_planes = timed(planes_fn)

    @jax.jit
    def cmp_fn():
        dst = jnp.sqrt(jnp.sum((st.elstiff - gP) ** 2, axis=0))
        return jnp.where(dst > 1.e-3, gP, st.elstiff), dst.max()
    t_cmp = timed(cmp_fn)

    @jax.jit
    def full():
        return fek._respond_and_update(md, st, dm, CV, du, True, 4)
    t_full = timed(full)

    print(f'element_deps   {t_deps*1e3:8.2f} ms')
    print(f'return map n4  {t_map*1e3:8.2f} ms')
    print(f'return map n1  {t_map1*1e3:8.2f} ms')
    print(f'elstiff_planes {t_planes*1e3:8.2f} ms')
    print(f'compare/where  {t_cmp*1e3:8.2f} ms')
    print(f'sum            {(t_deps+t_map+t_planes+t_cmp)*1e3:8.2f} ms')
    print(f'full respond   {t_full*1e3:8.2f} ms')


if __name__ == '__main__':
    main()
