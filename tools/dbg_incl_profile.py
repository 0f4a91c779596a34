"""Phase profile of the 1024^2 3-material inclusion step (VERDICT r3 Weak
#3): times the full warm step, then each respond_grouped sub-phase (gather,
per-group return map, scatter) on the production state.  Run on the real
TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, 'ndim')][0]
    float(jnp.asarray(leaf).ravel()[0])


def timed(fn, reps=3):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek

    dtype = jnp.float32
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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
    st = fek.init_state(md, CVs, dtype=dtype)
    st, d = fek.load_step_split(md, st, dms, CVs, 0.25, n_inner=2)
    sync(st.sig)
    t0 = time.perf_counter()
    st2, d2 = fek.load_step_split(md, st, dms, CVs, 0.25, n_inner=2,
                                  du0=d['du'], kes0=d.get('kes'),
                                  dst0=d['dstiff'])
    sync(st2.sig)
    log(f'inclusion step {N}x{N}: {(time.perf_counter() - t0) * 1e3:.0f} ms '
        f'({int(d2["cg_iters"])} CG iters)')

    # sub-phase breakdown on the post-step state
    du = d2['du']
    deps_fn = jax.jit(lambda: fek.element_deps(md, du))
    deps = deps_fn()
    t = timed(deps_fn)
    log(f'element_deps: {t * 1e3:.1f} ms')

    g_gather = jax.jit(lambda: (st2.sig[md.perm], st2.epl[md.perm],
                                deps[md.perm]))
    sig_g, epl_g, deps_g = g_gather()
    t = timed(g_gather)
    log(f'gather into groups (3x (N,6)): {t * 1e3:.1f} ms')

    for k, (start, size) in enumerate(md.groups):
        sl = slice(start, start + size)
        CVk = jnp.asarray(CVs[k], dtype)

        def grp(sl=sl, k=k, CVk=CVk):
            return con.response_fast_chunked(
                dms[k], (sig_g[sl], epl_g[sl]), deps_g[sl], CVk, 12, 4)
        t = timed(grp)
        log(f'group {k} size {size} (svc={dms[k].is_svc} '
            f'sdim3={dms[k].sdim3}): {t * 1e3:.1f} ms')

    gr = jnp.zeros((md.nel, 6, 6), dtype)
    g_scat_old = jax.jit(lambda: jnp.zeros_like(gr).at[md.perm].set(gr))
    t = timed(g_scat_old)
    log(f'OLD scatter (N,6,6): {t * 1e3:.1f} ms')
    g_scat_new = jax.jit(lambda: gr[md.inv_perm])
    t = timed(g_scat_new)
    log(f'NEW inv-perm gather (N,6,6): {t * 1e3:.1f} ms')

    ep_fn = jax.jit(lambda: fek.elstiff_planes(md, gr))
    t = timed(ep_fn)
    log(f'elstiff_planes (N,6,6)->(36,NX,NY): {t * 1e3:.1f} ms')

    resp_fn = jax.jit(lambda: fek._respond_and_update(
        md, st2, dms, CVs, du, True, 4))
    t = timed(resp_fn)
    log(f'full _respond_and_update: {t * 1e3:.1f} ms')


if __name__ == '__main__':
    main()
