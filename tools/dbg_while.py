import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops.stencil_pallas import k_apply_stencil
rng = np.random.default_rng(0)
NX = NY = 1024
md = fek.rect_mesh(NX, NY, LX=1., LY=1., uniax='y', eps_tot=0.002, dtype=jnp.float32)
els = jnp.asarray(rng.uniform(0.5, 2.0, (36, NX, NY)) * 1e5, jnp.float32)
Kp = fek.element_stiffness_planes(md, els)
u0 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
u1 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)

def apply_p(Kp, a, b):
    return k_apply_stencil(Kp, a, b, TX=16)
def apply_x(Kp, a, b):
    return fek._scatter_planes(md, fek._contract_planes(Kp, fek._gather_planes(md, (a, b))))

def bench(name, mk):
    f = mk()
    for K in (2, 22):
        r = f(Kp, u0, u1, K); _ = float(r[0].ravel()[0])
    t0 = time.perf_counter(); r = f(Kp, u0, u1, 2); _ = float(r[0].ravel()[0]); t1 = time.perf_counter()
    r = f(Kp, u0, u1, 22); _ = float(r[0].ravel()[0]); t2 = time.perf_counter()
    print(f'{name:28s}: {((t2-t1)-(t1-t0))/20*1e3:7.3f} ms/apply', flush=True)

def mk_while(apply_fn):
    @partial(jax.jit, static_argnames=('K',))
    def run(Kp, u0, u1, K):
        def cond(s): return s[2] < K
        def body(s):
            a, b = apply_fn(Kp, s[0], s[1])
            sc = 1. / (jnp.abs(a).max() + 1.)
            return (a * sc, b * sc, s[2] + 1)
        return jax.lax.while_loop(cond, body, (u0, u1, 0))
    return run

def mk_fori_in_while(apply_fn):
    @partial(jax.jit, static_argnames=('K',))
    def run(Kp, u0, u1, K):
        def cond(s): return s[2] < K
        def body(s):
            def fb(i, uv):
                a, b = apply_fn(Kp, uv[0], uv[1])
                sc = 1. / (jnp.abs(a).max() + 1.)
                return (a * sc, b * sc)
            a, b = jax.lax.fori_loop(0, 2, fb, (s[0], s[1]))
            return (a, b, s[2] + 1)
        return jax.lax.while_loop(cond, body, (u0, u1, 0))
    return run





def mk_while_sharedKp(apply_fn):
    @partial(jax.jit, static_argnames=('K',))
    def run(Kp, u0, u1, K):
        # a second, XLA-side consumer of Kp (like k_diag_t / rhs in mg)
        diag = sum(Kp[i, i] for i in range(8))
        def cond(s): return s[2] < K
        def body(s):
            a, b = apply_fn(Kp, s[0], s[1])
            a = a + 1e-30 * diag[0, 0]
            sc = 1. / (jnp.abs(a).max() + 1.)
            return (a * sc, b * sc, s[2] + 1)
        return jax.lax.while_loop(cond, body, (u0, u1, 0))
    return run

def mk_while_diag_inloop(apply_fn):
    @partial(jax.jit, static_argnames=('K',))
    def run(Kp, u0, u1, K):
        def cond(s): return s[2] < K
        def body(s):
            diag = sum(Kp[i, i] for i in range(8))   # consumer inside body
            a, b = apply_fn(Kp, s[0], s[1])
            a = a + 1e-30 * diag[0, 0]

            sc = 1. / (jnp.abs(a).max() + 1.)
            return (a * sc, b * sc, s[2] + 1)
        return jax.lax.while_loop(cond, body, (u0, u1, 0))
    return run

bench('pallas shared-Kp', lambda: mk_while_sharedKp(apply_p))
bench('pallas diag-in-loop', lambda: mk_while_diag_inloop(apply_p))
