import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops import multigrid as mg
from pylabfea_tpu.ops.stencil_pallas import k_apply_stencil
rng = np.random.default_rng(0)
NX = NY = 1024
md = fek.rect_mesh(NX, NY, LX=1., LY=1., uniax='y', eps_tot=0.002, dtype=jnp.float32)
els = jnp.asarray(rng.uniform(0.5, 2.0, (36, NX, NY)) * 1e5, jnp.float32)
Kp = fek.element_stiffness_planes(md, els)
u0 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
u1 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)

@partial(jax.jit, static_argnames=('K', 'with_conv'))
def run(Kp, u0, u1, K, with_conv):
    def cond(s): return s[2] < K
    def body(s):
        a, b = k_apply_stencil(Kp, s[0], s[1], TX=16)
        if with_conv:
            rc = mg.restrict((a, b))                       # conv stride-2
            e = mg.prolong(rc, NX + 1, NY + 1)             # conv dilated
            a = a + 1e-6 * e[0]
            b = b + 1e-6 * e[1]
        sc = 1. / (jnp.abs(a).max() + 1.)
        return (a * sc, b * sc, s[2] + 1)
    return jax.lax.while_loop(cond, body, (u0, u1, 0))

for wc in (False, True):
    for K in (2, 22):
        r = run(Kp, u0, u1, K=K, with_conv=wc); _ = float(r[0].ravel()[0])
    t0 = time.perf_counter(); r = run(Kp, u0, u1, K=2, with_conv=wc); _ = float(r[0].ravel()[0]); t1 = time.perf_counter()
    r = run(Kp, u0, u1, K=22, with_conv=wc); _ = float(r[0].ravel()[0]); t2 = time.perf_counter()
    print(f'with_conv={wc}: {((t2-t1)-(t1-t0))/20*1e3:7.3f} ms/apply-round', flush=True)
