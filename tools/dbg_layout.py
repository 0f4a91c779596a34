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
Kp_arg = fek.element_stiffness_planes(md, els)
u0 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
u1 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
K = 20

def run_with(make_kp, name, extra=None):
    @partial(jax.jit, static_argnames=('K',))
    def prog(Kp_in, u0, u1, K):
        Kp = make_kp(Kp_in)
        def body(i, uv):
            a, b = k_apply_stencil(Kp, uv[0], uv[1], TX=16)
            s = 1. / (jnp.abs(a).max() + 1.)
            return (a * s, b * s)
        return jax.lax.fori_loop(0, K, body, (u0, u1))
    for KK in (2, 22):
        r = prog(Kp_arg, u0, u1, K=KK)
        _ = float(r[0].ravel()[0])
    t0 = time.perf_counter(); r = prog(Kp_arg, u0, u1, K=2); _ = float(r[0].ravel()[0]); t1 = time.perf_counter()
    r = prog(Kp_arg, u0, u1, K=22); _ = float(r[0].ravel()[0]); t2 = time.perf_counter()
    print(f'{name}: {((t2-t1)-(t1-t0))/20*1e3:7.3f} ms/apply', flush=True)

run_with(lambda k: k, 'arg-direct')
from jax.experimental import layout as jl
run_with(lambda k: jl.with_layout_constraint(k, jl.Layout((0,1,2,3))), 'arg+pin')
run_with(lambda k: fek.element_stiffness_planes(md, els), 'in-program')
run_with(lambda k: jl.with_layout_constraint(fek.element_stiffness_planes(md, els), jl.Layout((0,1,2,3))), 'in-program+pin')
