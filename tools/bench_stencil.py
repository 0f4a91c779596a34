import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops.stencil_pallas import k_apply_stencil, auto_tile
rng = np.random.default_rng(0)
for NX in (1024, 2048):
    NY = NX
    md = fek.rect_mesh(NX, NY, LX=1., LY=1., uniax='y', eps_tot=0.002, dtype=jnp.float32)
    els = jnp.asarray(rng.uniform(0.5, 2.0, (36, NX, NY)) * 1e5, jnp.float32)
    Kp = fek.element_stiffness_planes(md, els)
    u0 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
    u1 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
    TX = auto_tile(NX, NY)

    def chain(apply_fn, K):
        @partial(jax.jit, static_argnames=('K',))
        def run(Kp, u0, u1, K):
            def body(i, uv):
                a, b = apply_fn(Kp, uv[0], uv[1])
                s = 1. / (jnp.abs(a).max() + 1.)
                return (a * s, b * s)
            return jax.lax.fori_loop(0, K, body, (u0, u1), unroll=False)
        return lambda: run(Kp, u0, u1, K=K)
    xla_apply = lambda Kp, a, b: fek._scatter_planes(md, fek._contract_planes(Kp, fek._gather_planes(md, (a, b))))
    pal_apply = partial(k_apply_stencil, TX=TX)
    for name, ap in (('xla', xla_apply), ('pallas', pal_apply)):
        short, long_ = chain(ap, 5), chain(ap, 55)
        for f in (short, long_):
            jax.block_until_ready(f())
        t0 = time.perf_counter(); r1 = short(); _ = float(jnp.abs(r1[0]).max()); t1 = time.perf_counter()
        r2 = long_(); _ = float(jnp.abs(r2[0]).max()); t2 = time.perf_counter()
        per = (t2 - t1 - (t1 - t0)) / 50
        print(f'NX={NX} {name:6s} TX={TX}: {per*1e3:6.3f} ms/apply '
              f'(short {1e3*(t1-t0):.1f} long {1e3*(t2-t1):.1f})', flush=True)
