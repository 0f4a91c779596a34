import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops.stencil_pallas import k_apply_stencil
rng = np.random.default_rng(0)
for NX in (256, 1024):
    NY = NX
    md = fek.rect_mesh(NX, NY, LX=1., LY=1., uniax='y', eps_tot=0.002, dtype=jnp.float32)
    els = jnp.asarray(rng.uniform(0.5, 2.0, (36, NX, NY)) * 1e5, jnp.float32)
    Kp = fek.element_stiffness_planes(md, els)
    u0 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
    u1 = jnp.asarray(rng.normal(size=(NX+1, NY+1)), jnp.float32)
    xla = jax.jit(lambda Kp, u0, u1: fek._scatter_planes(md, fek._contract_planes(Kp, fek._gather_planes(md, (u0, u1)))))
    for TX in (8, 16):
        pal = jax.jit(lambda Kp, u0, u1, TX=TX: k_apply_stencil(Kp, u0, u1, TX=TX))
        o = pal(Kp, u0, u1); jax.block_until_ready(o)
        r = xla(Kp, u0, u1); jax.block_until_ready(r)
        err = max(float(jnp.abs(o[i]-r[i]).max()/jnp.abs(r[i]).max()) for i in range(2))
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps): o = pal(Kp, u0, u1)
        jax.block_until_ready(o)
        tp = (time.perf_counter()-t0)/reps
        t0 = time.perf_counter()
        for _ in range(reps): r = xla(Kp, u0, u1)
        jax.block_until_ready(r)
        tx = (time.perf_counter()-t0)/reps
        print(f'NX={NX} TX={TX}: pallas {tp*1e3:6.2f} ms  xla {tx*1e3:6.2f} ms  x{tx/tp:.2f}  err {err:.1e}', flush=True)
