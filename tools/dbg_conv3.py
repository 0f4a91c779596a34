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

def restr_mat(nf):
    # (nc, nf) full-weighting rows [.., 0.5, 1, 0.5, ..] at stride 2
    nc = nf // 2 + 1
    W = np.zeros((nc, nf), np.float32)
    for I in range(nc):
        j = 2 * I
        W[I, j] = 1.
        if j - 1 >= 0: W[I, j - 1] = .5
        if j + 1 < nf: W[I, j + 1] = .5
    return jnp.asarray(W)

Wx = restr_mat(NX + 1)
Wy = restr_mat(NY + 1)

def restrict_mm(f):
    return jax.lax.dot_general(
        jax.lax.dot_general(Wx, f, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST),
        Wy, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST)

def prolong_mm(c):
    return jax.lax.dot_general(
        jax.lax.dot_general(Wx, c, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST),
        Wy, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST)

# parity with the conv version
rc_ref = mg.restrict((u0, u1))
rc_mm = (restrict_mm(u0), restrict_mm(u1))
print('restrict err', float(jnp.abs(rc_mm[0] - rc_ref[0]).max()), flush=True)
e_ref = mg.prolong(rc_ref, NX + 1, NY + 1)
e_mm = (prolong_mm(rc_mm[0]), prolong_mm(rc_mm[1]))
print('prolong err', float(jnp.abs(e_mm[0] - e_ref[0]).max() / jnp.abs(e_ref[0]).max()), flush=True)

@partial(jax.jit, static_argnames=('K',))
def run(Kp, u0, u1, K):
    def cond(s): return s[2] < K
    def body(s):
        a, b = k_apply_stencil(Kp, s[0], s[1], TX=16)
        rc = (restrict_mm(a), restrict_mm(b))
        e = (prolong_mm(rc[0]), prolong_mm(rc[1]))
        a = a + 1e-6 * e[0]
        b = b + 1e-6 * e[1]
        sc = 1. / (jnp.abs(a).max() + 1.)
        return (a * sc, b * sc, s[2] + 1)
    return jax.lax.while_loop(cond, body, (u0, u1, 0))

for K in (2, 22):
    r = run(Kp, u0, u1, K=K); _ = float(r[0].ravel()[0])
t0 = time.perf_counter(); r = run(Kp, u0, u1, K=2); _ = float(r[0].ravel()[0]); t1 = time.perf_counter()
r = run(Kp, u0, u1, K=22); _ = float(r[0].ravel()[0]); t2 = time.perf_counter()
print(f'mode=matmul: {((t2-t1)-(t1-t0))/20*1e3:7.3f} ms/round', flush=True)
