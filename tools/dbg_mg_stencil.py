import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops import multigrid as mg
from bench import flagship
from __graft_entry__ import _elastic_cv

dtype = jnp.float32
dm, _ = flagship(dtype)
CV = _elastic_cv(dtype)
N = 1024
md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002, dtype=dtype)
st = fek.init_state(md, CV, dtype=dtype)
st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
_ = float(st.sig.ravel()[0])
bc_val = md.fixed_val * 0.25
force = md.force * 0.25

def solve():
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100, x0=d['du'])
    return du, res, it

import pylabfea_tpu.ops.stencil_pallas as sp
for mode, gate_nx in (('xla', 10**9), ('stencil-1024-only', 1024), ('stencil>=512', 512), ('stencil>=128', 128)):
    fek.USE_STENCIL = None
    orig = sp.auto_tile
    def auto2(NX, NY, _orig=orig, _g=gate_nx):
        return _orig(NX, NY) if NX >= _g else 0
    sp.auto_tile = auto2
    fek.solve_linear.clear_cache()
    du, res, it = solve(); _ = float(res)
    t0 = time.perf_counter(); du, res, it = solve(); _ = float(res); t1 = time.perf_counter()
    print(f'{mode:20s}: {1e3*(t1-t0):7.1f} ms  ({int(it)} iters)', flush=True)
    sp.auto_tile = orig

mg.COARSE_DENSE_MAX = 0
fek.solve_linear.clear_cache()
du, res, it = solve(); _ = float(res)
t0 = time.perf_counter(); du, res, it = solve(); _ = float(res); t1 = time.perf_counter()
print(f'{"no-dense-bottom":20s}: {1e3*(t1-t0):7.1f} ms  ({int(it)} iters)', flush=True)

# cold solves for per-iteration cost
for name, cdm in (('cold-dense', 700), ('cold-nodense', 0)):
    mg.COARSE_DENSE_MAX = cdm
    fek.solve_linear.clear_cache()
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100)
    _ = float(res)
    t0 = time.perf_counter()
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100)
    _ = float(res); t1 = time.perf_counter()
    print(f'{name:20s}: {1e3*(t1-t0):7.1f} ms  ({int(it)} iters)', flush=True)
