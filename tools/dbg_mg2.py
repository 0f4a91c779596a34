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

orig_attach = mg._attach_coarse_inv
def attach_dbg(levels):
    out = orig_attach(levels)
    print(f'  [trace] levels={len(out)} kc_inv={"SET" if out[-1].kc_inv is not None else "None"} CDM={mg.COARSE_DENSE_MAX}', flush=True)
    return out
mg._attach_coarse_inv = attach_dbg

fek.USE_STENCIL = False   # isolate from the stencil entirely
for cdm in (700, 0):
    mg.COARSE_DENSE_MAX = cdm
    fek.solve_linear.clear_cache()
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100)
    _ = float(res)
    t0 = time.perf_counter()
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100)
    _ = float(res); t1 = time.perf_counter()
    print(f'CDM={cdm}: cold {1e3*(t1-t0):7.1f} ms  ({int(it)} iters, res {float(res):.1e})', flush=True)
