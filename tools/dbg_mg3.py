import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops import stencil_pallas as sp
from bench import flagship
from __graft_entry__ import _elastic_cv

mode = sys.argv[1]
if mode == 'fine-only':
    orig = sp.auto_tile
    sp.auto_tile = lambda NX, NY, _o=orig: _o(NX, NY) if NX >= 1024 else 0
elif mode == 'off':
    fek.USE_STENCIL = False

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
for tag, x0 in (('cold', None), ('warm', d['du'])):
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100, x0=x0)
    _ = float(res)
    t0 = time.perf_counter()
    du, res, it = fek.solve_linear(md, st.elstiff, bc_val, force, None, 100, x0=x0)
    _ = float(res); t1 = time.perf_counter()
    print(f'{mode:10s} {tag}: {1e3*(t1-t0):7.1f} ms ({int(it)} iters)', flush=True)
