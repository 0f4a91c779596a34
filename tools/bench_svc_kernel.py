"""Shootout: XLA svc_decision_and_gradient vs the fused Pallas kernel.

Correctness vs float64 NumPy ground truth + wall-clock on the attached
device.  Usage: python tools/bench_svc_kernel.py [N] [nsv] [f]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def ground_truth(x, sv, dc, gamma, rho):
    x = x.astype(np.float64)
    sv = sv.astype(np.float64)
    d2 = ((x * x).sum(1)[:, None] + (sv * sv).sum(1)[None, :]
          - 2. * x @ sv.T)
    k = np.exp(-gamma * d2)
    f = k @ dc + rho
    w = dc[None, :] * k
    g = -2. * gamma * (w.sum(1)[:, None] * x - w @ sv)
    return f, g


def timeit(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def main():
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops.pallas_kernels import svc_f_grad_pallas

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 20
    nsv = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    plat = jax.devices()[0].platform
    interp = plat != 'tpu'
    print(f'platform={plat} N={N} nsv={nsv} f={f} interpret={interp}')

    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, f)).astype(np.float32)
    sv = rng.normal(size=(nsv, f)).astype(np.float32)
    dc = (rng.normal(size=nsv) * 0.5).astype(np.float32)
    gamma, rho = 2.5, 0.05

    f_ref, g_ref = ground_truth(x[:4096], sv, dc, gamma, rho)

    dm = con.DeviceMaterial(
        hill=jnp.ones(6), sy=jnp.float32(150.), khard=jnp.float32(0.),
        drucker=jnp.float32(0.), sv=jnp.asarray(sv), dc=jnp.asarray(dc),
        rho=jnp.float32(rho), gamma=jnp.float32(gamma),
        scale_seq=jnp.float32(150.), scale_wh=jnp.float32(1.),
        feat_mean=jnp.zeros(0), feat_scale=jnp.zeros(0), tex=jnp.zeros(0),
        is_svc=True, dev_only=False)
    xd = jnp.asarray(x)

    xla = jax.jit(lambda x: con.svc_decision_and_gradient(dm, x))
    (fx, gx), t_xla = timeit(lambda: xla(xd))
    ef = np.abs(np.asarray(fx[:4096]) - f_ref).max()
    eg = np.abs(np.asarray(gx[:4096]) - g_ref).max()
    print(f'XLA    : {t_xla * 1e3:7.2f} ms   |df|={ef:.2e} |dg|={eg:.2e}')

    pal = jax.jit(lambda x: svc_f_grad_pallas(
        x, dm.sv, dm.dc, dm.gamma, dm.rho, interpret=interp))
    (fp, gp), t_pal = timeit(lambda: pal(xd))
    ef = np.abs(np.asarray(fp[:4096]) - f_ref).max()
    eg = np.abs(np.asarray(gp[:4096]) - g_ref).max()
    print(f'Pallas : {t_pal * 1e3:7.2f} ms   |df|={ef:.2e} |dg|={eg:.2e}'
          f'   speedup x{t_xla / t_pal:.2f}')

    from pylabfea_tpu.ops.pallas_kernels import svc_f_grad_pallas_mxu
    palm = jax.jit(lambda x: svc_f_grad_pallas_mxu(
        x, dm.sv, dm.dc, dm.gamma, dm.rho, interpret=interp))
    (fm, gm), t_mxu = timeit(lambda: palm(xd))
    ef = np.abs(np.asarray(fm[:4096]) - f_ref).max()
    eg = np.abs(np.asarray(gm[:4096]) - g_ref).max()
    print(f'PallasM: {t_mxu * 1e3:7.2f} ms   |df|={ef:.2e} |dg|={eg:.2e}'
          f'   speedup x{t_xla / t_mxu:.2f}')

    # decision-only variant
    palf = jax.jit(lambda x: svc_f_grad_pallas(
        x, dm.sv, dm.dc, dm.gamma, dm.rho, with_grad=False,
        interpret=interp)[0])
    fonly, t_f = timeit(lambda: palf(xd))
    ef = np.abs(np.asarray(fonly[:4096]) - f_ref).max()
    print(f'Pallas f-only: {t_f * 1e3:.2f} ms  |df|={ef:.2e}')


if __name__ == '__main__':
    main()
