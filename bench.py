"""Flagship benchmark: Hill-ML (SVC yield function) Gauss-point return maps.

Runs the production return-map kernel (``constitutive.response_fast``:
elastic predictor + cutting-plane closest-point projection onto the SVC
yield locus with the analytic RBF gradient, trust-region safeguarded) over
10^6 element states on the attached accelerator and reports throughput in
return-maps/second.  ``vs_baseline`` compares against the reference
implementation's execution model — one Python-level ``response`` call per
element (pyLabFEA model.py:1340-1343, substepped return map with
bracket-march + Brent yield-locus searches) — measured on this machine's
CPU over a sample.  Both integrate the same constitutive model to the same
yield-surface tolerance; the device kernel uses the standard
closest-point-projection algorithm instead of the reference's substepping
(the reference-faithful algorithm is also available on device as
``constitutive.response`` and benches ~17k maps/s, still ~140x the
reference execution model).

Prints exactly one JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    """Force completion of everything queued before reading the clock:
    on the tunnel-attached platform ``jax.block_until_ready`` does not
    reliably await remote execution (BENCH_NOTES.md 'Timing method'), so
    read one scalar of the last output back to the host — device queues
    execute in order, so this awaits the whole chain."""
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, 'ndim')][0]
    float(jnp.asarray(leaf).ravel()[0])


def flagship(dtype, nsv=512, sy=150.):
    from pylabfea_tpu.ops.constitutive import DeviceMaterial
    rng = np.random.default_rng(0)
    u = rng.normal(size=(nsv, 6))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    lab = np.where(np.arange(nsv) % 2 == 0, 0.9, 1.1)
    sv = u * lab[:, None]
    dc = np.where(lab > 1., 1., -1.) * 0.5
    dm = DeviceMaterial(
        hill=jnp.ones(6, dtype), sy=jnp.asarray(sy, dtype),
        khard=jnp.asarray(0., dtype), drucker=jnp.asarray(0., dtype),
        sv=jnp.asarray(sv, dtype), dc=jnp.asarray(dc, dtype),
        rho=jnp.asarray(0.05, dtype), gamma=jnp.asarray(2.5, dtype),
        scale_seq=jnp.asarray(sy, dtype),
        scale_wh=jnp.asarray(1., dtype),
        feat_mean=jnp.zeros(0, dtype), feat_scale=jnp.zeros(0, dtype),
        tex=jnp.zeros(0, dtype), is_svc=True, dev_only=False)
    return dm, (sv, dc, 0.05, 2.5, sy)


def host_material(svc_np, sy, CV):
    """Host Material with the same SVC parameters (reference-equivalent
    execution: scalar response per element)."""
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops.svc import SVCParams
    sv, dc, rho, gamma, _ = svc_np
    mat = FE.Material('bench-ML')
    mat.elasticity(CV=np.asarray(CV, dtype=float))
    mat.plasticity(sy=sy, sdim=6)
    mat._svc = SVCParams(support_vectors=np.asarray(sv, float),
                         dual_coef=np.asarray(dc, float),
                         intercept=rho, gamma=gamma)
    mat.ML_yf = True
    mat.scale_seq = sy
    mat.Ndof = 6
    return mat


def main():
    from pylabfea_tpu.ops import constitutive as con
    from __graft_entry__ import _elastic_cv

    platform = jax.devices()[0].platform
    dtype = jnp.float32
    log(f'platform: {platform}, devices: {jax.devices()}')

    N = int(2 ** 20)  # 1M Gauss points / elements
    dm, svc_np = flagship(dtype)
    CV = _elastic_cv(dtype)
    sy = 150.

    rng = np.random.default_rng(1)
    # stress states near the yield locus + strain increments driving plastic flow
    u = rng.normal(size=(N, 6))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sig = jnp.asarray(u * sy * rng.uniform(0.55, 0.95, (N, 1)), dtype)
    epl = jnp.zeros((N, 6), dtype)
    deps = jnp.asarray(rng.normal(0., 1.0e-4, (N, 6)), dtype)

    step = jax.jit(lambda s, e, d: con.response_fast(dm, (s, e), d, CV, 12))
    out = step(sig, epl, deps)
    sync(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = step(sig, epl, deps)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    thr = N / dt
    log(f'device return-map: {N} points in {dt * 1e3:.1f} ms '
        f'-> {thr:,.0f} maps/s')

    # baseline: reference execution model (scalar per-element response on CPU)
    mat = host_material(svc_np, sy, CV)
    n_host = 40
    sig_h = np.asarray(sig[:n_host], float)
    epl_h = np.zeros((n_host, 6))
    deps_h = np.asarray(deps[:n_host], float)
    t0 = time.perf_counter()
    for i in range(n_host):
        mat.response(sig_h[i], epl_h[i], deps_h[i], np.asarray(CV, float))
    dt_host = time.perf_counter() - t0
    thr_host = n_host / dt_host
    log(f'reference-style host: {n_host} points in {dt_host * 1e3:.1f} ms '
        f'-> {thr_host:,.1f} maps/s')

    # north-star FE metric: full Newton load step — multigrid CG + batched
    # return map — on the 1024x1024 (1M-element) Hill-ML mesh of
    # BASELINE.json, recorded as extra fields of the JSON line
    fe_fields = {}
    try:
        import os
        if os.environ.get('PYLABFEA_BENCH_FE', '1') == '1':
            from pylabfea_tpu.ops import fe_kernels as fek
            NB = int(os.environ.get('PYLABFEA_BENCH_FE_N', '1024'))
            md = fek.rect_mesh(NB, NB, LX=1., LY=1., uniax='y',
                               eps_tot=0.002, dtype=dtype)
            st = fek.init_state(md, CV, dtype=dtype)
            st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
            sync(st.sig)
            # timed step in the production configuration: warm-started
            # from the previous increment (equal fractions)
            t0 = time.perf_counter()
            st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2,
                                        du0=d['du'])
            sync(st.sig)
            dt_fe = time.perf_counter() - t0
            log(f'FE Newton step ({NB}x{NB}={NB * NB:,} elements, MG-CG '
                f'{int(d["cg_iters"])} iters, res {float(d["cg_res"]):.1e}): '
                f'{dt_fe * 1e3:.0f} ms -> {NB * NB / dt_fe:,.0f} '
                f'element-updates/s')
            fe_fields = {"mesh": f"{NB}x{NB}", "step_s": round(dt_fe, 4),
                         "fe_element_updates_per_s": float(NB * NB / dt_fe),
                         "cg_iters": int(d["cg_iters"])}
    except Exception as e:  # never break the headline metric
        log(f'FE step benchmark skipped: {type(e).__name__}: {e}')

    vs = thr / thr_host
    print(json.dumps({
        "metric": "hill_ml_return_maps_per_s",
        "value": float(thr),
        "unit": "gauss_points/s",
        "vs_baseline": float(vs),
        **fe_fields,
    }))


if __name__ == '__main__':
    main()
