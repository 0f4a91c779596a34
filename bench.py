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
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# v5e single-chip peaks (jax-ml.github.io/scaling-book numbers): HBM
# bandwidth and bf16 MXU throughput.  f32 HIGHEST-precision matmuls run
# as 6 bf16 MXU passes, counted as such in the SVC roofline.
V5E_HBM_GBPS = 819.
V5E_BF16_TFLOPS = 197.

#: wedge-guard state: every probe attempt that failed to complete counts
#: one event; sections whose probe (and its one retry) failed are skipped
#: and listed.  Published in the BENCH JSON (VERDICT r5 item 6).
WEDGE = {'events': 0, 'skipped': []}


def _probe_once(timeout, simulate=False):
    """Dispatch a tiny matmul and read one scalar back in a daemon
    thread; True when the round trip completes within ``timeout``.  The
    known failure mode is a dispatch that never completes (readback hangs
    on a futex — BENCH_NOTES.md), which only a thread-join timeout can
    observe in-process.  ``simulate`` models that hang for the synthetic
    wedge test without touching the device."""
    if simulate:
        return False
    import threading
    done = []

    def work():
        try:
            x = jnp.ones((128, 128), jnp.float32)
            float(jnp.asarray(x @ x).ravel()[0])
            done.append(True)
        except Exception:
            pass

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    return bool(done)


def probe_section(tag, timeout=120):
    """Timed tiny-matmul probe before each timed section with
    retry-once-then-flag semantics: the tunnel-attached chip can wedge
    BETWEEN sections (19-minute outlier step, BENCH_NOTES.md round 4), and
    a wedged section would otherwise silently poison the round's numbers.
    Returns True when the section may run.  Synthetic-hang injection for
    tests: PYLABFEA_BENCH_FORCE_WEDGE='once' (first attempt of the first
    probed section hangs, retry recovers) | '<tag>' (that section's
    probes all hang -> section skipped) | 'all'."""
    forced = os.environ.get('PYLABFEA_BENCH_FORCE_WEDGE', '')
    sim = forced in ('all', tag) or forced == 'once'
    if _probe_once(timeout, simulate=sim):
        return True
    WEDGE['events'] += 1
    if forced == 'once':
        os.environ['PYLABFEA_BENCH_FORCE_WEDGE'] = ''
        forced = ''
    log(f'wedge probe [{tag}]: dispatch did not complete in {timeout}s '
        f'- retrying once')
    if _probe_once(timeout, simulate=forced in ('all', tag)):
        return True
    WEDGE['events'] += 1
    WEDGE['skipped'].append(tag)
    log(f'wedge probe [{tag}]: retry failed - section skipped')
    return False


def probe_accelerator(timeout=240):
    """The tunnel-attached TPU can wedge: computations dispatch but never
    complete, so any readback hangs on a futex forever (BENCH_NOTES.md).
    Probe it in a SUBPROCESS with a hard timeout before this process
    commits its (un-reinitialisable) jax backend to it.  Returns True when
    a trivial computation round-trips."""
    import subprocess
    code = ('import jax, jax.numpy as jnp; '
            'print(float(jnp.float32(1.) + jnp.float32(2.)))')
    try:
        res = subprocess.run([sys.executable, '-c', code], timeout=timeout,
                             capture_output=True, text=True)
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def client_watchdog(timeout=300.):
    """Guard the bench process's OWN first device touch.  Client creation
    can wedge in THIS process even when the subprocess probe round-trips
    (observed: two runs stuck >8 min / >50 min in ``jax.devices()`` while
    fresh processes computed fine).  Backend init holds jax's global
    backend lock, so once it hangs no in-process CPU fallback is possible
    — instead a daemon thread emits the one-line JSON with the wedge
    flagged and exits, so the driver records an honest result rather than
    hanging.  Returns an Event the caller sets once devices are live."""
    import threading
    done = threading.Event()

    def fire():
        if not done.wait(timeout):
            log(f'client creation did not complete in {timeout:.0f}s — '
                'flagging wedge and exiting')
            rec = {"metric": "hill_ml_return_maps_per_s", "value": 0.0,
                   "unit": "gauss_points/s", "vs_baseline": 0.0,
                   "platform": "none",
                   "wedge_events": WEDGE['events'] + 1,
                   "tpu_client_creation_wedged": True}
            print(json.dumps(rec), flush=True)
            os._exit(0)

    threading.Thread(target=fire, daemon=True).start()
    return done


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


def trained_flagship(dtype, compress='auto'):
    """Production-workload material: the GENUINELY TRAINED Hill-ML SVC of
    the reference-solve benchmark (REF_SOLVE_svc.npz — trained by the
    reference package's own train_SVC on the Hill reference), served
    through the default compression path.  This is what a real serving
    deployment runs; the 512-random-SV synthetic of ``flagship`` is an
    information-dense stress test kept for the headline return-map metric's
    round-over-round continuity.  Returns (dm, CV, eps, nsv, rel) or None
    when the npz is absent."""
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops.svc import SVCParams

    spath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'REF_SOLVE_svc.npz')
    if not os.path.exists(spath):
        return None
    z = np.load(spath)
    mat = FE.Material('trained-ML')
    mat.elasticity(CV=np.asarray(z['CV'], dtype=float))
    mat.plasticity(sy=float(z['sy']), sdim=6)
    mat._svc = SVCParams(support_vectors=np.asarray(z['support_vectors']),
                         dual_coef=np.asarray(z['dual_coef']),
                         intercept=float(z['intercept']),
                         gamma=float(z['gamma']))
    mat.ML_yf = True
    mat.dev_only = bool(z['dev_only'])
    mat.scale_seq = float(z['scale_seq'])
    mat.Ndof = 6
    dm = con.device_material_from(mat, dtype=dtype, compress=compress)
    rel = float(getattr(mat, 'svc_compress_rel', 0.))
    return dm, np.asarray(z['CV'], float), float(z['eps']), \
        int(dm.sv.shape[0]), rel


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


def ref_solve_fields(dtype):
    """Device-vs-REFERENCE FE-solve benchmark on the meshes recorded in
    REF_SOLVE.json (tools/bench_ref_solve.py runs the ACTUAL pyLabFEA
    package's Model.solve() once per machine — a 64-element solve takes
    ~12 min of host CPU).  The device side solves the identical BVP with
    the identical trained SVC (REF_SOLVE_svc.npz) under the convergence-
    gated equilibrium loop and must land on the reference's converged
    global stress (parity recorded alongside the speedup)."""
    import json as _json

    root = os.path.dirname(os.path.abspath(__file__))
    jpath = os.path.join(root, 'REF_SOLVE.json')
    spath = os.path.join(root, 'REF_SOLVE_svc.npz')
    if not (os.path.exists(jpath) and os.path.exists(spath)):
        return {}
    with open(jpath) as fh:
        rec = _json.load(fh)
    z = np.load(spath)
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops.svc import SVCParams

    mat = FE.Material('ref-ML')
    mat.elasticity(CV=np.asarray(z['CV'], dtype=float))
    mat.plasticity(sy=float(z['sy']), sdim=6)
    mat._svc = SVCParams(support_vectors=np.asarray(z['support_vectors']),
                         dual_coef=np.asarray(z['dual_coef']),
                         intercept=float(z['intercept']),
                         gamma=float(z['gamma']))
    mat.ML_yf = True
    mat.dev_only = bool(z['dev_only'])
    mat.scale_seq = float(z['scale_seq'])
    mat.Ndof = 6
    # default serving path: reduced-set compression with the guaranteed
    # sub-tolerance decision-function bound (a no-op when the trained SV
    # set is already minimal — reduce_svc falls back to the exact set)
    dm = con.device_material_from(mat, dtype=dtype, compress='auto')
    CV = np.asarray(z['CV'], dtype=float)
    eps = float(z['eps'])

    fields = {}
    for key, r in sorted(rec.get('sizes', {}).items(), key=lambda kv:
                         int(kv[0])):
        N = int(key)
        md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                           dtype=dtype)
        # one throwaway pass to exclude compile time (the reference's
        # recorded wall-clock is steady-state Python, not compilation).
        # commit_faithful: the fast cutting-plane projection drives the
        # inner iterations, then each step re-converges on the
        # reference-faithful substepped integrator (warm-started tail) —
        # the committed states follow the reference's DISCRETE
        # integration path, closing the fixed-point-in-band selection
        # gap that substep refinement could not (nsub=16 saturated at
        # 9.6e-3 because both integrators stop anywhere inside the
        # yield-tolerance band; the tail lands on the anchor's spot:
        # measured 7e-6 at 8^2, tools/dbg_parity_commit.py)
        st, _ = fek.solve_uniaxial(md, dm, CV, nsteps=8, n_inner=2,
                                   dtype=dtype, gate=True, nsub=4,
                                   commit_faithful=True)
        sync(st.sig)
        t0 = time.perf_counter()
        st, hist = fek.solve_uniaxial(md, dm, CV, nsteps=8, n_inner=2,
                                      dtype=dtype, gate=True, nsub=4,
                                      commit_faithful=True)
        sync(st.sig)
        dt = time.perf_counter() - t0
        sig = np.asarray(hist[-1][0], float)
        # parity anchor: the CONVERGED faithful-f64 solution of the same
        # BVP (REF_SOLVE.json 'converged_glob_sig').  The reference
        # Model.solve() does NOT converge on this workload — it exits at
        # its 15-trial-iteration cap with ~15% equilibrium residual
        # (glob sig_xx ~ 25 MPa against a free right edge, impossible at
        # discrete equilibrium); our faithful host twin reproduces that
        # capped state, so the reference record is kept for wall-clock
        # and context only (see REF_SOLVE.json 'converged_note').
        anchor = np.asarray(r.get('converged_glob_sig', r['glob_sig']),
                            float)
        # two parities: the homogenized load-direction stress (the
        # quantity the reference's own examples report), and the max
        # over all components.  The latter is bounded by the
        # yf-tolerance band of this deliberately-crude SVC locus — the
        # fast and faithful paths land on different valid fixed points
        # within the band, differing ~3% in the soft components
        # (sig_zz, out-of-plane shears) while sig_yy agrees to ~1e-3.
        par_yy = float(abs(sig[1] - anchor[1]) / abs(anchor[1]))
        par_max = float(np.abs(sig - anchor).max()
                        / max(1., np.abs(anchor).max()))
        speed = r['solve_s'] / dt
        log(f'ref-solve {N}x{N}: reference {r["solve_s"]:.0f}s, device '
            f'{dt * 1e3:.0f} ms -> {speed:,.0f}x (vs converged '
            f'faithful-f64: sig_yy {par_yy:.1e}, max {par_max:.1e})')
        fields[f'fe_solve_speedup_{N}sq'] = round(speed, 1)
        fields[f'fe_solve_parity_{N}sq'] = float(f'{par_yy:.2e}')
        fields[f'fe_solve_parity_max_{N}sq'] = float(f'{par_max:.2e}')
    return fields


def scale_fields(dtype, CV):
    """Flagship-scale rows: a 2048^2 (4.2M-element) single-material
    production step and a 1024^2 3-material inclusion step (general BCs,
    corner pin, grouped return maps — the reference's train_hill.py
    flagship workload at TPU scale)."""
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek

    fields = {}
    # --- 2048^2 single material (trained SVC, like the 1024^2 row) ------
    tr = trained_flagship(dtype)
    if tr is not None:
        dm, CV, eps2k = tr[0], tr[1], tr[2]
    else:
        dm, _ = flagship(dtype)
        eps2k = 0.002
    md = fek.rect_mesh(2048, 2048, LX=1., LY=1., uniax='y', eps_tot=eps2k,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    sync(st.sig)
    t0 = time.perf_counter()
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2,
                                du0=d['du'], kes0=d.get('kes'),
                                dst0=d['dstiff'])
    sync(st.sig)
    dt = time.perf_counter() - t0
    log(f'FE Newton step 2048x2048 (4.2M elements, {int(d["cg_iters"])} '
        f'MG-CG iters): {dt * 1e3:.0f} ms -> {2048 * 2048 / dt:,.0f} '
        f'element-updates/s')
    fields['step_s_2048'] = round(dt, 4)

    # --- 1024^2 3-material inclusion (train_hill.py physics at scale) ---
    N = 1024
    mat_h = FE.Material(num=1)
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    mat_j = FE.Material(num=2)
    mat_j.elasticity(E=200.e3, nu=0.3)
    mat_j.plasticity(sy=150., sdim=3)
    mat_el = FE.Material(num=3)
    mat_el.elasticity(E=1.e3, nu=0.27)
    mat_map = np.zeros((N, N), dtype=int)
    mat_map[N // 2:, :] = 1
    mat_map[N // 3: 2 * N // 3, N // 3: 2 * N // 3] = 2
    bc = {'bot': {1: ('disp', 0.)}, 'left': {}, 'right': {},
          'top': {1: ('disp', 0.002 * 4.)},
          'nodes': ((0, 0, 0, 'disp', 0.),)}
    md = fek.rect_mesh(N, N, LX=4., LY=4., bc=bc, mat_map=mat_map,
                       dtype=dtype)
    dms = tuple(con.device_material_from(m, dtype=dtype)
                for m in (mat_h, mat_j, mat_el))
    CVs = tuple(np.asarray(m.CV, float) for m in (mat_h, mat_j, mat_el))
    st = fek.init_state(md, CVs, dtype=dtype)
    st, d = fek.load_step_split(md, st, dms, CVs, 0.25, n_inner=2)
    sync(st.sig)
    t0 = time.perf_counter()
    st, d = fek.load_step_split(md, st, dms, CVs, 0.25, n_inner=2,
                                du0=d['du'], kes0=d.get('kes'),
                                dst0=d['dstiff'])
    sync(st.sig)
    dt = time.perf_counter() - t0
    log(f'FE Newton step 1024x1024 3-material inclusion '
        f'({int(d["cg_iters"])} MG-CG iters): {dt * 1e3:.0f} ms')
    fields['step_s_1024_inclusion'] = round(dt, 4)
    return fields


def fe3d_fields(dtype):
    """3-D hex8 device-solver row (beyond-reference capability,
    ops/fe3d.py): a 64^3 = 262k-element J2+hardening elastoplastic step,
    timed warm (du warm start, mid-plasticity tangents).  64^3 keeps the
    XLA compile ~40 s (128^3 compiles ~3 min and runs 2.3-2.9 s/step —
    recorded in BENCH_NOTES.md, not re-measured every round)."""
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe3d

    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., khard=500., sdim=6)
    dm = con.device_material_from(mat, dtype=dtype)
    N = 64
    md = fe3d.box_mesh(N, N, N, uniax='z', eps_tot=0.002, dtype=dtype)
    st = fe3d.init_state3(md, mat.CV, dtype=dtype)
    # warm-up step compiles AND carries the mesh into the elastic-plastic
    # transition; the TIMED step advances the plastic front with changed
    # tangents (real MG-CG work — a third equal step would warm-start to
    # 0 iterations once the tangent field saturates, a degenerate row)
    st, d = fe3d.load_step3(md, st, dm, mat.CV, 0.4, n_inner=2,
                            du0=jnp.zeros_like(st.u))
    sync(st.sig)
    t0 = time.perf_counter()
    st, d = fe3d.load_step3(md, st, dm, mat.CV, 0.3, n_inner=2,
                            du0=d['du'])
    sync(st.sig)
    dt = time.perf_counter() - t0
    log(f'FE Newton step 3-D 64^3 (262k hex8 elements, '
        f'iters/inner {[int(x) for x in d["cg_iters_hist"]]}): '
        f'{dt * 1e3:.0f} ms -> {N ** 3 / dt:,.0f} element-updates/s')
    fields = {'step_s_64cubed_3d': round(dt, 4)}

    # --- 128^3 flagship row (VERDICT r5 item 2a: target <= 0.6 s).
    # ~2.1M hex8 elements; XLA compile ~3-5 min cold (persistent cache
    # makes reruns cheap).  PYLABFEA_BENCH_128=0 skips on a tight budget.
    if os.environ.get('PYLABFEA_BENCH_128', '1') == '1':
        N2 = 128
        md2 = fe3d.box_mesh(N2, N2, N2, uniax='z', eps_tot=0.002,
                            dtype=dtype)
        st2 = fe3d.init_state3(md2, mat.CV, dtype=dtype)
        st2, d2 = fe3d.load_step3(md2, st2, dm, mat.CV, 0.4, n_inner=2,
                                  du0=jnp.zeros_like(st2.u))
        sync(st2.sig)
        t0 = time.perf_counter()
        st2, d2 = fe3d.load_step3(md2, st2, dm, mat.CV, 0.3, n_inner=2,
                                  du0=d2['du'])
        sync(st2.sig)
        dt2 = time.perf_counter() - t0
        log(f'FE Newton step 3-D 128^3 (2.1M hex8 elements, iters/inner '
            f'{[int(x) for x in d2["cg_iters_hist"]]}): {dt2 * 1e3:.0f} ms '
            f'-> {N2 ** 3 / dt2:,.0f} element-updates/s')
        fields['step_s_128cubed'] = round(dt2, 4)
        del st2, d2, md2

    # measured roofline of the fused volume K-apply (VERDICT r5 item 5):
    # single-pass traffic model = the 36 tangent volumes once + u read
    # twice (aligned + shifted row streams) + out write (3 components)
    fixT = fe3d._split3(md.fixed)
    vT = fe3d._split3(st.u)
    Cp = st.elstiff
    # loop the apply INSIDE one jit (output chained into the next input)
    # so the per-call dispatch over the device tunnel (~1-2 ms) doesn't
    # floor the measurement at this size
    REPS_IN = 20
    apply_j = jax.jit(lambda C, v: jax.lax.fori_loop(
        0, REPS_IN, lambda _, vv: fe3d.k_apply3_t(md, C, vv, fixT), v))
    out = apply_j(Cp, vT)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = apply_j(Cp, vT)
    sync(out)
    t_a = (time.perf_counter() - t0) / (3 * REPS_IN)
    nn3 = (N + 1) ** 3
    gbps = (36 * N ** 3 + 9 * nn3) * 4 / t_a / 1e9
    log(f'volume K-apply {N}^3: {t_a * 1e3:.2f} ms -> {gbps:.0f} GB/s '
        f'({gbps / V5E_HBM_GBPS:.0%} of v5e HBM peak)')
    fields['volume_ms'] = round(t_a * 1e3, 3)
    fields['volume_gbps'] = round(gbps, 1)
    fields['volume_frac_peak'] = round(gbps / V5E_HBM_GBPS, 3)

    # --- 3-D multi-material inclusion (VERDICT r5 item 2b): centered
    # stiff elastic inclusion (1/8 edge fraction like train_hill's 2-D
    # flagship) in the J2+hardening matrix, grouped return map.  Parity
    # of the production dtype is asserted against an f64 solve at 16^3;
    # the timed row is the 64^3 transition step.
    incl = FE.Material(num=2)
    incl.elasticity(E=600.e3, nu=0.3)
    CV_i = np.zeros((6, 6))
    CV_i[:3, :3] = incl.C12
    np.fill_diagonal(CV_i[:3, :3], incl.C11)
    CV_i[3, 3] = CV_i[4, 4] = CV_i[5, 5] = incl.C44

    def incl_solve(Ni, dt_, nsteps=4):
        mm = np.zeros((Ni, Ni, Ni), np.int32)
        lo, hi = 3 * Ni // 8, 5 * Ni // 8
        mm[lo:hi, lo:hi, lo:hi] = 1
        mdi = fe3d.box_mesh(Ni, Ni, Ni, uniax='z', eps_tot=0.002,
                            mat_map=mm, dtype=dt_)
        dmm = con.device_material_from(mat, dtype=dt_)
        dmi = con.device_material_from(incl, dtype=dt_)
        return mdi, (dmm, dmi), (mat.CV, CV_i)

    md16, mats16, CVs16 = incl_solve(16, dtype)
    _, h32 = fe3d.solve_uniaxial3(md16, mats16, CVs16, nsteps=4,
                                  n_inner=2)
    md16d, mats16d, CVs16d = incl_solve(16, jnp.float64)
    _, h64 = fe3d.solve_uniaxial3(md16d, mats16d, CVs16d, nsteps=4,
                                  n_inner=2)
    gs32 = np.asarray(h32[-1][0], float)
    gs64 = np.asarray(h64[-1][0], float)
    par = float(np.abs(gs32 - gs64).max() / np.abs(gs64).max())
    assert par < 5e-4, f'3-D inclusion f32-vs-f64 parity {par:.2e}'
    fields['incl3d_parity_16cubed'] = round(par, 8)

    Ni = 64
    mdi, matsi, CVsi = incl_solve(Ni, dtype)
    sti = fe3d.init_state3(mdi, CVsi, dtype=dtype)
    sti, di = fe3d.load_step3(mdi, sti, matsi, CVsi, 0.4, n_inner=2,
                              du0=jnp.zeros_like(sti.u))
    sync(sti.sig)
    t0 = time.perf_counter()
    sti, di = fe3d.load_step3(mdi, sti, matsi, CVsi, 0.3, n_inner=2,
                              du0=di['du'])
    sync(sti.sig)
    dti = time.perf_counter() - t0
    log(f'FE Newton step 3-D 64^3 2-material inclusion (grouped return '
        f'map, f32-vs-f64 parity {par:.1e} at 16^3): {dti * 1e3:.0f} ms')
    fields['step_s_64cubed_3d_inclusion'] = round(dti, 4)
    return fields


def phase_fields(md, st, d, dm, CV, reps=3):
    """Per-phase breakdown of the production step (the three jitted
    programs of ``load_step_split``), published as JSON fields so perf
    work targets the dominant phase (tools/profile_step.py interactive
    twin).  Everything is warm here — the step benchmark just ran."""
    from pylabfea_tpu.ops import fe_kernels as fek

    def timed(fn):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / reps

    t_h = timed(lambda: fek._hier_kes_jit(md, st.elstiff))
    kes = fek._hier_kes_jit(md, st.elstiff)
    t_s = timed(lambda: fek._mg_solve_jit(md, kes, md.fixed_val * 0.25,
                                          md.force * 0.25, 1.e-6, 100,
                                          d['du']))
    t_r = timed(lambda: fek._respond_and_update(md, st, dm, CV, d['du'],
                                                True, 4))
    log(f'phases: hierarchy {t_h * 1e3:.1f} ms, warm solve '
        f'{t_s * 1e3:.1f} ms, response {t_r * 1e3:.1f} ms')
    fields = {'phase_hier_s': round(t_h, 4), 'phase_solve_s': round(t_s, 4),
              'phase_resp_s': round(t_r, 4)}

    # measured roofline of the fine-grid stencil K-apply (VERDICT r5
    # item 5): single-pass traffic model = the (8, 8, NX, NY) stiffness
    # planes once + u read + out write (2 components each)
    NX, NY = md.grid[:2]
    fixT = fek._split(md.fixed)
    vT = fek._split(d['du'])
    Kp = kes[0]
    apply_j = jax.jit(lambda K, v: fek.k_apply_t(md, K, v, fixT))
    out = apply_j(Kp, vT)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = apply_j(Kp, vT)
    sync(out)
    t_a = (time.perf_counter() - t0) / 10
    nn2 = (NX + 1) * (NY + 1)
    gbps = (64 * NX * NY + 6 * nn2) * 4 / t_a / 1e9
    log(f'stencil K-apply {NX}x{NY}: {t_a * 1e3:.2f} ms -> {gbps:.0f} GB/s '
        f'({gbps / V5E_HBM_GBPS:.0%} of v5e HBM peak)')
    fields['stencil_ms'] = round(t_a * 1e3, 3)
    fields['stencil_gbps'] = round(gbps, 1)
    fields['stencil_frac_peak'] = round(gbps / V5E_HBM_GBPS, 3)
    return fields


def svc_roofline_fields(dm, sig, epl):
    """Measured roofline of the fused SVC decision+gradient pass (the
    return map's inner kernel): HBM side counts the (N, nsv) kernel
    matrix written + read once (XLA materializes it between the two
    MXU contractions at these sizes) plus features/SV/outputs; MXU side
    counts the two (N, ndof, nsv) contractions at 6 bf16 passes each
    (HIGHEST-precision f32)."""
    from pylabfea_tpu.ops import constitutive as con

    x = con._features(dm, sig, epl)
    N, ndof = x.shape
    nsv = dm.sv.shape[0]
    f = jax.jit(lambda xx: con.svc_decision_and_gradient(dm, xx))
    out = f(x)
    sync(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = f(x)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    bytes_ = (2 * N * nsv + 3 * N * ndof + 2 * nsv * ndof + N) * 4
    gbps = bytes_ / dt / 1e9
    flops = 6 * 2 * (2 * N * nsv * ndof)
    tflops = flops / dt / 1e12
    frac = max(gbps / V5E_HBM_GBPS, tflops / V5E_BF16_TFLOPS)
    log(f'SVC f+grad pass ({N}x{nsv}): {dt * 1e3:.2f} ms -> {gbps:.0f} GB/s'
        f' / {tflops:.1f} bf16-TFLOP/s ({frac:.0%} of v5e roofline)')
    return {'svc_ms': round(dt * 1e3, 3), 'svc_gbps': round(gbps, 1),
            'svc_tflops': round(tflops, 2),
            'svc_frac_peak': round(frac, 3)}


def main():
    from pylabfea_tpu.ops import constitutive as con
    from __graft_entry__ import _elastic_cv

    wedged = False
    if os.environ.get('PYLABFEA_BENCH_PROBE', '1') == '1' \
            and not probe_accelerator():
        # The attached accelerator never completed a trivial computation:
        # fall back to the local CPU backend (config.update is required —
        # env vars alone do not override an attached plugin) and shrink
        # the workload so the benchmark still completes and reports,
        # honestly flagged, instead of hanging the driver.
        wedged = True
        jax.config.update('jax_platforms', 'cpu')
        os.environ.setdefault('PYLABFEA_BENCH_SCALE', '0')
        os.environ.setdefault('PYLABFEA_BENCH_FE_N', '256')
        log('accelerator probe FAILED (dispatch never completed) — '
            'falling back to local CPU, scale rows off')

    live = client_watchdog(float(os.environ.get(
        'PYLABFEA_BENCH_CLIENT_TIMEOUT', '300')))
    if os.environ.get('PYLABFEA_BENCH_FORCE_CLIENT_WEDGE'):
        time.sleep(1e9)   # synthetic client-creation hang (watchdog test)
    platform = jax.devices()[0].platform
    live.set()
    dtype = jnp.float32
    log(f'platform: {platform}, devices: {jax.devices()}')

    N = int(os.environ.get('PYLABFEA_BENCH_N',
                           2 ** 20 if not wedged else 2 ** 18))
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

    # measured SVC-kernel roofline (the return map's inner pass)
    fe_fields = {}
    try:
        fe_fields.update(svc_roofline_fields(dm, sig, epl))
    except Exception as e:
        log(f'SVC roofline skipped: {type(e).__name__}: {e}')

    # north-star FE metric: full Newton load step — multigrid CG + batched
    # return map — on the 1024x1024 (1M-element) Hill-ML mesh of
    # BASELINE.json, recorded as extra fields of the JSON line
    try:
        if os.environ.get('PYLABFEA_BENCH_FE', '1') == '1' \
                and probe_section('fe'):
            from pylabfea_tpu.ops import fe_kernels as fek
            NB = int(os.environ.get('PYLABFEA_BENCH_FE_N', '1024'))
            # production workload: the trained Hill-ML SVC (the material a
            # real deployment serves), through the default compression
            # path; the 512-random-SV synthetic row is kept alongside for
            # round-over-round continuity
            tr = trained_flagship(dtype)
            if tr is not None:
                dm_t, CV_t, eps_t, nsv_t, rel_t = tr
            else:
                dm_t, CV_t, eps_t, nsv_t, rel_t = dm, CV, 0.002, 512, 0.

            def run_step(dm_s, CV_s, eps_s, n_timed=2):
                md = fek.rect_mesh(NB, NB, LX=1., LY=1., uniax='y',
                                   eps_tot=eps_s, dtype=dtype)
                st = fek.init_state(md, CV_s, dtype=dtype)
                st, d = fek.load_step_split(md, st, dm_s, CV_s, 0.25,
                                            n_inner=2)
                sync(st.sig)
                # timed steps in the production configuration:
                # warm-started from the previous increment (equal
                # fractions), hierarchy threaded when the tangent field
                # carried over unchanged.  Two consecutive timed steps
                # pin the warm-start protocol and expose run-to-run
                # variance (VERDICT r4 item 4).
                times, iters = [], []
                for _ in range(n_timed):
                    t0 = time.perf_counter()
                    st, d = fek.load_step_split(
                        md, st, dm_s, CV_s, 0.25, n_inner=2, du0=d['du'],
                        kes0=d.get('kes'), dst0=d['dstiff'])
                    sync(st.sig)
                    times.append(time.perf_counter() - t0)
                    iters.append([int(x) for x in d['cg_iters_hist']])
                return md, st, d, times, iters

            md, st, d, times, iters = run_step(dm_t, CV_t, eps_t)
            dt_fe = times[0]
            log(f'FE Newton step ({NB}x{NB}={NB * NB:,} elements, trained '
                f'SVC nsv={nsv_t}, MG-CG iters/inner {iters[0]}, res '
                f'{float(d["cg_res"]):.1e}): '
                + ' / '.join(f'{t * 1e3:.0f}' for t in times)
                + f' ms -> {NB * NB / dt_fe:,.0f} element-updates/s')
            fe_fields = {"mesh": f"{NB}x{NB}", "step_s": round(dt_fe, 4),
                         "step_s_rep": round(times[1], 4),
                         "fe_element_updates_per_s": float(NB * NB / dt_fe),
                         "cg_iters": int(d["cg_iters"]),
                         "cg_iters_hist": iters,
                         "step_nsv": nsv_t,
                         "svc_compress_rel": rel_t}
            fe_fields.update(phase_fields(md, st, d, dm_t, CV_t))
            if tr is not None:
                _, _, d5, t5, i5 = run_step(dm, CV, 0.002)
                log(f'FE Newton step synthetic 512-SV SVC: '
                    + ' / '.join(f'{t * 1e3:.0f}' for t in t5)
                    + f' ms (MG-CG iters/inner {i5[0]})')
                fe_fields['step_s_synth512'] = round(t5[0], 4)
    except Exception as e:  # never break the headline metric
        log(f'FE step benchmark skipped: {type(e).__name__}: {e}')

    try:
        if os.environ.get('PYLABFEA_BENCH_FE', '1') == '1' \
                and os.environ.get('PYLABFEA_BENCH_SCALE', '1') == '1' \
                and probe_section('scale'):
            fe_fields.update(scale_fields(dtype, CV))
    except Exception as e:
        log(f'scale benchmark skipped: {type(e).__name__}: {e}')

    try:
        if os.environ.get('PYLABFEA_BENCH_FE', '1') == '1' \
                and os.environ.get('PYLABFEA_BENCH_3D', '1') == '1' \
                and probe_section('3d'):
            fe_fields.update(fe3d_fields(dtype))
    except Exception as e:
        log(f'3-D benchmark skipped: {type(e).__name__}: {e}')

    try:
        if os.environ.get('PYLABFEA_BENCH_REF', '1') == '1' \
                and probe_section('ref'):
            fe_fields.update(ref_solve_fields(dtype))
    except Exception as e:
        log(f'reference-solve benchmark skipped: {type(e).__name__}: {e}')

    vs = thr / thr_host
    rec = {
        "metric": "hill_ml_return_maps_per_s",
        "value": float(thr),
        "unit": "gauss_points/s",
        "vs_baseline": float(vs),
        "platform": platform,
        **fe_fields,
    }
    rec["wedge_events"] = WEDGE['events']
    if WEDGE['skipped']:
        rec["wedge_skipped"] = WEDGE['skipped']
    if wedged:
        rec["tpu_wedged_cpu_fallback"] = True
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
