"""Gradient-based plastic-parameter identification (TPU-native).

The reference identifies the ELASTIC stiffness tensor from data with a
least-squares / L-BFGS-B fit (``get_elastic_coefficients``, reference
data.py:84-348) but has no direct instrument for the PLASTIC parameters:
anisotropy is only captured indirectly, by computing yield stresses per
load case and training an SVC on them.  Automatic differentiation through
the device return map provides that instrument natively: simulate the
stress response along the measured strain paths with
``constitutive.response_fast(fixed_trip=True)`` (value-identical to the
production projection, but a fixed-trip ``fori_loop`` so reverse mode has
a transpose), and descend the stress misfit with respect to the yield
strength, the six Hill coefficients and the hardening modulus.

The fit runs on whatever backend JAX is on — on TPU the simulation over
(npaths, nsteps) batches is the same MXU-mapped kernel the FE solver
uses, so thousands of experimental paths calibrate in one descent.

Typical use::

    from pylabfea_tpu.ops import calibrate
    params, info = calibrate.fit_plasticity(deps_paths, sig_paths, CV)
    mat.plasticity(sy=params['sy'], hill=list(params['hill']),
                   khard=params['khard'], sdim=6)

with ``deps_paths/sig_paths`` of shape (npaths, nsteps, 6): per-step
strain increments (Voigt, engineering shear) and the stresses measured at
the end of each step.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import jtensors as jt


def _material_of(theta, dtype, peeq_ref=1.):
    """Positive-parameterized analytic DeviceMaterial: theta carries
    log(sy), log(hill) and raw_dsy = softplus-inverse of the FLOW-STRESS
    RISE over the reference plastic strain ``peeq_ref`` (khard =
    softplus(raw_dsy)/peeq_ref).  Any real theta is a valid material
    (positivity without constrained optimization), and the hardening
    parameter lives at stress scale — khard itself is sy/peeq_ref-scaled
    (~1e4-1e5), which conditions gradient descent so badly the khard
    direction never converges.  Optional keys 'raw_vr' (softplus, stress
    scale) and 'log_vb_peeq' (log of voce_b*peeq_ref, so the rate lives at
    O(1)) switch on Voce saturation hardening; optional key 'drucker'
    (raw, sign-free — the I1 term is linear in it) fits the
    tension/compression asymmetry."""
    as_d = lambda x: jnp.asarray(x, dtype)
    sy = jnp.exp(theta['log_sy'])
    voce = 'raw_vr' in theta
    return con.DeviceMaterial(
        hill=jnp.exp(theta['log_hill']), sy=sy,
        khard=jax.nn.softplus(theta['raw_dsy']) / peeq_ref,
        drucker=theta.get('drucker', as_d(0.)),
        sv=as_d(np.zeros((1, 6))), dc=as_d(np.zeros(1)), rho=as_d(0.),
        gamma=as_d(1.), scale_seq=sy, scale_wh=as_d(1.),
        feat_mean=as_d(np.zeros(0)), feat_scale=as_d(np.zeros(0)),
        tex=as_d(np.zeros(0)),
        voce_r=jax.nn.softplus(theta['raw_vr']) if voce else as_d(0.),
        voce_b=(jnp.exp(theta['log_vb_peeq']) / peeq_ref if voce
                else as_d(1.)),
        is_svc=False, dev_only=False, sdim3=False)


_CV_SCALE = 450.  # sqrt(typical stiffness entry) — keeps chol params O(1)


def _cv_of(raw):
    """Symmetric positive-definite 6x6 stiffness from a raw 21-vector:
    Cholesky parameterization C = L L^T (same trick as the reference's
    L-BFGS elastic fit, data.py:147-251 — positivity without constraints),
    scaled so O(1) raw entries give O(2e5) moduli."""
    L = jnp.zeros((6, 6), raw.dtype).at[jnp.tril_indices(6)].set(
        raw * _CV_SCALE)
    return L @ L.T


def _cv_raw_of(CV):
    """Inverse of _cv_of: raw 21-vector for a given SPD stiffness."""
    L = np.linalg.cholesky(np.asarray(CV))
    return L[np.tril_indices(6)] / _CV_SCALE


def _be_project(m, sig_in, epl_in, deps, CV, iters=12):
    """One backward-Euler closest-point projection with IMPLICIT (IFT)
    derivatives via ``lax.custom_root``.

    Unknown z = [sig (6), dlam] per lane; residual R_sig = sig - sig_tr +
    dlam * C a(sig), R_f = f(sig, peeq(epl_in + dlam a(sig))) (elastic
    lanes pinned to the trial).  The solve is a plain vmapped 7x7 Newton;
    the tangent solve is ONE batched linear solve at the solution — so the
    derivative is exact at the converged point and BOUNDED regardless of
    iteration count, where unrolled AD of the projection loop is
    tangent-EXPANDING near the Drucker cone apex (~2.6x per trip,
    overflowing at 40 trips).  Memory: O(1) in iters for the backward
    pass vs O(iters) unrolled.
    """
    sig_tr = sig_in + deps @ CV.T
    peeq_in = jt.eps_eq(epl_in)
    f_tr = con.yf(m, sig_tr, peeq_in)
    toler = con.flow_stress(m, peeq_in) * 5e-3
    plastic = f_tr > toler
    scale_r = jnp.max(jnp.abs(CV))

    def residual(z):
        sig, dlam = z[..., :6], z[..., 6]
        a = con.fgrad(m, sig)
        depl = dlam[..., None] * a
        peeq = jt.eps_eq(epl_in + depl)
        r_sig = sig - sig_tr + dlam[..., None] * (a @ CV.T)
        r_f = con.yf(m, sig, peeq) / scale_r
        r_pl = jnp.concatenate([r_sig, r_f[..., None]], -1)
        r_el = jnp.concatenate([sig - sig_tr, dlam[..., None]], -1)
        return jnp.where(plastic[..., None], r_pl, r_el)

    def _lane_cols(g, like):
        """Lane-diagonal linear map -> per-lane (7,7) Jacobian in 7
        applications of g (one-hot tangents broadcast over lanes)."""
        cols = [g(jnp.zeros_like(like).at[..., i].set(1.))
                for i in range(7)]
        return jnp.stack(cols, axis=-1)

    def solve(f, z0):
        def newton(z, _):
            J = _lane_cols(jax.linearize(f, z)[1], z0)

            r = f(z)
            dz = jnp.linalg.solve(J, r[..., None])[..., 0]
            return z - dz, None
        z, _ = jax.lax.scan(newton, z0, None, length=iters)
        return z

    def tangent_solve(g, y):
        J = _lane_cols(g, y)
        return jnp.linalg.solve(J, y[..., None])[..., 0]

    z0 = jnp.concatenate([sig_tr, jnp.zeros(sig_tr.shape[:-1] + (1,),
                                            sig_tr.dtype)], -1)
    z = jax.lax.custom_root(residual, z0, solve, tangent_solve)
    sig = z[..., :6]
    dlam = z[..., 6]
    depl = dlam[..., None] * con.fgrad(m, sig)
    depl = jnp.where(plastic[..., None], depl, 0.)
    sig = jnp.where(plastic[..., None], sig, sig_tr)
    return sig, depl


def simulate_paths(theta, CV, deps_paths, maxiter=12, nsub=1, peeq_ref=1.,
                   integrator='unrolled'):
    """Integrate the return map along strain paths.

    deps_paths: (npaths, nsteps, 6) per-step strain increments.
    Returns (npaths, nsteps, 6) stresses after each step.  Differentiable
    w.r.t. ``theta`` (and ``CV``).  A theta key 'cv_raw' (Cholesky
    21-vector) OVERRIDES ``CV`` — the joint elastic-plastic fit.

    ``integrator``: 'unrolled' (default) differentiates through the
    production cutting-plane loop (``response_fast(fixed_trip=True)``) —
    exact w.r.t. the production map, but its tangent chain is expanding
    near the Drucker cone apex; 'implicit' uses the backward-Euler
    projection with implicit-function-theorem derivatives
    (:func:`_be_project`) — O(deps^2) away from the production map in
    value, but derivative-bounded everywhere and O(1)-memory backward.
    """
    dtype = deps_paths.dtype
    if 'cv_raw' in theta:
        CV = _cv_of(theta['cv_raw'])
    m = _material_of(theta, dtype, peeq_ref)
    npaths = deps_paths.shape[0]
    z = jnp.zeros((npaths, 6), dtype)

    def step(carry, deps):
        sig, epl = carry
        if integrator == 'implicit':
            sig_n, depl = _be_project(m, sig, epl, deps, CV, iters=maxiter)
        else:
            _, sig_n, depl, _ = con.response_fast(
                m, (sig, epl), deps, CV, maxiter, nsub, fixed_trip=True)
        return (sig_n, epl + depl), sig_n

    _, sig_hist = jax.lax.scan(step, (z, z), jnp.swapaxes(deps_paths, 0, 1))
    return jnp.swapaxes(sig_hist, 0, 1)


def estimate_init(deps_paths, sig_paths, hardening='linear',
                  fit_drucker=False):
    """Slope-based {sy, khard [, voce_r, voce_b]} seed from the raw data.

    Per path, the equivalent stress vs equivalent total strain curve is
    bilinear-ish: an elastic leg (slope from the first two samples) and a
    hardening leg (slope over the last quarter).  The hardening modulus
    follows from the series-compliance relation 1/s_pl = 1/s_el + 1/khard
    and the yield strength from the leg intersection.  Crude (the first
    sample may itself be plastic, and the Hill shape distorts per-path
    values), but it lands inside the basin of the global optimum — which
    is what the LM descent needs: a cold khard start collapses into the
    softplus-saturated khard=0 local minimum and cannot recover.

    For ``hardening='voce'`` a scalar pre-fit of the pooled flow curve
    seq(peeq) refines the seed: grid over the saturation rate voce_b
    (whose log direction has the same boundary-collapse trap — vb -> 0
    degenerates Voce into the linear term and LM wanders off), linear
    least squares for (sy, khard, voce_r) at each rate, best residual
    wins.  peeq is proxied by eps_eq_total - seq/s_el.
    """
    from pylabfea_tpu.ops import jtensors as jt

    seq_p = np.asarray(jt.seq_j2_voigt(sig_paths))
    eeq_p = np.asarray(jt.eps_eq(jnp.cumsum(deps_paths, axis=1)))
    nst = seq_p.shape[1]
    if nst < 4:  # too short for slope legs — ceiling fallback
        seq = jt.seq_j2_voigt(jnp.reshape(sig_paths, (-1, 6)))
        init = {'sy': 0.9 * float(jnp.max(seq)), 'hill': np.ones(6),
                'khard': 1.0}
        if hardening == 'voce':
            init.update(voce_r=0.3 * init['sy'], voce_b=100.)
        if fit_drucker:
            init['drucker'] = 0.
        return init
    tail = max(nst // 4, 2)
    khs, sys_, sels = [], [], []
    for s, e in zip(seq_p, eeq_p):
        s_el = (s[1] - s[0]) / max(e[1] - e[0], 1e-16)
        s_pl = (s[-1] - s[-tail]) / max(e[-1] - e[-tail], 1e-16)
        if 0. < s_pl < 0.9 * s_el:
            khs.append(1. / max(1. / s_pl - 1. / s_el, 1e-16))
            e_y = (s[-1] - s_pl * e[-1]) / (s_el - s_pl)
            sys_.append(s_el * e_y)
            sels.append(s_el)
    if not khs:  # no path shows a hardening bend — fall back
        seq = jt.seq_j2_voigt(jnp.reshape(sig_paths, (-1, 6)))
        return {'sy': 0.9 * float(jnp.max(seq)), 'hill': np.ones(6),
                'khard': 1.0}
    init = {'sy': float(np.median(sys_)), 'hill': np.ones(6),
            'khard': float(np.median(khs))}
    voce = hardening == 'voce'
    if not (voce or fit_drucker):
        return init
    # pooled scalar flow curve: peeq proxy per sample, plastic points only;
    # at flow, sqrt(I2) ~ sy + kh*p + vr*(1-exp(-vb*p)) - drucker*I1/3, all
    # LINEAR in (sy, kh, vr, drucker) given vb — one lstsq per grid node
    s_el = float(np.median(sels))
    pe, sq, i1 = [], [], []
    for s, e, sg in zip(seq_p, eeq_p, np.asarray(sig_paths)):
        p = e - s / s_el
        sel = p > 0.05 * p[-1] if p[-1] > 0 else p > 0
        pe.append(p[sel])
        sq.append(s[sel])
        i1.append(sg[sel, 0:3].sum(axis=-1))
    pe = np.concatenate(pe)
    sq = np.concatenate(sq)
    i1 = np.concatenate(i1)
    fallback_vb = 2. / max(float(pe.max()) if pe.size else 0., 1e-4)
    if pe.size < 8:
        if voce:
            init.update(voce_r=0.3 * init['sy'], voce_b=fallback_vb)
        if fit_drucker:
            init['drucker'] = 0.
        return init
    cols = [np.ones_like(pe), pe]
    if fit_drucker:
        cols.append(-i1 / 3.)
    best = None
    vb_grid = (np.geomspace(0.25 / pe.max(), 25. / pe.max(), 24) if voce
               else [None])
    for vb in vb_grid:
        A = np.stack(cols + ([-np.expm1(-vb * pe)] if voce else []), axis=1)
        coef, res, *_ = np.linalg.lstsq(A, sq, rcond=None)
        r = float(np.sum((A @ coef - sq) ** 2))
        if (not voce or coef[-1] >= 0.) and (best is None or r < best[0]):
            best = (r, coef, vb)
    if best is None:
        if voce:
            init.update(voce_r=0.3 * init['sy'], voce_b=fallback_vb)
        if fit_drucker:
            init['drucker'] = 0.
        return init
    _, coef, vb0 = best
    init.update(sy=max(float(coef[0]), 1e-3),
                khard=max(float(coef[1]), 1e-3))
    k = 2
    if fit_drucker:
        init['drucker'] = float(coef[k])
        k += 1
    if voce:
        init.update(voce_r=max(float(coef[k]), 1e-3), voce_b=float(vb0))
    return init


def fit_plasticity(deps_paths, sig_paths, CV, init=None, steps=80,
                   maxiter=40, nsub=1, weights=None, gauge='uniax_x',
                   hardening='linear', deviatoric=False,
                   fit_drucker=False, fit_CV=False, integrator='unrolled'):
    """Identify {sy, hill (6), khard} from measured stress paths.

    deps_paths, sig_paths: (npaths, nsteps, 6) strain increments and the
    stresses observed after each increment (same elastic stiffness ``CV``
    for all paths — identify it first with the elastic-coefficient fit).
    ``init`` optionally seeds {'sy': float, 'hill': (6,), 'khard': float};
    the default comes from :func:`estimate_init`.  ``weights`` (npaths,)
    optionally reweights paths.

    The Hill parameterization carries an exact gauge freedom — (hill*c,
    sy*sqrt(c), khard*sqrt(c)) is the SAME material for any c > 0 — so raw
    fitted parameters are only defined up to that ray.  ``gauge='uniax_x'``
    (default) pins it by rescaling so the uniaxial-x equivalent stress
    equals the applied stress, 0.5*(hill[0]+hill[2]) == 1 (the J2
    all-ones convention); ``gauge=None`` returns the raw optimum.

    The descent is Levenberg-Marquardt on the stacked relative stress
    residual with the 8-column Jacobian from forward-mode AD through the
    return-map scan (first-order methods stall in the ill-conditioned
    sy<->khard valley; the quadratic model does not).  ``maxiter`` is the
    return-map projection budget: it must be large enough that every lane
    FULLY converges, because truncated lanes turn the residual into
    iteration noise that floods the landscape with spurious stationary
    points (measured: maxiter=12 strands LM at 1e-2 parameter error with
    |J'r|=0; maxiter=40 recovers 1e-3).

    ``hardening='voce'`` additionally fits the saturation parameters
    {voce_r, voce_b} of sflow = sy + khard*peeq + voce_r*(1 -
    exp(-voce_b*peeq)) — micromechanical (CPFEM) hardening saturates, and
    the linear law alone overshoots beyond ~1% plastic strain.

    ``fit_drucker=True`` additionally fits the Drucker pressure-sensitivity
    coefficient (tension/compression asymmetry).  Caveat: keep the paths'
    hydrostatic drift bounded (|I1| well below 3*sy/drucker) — physical
    test protocols do this naturally, but strain-controlled paths with
    runaway volumetric strain drive states toward the Drucker cone apex,
    where the return map stays value-convergent but its unrolled
    derivative is expanding (~2.6x per Newton trip, measured) and the
    Jacobian overflows.

    ``fit_CV=True`` refines the elastic stiffness JOINTLY with the plastic
    parameters (21 Cholesky-parameterized coefficients seeded from the
    given ``CV``) — for data without clean pre-yield segments, where a
    separately fitted stiffness is biased by plastic contamination.  Note
    ``deviatoric=True`` removes the hydrostatic response from the
    residual, leaving the bulk-modulus block of a jointly fitted CV only
    weakly determined.

    ``deviatoric=True`` fits the deviatoric stress response only.  Every
    plastic parameter is deviatoric (associated flow is isochoric), while
    the hydrostatic response of finite-strain data carries O(eps^2)
    volumetric terms a small-strain model cannot represent — on the
    reference CPFEM set they reach K*eps^2 ~ 15 MPa rms and would drown
    the plastic signal (measured: the full-residual fit leaves 0.69
    relative rms, ALL of it hydrostatic, deviatoric rms 1.2 MPa).

    Returns (params dict with 'sy'/'hill'/'khard' [+'voce_r'/'voce_b'],
    info dict with the cost history and final simulated paths).
    """
    from jax.flatten_util import ravel_pytree

    from pylabfea_tpu.ops import jtensors as jt

    deps_paths = jnp.asarray(deps_paths)
    sig_paths = jnp.asarray(sig_paths, deps_paths.dtype)
    if init is None:
        init = estimate_init(deps_paths, sig_paths, hardening, fit_drucker)
    # hardening reference strain: the largest accumulated equivalent strain
    # in the data (upper bound of peeq) — puts the hardening parameter at
    # stress scale (see _material_of)
    eps_tot = jnp.cumsum(deps_paths, axis=1)
    peeq_ref = float(jnp.max(jt.eps_eq(eps_tot.reshape(-1, 6)))) or 1.
    dsy0 = max(float(init['khard']) * peeq_ref, 1e-6)
    theta = {
        'log_sy': jnp.log(jnp.asarray(init['sy'], deps_paths.dtype)),
        'log_hill': jnp.log(jnp.asarray(init['hill'], deps_paths.dtype)),
        # softplus^-1(dsy)
        'raw_dsy': jnp.asarray(float(np.log(np.expm1(dsy0) + 1e-300))
                               if dsy0 < 30. else dsy0,
                               deps_paths.dtype),
    }
    if hardening == 'voce':
        # seed from the scalar pre-fit (estimate_init); softplus keeps both
        # positive and LM reshuffles the linear-vs-voce share freely
        vr0 = max(float(init.get('voce_r', 0.5 * dsy0 / peeq_ref)), 1e-3)
        vb0 = max(float(init.get('voce_b', 2. / peeq_ref)), 1e-6)
        theta['raw_vr'] = jnp.asarray(
            float(np.log(np.expm1(vr0) + 1e-300)) if vr0 < 30. else vr0,
            deps_paths.dtype)
        theta['log_vb_peeq'] = jnp.asarray(np.log(vb0 * peeq_ref),
                                           deps_paths.dtype)
    elif hardening != 'linear':
        raise ValueError(f'unknown hardening model {hardening!r}')
    if fit_drucker:
        theta['drucker'] = jnp.asarray(float(init.get('drucker', 0.)),
                                       deps_paths.dtype)
    if fit_CV:
        theta['cv_raw'] = jnp.asarray(_cv_raw_of(CV), deps_paths.dtype)
    scale = jnp.maximum(jnp.sqrt(jnp.mean(sig_paths ** 2)), 1e-12)
    if weights is None:
        w = jnp.ones((), deps_paths.dtype)
    else:
        w = jnp.asarray(weights, deps_paths.dtype)
        w = (w / jnp.mean(w))[:, None, None]

    x0, unravel = ravel_pytree(theta)

    def _dev(s):
        p = jnp.mean(s[..., 0:3], axis=-1, keepdims=True)
        return s.at[..., 0:3].add(-p) if deviatoric else s

    sig_cmp = _dev(sig_paths)

    def resid(x):
        sim = simulate_paths(unravel(x), CV, deps_paths, maxiter, nsub,
                             peeq_ref, integrator)
        return (jnp.sqrt(w) * (_dev(sim) - sig_cmp) / scale).ravel()

    res_j = jax.jit(resid)
    jac_j = jax.jit(jax.jacfwd(resid))

    x = x0
    r = res_j(x)
    cost = float(r @ r)
    hist = [cost]
    lam = 1e-3
    for _ in range(steps):
        J = jac_j(x)
        JTJ = J.T @ J
        JTr = J.T @ r
        for _ in range(16):  # adapt damping until the step descends
            A = JTJ + lam * jnp.diag(jnp.maximum(jnp.diag(JTJ), 1e-12))
            dx = jnp.linalg.solve(A, -JTr)
            r_new = res_j(x + dx)
            c_new = float(r_new @ r_new)
            if c_new < cost:
                x, r, cost = x + dx, r_new, c_new
                lam = max(lam * 0.3, 1e-14)
                break
            lam *= 4.
        hist.append(cost)
        if cost < 1e-24 or lam > 1e18:  # converged / stationary
            break
    theta = unravel(x)
    params = {'sy': float(jnp.exp(theta['log_sy'])),
              'hill': np.asarray(jnp.exp(theta['log_hill'])),
              'khard': float(jax.nn.softplus(theta['raw_dsy'])) / peeq_ref}
    if hardening == 'voce':
        params['voce_r'] = float(jax.nn.softplus(theta['raw_vr']))
        params['voce_b'] = float(jnp.exp(theta['log_vb_peeq'])) / peeq_ref
    if fit_drucker:
        params['drucker'] = float(theta['drucker'])
    if fit_CV:
        params['CV'] = np.asarray(_cv_of(theta['cv_raw']))
    if gauge == 'uniax_x':
        c = 0.5 * (params['hill'][0] + params['hill'][2])
        rc = float(np.sqrt(c))
        params['sy'] = params['sy'] / rc
        params['hill'] = params['hill'] / c
        params['khard'] = params['khard'] / rc
        if 'voce_r' in params:
            params['voce_r'] = params['voce_r'] / rc  # stress scale, like sy
        if 'drucker' in params:
            params['drucker'] = params['drucker'] / rc  # rides on sqrt(I2)
    info = {'loss': hist,
            'sim': np.asarray(simulate_paths(theta, CV, deps_paths,
                                             maxiter, nsub, peeq_ref,
                                             integrator))}
    info['param_std'] = _param_std(jac_j, x, cost, theta, peeq_ref,
                                   hardening, fit_drucker)
    return params, info


def _param_std(jac_j, x, cost, theta, peeq_ref, hardening, fit_drucker):
    """Gauss-Newton parameter standard errors at the optimum.

    cov_raw = s^2 (J'J)^-1 with s^2 = cost/(m - n) (residuals already
    scale-normalized), mapped to the NATURAL parameters by the delta
    method through each transform (exp / softplus).  Reported in the RAW
    gauge (the uniax_x rescaling treats the gauge constant as fixed — its
    own uncertainty is pure gauge and carries no information); the exact
    Hill gauge ray is a NULL direction of J'J, so the covariance is the
    pseudo-inverse restricted to the identifiable subspace (near-null
    modes dropped).  Returns None when the fit is at an
    exact-interpolation floor (stds would be 0/inf noise)."""
    J = np.asarray(jac_j(x))
    m, n = J.shape
    if m <= n or cost < 1e-22:
        return None
    JTJ = J.T @ J
    cov = np.linalg.pinv(JTJ, rcond=1e-10) * (cost / (m - n))
    if not np.all(np.isfinite(cov)):
        return None
    sd = np.sqrt(np.maximum(np.diag(cov), 0.))
    # raveled order is alphabetical in the theta dict keys
    keys = sorted(theta.keys())
    out = {}
    pos = 0
    for k in keys:
        size = int(np.prod(np.shape(theta[k]))) or 1
        s = sd[pos:pos + size]
        v = np.asarray(theta[k]).reshape(-1)
        if k == 'log_sy':
            out['sy'] = float(np.exp(v[0]) * s[0])
        elif k == 'log_hill':
            out['hill'] = np.exp(v) * s
        elif k == 'raw_dsy':
            out['khard'] = float(_sigmoid(v[0]) * s[0]) / peeq_ref
        elif k == 'raw_vr':
            out['voce_r'] = float(_sigmoid(v[0]) * s[0])
        elif k == 'log_vb_peeq':
            out['voce_b'] = float(np.exp(v[0]) * s[0]) / peeq_ref
        elif k == 'drucker':
            out['drucker'] = float(s[0])
        elif k == 'cv_raw':
            out['cv_raw'] = s  # raw Cholesky space; full-C delta omitted
        pos += size
    return out


def _sigmoid(x):
    return 1. / (1. + np.exp(-x))


def resample_paths(records, nsteps=30, eps_max=None, cluster=2.0):
    """Rectangularize per-load-case stress/strain curves for the fit.

    records: {key: {'Stress': (N,6), 'Strain_Total': (N,6)}} — e.g.
    ``Data.lc_data`` from the CPFEM import pipeline (yield-onset-only
    'cyl' records, which carry a bare stress row, are skipped).  Every
    case is re-interpolated onto ``nsteps`` increments of total equivalent
    strain up to ``eps_max`` (default: the shortest case's reach, so every
    resampled path is fully backed by data).  The grid is power-law
    clustered toward zero strain (node j at cap*(j/n)**cluster) — the
    yield onset lives at a few permille of the path reach, and a uniform
    grid would leave the elastic leg (which conditions the sy direction of
    the fit) a single sample.  Returns (deps_paths, sig_paths) shaped
    (npaths, nsteps, 6).
    """
    from pylabfea_tpu.ops import jtensors as jt

    curves = []
    for key, rec in records.items():
        eps = np.asarray(rec.get('Strain_Total', np.zeros((0, 6))),
                         dtype=float)
        if eps.ndim != 2 or eps.shape[0] < 4:
            continue  # onset-only or too-short record
        sig = np.asarray(rec['Stress'], dtype=float)
        arc = np.asarray(jt.eps_eq(jnp.asarray(eps)))
        # strictly increasing arc length: keep only points above the
        # running maximum (a pairwise diff test keeps DECREASING arcs
        # after a back-step larger than its recovery, and np.interp on an
        # unsorted grid silently emits off-curve samples)
        run = np.maximum.accumulate(arc)
        keep = arc > np.concatenate([[-np.inf], run[:-1] + 1e-12])
        curves.append((arc[keep], eps[keep], sig[keep]))
    if not curves:
        raise ValueError('no full-curve load cases in records')
    reach = min(arc[-1] for arc, _, _ in curves)
    cap = reach if eps_max is None else min(eps_max, reach)
    grid = cap * (np.arange(1, nsteps + 1) / nsteps) ** cluster
    eps_r = np.zeros((len(curves), nsteps, 6))
    sig_r = np.zeros((len(curves), nsteps, 6))
    for p, (arc, eps, sig) in enumerate(curves):
        for k in range(6):
            eps_r[p, :, k] = np.interp(grid, arc, eps[:, k])
            sig_r[p, :, k] = np.interp(grid, arc, sig[:, k])
    deps = np.diff(eps_r, axis=1, prepend=np.zeros((len(curves), 1, 6)))
    return jnp.asarray(deps), jnp.asarray(sig_r)


def fit_from_data(db, CV=None, nsteps=30, eps_max=None,
                  shear_convention='engineering', deviatoric=True,
                  **fit_kw):
    """Identify {sy, hill, khard} from a ``dataio.Data`` database.

    The best-fit Hill material is the analytic surrogate of the measured
    behavior — complementary to the SVC route (which learns the locus
    shape non-parametrically but gives no interpretable coefficients).

    ``db``: a Data instance (its ``lc_data`` full-curve records and fitted
    ``mat_data['elast_const']`` are used) or a bare records dict (then
    ``CV`` is required).  The fit is deviatoric by default (finite-strain
    data carries O(eps^2) hydrostatic terms a small-strain model cannot
    represent — see :func:`fit_plasticity`).  Remaining kwargs pass
    through to :func:`fit_plasticity`.

    ``shear_convention``: the shear-strain convention of the DATABASE.
    The package (and the return map integrated here) uses engineering
    shear (gamma = 2 eps_ij); CPFEM databases typically store tensor
    components eps_ij — e.g. the reference's bundled random-texture set,
    where the fitted C44/((C11-C12)/2) = 1.98 on a macroscopically
    isotropic texture gives the convention away.  The mismatch is
    invisible to everything else in the pipeline (the elastic fit is
    self-consistent in either convention, and the reference never
    integrates these strains), but it DOUBLE-counts the plastic shear
    relief in the return map and poisons the fitted shear coefficients
    (measured: hill[3:] = 0.52 on isotropic-onset data).  With 'tensor',
    shear strain columns are doubled and — because a stiffness fitted in
    the tensor convention is wrong for engineering strains — the elastic
    stiffness is refitted from the pre-yield samples of the converted
    paths (any explicit ``CV`` must already be engineering-convention).
    """
    records = getattr(db, 'lc_data', None)
    if records is None:
        if isinstance(db, dict):
            records = db
        else:
            raise ValueError('database carries no load-case records '
                             '(lc_data is unset)')
    deps, sig = resample_paths(records, nsteps, eps_max)
    if shear_convention == 'tensor':
        deps = deps.at[..., 3:].mul(2.)
    elif shear_convention != 'engineering':
        raise ValueError(f'unknown shear_convention {shear_convention!r}')
    if CV is None and shear_convention == 'engineering':
        md = getattr(db, 'mat_data', {})
        CV = md.get('elast_const')
    if CV is None:
        # refit from the pre-yield prefix of the (converted) paths
        from pylabfea_tpu.dataio import get_elastic_coefficients
        from pylabfea_tpu.ops import jtensors as jt
        seq = np.asarray(jt.seq_j2_voigt(sig))
        eps_c = np.asarray(jnp.cumsum(deps, axis=1))
        keep = seq < 0.5 * seq.max(axis=1, keepdims=True)
        if keep.sum() < 12:
            raise ValueError('too few pre-yield samples to fit the elastic '
                             'stiffness: pass CV explicitly')
        CV = get_elastic_coefficients(eps_c[keep], np.asarray(sig)[keep])
    params, info = fit_plasticity(deps, sig, jnp.asarray(np.asarray(CV)),
                                  deviatoric=deviatoric, **fit_kw)
    # the engineering-convention stiffness actually used (refitted when the
    # database convention is 'tensor' — the stored elast_const is then NOT
    # valid for engineering strains)
    info['CV'] = np.asarray(CV)
    return params, info
