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


def _material_of(theta, CV, dtype, peeq_ref=1.):
    """Positive-parameterized analytic DeviceMaterial: theta carries
    log(sy), log(hill) and raw_dsy = softplus-inverse of the FLOW-STRESS
    RISE over the reference plastic strain ``peeq_ref`` (khard =
    softplus(raw_dsy)/peeq_ref).  Any real theta is a valid material
    (positivity without constrained optimization), and the hardening
    parameter lives at stress scale — khard itself is sy/peeq_ref-scaled
    (~1e4-1e5), which conditions gradient descent so badly the khard
    direction never converges."""
    as_d = lambda x: jnp.asarray(x, dtype)
    sy = jnp.exp(theta['log_sy'])
    return con.DeviceMaterial(
        hill=jnp.exp(theta['log_hill']), sy=sy,
        khard=jax.nn.softplus(theta['raw_dsy']) / peeq_ref,
        drucker=as_d(0.),
        sv=as_d(np.zeros((1, 6))), dc=as_d(np.zeros(1)), rho=as_d(0.),
        gamma=as_d(1.), scale_seq=sy, scale_wh=as_d(1.),
        feat_mean=as_d(np.zeros(0)), feat_scale=as_d(np.zeros(0)),
        tex=as_d(np.zeros(0)), is_svc=False, dev_only=False, sdim3=False)


def simulate_paths(theta, CV, deps_paths, maxiter=12, nsub=1, peeq_ref=1.):
    """Integrate the return map along strain paths.

    deps_paths: (npaths, nsteps, 6) per-step strain increments.
    Returns (npaths, nsteps, 6) stresses after each step.  Differentiable
    w.r.t. ``theta`` (and ``CV``).
    """
    dtype = deps_paths.dtype
    m = _material_of(theta, CV, dtype, peeq_ref)
    npaths = deps_paths.shape[0]
    z = jnp.zeros((npaths, 6), dtype)

    def step(carry, deps):
        sig, epl = carry
        _, sig_n, depl, _ = con.response_fast(
            m, (sig, epl), deps, CV, maxiter, nsub, fixed_trip=True)
        return (sig_n, epl + depl), sig_n

    _, sig_hist = jax.lax.scan(step, (z, z), jnp.swapaxes(deps_paths, 0, 1))
    return jnp.swapaxes(sig_hist, 0, 1)


def estimate_init(deps_paths, sig_paths):
    """Slope-based {sy, khard} seed from the raw path data.

    Per path, the equivalent stress vs equivalent total strain curve is
    bilinear-ish: an elastic leg (slope from the first two samples) and a
    hardening leg (slope over the last quarter).  The hardening modulus
    follows from the series-compliance relation 1/s_pl = 1/s_el + 1/khard
    and the yield strength from the leg intersection.  Crude (the first
    sample may itself be plastic, and the Hill shape distorts per-path
    values), but it lands inside the basin of the global optimum — which
    is what the LM descent needs: a cold khard start collapses into the
    softplus-saturated khard=0 local minimum and cannot recover.
    """
    from pylabfea_tpu.ops import jtensors as jt

    seq_p = np.asarray(jt.seq_j2_voigt(sig_paths))
    eeq_p = np.asarray(jt.eps_eq(jnp.cumsum(deps_paths, axis=1)))
    nst = seq_p.shape[1]
    tail = max(nst // 4, 2)
    khs, sys_ = [], []
    for s, e in zip(seq_p, eeq_p):
        s_el = (s[1] - s[0]) / max(e[1] - e[0], 1e-16)
        s_pl = (s[-1] - s[-tail]) / max(e[-1] - e[-tail], 1e-16)
        if 0. < s_pl < 0.9 * s_el:
            khs.append(1. / max(1. / s_pl - 1. / s_el, 1e-16))
            e_y = (s[-1] - s_pl * e[-1]) / (s_el - s_pl)
            sys_.append(s_el * e_y)
    if not khs:  # no path shows a hardening bend — fall back
        seq = jt.seq_j2_voigt(jnp.reshape(sig_paths, (-1, 6)))
        return {'sy': 0.9 * float(jnp.max(seq)), 'hill': np.ones(6),
                'khard': 1.0}
    return {'sy': float(np.median(sys_)), 'hill': np.ones(6),
            'khard': float(np.median(khs))}


def fit_plasticity(deps_paths, sig_paths, CV, init=None, steps=80,
                   maxiter=40, nsub=1, weights=None, gauge='uniax_x'):
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

    Returns (params dict with 'sy'/'hill'/'khard', info dict with the
    cost history and final simulated paths).
    """
    from jax.flatten_util import ravel_pytree

    from pylabfea_tpu.ops import jtensors as jt

    deps_paths = jnp.asarray(deps_paths)
    sig_paths = jnp.asarray(sig_paths, deps_paths.dtype)
    if init is None:
        init = estimate_init(deps_paths, sig_paths)
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
    scale = jnp.maximum(jnp.sqrt(jnp.mean(sig_paths ** 2)), 1e-12)
    if weights is None:
        w = jnp.ones((), deps_paths.dtype)
    else:
        w = jnp.asarray(weights, deps_paths.dtype)
        w = (w / jnp.mean(w))[:, None, None]

    x0, unravel = ravel_pytree(theta)

    def resid(x):
        sim = simulate_paths(unravel(x), CV, deps_paths, maxiter, nsub,
                             peeq_ref)
        return (jnp.sqrt(w) * (sim - sig_paths) / scale).ravel()

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
    if gauge == 'uniax_x':
        c = 0.5 * (params['hill'][0] + params['hill'][2])
        rc = float(np.sqrt(c))
        params = {'sy': params['sy'] / rc, 'hill': params['hill'] / c,
                  'khard': params['khard'] / rc}
    info = {'loss': hist,
            'sim': np.asarray(simulate_paths(theta, CV, deps_paths,
                                             maxiter, nsub, peeq_ref))}
    return params, info
