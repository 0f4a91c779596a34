"""Gradient-based plastic-parameter identification (ops.calibrate).

The reference package fits only the ELASTIC constants from data
(reference data.py:84-348); plastic anisotropy is captured indirectly via
SVC training on computed yield stresses.  ops.calibrate recovers the
plastic parameters DIRECTLY by differentiating through the device return
map, so the contract here is a round trip: simulate stress paths with a
known Hill material, fit from the paths alone, and require the parameters
back (up to the exact Hill gauge ray (hill*c, sy*sqrt(c), khard*sqrt(c)),
pinned by the uniax_x convention).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pylabfea_tpu.ops import calibrate, constitutive as con
from pylabfea_tpu.ops import jtensors as jt

HILL_TRUE = np.array([1.2, 0.9, 1.05, 1.0, 1.0, 1.0])
SY_TRUE, KHARD_TRUE = 150., 500.


def _cv_iso(E=200000., nu=0.3):
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    CV = np.zeros((6, 6))
    CV[:3, :3] = lam
    CV[np.arange(3), np.arange(3)] += 2 * mu
    CV[np.arange(3, 6), np.arange(3, 6)] = mu
    return jnp.asarray(CV)


def _mat(hill, sy, khard):
    return con.DeviceMaterial(
        hill=jnp.asarray(hill), sy=jnp.asarray(sy), khard=jnp.asarray(khard),
        drucker=jnp.asarray(0.), sv=jnp.zeros((1, 6)), dc=jnp.zeros(1),
        rho=jnp.asarray(0.), gamma=jnp.asarray(1.),
        scale_seq=jnp.asarray(sy), scale_wh=jnp.asarray(1.),
        feat_mean=jnp.zeros(0), feat_scale=jnp.zeros(0), tex=jnp.zeros(0),
        is_svc=False, dev_only=False, sdim3=False)


def _paths(npaths=12, nsteps=25, step=0.0016, seed=0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(npaths, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return jnp.asarray(np.repeat(dirs[:, None, :], nsteps, 1) * step)


def _simulate(m, deps, CV, maxiter=40):
    npaths = deps.shape[0]
    z = jnp.zeros((npaths, 6), deps.dtype)

    def stp(carry, d):
        s, e = carry
        _, sn, dp, _ = con.response_fast(m, (s, e), d, CV, maxiter, 1,
                                         fixed_trip=True)
        return (sn, e + dp), sn

    _, hist = jax.lax.scan(stp, (z, z), jnp.swapaxes(deps, 0, 1))
    return jnp.swapaxes(hist, 0, 1)


def test_fixed_trip_matches_while_loop():
    """fixed_trip=True must be value-identical to the production map."""
    CV = _cv_iso()
    m = _mat(HILL_TRUE, SY_TRUE, KHARD_TRUE)
    deps = _paths(6, 1, step=0.002)[:, 0]
    state = (jnp.zeros((6, 6)), jnp.zeros((6, 6)))
    out_w = con.response_fast(m, state, deps, CV, 40, 1)
    out_f = con.response_fast(m, state, deps, CV, 40, 1, fixed_trip=True)
    for a, b in zip(out_w, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)


def test_gradients_finite_at_virgin_state():
    """Virgin lanes (zero stress) sit on the sqrt kink of every equivalent
    measure; safe_sqrt must keep reverse-mode parameter gradients finite."""
    CV = _cv_iso()
    deps = _paths(4, 3)
    sig = _simulate(_mat(HILL_TRUE, SY_TRUE, KHARD_TRUE), deps, CV)
    theta = {'log_sy': jnp.log(jnp.asarray(SY_TRUE)),
             'log_hill': jnp.log(jnp.asarray(HILL_TRUE)),
             'raw_dsy': jnp.asarray(2.0)}

    def loss(th):
        sim = calibrate.simulate_paths(th, CV, deps, 40, 1, 0.01)
        return jnp.mean((sim - sig) ** 2)

    g = jax.grad(loss)(theta)
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), f'non-finite grad in {k}'


def test_round_trip_recovers_hill_material():
    CV = _cv_iso()
    deps = _paths()
    sig = _simulate(_mat(HILL_TRUE, SY_TRUE, KHARD_TRUE), deps, CV)

    params, info = calibrate.fit_plasticity(deps, sig, CV)

    assert info['loss'][-1] < 1e-6, 'LM did not reach the data floor'
    # gauge-fix the truth to the same uniax_x convention
    ct = 0.5 * (HILL_TRUE[0] + HILL_TRUE[2])
    rct = np.sqrt(ct)
    assert abs(params['sy'] - SY_TRUE / rct) / (SY_TRUE / rct) < 5e-3
    assert abs(params['khard'] - KHARD_TRUE / rct) / (KHARD_TRUE / rct) < 2e-2
    np.testing.assert_allclose(params['hill'], HILL_TRUE / ct, rtol=1e-2)
    # the simulated paths of the fit must overlay the data
    rms = float(jnp.sqrt(jnp.mean((info['sim'] - sig) ** 2)))
    assert rms < 1e-2 * float(jnp.sqrt(jnp.mean(sig ** 2)))


def test_estimate_init_lands_in_basin():
    """The slope seed must put khard within ~an order of magnitude and sy
    above the elastic floor — the basin requirement for the LM descent."""
    CV = _cv_iso()
    deps = _paths()
    sig = _simulate(_mat(HILL_TRUE, SY_TRUE, KHARD_TRUE), deps, CV)
    init = calibrate.estimate_init(deps, sig)
    assert 50. < init['khard'] < 5000.
    assert init['sy'] > 100.


def test_safe_sqrt_value_and_grad():
    x = jnp.asarray([0., 1e-30, 4.0])
    np.testing.assert_allclose(np.asarray(jt.safe_sqrt(x)),
                               np.sqrt(np.asarray(x)))
    g = jax.grad(lambda v: jt.safe_sqrt(v))(0.)
    assert float(g) == 0.
    g1 = jax.grad(lambda v: jt.safe_sqrt(v))(4.)
    assert abs(float(g1) - 0.25) < 1e-12
