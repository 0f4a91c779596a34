"""brent_vec / brent_jax must reproduce scipy.optimize brentq iterates.

The constitutive return map locates the ML yield surface with brentq at
xtol=1e-5 while the regression contract is tighter than that, so we require
*exact* (bitwise) agreement with scipy on a broad sweep of smooth functions
and brackets, not just agreement within xtol.
"""
import numpy as np

from scipy.optimize import root_scalar

from pylabfea_tpu.ops.rootfind import brent_vec, brent_jax


def _sweep_cases():
    rng = np.random.default_rng(42)
    cases = []
    for _ in range(200):
        a = rng.uniform(-3, 1)
        b = a + rng.uniform(0.5, 6)
        k = rng.uniform(0.3, 4.0)
        lo, hi = np.tanh(k * a), np.tanh(k * b)
        shift = rng.uniform(lo + 0.05 * (hi - lo), hi - 0.05 * (hi - lo))
        cases.append((a, b, k, shift))
    return cases


def test_brent_vec_matches_scipy_bitwise():
    cases = _sweep_cases()
    xa = np.array([c[0] for c in cases])
    xb = np.array([c[1] for c in cases])
    kk = np.array([c[2] for c in cases])
    sh = np.array([c[3] for c in cases])

    def f(x):
        return np.tanh(kk * x) - sh

    roots, ok = brent_vec(f, xa, xb, xtol=1.e-5)
    assert ok.all()
    for i, (a, b, k, s) in enumerate(cases):
        ref = root_scalar(lambda x: np.tanh(k * x) - s,
                          method='brentq', bracket=[a, b], xtol=1.e-5)
        assert roots[i] == ref.root, f"case {i}: {roots[i]} != {ref.root}"


def test_brent_jax_matches_vec():
    import jax.numpy as jnp
    cases = _sweep_cases()
    xa = np.array([c[0] for c in cases])
    xb = np.array([c[1] for c in cases])
    kk = np.array([c[2] for c in cases])
    sh = np.array([c[3] for c in cases])

    def f_np(x):
        return np.tanh(kk * x) - sh

    def f_jx(x):
        return jnp.tanh(jnp.asarray(kk) * x) - jnp.asarray(sh)

    r_np, ok_np = brent_vec(f_np, xa, xb, xtol=1.e-5)
    r_jx, ok_jx = brent_jax(f_jx, xa, xb, xtol=1.e-5)
    assert np.asarray(ok_jx).all()
    np.testing.assert_allclose(np.asarray(r_jx), r_np, rtol=0, atol=1e-5)


def test_brent_no_bracket_flagged():
    f = lambda x: x * x + 1.0
    roots, ok = brent_vec(f, np.array([0.]), np.array([1.]))
    assert not ok[0]
