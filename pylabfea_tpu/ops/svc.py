"""RBF support-vector-classifier inference kernels.

A trained SVC yield function is fully described by its support vectors,
dual coefficients, intercept and kernel width (the same parameter set the
Abaqus UMAT consumes, cf. reference material.py:2185-2217).  This module
holds those parameters as plain arrays and evaluates the decision function,
its gradient and Hessian as batched matmul/exp kernels — NumPy twins for the
host (parity) profile and jitted JAX twins for the device profile.  On TPU
the decision function is a single (N, nsv) matmul-shaped kernel that maps
straight onto the MXU; a Pallas variant lives in ``pallas_kernels``.

Training happens in ``pylabfea_tpu.ml``; any trainer that produces this
parameter set (sklearn's SMO or the JAX dual solver) plugs in here.
"""
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@dataclass
class SVCParams:
    """Parameters of a trained RBF-kernel SVC decision function."""
    support_vectors: np.ndarray  # (nsv, ndof)
    dual_coef: np.ndarray        # (nsv,)
    intercept: float
    gamma: float

    @classmethod
    def from_sklearn(cls, clf):
        return cls(support_vectors=np.array(clf.support_vectors_),
                   dual_coef=np.array(clf.dual_coef_[0]),
                   intercept=float(clf.intercept_[0]),
                   gamma=float(clf._gamma if hasattr(clf, "_gamma") else clf.gamma))

    def device_arrays(self, dtype=None):
        sv = jnp.asarray(self.support_vectors, dtype=dtype)
        dc = jnp.asarray(self.dual_coef, dtype=dtype)
        return sv, dc


def decision_function(params: SVCParams, x):
    """Decision function f(x) = sum_i dc_i exp(-gamma ||x - sv_i||^2) + rho.

    x : (N, ndof) array. Returns (N,).
    """
    x = np.asarray(x, dtype=float)
    sv = params.support_vectors
    # direct squared distances (matches libsvm's accumulation closely; the
    # device twin uses the matmul expansion instead)
    diff = x[:, None, :] - sv[None, :, :]
    d2 = np.sum(diff * diff, axis=2)
    k = np.exp(-params.gamma * d2)
    return k @ params.dual_coef + params.intercept


def decision_gradient(params: SVCParams, x):
    """Gradient of the decision function w.r.t. x.  Returns (N, ndof).

    dK/dx = -2 gamma (x - sv) K; summed with dual coefficients.
    """
    x = np.asarray(x, dtype=float)
    sv = params.support_vectors
    diff = x[:, None, :] - sv[None, :, :]
    k = np.exp(-params.gamma * np.sum(diff * diff, axis=2))
    w = params.dual_coef[None, :] * k
    return -2. * params.gamma * np.einsum('ns,nsd->nd', w, diff)


def decision_hessian(params: SVCParams, x):
    """Hessian of the decision function w.r.t. x.  Returns (N, ndof, ndof)."""
    x = np.asarray(x, dtype=float)
    sv = params.support_vectors
    diff = sv[None, :, :] - x[:, None, :]
    k = np.exp(-params.gamma * np.sum(diff * diff, axis=2))
    w = params.dual_coef[None, :] * k
    g = params.gamma
    h = 4. * g * g * np.einsum('ns,nsi,nsj->nij', w, diff, diff)
    trace_term = 2. * g * np.sum(w, axis=1)
    idx = np.arange(x.shape[1])
    h[:, idx, idx] -= trace_term[:, None]
    return h


@partial(jax.jit, static_argnums=())
def _decision_jax(sv, dc, intercept, gamma, x):
    d2 = (jnp.sum(x * x, axis=1)[:, None] + jnp.sum(sv * sv, axis=1)[None, :]
          - 2. * x @ sv.T)
    k = jnp.exp(-gamma * jnp.maximum(d2, 0.))
    return k @ dc + intercept


def decision_function_jax(params: SVCParams, x, dtype=None):
    """Jitted device decision function; promotes params to device arrays."""
    sv, dc = params.device_arrays(dtype)
    x = jnp.asarray(x, dtype=dtype)
    return _decision_jax(sv, dc, params.intercept, params.gamma, x)


@jax.jit
def _gradient_jax(sv, dc, gamma, x):
    diff = x[:, None, :] - sv[None, :, :]
    k = jnp.exp(-gamma * jnp.sum(diff * diff, axis=2))
    w = dc[None, :] * k
    return -2. * gamma * jnp.einsum('ns,nsd->nd', w, diff)


def decision_gradient_jax(params: SVCParams, x, dtype=None):
    sv, dc = params.device_arrays(dtype)
    return _gradient_jax(sv, dc, params.gamma, jnp.asarray(x, dtype=dtype))


def _rbf_kernel(A, B, gamma):
    d2 = (np.sum(A * A, axis=1)[:, None] + np.sum(B * B, axis=1)[None, :]
          - 2. * A @ B.T)
    return np.exp(-gamma * np.maximum(d2, 0.))


@partial(jax.jit, static_argnums=(3,))
def _refine_centers(X, a, Z0, gamma, iters=300, lr=0.02):
    """Adam ascent of q(Z) = (Kzx a)' Kzz^-1 (Kzx a) in float64-on-host
    precision (runs at trainer scale: (k, d) parameters, (m, k) kernels)."""

    def q(Z):
        d2x = (jnp.sum(Z * Z, axis=1)[:, None]
               + jnp.sum(X * X, axis=1)[None, :] - 2. * Z @ X.T)
        Kzx = jnp.exp(-gamma * jnp.maximum(d2x, 0.))
        d2z = (jnp.sum(Z * Z, axis=1)[:, None]
               + jnp.sum(Z * Z, axis=1)[None, :] - 2. * Z @ Z.T)
        Kzz = jnp.exp(-gamma * jnp.maximum(d2z, 0.))
        b = Kzx @ a
        c = jnp.linalg.solve(Kzz + 1e-10 * jnp.eye(Z.shape[0], dtype=Z.dtype),
                             b)
        return jnp.vdot(b, c)

    grad_q = jax.grad(lambda Z: -q(Z))

    def body(_, carry):
        Z, mom, vel, t = carry
        gr = grad_q(Z)
        mom = 0.9 * mom + 0.1 * gr
        vel = 0.999 * vel + 0.001 * gr * gr
        t = t + 1.
        mh = mom / (1. - 0.9 ** t)
        vh = vel / (1. - 0.999 ** t)
        return Z - lr * mh / (jnp.sqrt(vh) + 1e-8), mom, vel, t

    Z, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (Z0, jnp.zeros_like(Z0), jnp.zeros_like(Z0),
                         jnp.zeros((), Z0.dtype)))
    return Z


def reduce_svc(params: SVCParams, n_out=None, tol=1e-3, seed=0,
               max_rounds=60, abs_tol=None):
    """Reduced-set compression of a trained RBF SVC (serving optimization).

    Approximates the decision function's RKHS element
    ``w = sum_i a_i phi(x_i)`` by ``w~ = sum_j c_j phi(z_j)`` with far fewer
    centers: centers come from |a|-weighted k-means over the support
    vectors (Lloyd iterations), coefficients from the exact RKHS projection
    ``c = K_zz^-1 K_zx a`` (kernel ridge with a tiny jitter).  For the RBF
    kernel ``K(x,x)=1``, so the RKHS distance bounds the decision-function
    error EVERYWHERE: ``|f(x) - f~(x)| <= ||w - w~||_H`` for all x.

    The inference cost of every SVC pass (yf/grad/Hessian, host and
    device) is linear in the SV count, so a 4x reduction is a 4x cheaper
    constitutive kernel at a guaranteed decision-function error.

    Parameters: ``n_out`` fixes the center count; with ``n_out=None`` the
    count doubles from 16 until the RELATIVE RKHS error
    ``||w - w~||_H / ||w||_H`` meets ``tol``.  ``abs_tol`` instead bounds
    the ABSOLUTE decision-function error ``sup_x |f(x) - f~(x)| <=
    ||w - w~||_H <= abs_tol`` — the natural budget when the consumer is a
    yield check against the dimensionless ``yf_tolerance`` band (set e.g.
    ``abs_tol = 0.1 * yf_tolerance`` for a guaranteed sub-tolerance
    serving error).  Returns ``(reduced SVCParams, relative RKHS error)``.
    """
    X = np.asarray(params.support_vectors, float)
    a = np.asarray(params.dual_coef, float)
    g = float(params.gamma)
    m = X.shape[0]
    Kxx = _rbf_kernel(X, X, g)
    wnorm2 = float(a @ Kxx @ a)
    if abs_tol is not None:
        tol = float(abs_tol) / np.sqrt(max(wnorm2, 1e-300))

    def fit(k, seed):
        if k >= m:
            # exact: the full SV set reproduces w identically — never let
            # center refinement degrade the k = m case (measured: Lloyd +
            # Adam moved the full-count centers to a 5e-3 relative error
            # where copying the SVs is error-free)
            return X.copy(), a.copy(), 0.
        rng = np.random.default_rng(seed)
        wgt = np.abs(a) + 1e-12
        # k-means++-style seeding by weight, then Lloyd iterations
        Z = X[rng.choice(m, size=min(k, m), replace=False,
                         p=wgt / wgt.sum())]
        for _ in range(25):
            d2 = (np.sum(X * X, axis=1)[:, None]
                  + np.sum(Z * Z, axis=1)[None, :] - 2. * X @ Z.T)
            lab = np.argmin(d2, axis=1)
            for j in range(Z.shape[0]):
                sel = lab == j
                if np.any(sel):
                    Z[j] = np.average(X[sel], axis=0, weights=wgt[sel])
        Zkm = Z.copy()
        # refine the centers on the RKHS objective itself (Schoelkopf
        # reduced-set): with c eliminated in closed form the error is
        # e2(Z) = ||w||^2 - q(Z), q = (Kzx a)' Kzz^-1 (Kzx a); maximize q
        # by Adam through jax autodiff — k-means pools mass geometrically
        # and plateaus an order of magnitude above what moved centers
        # reach in >=4 dims.  Trainer-scale op, pinned to the host CPU
        # backend when one exists (the inner solve wants f64 LU,
        # f32-only on TPU); processes pinned to an accelerator-only
        # platform (JAX_PLATFORMS=tpu) run it on the default device.
        try:
            _cpu = jax.local_devices(backend='cpu')[0]
        except RuntimeError:
            _cpu = None
        import contextlib
        ctx = (jax.default_device(_cpu) if _cpu is not None
               else contextlib.nullcontext())
        with ctx:
            Z = _refine_centers(jnp.asarray(X), jnp.asarray(a),
                                jnp.asarray(Z), g)
        Z = np.asarray(Z, float)

        def project(Zc):
            Kzz = _rbf_kernel(Zc, Zc, g)
            Kzx = _rbf_kernel(Zc, X, g)
            c = np.linalg.solve(Kzz + 1e-10 * np.eye(Zc.shape[0]), Kzx @ a)
            e2 = wnorm2 - 2. * float(c @ Kzx @ a) + float(c @ Kzz @ c)
            return c, float(np.sqrt(max(e2, 0.) / max(wnorm2, 1e-300)))

        # keep whichever center set projects better — Adam ascent of q(Z)
        # usually improves on the k-means pooling, but near k ~ m it can
        # wander off a solution that was already near-exact
        c, rel = project(Z)
        c_km, rel_km = project(Zkm)
        if rel_km < rel:
            Z, c, rel = Zkm, c_km, rel_km
        return Z, c, rel

    if n_out is not None:
        Z, c, rel = fit(int(n_out), seed)
    else:
        k = 16
        while True:
            Z, c, rel = fit(k, seed)
            if rel <= tol or k >= m:
                break
            k = min(2 * k, m)
    red = SVCParams(support_vectors=Z, dual_coef=c,
                    intercept=params.intercept, gamma=g)
    return red, rel
