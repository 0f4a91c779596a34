"""TPU-native SVC training: projected-gradient ascent on the RBF-SVM dual.

sklearn's libsvm SMO is sequential (host-only).  This trainer solves the
same dual problem with batched linear algebra so the whole fit runs under
``jit`` on the accelerator:

    max_a  1^T a - 1/2 a^T Q a,   0 <= a_i <= C,
    Q_ij = y_i y_j (K(x_i, x_j) + 1)

The "+1" absorbs the bias into the kernel (a standard reformulation), so no
equality constraint remains and the feasible set is a box — projected
gradient with a spectral step size converges reliably.  The resulting
decision function is f(x) = sum_i a_i y_i K(x, x_i) + b with
b = sum_i a_i y_i, returned as an ``SVCParams`` compatible with everything
else in the framework (inference kernels, UMAT export, FE solvers).

Accuracy: on yield-function training sets this matches sklearn's decision
boundary to within the band spacing of the training data (see
tests/test_jax_trainer.py); support-vector sets differ (the reference notes
SV sets are unstable between solvers, SURVEY §7.3).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pylabfea_tpu.ops.svc import SVCParams


@partial(jax.jit, static_argnums=(2, 3, 4))
def _fit_dual(X, y, C, gamma, iters):
    n = X.shape[0]
    d2 = (jnp.sum(X * X, axis=1)[:, None] + jnp.sum(X * X, axis=1)[None, :]
          - 2. * X @ X.T)
    K = jnp.exp(-gamma * jnp.maximum(d2, 0.)) + 1.
    Q = (y[:, None] * y[None, :]) * K
    # spectral step size: 1 / ||Q||_2 (power iteration)
    v = jnp.ones(n, X.dtype) / jnp.sqrt(jnp.asarray(n, X.dtype))

    def pow_body(_, v):
        w = Q @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, 30, pow_body, v)
    L = jnp.vdot(v, Q @ v)
    step = 1. / jnp.maximum(L, 1e-12)

    def body(_, a):
        g = 1. - Q @ a
        return jnp.clip(a + step * g, 0., C)

    a = jax.lax.fori_loop(0, iters, body, jnp.zeros(n, X.dtype))
    return a


def fit_svc_jax(X, y, C=10., gamma=1., iters=3000, sv_tol=1e-6,
                dtype=jnp.float32):
    """Train an RBF SVC on device; returns (SVCParams, dual variables)."""
    X = jnp.asarray(X, dtype=dtype)
    y = jnp.asarray(y, dtype=dtype)
    a = _fit_dual(X, y, float(C), float(gamma), int(iters))
    a_np = np.asarray(a, dtype=float)
    y_np = np.asarray(y, dtype=float)
    X_np = np.asarray(X, dtype=float)
    keep = a_np > sv_tol * C
    dc = (a_np * y_np)[keep]
    sv = X_np[keep]
    b = float(np.sum(a_np * y_np))
    params = SVCParams(support_vectors=sv, dual_coef=dc, intercept=b,
                       gamma=float(gamma))
    return params, a_np


@partial(jax.jit, static_argnums=(5,))
def _fold_grid_acc(X, y, train_mask, Cs, gamma, iters):
    """Validation accuracies of all C values for ONE (fold, gamma) pair.

    Held-out points are excluded exactly by the per-sample box bound
    ``a_i <= train_mask_i * C`` (their duals stay 0, removing them from the
    problem), so every fold reuses the same static shapes and one compiled
    trace serves the whole search.  The kernel/Q matrices depend on gamma
    only, so all C lanes share them — the vmapped dual iterations become one
    batched (nC, n) x (n, n) matmul per step."""
    sq = jnp.sum(X * X, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2. * X @ X.T, 0.)
    K = jnp.exp(-gamma * d2) + 1.
    Q = (y[:, None] * y[None, :]) * K
    Qm = Q * train_mask[:, None] * train_mask[None, :]
    v = train_mask / jnp.maximum(jnp.linalg.norm(train_mask), 1e-30)

    def pow_body(_, v):
        w = Qm @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, 30, pow_body, v)
    step = 1. / jnp.maximum(jnp.vdot(v, Qm @ v), 1e-12)
    ub = train_mask[None, :] * Cs[:, None]          # (nC, n)

    def body(_, A):
        G = 1. - A @ Qm
        return jnp.clip(A + step * G, 0., ub)

    A = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(ub))
    F = (A * y[None, :]) @ K                        # decisions on all points
    correct = jnp.where(F > 0., 1., -1.) == y[None, :]
    vm = 1. - train_mask
    return (correct * vm[None, :]).sum(axis=1) / jnp.maximum(vm.sum(), 1.)


def gridsearch_svc_jax(X, y, cvals, gvals, n_splits=5, iters=2000,
                       dtype=jnp.float32, seed=13):
    """K-fold cross-validated (C, gamma) search with the on-device dual
    solver — the sklearn-free twin of the reference's GridSearchCV workflow
    (material.py:1211-1240).  Returns (best_C, best_gamma, scores) with
    ``scores[g, c]`` the mean validation accuracy of (gvals[g], cvals[c])."""
    X = jnp.asarray(X, dtype=dtype)
    y = jnp.asarray(y, dtype=dtype)
    n = X.shape[0]
    folds = np.array_split(np.random.default_rng(seed).permutation(n),
                           n_splits)
    Cs = jnp.asarray(cvals, dtype)
    scores = np.zeros((len(gvals), len(cvals)))
    for fold in folds:
        mask = np.ones(n)
        mask[fold] = 0.
        tm = jnp.asarray(mask, dtype)
        for gi, gamma in enumerate(gvals):
            scores[gi] += np.asarray(
                _fold_grid_acc(X, y, tm, Cs, jnp.asarray(gamma, dtype),
                               int(iters)))
    scores /= n_splits
    gi, ci = np.unravel_index(int(np.argmax(scores)), scores.shape)
    return float(cvals[ci]), float(gvals[gi]), scores


def train_svc_jax(material, X_train, y_train, C=10., gamma=1., iters=3000,
                  dtype=jnp.float32):
    """Fit the SVC on device and install it as the material's ML yield
    function (replaces the sklearn object; ``svm_yf`` stays None)."""
    params, a = fit_svc_jax(X_train, y_train, C=C, gamma=gamma, iters=iters,
                            dtype=dtype)
    material._svc = params
    material.svm_yf = None
    material.ML_yf = True
    material.gam_yf = float(gamma)
    material.C_yf = float(C)
    from pylabfea_tpu.ops import svc as svc_ops
    pred = np.where(svc_ops.decision_function(params, X_train) > 0, 1., -1.)
    return 100. * float(np.mean(pred == np.asarray(y_train)))
