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
