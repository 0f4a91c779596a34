"""Device (JAX) twin of the tensor kernel — batch-first, jit/vmap-friendly.

All functions take batched arrays ``(N, k)`` and are shape-static so XLA can
fuse them into surrounding kernels.  The equivalent-stress formulas operate
directly on Voigt components (no eigendecomposition), which is exact for J2
and 6-parameter-Hill materials — the production TPU path.  A principal-stress
routine based on ``eigh`` is provided for 3-parameter models; its ordering
convention is normalized (see ``sig_princ_device``) and may differ from the
host convention only in degenerate (tied) states.
"""
import jax  # noqa: F401  (kept for kernel callers)
import jax.numpy as jnp
import numpy as np

a_vec = np.array([1., -0.5, -0.5]) / np.sqrt(1.5)
b_vec = np.array([0., 0.5, -0.5]) * np.sqrt(2)


def voigt_to_tensor(sv):
    """(..., 6) Voigt -> (..., 3, 3) symmetric tensor."""
    s = sv
    row0 = jnp.stack([s[..., 0], s[..., 5], s[..., 4]], axis=-1)
    row1 = jnp.stack([s[..., 5], s[..., 1], s[..., 3]], axis=-1)
    row2 = jnp.stack([s[..., 4], s[..., 3], s[..., 2]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def seq_j2_voigt(sig):
    """J2 equivalent stress from full Voigt stresses (..., 6)."""
    d12 = sig[..., 0] - sig[..., 1]
    d23 = sig[..., 1] - sig[..., 2]
    d31 = sig[..., 2] - sig[..., 0]
    sh = sig[..., 3] ** 2 + sig[..., 4] ** 2 + sig[..., 5] ** 2
    return jnp.sqrt(0.5 * (d12 ** 2 + d23 ** 2 + d31 ** 2) + 3. * sh)


def seq_j2_princ(sp):
    """J2 equivalent stress from principal stresses (..., 3)."""
    d12 = sp[..., 0] - sp[..., 1]
    d23 = sp[..., 1] - sp[..., 2]
    d31 = sp[..., 2] - sp[..., 0]
    return jnp.sqrt(0.5 * (d12 ** 2 + d23 ** 2 + d31 ** 2))


_AXIS_PERMS = np.array([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                        [1, 2, 0], [2, 0, 1], [2, 1, 0]])


def sig_princ_device(sig):
    """Principal stresses + eigenvectors on device via ``eigh``, with the
    eigen-pairs assigned to the material axes by the OPTIMAL alignment:
    the permutation maximizing sum_r |v[r, perm[r]]| over all 6 axis
    assignments (each axis gets the eigenvector that dominates it).

    This is invariant to the eigendecomposition's internal column order —
    unlike the reference's row-argsort reorder of the raw ``np.linalg.eig``
    output (basic.py:153-173), whose result depends on LAPACK's unspecified
    eigenvalue ordering for strongly rotated states.  On principal/coaxial
    inputs and on the near-axis-aligned states of the reference's test
    workloads the two conventions coincide; ambiguous rotated states
    resolve here deterministically (first-max permutation, eigh ascending
    base order) instead of by LAPACK internals.
    """
    st = voigt_to_tensor(sig)
    w, v = jnp.linalg.eigh(st)
    absv = jnp.abs(v)  # rows = axes, columns = eigenvectors
    scores = jnp.stack(
        [absv[..., 0, p[0]] + absv[..., 1, p[1]] + absv[..., 2, p[2]]
         for p in _AXIS_PERMS], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    perm = jnp.asarray(_AXIS_PERMS)[best]          # (..., 3)
    spa = jnp.take_along_axis(w, perm, axis=-1)
    eva = jnp.take_along_axis(v, perm[..., None, :], axis=-1)
    det = jnp.linalg.det(eva)
    eva = jnp.where((det < 0)[..., None, None], -eva, eva)
    return spa, eva


def sig_dev(sig):
    """Deviatoric stress for Voigt (..., 6) or principal (..., 3) input."""
    k = sig.shape[-1]
    p = jnp.sum(sig[..., 0:3], axis=-1, keepdims=True) / 3.
    if k == 3:
        return sig - p
    return sig - jnp.concatenate([jnp.broadcast_to(p, sig[..., 0:3].shape),
                                  jnp.zeros_like(sig[..., 3:])], axis=-1)


def polar_ang_princ(sp):
    """Polar angle in the deviatoric plane from principal stresses."""
    hyd = jnp.sum(sp, axis=-1, keepdims=True) / 3.
    dev = sp - hyd
    vn = jnp.linalg.norm(dev, axis=-1)
    vn = jnp.where(vn < 1.e-4, 1., vn)
    dsa = (dev / vn[..., None]) @ jnp.asarray(a_vec, dtype=sp.dtype)
    dsb = (dev / vn[..., None]) @ jnp.asarray(b_vec, dtype=sp.dtype)
    return jnp.arctan2(dsb, dsa)


def eps_eq(eps):
    """Equivalent strain for Voigt (..., 6) or principal (..., 3) input."""
    if eps.shape[-1] == 6:
        return jnp.sqrt(2. * (jnp.sum(eps[..., 0:3] ** 2, axis=-1) +
                              0.5 * jnp.sum(eps[..., 3:6] ** 2, axis=-1)) / 3.)
    return jnp.sqrt(2. * jnp.sum(eps[..., 0:3] ** 2, axis=-1) / 3.)
