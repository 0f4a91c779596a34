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


def safe_sqrt(x):
    """sqrt with a ZERO (not NaN) derivative at x == 0.

    Value-identical to ``jnp.sqrt`` for x >= 0 (exact 0 at 0).  Virgin
    states (zero stress / zero plastic strain) sit exactly at the sqrt
    kink; plain ``jnp.sqrt`` there emits an inf derivative that turns even
    a ZERO cotangent into NaN and poisons reverse-mode parameter gradients
    (``ops.calibrate``).  The double-``where`` keeps the unselected branch
    out of both the value and the differentiation path."""
    pos = x > 0.
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.)), 0.)


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
    return safe_sqrt(0.5 * (d12 ** 2 + d23 ** 2 + d31 ** 2) + 3. * sh)


def seq_j2_princ(sp):
    """J2 equivalent stress from principal stresses (..., 3)."""
    d12 = sp[..., 0] - sp[..., 1]
    d23 = sp[..., 1] - sp[..., 2]
    d31 = sp[..., 2] - sp[..., 0]
    return safe_sqrt(0.5 * (d12 ** 2 + d23 ** 2 + d31 ** 2))


_AXIS_PERMS = np.array([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                        [1, 2, 0], [2, 0, 1], [2, 1, 0]])
# permutation matrices P[k, i, perm_k[i]] = 1 (selection as matmul) and
# permutation parities: TPU dynamic gathers (take_along_axis) over batched
# minor dims serialize catastrophically — measured 1551 ms vs 19.6 ms for a
# 466k-lane analytic return map whose only difference was the principal-
# stress path — so the axis assignment is evaluated as one-hot contractions
# (exact: each output is 1.0 * w[perm[i]] + 0.0 + 0.0)
_PERM_MATS = np.zeros((6, 3, 3))
for _k, _p in enumerate(_AXIS_PERMS):
    for _i, _j in enumerate(_p):
        _PERM_MATS[_k, _i, _j] = 1.
_PERM_SIGNS = np.array([np.linalg.det(P) for P in _PERM_MATS])


def _eigh_sym3_closed(st):
    """Closed-form eigendecomposition of symmetric 3x3 batches: Cardano
    (trigonometric) eigenvalues + cross-product eigenvectors — pure
    elementwise arithmetic instead of ``jnp.linalg.eigh``'s iterative QR,
    which costs ~100x more on TPU and serializes the constitutive kernels
    of sdim=3 / cylindrical-SVC materials (measured: a 3-material 256^2
    return map dropped from 3.0 s to the 12 ms of the eigh-free path).

    Returns (w ascending (..., 3), v (..., 3, 3) column eigenvectors).
    Eigenvectors of (near-)degenerate pairs are ill-defined; the spherical
    limit falls back to the identity frame (the axis-assignment consumer
    treats that as the aligned case, which is exact there).
    """
    dt = st.dtype
    q = jnp.trace(st, axis1=-2, axis2=-1) / 3.
    eye = jnp.eye(3, dtype=dt)
    B = st - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.
    p = jnp.sqrt(jnp.maximum(p2, 0.))
    psafe = jnp.where(p2 > 0., p, 1.)
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2. * psafe ** 3), -1., 1.)
    phi = jnp.arccos(r) / 3.
    two_pi_3 = jnp.asarray(2. * np.pi / 3., dt)
    w_hi = q + 2. * p * jnp.cos(phi)
    w_lo = q + 2. * p * jnp.cos(phi + two_pi_3)
    w_mid = 3. * q - w_hi - w_lo
    w = jnp.stack([w_lo, w_mid, w_hi], axis=-1)  # ascending (eigh order)

    def eigvec(lmbda):
        # v = cross(row_a, row_b) of (A - lambda I); take the best of the
        # three row pairs (largest norm) for robustness
        A = st - lmbda[..., None, None] * eye
        r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c12 = jnp.cross(r1, r2)
        c20 = jnp.cross(r2, r0)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        n20 = jnp.sum(c20 * c20, axis=-1)
        best = jnp.where((n01 >= n12)[..., None] & (n01 >= n20)[..., None],
                         c01,
                         jnp.where((n12 >= n20)[..., None], c12, c20))
        nb = jnp.maximum(n01, jnp.maximum(n12, n20))
        nrm = jnp.sqrt(jnp.sum(best * best, axis=-1))
        ok = nb > 1e-24 * jnp.maximum(
            jnp.sum(st * st, axis=(-2, -1)), 1e-30) ** 1.5
        return best / jnp.where(nrm == 0., 1., nrm)[..., None], ok

    v0, ok0 = eigvec(w_lo)
    v1, ok1 = eigvec(w_mid)
    v2, ok2 = eigvec(w_hi)
    v = jnp.stack([v0, v1, v2], axis=-1)  # columns = eigenvectors
    # degenerate / spherical fallback: identity frame
    good = (ok0 & ok1 & ok2 & (p2 > 0.))[..., None, None]
    v = jnp.where(good, v, jnp.broadcast_to(eye, v.shape))
    return w, v


def _axis_onehot(v, dtype):
    """One-hot (.., 6) selection over the axis-assignment permutations:
    the permutation maximizing sum_r |v[r, perm[r]]| (each material axis
    gets the eigenvector that dominates it), first-max tie resolution —
    identical semantics to ``argmax`` + gather, expressed gather-free."""
    absv = jnp.abs(v)  # rows = axes, columns = eigenvectors
    scores = jnp.stack(
        [absv[..., 0, p[0]] + absv[..., 1, p[1]] + absv[..., 2, p[2]]
         for p in _AXIS_PERMS], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    return (best[..., None] == jnp.arange(6)).astype(dtype)


def sig_princ_vals(sig):
    """Principal stresses assigned to the material axes — the values-only
    fast path of ``sig_princ_device`` (no eigenvector matrix, no
    orientation sign): ``spa[i] = w[perm[i]]`` evaluated as a one-hot
    contraction.  This is what the constitutive kernels (``seq_hill``,
    ``fgrad`` of sdim=3 materials, cylindrical SVC features) consume —
    none of them use the eigenvectors."""
    st = voigt_to_tensor(sig)
    w, v = _eigh_sym3_closed(st)
    onehot = _axis_onehot(v, sig.dtype)
    S = jnp.einsum('...k,kij->...ij', onehot,
                   jnp.asarray(_PERM_MATS, sig.dtype))
    return jnp.einsum('...ij,...j->...i', S, w)


def sig_princ_device(sig):
    """Principal stresses + eigenvectors on device, with the eigen-pairs
    assigned to the material axes by the OPTIMAL alignment: the
    permutation maximizing sum_r |v[r, perm[r]]| over all 6 axis
    assignments (each axis gets the eigenvector that dominates it).

    This is invariant to the eigendecomposition's internal column order —
    unlike the reference's row-argsort reorder of the raw ``np.linalg.eig``
    output (basic.py:153-173), whose result depends on LAPACK's unspecified
    eigenvalue ordering for strongly rotated states.  On principal/coaxial
    inputs and on the near-axis-aligned states of the reference's test
    workloads the two conventions coincide; ambiguous rotated states
    resolve here deterministically (first-max permutation, eigh ascending
    base order) instead of by LAPACK internals.

    The permutation is applied as one-hot matmuls, not gathers (see
    ``_PERM_MATS``); values are bit-identical to the gather formulation.
    """
    st = voigt_to_tensor(sig)
    w, v = _eigh_sym3_closed(st)
    onehot = _axis_onehot(v, sig.dtype)
    S = jnp.einsum('...k,kij->...ij', onehot,
                   jnp.asarray(_PERM_MATS, sig.dtype))
    spa = jnp.einsum('...ij,...j->...i', S, w)
    # eva[.., a, i] = v[.., a, perm[i]]
    eva = jnp.einsum('...aj,...ij->...ai', v, S)
    # right-handedness: det(eva) = det(v) * sign(perm); det(v) via the
    # scalar triple product of its columns (elementwise, no LU)
    c0, c1, c2 = v[..., :, 0], v[..., :, 1], v[..., :, 2]
    detv = jnp.sum(c0 * jnp.cross(c1, c2), axis=-1)
    psign = jnp.einsum('...k,k->...', onehot,
                       jnp.asarray(_PERM_SIGNS, sig.dtype))
    eva = jnp.where((detv * psign < 0)[..., None, None], -eva, eva)
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
        return safe_sqrt(2. * (jnp.sum(eps[..., 0:3] ** 2, axis=-1) +
                               0.5 * jnp.sum(eps[..., 3:6] ** 2, axis=-1)) / 3.)
    return safe_sqrt(2. * jnp.sum(eps[..., 0:3] ** 2, axis=-1) / 3.)
