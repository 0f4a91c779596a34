"""Device (JAX) constitutive kernels — the TPU hot path.

Batched, jit/vmap-friendly twins of the host return map in
``pylabfea_tpu.materials``: Hill-6p/J2 equivalent stress and gradient, SVC
yield function with distance-to-locus root find, associated flow, consistent
tangent, and the full substepping ``response`` update over (N, 6) element
state batches.  All control flow is masked (fixed trip counts / while_loops),
all shapes static, dtype-generic (float32 on TPU, float64 on CPU parity
checks).

The material parameter set is a pytree (`DeviceMaterial`) so the same jitted
kernel serves any Hill/J2/SVC material; `kind` is static.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pylabfea_tpu.core.tensors import yf_tolerance
from pylabfea_tpu.ops.rootfind import brent_jax
from pylabfea_tpu.ops import jtensors as jt


class DeviceMaterial(NamedTuple):
    """Pytree of material parameters for the device kernels.

    For analytic materials the SVC fields hold dummy (1, 6)/(1,) arrays.
    ``is_svc`` is static pytree metadata (aux data), so jitted kernels
    specialize per material kind at trace time.
    """
    hill: jnp.ndarray        # (6,)
    sy: jnp.ndarray          # scalar
    khard: jnp.ndarray       # scalar
    drucker: jnp.ndarray     # scalar
    sv: jnp.ndarray          # (nsv, ndof) SVC support vectors
    dc: jnp.ndarray          # (nsv,) dual coefficients
    rho: jnp.ndarray         # scalar intercept
    gamma: jnp.ndarray       # scalar kernel width
    scale_seq: jnp.ndarray   # scalar feature scale (stress)
    scale_wh: jnp.ndarray    # scalar feature scale (plastic strain, WH)
    feat_mean: jnp.ndarray   # (ndof,) StandardScaler mean (texture), else (0,)
    feat_scale: jnp.ndarray  # (ndof,) StandardScaler scale (texture), else (0,)
    tex: jnp.ndarray         # (tdim,) fixed texture descriptor, else (0,)
    # Voce saturating hardening (analytic materials; 0/1 = pure linear):
    # sflow = sy + khard*peeq + voce_r*(1 - exp(-voce_b*peeq))
    voce_r: jnp.ndarray = 0.   # scalar saturation stress rise
    voce_b: jnp.ndarray = 1.   # scalar saturation rate (1/strain)
    is_svc: bool = False     # static (aux data, not a traced leaf)
    dev_only: bool = False   # static: deviatoric stress features
    sdim3: bool = False      # static: sdim=3 principal-space semantics


def _dm_flatten(m):
    return (m[:-3], (m.is_svc, m.dev_only, m.sdim3))


def _dm_unflatten(aux, children):
    return DeviceMaterial(*children, is_svc=aux[0], dev_only=aux[1],
                          sdim3=aux[2])


jax.tree_util.register_pytree_node(DeviceMaterial, _dm_flatten, _dm_unflatten)


def _resolve_compress(p, compress):
    """Reduced-set compression of SVCParams per the ``compress`` spec:
    True/'auto' = absolute decision-function error budget of 10% of the
    yield-tolerance band (guaranteed sub-tolerance serving error), a float
    = absolute RKHS/decision-function error bound, an int = fixed center
    count.  Returns (reduced params, relative RKHS error)."""
    from pylabfea_tpu.ops.svc import reduce_svc
    if isinstance(compress, bool) or compress == 'auto':
        # (bool checked first: True == 1 would otherwise hit the int arm)
        if not compress:
            return p, 0.
        return reduce_svc(p, abs_tol=0.1 * yf_tolerance)
    if isinstance(compress, int):
        return reduce_svc(p, n_out=compress)
    return reduce_svc(p, abs_tol=float(compress))


def device_material_from(mat, dtype=jnp.float32, tex=None, compress=None):
    """Build a DeviceMaterial from a host ``Material``.

    Supported SVC feature layouts: cylindrical sdim=3 (Ndof=2; note the
    reference computes the deviatoric polar angle of general 6-D stresses
    through LAPACK eig's raw eigenvalue order, which the eigh-based device
    path cannot replicate bitwise — principal-stress inputs and coaxial
    states match exactly), 6-D stress (plus ``dev_only``), stress +
    work-hardening (Ndof=15) and texture-conditioned features (fixed
    descriptor via ``tex=``; GSH scaler features and PCA-whitened ADV
    descriptors both fold into an affine feature map).

    ``compress`` (SVC materials only) serves a reduced-set compression of
    the decision function instead of the raw SV set — ``True``/``'auto'``
    bounds the absolute decision-function error at 10% of the
    yield-tolerance band, a float sets that bound, an int fixes the center
    count (``ops.svc.reduce_svc``).  The reduction is cached on the host
    material (``mat._svc_reduced``) and its achieved relative RKHS error
    is exposed as ``mat.svc_compress_rel``; the host material's own SVC
    is left untouched (use ``Material.compress_svc`` to compress in
    place)."""
    as_d = lambda x: jnp.asarray(x, dtype=dtype)
    if mat.ML_yf:
        p = mat._svc
        if compress:
            spec = compress if not isinstance(compress, bool) else 'auto'
            cached = getattr(mat, '_svc_reduced', None)
            # cache hit requires the SAME spec AND the same _svc object:
            # retraining (train_SVC / compress_svc) replaces mat._svc, and
            # serving a stale reduced center set of the old SVC would be a
            # silently wrong yield surface.  The cache tuple holds the
            # keyed _svc, so its identity cannot be recycled.
            if cached is not None and cached[0] == spec \
                    and cached[3] is p:
                p, rel = cached[1], cached[2]
            else:
                p, rel = _resolve_compress(p, compress)
                mat._svc_reduced = (spec, p, rel, mat._svc)
            mat.svc_compress_rel = rel
        ndof = p.support_vectors.shape[1]
        txdat = bool(getattr(mat, 'txdat', False))
        if txdat:
            if tex is None:
                raise ValueError('texture-conditioned material: pass the '
                                 'fixed texture descriptor via tex=')
            tx_raw = np.asarray(tex, dtype=float)
            mean = np.asarray(mat.std_scaler.mean_)
            scale = np.asarray(mat.std_scaler.scale_)
            pca = getattr(mat, 'pca', None)
            if pca is not None and \
                    'ADV' in mat.msparam[0]['tx_descriptor']:
                # ADV descriptors go through the fitted PCA (whitened) —
                # an affine map once trained (material.py:2301-2368).  The
                # descriptor is fixed per DeviceMaterial, so store the
                # PCA-transformed block directly with identity scaling on
                # its columns; stress/WH columns keep the scaler transform.
                ind_tx = mat.ind_tx
                tx_feat = np.asarray(pca.transform(tx_raw[None, :]))[0]
                fm = as_d(np.concatenate([mean[:ind_tx],
                                          np.zeros(tx_feat.size)]))
                fs = as_d(np.concatenate([scale[:ind_tx],
                                          np.ones(tx_feat.size)]))
                tx = as_d(tx_feat)
            else:
                fm = as_d(mean)
                fs = as_d(scale)
                tx = as_d(tx_raw)
        else:
            if ndof not in (2, 6, 15):
                raise NotImplementedError(
                    'device constitutive path supports cylindrical (Ndof=2), '
                    'stress-only (Ndof=6), stress + work-hardening (Ndof=15) '
                    f'or texture-scaled SVC features; got Ndof={ndof}')
            fm = as_d(np.zeros(0))
            fs = as_d(np.zeros(0))
            tx = as_d(np.zeros(0))
        return DeviceMaterial(
            hill=as_d(np.ones(6)), sy=as_d(mat.sy), khard=as_d(mat.khard or 0.),
            drucker=as_d(0.), sv=as_d(p.support_vectors), dc=as_d(p.dual_coef),
            rho=as_d(p.intercept), gamma=as_d(p.gamma),
            scale_seq=as_d(mat.scale_seq),
            scale_wh=as_d(getattr(mat, 'scale_wh', None) or 1.),
            feat_mean=fm, feat_scale=fs, tex=tx,
            is_svc=True, dev_only=bool(mat.dev_only))
    if getattr(mat, 'sy', None) is None:
        # purely elastic material (no plasticity defined): a sentinel yield
        # strength far above any physical stress keeps the lanes on the
        # elastic branch of the shared return-map kernel (1e15 stays well
        # inside f32 range even through the masked-out plastic-branch
        # intermediates, which scale like sentinel^2)
        return DeviceMaterial(
            hill=as_d(np.ones(6)), sy=as_d(1.e15), khard=as_d(0.),
            drucker=as_d(0.), sv=as_d(np.zeros((1, 6))), dc=as_d(np.zeros(1)),
            rho=as_d(0.), gamma=as_d(1.), scale_seq=as_d(1.e15),
            scale_wh=as_d(1.), feat_mean=as_d(np.zeros(0)),
            feat_scale=as_d(np.zeros(0)), tex=as_d(np.zeros(0)),
            is_svc=False, dev_only=False)
    if getattr(mat, 'tresca', False) or getattr(mat, 'barlat', False) \
            or getattr(mat, 'lhs', None) is not None:
        raise NotImplementedError(
            'device constitutive path: Tresca/Barlat/LHS analytic criteria '
            'run on the host profile (no analytic flow gradient — the '
            'reference has the same limitation, material.py:558-562)')
    hill = np.ones(6)
    hill[:len(mat.hill)] = mat.hill
    return DeviceMaterial(
        hill=as_d(hill), sy=as_d(mat.sy), khard=as_d(mat.khard or 0.),
        drucker=as_d(mat.drucker or 0.),
        sv=as_d(np.zeros((1, 6))), dc=as_d(np.zeros(1)), rho=as_d(0.),
        gamma=as_d(1.), scale_seq=as_d(mat.sy), scale_wh=as_d(1.),
        feat_mean=as_d(np.zeros(0)), feat_scale=as_d(np.zeros(0)),
        tex=as_d(np.zeros(0)),
        voce_r=as_d(getattr(mat, 'voce_r', None) or 0.),
        voce_b=as_d(getattr(mat, 'voce_b', None) or 1.),
        is_svc=False, dev_only=False,
        sdim3=mat.sdim == 3)


# -----------------------------------------------------------------
# equivalent stress / yield function / gradient
# -----------------------------------------------------------------
def _mm(a, b):
    """Matmul at HIGHEST precision: TPU's default single-pass bf16 matmul
    loses ~1e-3 relative, which the yield-locus root marching amplifies to
    percent-level stress errors (measured 3.5% vs CPU f64 at yield onset;
    full-f32 arithmetic restores 1e-4 agreement).  Used where the error
    feeds the yield-function value; cheap (matvec / 6-wide) contractions."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _rbf_d2(x, sv):
    """Pairwise squared distances |x|^2 + |sv|^2 - 2 x @ sv.T with the cross
    term at HIGHEST precision.

    Precision/formulation shootout on TPU v5e (2^20 x 512, f+grad per
    call): DEFAULT (1-pass bf16) 11.3 ms but 4e-1 abs error in f —
    percent-level stress errors after yield-locus root marching; HIGH
    (3-pass) 11.8 ms / 5e-3 error — same order as yf_tolerance, unsafe;
    HIGHEST (6-pass) 15.0 ms / 2e-5 error; exact VPU subtract-square
    18.8 ms.  HIGHEST matches the CPU f64 ground truth to ~1e-5 relative
    in the FE solution, at ~60% of the bf16-only throughput."""
    d2 = (jnp.sum(x * x, axis=-1)[:, None]
          + jnp.sum(sv * sv, axis=-1)[None, :]
          - 2. * _mm(x, sv.T))
    return jnp.maximum(d2, 0.)


def seq_hill(m: DeviceMaterial, sig):
    """Hill equivalent stress with Drucker hydrostatic term; sig (..., 6).

    ``sdim3`` materials follow the host's sdim=3 convention
    (calc_seq, reference material.py:576-676): the 3-parameter Hill
    quadratic is evaluated on the PRINCIPAL stresses (host eigenvalue
    ordering); otherwise the 6-parameter form acts on the Voigt components
    directly.  J2 (all parameters 1) coincides in both."""
    if m.sdim3 and sig.shape[-1] == 6:
        s = jt.sig_princ_vals(sig)
    else:
        s = sig
    return _seq_hill_of(m, sig, s)


def _seq_hill_of(m: DeviceMaterial, sig, s):
    """Hill equivalent stress given the (already principal-transformed for
    sdim=3) stress rows ``s``; ``sig`` supplies the I1 trace."""
    hp = m.hill
    if s.shape[-1] == 3:
        sh3 = sh4 = sh5 = 0.
    else:
        sh3, sh4, sh5 = s[..., 3], s[..., 4], s[..., 5]
    I2 = 0.5 * (hp[0] * (s[..., 0] - s[..., 1]) ** 2 +
                hp[1] * (s[..., 1] - s[..., 2]) ** 2 +
                hp[2] * (s[..., 2] - s[..., 0]) ** 2 +
                6. * hp[3] * sh3 ** 2 +
                6. * hp[4] * sh4 ** 2 +
                6. * hp[5] * sh5 ** 2)
    I1 = m.drucker * jnp.sum(sig[..., 0:3], axis=-1) / 3.
    # safe_sqrt: value-identical, but a ZERO instead of NaN derivative at
    # I2 == 0 — virgin-stress lanes otherwise poison reverse-mode shared-
    # parameter gradients (ops.calibrate)
    return jt.safe_sqrt(I2) + I1


def svc_decision(m: DeviceMaterial, x):
    """SVC decision function on feature rows x (N, ndof).  The (N, nsv)
    distance matrix is evaluated in matmul form so XLA maps it to the MXU."""
    k = jnp.exp(-m.gamma * _rbf_d2(x, m.sv))
    return _mm(k, m.dc) + m.rho

def svc_gradient(m: DeviceMaterial, x):
    """Gradient of the SVC decision function w.r.t. features (N, ndof)."""
    w = m.dc[None, :] * jnp.exp(-m.gamma * _rbf_d2(x, m.sv))
    # sum_s w_s * (x - sv_s) = (sum_s w_s) x - w @ sv — matmul form; a
    # bf16 matmul here measurably biases the flow direction (0.5% stress)
    return -2. * m.gamma * (jnp.sum(w, axis=-1)[:, None] * x - _mm(w, m.sv))


def svc_decision_and_gradient(m: DeviceMaterial, x):
    """Decision function AND its gradient from ONE (N, nsv) kernel-matrix
    evaluation — the distance matmul + exp dominate the return map's cost,
    so sharing them between f and grad nearly halves HBM traffic per Newton
    iteration."""
    k = jnp.exp(-m.gamma * _rbf_d2(x, m.sv))
    f = _mm(k, m.dc) + m.rho
    w = m.dc[None, :] * k
    g = -2. * m.gamma * (jnp.sum(w, axis=-1)[:, None] * x - _mm(w, m.sv))
    return f, g


def _has_wh(m: DeviceMaterial):
    """Static: does the feature vector carry the work-hardening block?"""
    return m.sv.shape[-1] - 6 - m.tex.shape[0] == 9


def _features(m: DeviceMaterial, sig, epl):
    """SVC feature rows from stress (and plastic strain / texture):
    host ``create_scaled_input`` conventions — deviatoric projection if
    ``dev_only``; without texture sig/scale_seq and epl/scale_wh blocks
    plus zeroed (acc_strain, max_stress, flag) columns (the FE solver's
    defaults); with texture the RAW feature vector through the fitted
    StandardScaler (material.py:2301-2368)."""
    if m.sv.shape[-1] == 2:
        # cylindrical sdim=3 features (seq/scale - 1, theta/pi): invariants,
        # so 6-D Voigt and 3-D principal inputs give identical values
        if sig.shape[-1] == 6:
            seq = jt.seq_j2_voigt(sig)
            sp = jt.sig_princ_vals(sig)
        else:
            seq = jt.seq_j2_princ(sig)
            sp = sig
        theta = jt.polar_ang_princ(sp)
        return jnp.stack([seq / m.scale_seq - 1., theta / jnp.pi], axis=-1)
    s = jt.sig_dev(sig) if m.dev_only else sig
    N = sig.shape[0]
    tdim = m.tex.shape[0]
    if tdim > 0:
        parts = [s]
        if _has_wh(m):
            if epl is None:
                epl = jnp.zeros_like(sig)
            parts += [epl, jnp.zeros((N, 3), sig.dtype)]
        parts.append(jnp.broadcast_to(m.tex, (N, tdim)).astype(sig.dtype))
        x_raw = jnp.concatenate(parts, axis=-1)
        return (x_raw - m.feat_mean) / m.feat_scale
    x = s / m.scale_seq
    if m.sv.shape[-1] == 6:
        return x
    if epl is None:
        epl = jnp.zeros_like(sig)
    extras = jnp.zeros((N, 3), sig.dtype)
    return jnp.concatenate([x, epl / m.scale_wh, extras], axis=-1)


def _khard_lanes(m: DeviceMaterial, g_feat):
    """Per-lane work-hardening-rate contributions -sum_c dgrad_c *
    scale_seq/scale_wh; the host's scalar khard is their (masked) batch
    mean clipped at 0 (calc_fgrad, material.py:808-812)."""
    return -jnp.sum(g_feat[:, 6:12], axis=-1) * m.scale_seq / m.scale_wh


def _jac_cyl(sp):
    """Jacobian of the (seq, theta, p) transform for principal-stress rows
    (host Material._jac_cyl, reference material.py:780-795) — including the
    faithful all-ones rows for nearly-hydrostatic states (vn <= 0.1)."""
    dt = sp.dtype
    av = jnp.asarray(jt.a_vec, dt)
    bv = jnp.asarray(jt.b_vec, dt)
    dev = jt.sig_dev(sp)
    vn = jnp.linalg.norm(dev, axis=-1) * jnp.sqrt(jnp.asarray(1.5, dt))
    big = vn > 0.1
    vs = jnp.where(big, vn, 1.)
    dseqds = 3. * dev / vs[:, None]
    dsa = sp @ av
    dsb = sp @ bv
    den = dsa ** 2 + dsb ** 2
    den = jnp.where(den == 0., 1., den)
    # Re(-i ((a + i b)/sc - dseqds/vs)) = Im((a + i b)/sc)
    col1 = (bv[None, :] * dsa[:, None] - av[None, :] * dsb[:, None]) \
        / den[:, None]
    ones = jnp.ones_like(dseqds)
    c0 = jnp.where(big[:, None], dseqds, ones[:, :])
    c1 = jnp.where(big[:, None], col1, ones[:, :])
    c2 = jnp.where(big[:, None], jnp.full_like(dseqds, 1. / 3.), ones)
    return jnp.stack([c0, c1, c2], axis=-1)


def _svc_stress_grad(m: DeviceMaterial, sig, g_feat):
    """Chain rule from feature space to 6-D stress space: /scale_seq, the
    per-component StandardScaler scales for texture materials
    (material.py:545-548), or the cylindrical Jacobian for sdim=3 (the host
    maps (1, dtheta) through _jac_cyl into principal space and leaves the
    shear components zero, material.py:537-543)."""
    if m.sv.shape[-1] == 2:
        sp = jt.sig_princ_vals(sig) if sig.shape[-1] == 6 else sig
        jac = _jac_cyl(sp)
        vec = jnp.stack([jnp.ones_like(g_feat[:, 0]), g_feat[:, 1],
                         jnp.zeros_like(g_feat[:, 0])], axis=-1)
        a3 = jnp.einsum('nij,nj->ni', jac, vec,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.concatenate(
            [a3, jnp.zeros((sig.shape[0], 3), sig.dtype)], axis=-1)
    if m.tex.shape[0] > 0:
        return g_feat[:, 0:6] / m.feat_scale[0:6]
    return g_feat[:, 0:6] / m.scale_seq


def flow_stress(m: DeviceMaterial, peeq):
    """Analytic flow stress sflow(peeq) = sy + khard*peeq
    + voce_r*(1 - exp(-voce_b*peeq)) — linear isotropic hardening
    (reference material.py:974-1007 contract) plus an optional Voce
    saturation term the reference lacks (CPFEM hardening saturates;
    a linear surrogate overshoots beyond ~1% strain)."""
    return m.sy + peeq * m.khard + m.voce_r * (-jnp.expm1(-m.voce_b * peeq))


def hard_modulus(m: DeviceMaterial, peeq):
    """d sflow / d peeq = khard + voce_r*voce_b*exp(-voce_b*peeq)."""
    return m.khard + m.voce_r * m.voce_b * jnp.exp(-m.voce_b * peeq)


def khard_of(m: DeviceMaterial, g_feat, mask=None):
    """Hardening modulus: the batch-mean work-hardening rate derived from
    the SVC gradient's plastic-strain components — a SCALAR per batch like
    the host's ``self.khard`` side effect (restricted to ``mask`` lanes
    when given, as in _epl_dot_rows); the material's static khard
    otherwise."""
    if not m.is_svc or not _has_wh(m):
        return m.khard
    lanes = _khard_lanes(m, g_feat)
    if mask is None:
        return jnp.maximum(0., jnp.mean(lanes))
    cnt = jnp.maximum(jnp.sum(mask), 1)
    return jnp.maximum(0., jnp.sum(jnp.where(mask, lanes, 0.)) / cnt)


def yf(m: DeviceMaterial, sig, peeq, epl=None):
    """Yield function: SVC decision or seq - sflow; sig (N, 6), peeq (N,)."""
    if m.is_svc:
        return svc_decision(m, _features(m, sig, epl))
    return seq_hill(m, sig) - flow_stress(m, peeq)


def _seq_grad_analytic(m: DeviceMaterial, sig):
    """Fused (seq, grad) of the analytic Hill/J2/Drucker criterion from ONE
    principal decomposition — the sdim=3 eigen path used to run three times
    per ``yf_and_fgrad`` call (yf, fgrad's own seq, fgrad's principal
    transform), which together with gather-lowered axis assignment made the
    sdim=3 group of a grouped return map cost ~80x its 6-D twin."""
    hp = m.hill
    if m.sdim3 and sig.shape[-1] == 6:
        # host sdim=3 convention (calc_fgrad, material.py:826-855): the
        # principal-space gradient components fill the normal Voigt slots,
        # shear components stay ZERO (no eigenvector back-rotation — the
        # reference's numerical contract, replicated for parity)
        s = jt.sig_princ_vals(sig)
    else:
        s = sig
    seq = _seq_hill_of(m, sig, s)
    # guard the 1/(2 seq) division at zero stress: the gradient there is
    # mathematically undefined (sqrt kink) and every consumer masks such
    # lanes, but inf would poison masked arithmetic (0 * inf = NaN in the
    # elastic-fraction tangent blend — hit by zero-increment elements in
    # the differentiable-FE residual)
    seqg = jnp.where(seq <= 0., 1., seq)
    sdev = jt.sig_dev(s)
    d3 = m.drucker / 3.
    g0 = ((hp[0] + hp[2]) * sdev[..., 0] - hp[0] * sdev[..., 1]
          - hp[2] * sdev[..., 2]) / (2. * seqg) + d3
    g1 = ((hp[1] + hp[0]) * sdev[..., 1] - hp[0] * sdev[..., 0]
          - hp[1] * sdev[..., 2]) / (2. * seqg) + d3
    g2 = ((hp[2] + hp[1]) * sdev[..., 2] - hp[2] * sdev[..., 0]
          - hp[1] * sdev[..., 1]) / (2. * seqg) + d3
    if s.shape[-1] == 3:
        zero = jnp.zeros_like(seqg)
        return seq, jnp.stack([g0, g1, g2, zero, zero, zero], axis=-1)
    g3 = 3. * hp[3] * sdev[..., 3] / seqg
    g4 = 3. * hp[4] * sdev[..., 4] / seqg
    g5 = 3. * hp[5] * sdev[..., 5] / seqg
    return seq, jnp.stack([g0, g1, g2, g3, g4, g5], axis=-1)


def fgrad(m: DeviceMaterial, sig, epl=None):
    """Yield-surface gradient in stress space; sig (N, 6).  (Host
    convention: the stress-feature components / scale_seq, with no
    deviatoric chain term even when ``dev_only`` — material.py:826.)"""
    if m.is_svc:
        return _svc_stress_grad(m, sig,
                                svc_gradient(m, _features(m, sig, epl)))
    return _seq_grad_analytic(m, sig)[1]


def hessian(m: DeviceMaterial, sig, epl=None):
    """Hessian of the ML yield surface w.r.t. stress (device twin of
    Material.calc_hessian): vectorized RBF-kernel Hessian over the feature
    rows, stress block sliced out and scaled with the host's conventions
    (a single /scale_seq without a StandardScaler — the reference's
    convention, material.py:645-650 — and the squared per-component scales
    with one).  SVC materials with 6-D stress features only."""
    if not m.is_svc or m.sv.shape[-1] == 2:
        raise NotImplementedError('hessian: SVC materials with 6-D stress '
                                  'features only')
    x = _features(m, sig, epl)
    diff = m.sv[None, :, :] - x[:, None, :]
    k = jnp.exp(-m.gamma * jnp.sum(diff * diff, axis=-1))
    w = m.dc[None, :] * k
    g = m.gamma
    h = 4. * g * g * jnp.einsum('ns,nsi,nsj->nij', w, diff, diff,
                                precision=jax.lax.Precision.HIGHEST)
    tr = 2. * g * jnp.sum(w, axis=-1)
    ii = jnp.arange(x.shape[-1])
    h = h.at[:, ii, ii].add(-tr[:, None])
    h6 = h[:, 0:6, 0:6]
    if m.tex.shape[0] > 0:
        sf = 1. / (jnp.ones(6, sig.dtype) * m.scale_seq)
        return h6 * (sf[:, None] * sf[None, :])[None]
    return h6 / m.scale_seq


def yf_and_fgrad(m: DeviceMaterial, sig, peeq, epl=None):
    """Fused yield function + stress gradient + hardening modulus (one
    kernel-matrix pass for SVC).  Returns (f, g (N, 6), khard scalar)."""
    if m.is_svc:
        f, g = svc_decision_and_gradient(m, _features(m, sig, epl))
        return f, _svc_stress_grad(m, sig, g), khard_of(m, g)
    seq, g = _seq_grad_analytic(m, sig)
    return seq - flow_stress(m, peeq), g, hard_modulus(m, peeq)


def ml_yf_dist(m: DeviceMaterial, sig, peeq, epl=None, khard=None,
               maxmarch=400):
    """Distance of stresses to the SVC yield locus along their own loading
    direction (device twin of Material.ML_full_yf): geometric bracket
    marching (x0 *= 0.98 down / x1 *= 1.02 up) then Brent root find.  For
    work-hardening materials the plastic-strain features stay fixed while
    the stress is scaled (host find_yloc convention)."""
    _seq = jt.seq_j2_voigt if sig.shape[-1] == 6 else jt.seq_j2_princ
    seq = _seq(sig)
    kh = m.khard if khard is None else khard
    sflow = m.sy + peeq * kh
    small = seq < 0.01
    safe_seq = jnp.where(small, 1., seq)
    su = sig / safe_seq[:, None]

    def f_of(x):
        return svc_decision(m, _features(m, x[:, None] * su, epl))

    x0 = jnp.where(su[:, 0] * su[:, 1] < -1.e-5, 0.5 * sflow, sflow)
    x1 = x0

    def march(x, fac, active_of):
        def cond(s):
            x, f, it = s
            return active_of(x, f).any() & (it < maxmarch)

        def body(s):
            x, f, it = s
            xn = jnp.where(active_of(x, f), x * fac, x)
            return xn, f_of(xn), it + 1

        return jax.lax.while_loop(cond, body, (x, f_of(x), 0))[0]

    x0 = march(x0, 0.98, lambda x, f: (f >= 0.) & (x > 0.01))
    x1 = march(x1, 1.02, lambda x, f: (f < 0.) & (x < 5. * sflow))
    xs, ok = brent_jax(f_of, x0, x1, xtol=1.e-5)
    good = ok & (xs < 4. * sflow) & ~small
    seq_su = _seq(su)
    return jnp.where(good, seq - xs * seq_su, seq - 0.85 * sflow)


def yf_dist(m: DeviceMaterial, sig, peeq, epl=None, khard=None):
    """Distance-type yield function: ML root find for SVC, plain yf else."""
    if m.is_svc:
        return ml_yf_dist(m, sig, peeq, epl, khard)
    return yf(m, sig, peeq)


# -----------------------------------------------------------------
# flow rule / tangent / return map
# -----------------------------------------------------------------
def epl_dot(m: DeviceMaterial, sig, peeq, CV, deps, epl=None):
    """Associated plastic strain increment (Crisfield ch. 6)."""
    yfun = yf(m, sig + _mm(deps, CV.T), peeq, epl)
    _, a, kh = yf_and_fgrad(m, sig, peeq, epl)
    ca = _mm(a, CV.T)
    hh = jnp.sum(ca * a, axis=-1) + kh
    lam = jnp.sum(ca * deps, axis=-1) / hh
    pdot = lam[:, None] * a
    return jnp.where((yfun > yf_tolerance)[:, None], pdot, 0.)


def c_tan(m: DeviceMaterial, sig, CV, epl=None):
    """Consistent tangent Ct = C - (Ca (x) Ca) / (a^T C a + khard)."""
    _, a, kh = yf_and_fgrad(m, sig, jnp.zeros(sig.shape[0], sig.dtype), epl)
    ca = _mm(a, CV.T)
    hh = jnp.sum(ca * a, axis=-1) + kh
    return CV[None] - ca[:, :, None] * ca[:, None, :] / hh[:, None, None]


def _flow_tan(m: DeviceMaterial, sig, peeq, CV, deps, epl):
    """Flow increment + consistent tangent with the host's khard-statistics
    chain (response_batch): epl_dot's denominator uses the batch-mean
    hardening rate over the YIELDING lanes (the host computes its gradient
    on the masked subset), c_tan's over ALL lanes; the khard 'last set'
    (c_tan's) is what the subsequent yield-distance marching sees.
    Returns (pdot, Ct, khard_full)."""
    dsig = _mm(deps, CV.T)
    yfun = yf(m, sig + dsig, peeq, epl)
    yld = yfun > yf_tolerance
    if m.is_svc:
        _, gfeat = svc_decision_and_gradient(m, _features(m, sig, epl))
        a = _svc_stress_grad(m, sig, gfeat)
        kh_sub = khard_of(m, gfeat, mask=yld)
        kh_full = khard_of(m, gfeat)
    else:
        a = fgrad(m, sig)
        kh_sub = kh_full = hard_modulus(m, peeq)
    ca = _mm(a, CV.T)
    aca = jnp.sum(ca * a, axis=-1)
    lam = jnp.sum(ca * deps, axis=-1) / (aca + kh_sub)
    pdot = jnp.where(yld[:, None], lam[:, None] * a, 0.)
    Ct = CV[None] - ca[:, :, None] * ca[:, None, :] \
        / (aca + kh_full)[:, None, None]
    return pdot, Ct, kh_full


def _inv3x3(A):
    """Closed-form 3x3 inverse (adjugate over determinant).

    TPU's LuDecomposition custom call implements float32 only, so
    ``jnp.linalg.inv`` breaks the float64-on-TPU validation path; the
    closed form is dtype-generic and cheaper than a (batched) LU anyway."""
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c10 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c20 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c21 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = (A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02)
    rows = jnp.stack([jnp.stack([c00, c10, c20], axis=-1),
                      jnp.stack([c01, c11, c21], axis=-1),
                      jnp.stack([c02, c12, c22], axis=-1)], axis=-2)
    return rows / det[..., None, None]


def _solve3x3(A, b):
    """Closed-form solve of (..., 3, 3) @ x = (..., 3) — see ``_inv3x3``."""
    return jnp.einsum('...ij,...j->...i', _inv3x3(A), b)


def _inv6x6_spd(CV):
    """Dtype-generic closed-form inverse of a (possibly fully coupled)
    6x6 elastic tensor: Schur complement over 3x3 blocks built on
    ``_inv3x3`` (TPU's LU custom call is float32-only, so
    ``jnp.linalg.inv`` is off-limits on the f64-on-TPU validation path).
    Rows/columns with an empty diagonal (plane-stress reduced CV) are
    decoupled and regularized to identity, making this a pseudo-inverse
    on the active subspace.  Used by the secant-downdate SPD criterion,
    which needs the TRUE w^T CV^-1 w for fitted 21-coefficient tensors
    with normal-shear coupling — the block-diagonal ``_compliance``
    underestimates it there."""
    diag = jnp.diagonal(CV)
    empty = jnp.abs(diag) <= 1.
    keep = jnp.where(empty, 0., 1.).astype(CV.dtype)
    fill = jnp.where(empty, 1., 0.).astype(CV.dtype)
    C = CV * (keep[:, None] * keep[None, :]) + jnp.diag(fill)
    A, B = C[0:3, 0:3], C[0:3, 3:6]
    Bt, D = C[3:6, 0:3], C[3:6, 3:6]
    Ai = _inv3x3(A)
    Si = _inv3x3(D - Bt @ Ai @ B)
    TR = -Ai @ B @ Si
    TL = Ai - TR @ Bt @ Ai
    top = jnp.concatenate([TL, TR], axis=1)
    bot = jnp.concatenate([TR.T, Si], axis=1)
    return jnp.concatenate([top, bot], axis=0) * (keep[:, None]
                                                  * keep[None, :])


def _compliance(CV):
    """Pseudo-compliance used by the excess-stress correction (handles
    plane-stress CV with empty rows)."""
    SV = jnp.zeros_like(CV)
    # build on host shapes: CV is concrete only at trace time; use where
    full3 = CV[2, 2] > 1.
    inv3 = _inv3x3(jnp.where(full3, CV[0:3, 0:3],
                             CV[0:3, 0:3] + jnp.diag(
                                 jnp.array([0., 0., 1.], CV.dtype))))
    d2 = CV[0, 0] * CV[1, 1] - CV[0, 1] * CV[1, 0]
    inv2 = jnp.stack([jnp.stack([CV[1, 1], -CV[0, 1]]),
                      jnp.stack([-CV[1, 0], CV[0, 0]])]) / d2
    top = jnp.where(full3, inv3,
                    jnp.zeros((3, 3), CV.dtype).at[0:2, 0:2].set(inv2))
    SV = SV.at[0:3, 0:3].set(top)
    for k in range(3, 6):
        SV = SV.at[k, k].set(jnp.where(CV[k, k] > 1., 1. / CV[k, k], 0.))
    return SV


@partial(jax.jit, static_argnums=(4,))
def response(m: DeviceMaterial, state, deps, CV, maxit=50):
    """Batched return map over element states — the TPU hot kernel.

    state = (sig (N,6), epl (N,6)); deps (N,6); CV (6,6).
    Mirrors the host ``Material.response_batch`` control flow with masked
    lanes: elastic predictor, step split at the yield locus, one trial step
    deciding subdivision, then ``maxit`` masked substeps with excess-stress
    correction.  Returns (fy1, sig, depl, grad_stiff).
    """
    sig0, epl0 = state
    N = sig0.shape[0]
    dt = sig0.dtype
    peeq0 = jt.eps_eq(epl0)
    toler = yf_tolerance * flow_stress(m, peeq0)
    dsig = _mm(deps, CV.T)
    fy_pred = yf_dist(m, sig0 + dsig, peeq0, epl0)
    elastic = fy_pred < toler

    # ---- plastic branch (computed for all lanes, masked at the end) ----
    fy0 = yf(m, sig0, peeq0, epl0)
    split = fy0 < -0.15
    if m.is_svc:
        # host convention: the split-distance is evaluated at ZERO
        # plastic strain (response_batch passes zeros_like(epl))
        fy0_d = ml_yf_dist(m, sig0, jnp.zeros(N, dt),
                           jnp.zeros_like(epl0))
        fy0 = jnp.where(split, fy0_d, fy0)
    seq_dsig = seq_hill(m, dsig) if not m.is_svc else jt.seq_j2_voigt(dsig)
    st_scal = jnp.where(split, 1. + fy0 / seq_dsig, 1.)
    deps_el = deps * (1. - st_scal)[:, None]
    sig = sig0 + _mm(deps_el, CV.T)
    grad = jnp.where(split[:, None, None],
                     CV[None] * (1. - st_scal)[:, None, None], 0.)
    deps_r = deps - deps_el

    # trial with full remaining step -> subdivide?
    ddepl_t, t_st_t, kh_t = _flow_tan(m, sig, peeq0, CV, deps_r, epl0)
    peeq_t = jt.eps_eq(epl0 + ddepl_t)
    sig_t = sig + jnp.einsum('nij,nj->ni', t_st_t, deps_r, precision=jax.lax.Precision.HIGHEST)
    fy_t = yf_dist(m, sig_t, peeq_t, epl0 + ddepl_t, kh_t)
    sub = fy_t > toler
    deps_r = jnp.where(sub[:, None], deps_r / maxit, deps_r)
    nsteps = jnp.where(sub, maxit, 1)

    SV = _compliance(CV)

    def body(it, carry):
        sig, depl, grad, fy = carry
        act = it < nsteps
        peeq = jt.eps_eq(epl0)
        ddepl, t_st, kh_it = _flow_tan(m, sig, peeq, CV, deps_r, epl0)
        eplt = epl0 + depl + ddepl
        sig_n = sig + jnp.einsum('nij,nj->ni', t_st, deps_r, precision=jax.lax.Precision.HIGHEST)
        fy_n = yf_dist(m, sig_n, jt.eps_eq(eplt), eplt, kh_it)
        over = fy_n > toler
        seq_n = seq_hill(m, sig_n) if not m.is_svc else jt.seq_j2_voigt(sig_n)
        seq_n = jnp.where(seq_n == 0., 1., seq_n)
        dsig_x = jnp.where(over[:, None], sig_n * (fy_n / seq_n)[:, None], 0.)
        sig_c = sig_n - dsig_x
        ddepl_c = ddepl + dsig_x @ SV.T
        # min-norm tangent correction: solve (A A^T) y = b, x = A^T y with
        # A the (3,6) strain-projection matrix of deps_r (normal components)
        d = deps_r[:, 0:3]
        s2 = jnp.sum(d * d, axis=-1)
        # G = A A^T = s2 * I + d_i d_j off-diagonal (A includes the shear
        # columns, which contribute d_k^2 to every diagonal entry)
        eye3 = jnp.eye(3, dtype=dt)[None]
        outer = d[:, :, None] * d[:, None, :]
        G = outer * (1. - eye3) + s2[:, None, None] * eye3
        Gsafe = G + eye3 * jnp.where(s2 < 1e-30, 1., 0.)[:, None, None]
        yv = _solve3x3(Gsafe, dsig_x[:, 0:3])
        yv = jnp.where((s2 > 1e-30)[:, None], yv, 0.)
        # x = A^T y: x0=d0*y0, x1=d1*y1, x2=d2*y2, x3=d2*y1+d1*y2,
        # x4=d2*y0+d0*y2, x5=d1*y0+d0*y1
        x0 = d[:, 0] * yv[:, 0]
        x1 = d[:, 1] * yv[:, 1]
        x2 = d[:, 2] * yv[:, 2]
        x3 = d[:, 2] * yv[:, 1] + d[:, 1] * yv[:, 2]
        x4 = d[:, 2] * yv[:, 0] + d[:, 0] * yv[:, 2]
        x5 = d[:, 1] * yv[:, 0] + d[:, 0] * yv[:, 1]
        Ct = jnp.zeros((N, 6, 6), dt)
        Ct = Ct.at[:, 0, 0].set(x0).at[:, 1, 1].set(x1).at[:, 2, 2].set(x2)
        Ct = Ct.at[:, 0, 1].set(x5).at[:, 1, 0].set(x5)
        Ct = Ct.at[:, 0, 2].set(x4).at[:, 2, 0].set(x4)
        Ct = Ct.at[:, 1, 2].set(x3).at[:, 2, 1].set(x3)
        t_st_c = t_st - jnp.where(over[:, None, None], Ct, 0.)
        eplt_c = epl0 + depl + ddepl_c
        fy_c = yf_dist(m, sig_c, jt.eps_eq(eplt_c), eplt_c, kh_it)
        sig_new = jnp.where(over[:, None], sig_c, sig_n)
        ddepl_new = jnp.where(over[:, None], ddepl_c, ddepl)
        fy_new = jnp.where(over, fy_c, fy_n)
        grad_new = grad + t_st_c * (st_scal / nsteps)[:, None, None]
        # freeze inactive lanes
        sig = jnp.where(act[:, None], sig_new, sig)
        depl = depl + jnp.where(act[:, None], ddepl_new, 0.)
        grad = jnp.where(act[:, None, None], grad_new, grad)
        fy = jnp.where(act, fy_new, fy)
        return sig, depl, grad, fy

    init = (sig, jnp.zeros_like(sig), grad, fy_t)
    sig_p, depl_p, grad_p, fy_p = jax.lax.fori_loop(0, maxit, body, init)

    # merge elastic and plastic lanes
    sig_out = jnp.where(elastic[:, None], sig0 + dsig, sig_p)
    depl_out = jnp.where(elastic[:, None], 0., depl_p)
    grad_out = jnp.where(elastic[:, None, None], CV[None], grad_p)
    fy_out = jnp.where(elastic, fy_pred, fy_p)
    return fy_out, sig_out, depl_out, grad_out


def response_chunked(m: DeviceMaterial, state, deps, CV, maxit=50,
                     chunk=65536):
    """Reference-faithful ``response`` evaluated in fixed-size chunks via
    ``lax.map`` — bounds the live (chunk, nsv) kernel matrices so very large
    batches (10^6+ Gauss points) fit in HBM."""
    sig0, epl0 = state
    N = sig0.shape[0]
    if N <= chunk:
        return response(m, state, deps, CV, maxit)
    pad = (-N) % chunk
    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    blocks = jax.tree.map(
        lambda x: x.reshape(-1, chunk, *x.shape[1:]),
        (pad0(sig0), pad0(epl0), pad0(deps)))

    def one(block):
        s, e, d = block
        return response(m, (s, e), d, CV, maxit)

    fy, s, dp, g = jax.lax.map(one, blocks)
    unb = lambda x: x.reshape(-1, *x.shape[2:])[:N]
    return unb(fy), unb(s), unb(dp), unb(g)


def response_fast_chunked(m: DeviceMaterial, state, deps, CV, maxiter=12,
                          nsub=1, chunk=1 << 21):
    """``response_fast`` evaluated in fixed-size chunks via ``lax.map`` when
    the batch exceeds ``chunk`` points — bounds the live (chunk, nsv) SVC
    kernel matrices so multi-million-point batches fit in HBM."""
    sig0, epl0 = state
    N = sig0.shape[0]
    if N <= chunk:
        return response_fast(m, state, deps, CV, maxiter, nsub)
    pad = (-N) % chunk

    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    blocks = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, chunk, *x.shape[1:]),
        (pad0(sig0), pad0(epl0), pad0(deps)))

    def one(block):
        s, e, d = block
        return response_fast(m, (s, e), d, CV, maxiter, nsub)

    fy, s, dp, g = jax.lax.map(one, blocks)
    unb = lambda x: x.reshape(-1, *x.shape[2:])[:N]
    return unb(fy), unb(s), unb(dp), unb(g)


#: scale on the cutting-plane projection's exit tolerance (response_fast):
#: 1.0 = the reference's yf_tolerance band; < 1 polishes the return map
#: closer to the exact yield locus (costs ~1 extra Newton trip per 10x).
#: Captured at trace time — call response_fast.clear_cache() after changing.
PROJ_TOL_SCALE = 1.0


@partial(jax.jit, static_argnums=(4, 5, 6))
def response_fast(m: DeviceMaterial, state, deps, CV, maxiter=12, nsub=1,
                  fixed_trip=False):
    """Production return map — cutting-plane closest-point projection.

    Instead of translating the reference's substepped update (50 masked
    substeps, each with a bracket-march + Brent yield-locus search — see
    ``response``), this integrates the same constitutive model with the
    standard cutting-plane algorithm (Simo & Hughes, Computational
    Inelasticity, alg. 3.5.2): elastic predictor, then Newton iterations
    lam_k = f_k / (a_k^T C a_k + khard) that return the stress to the yield
    surface along the flow direction.  ~6-12 yield-function/gradient
    evaluations per point instead of thousands — this is the speed-of-light
    formulation for the MXU.

    ``nsub`` optional equal substeps follow the strain path more closely
    (the single projection is first-order in the increment size; nsub=3-4
    recovers the substepped reference within ~0.1% at typical FE steps).

    ``fixed_trip=True`` runs the projection as a fixed ``maxiter``-trip
    ``fori_loop`` instead of the early-exit ``while_loop``, and polishes
    plastic lanes to machine zero instead of freezing inside the +-toler
    band (agreement with the production map is bounded by the projection
    tolerance; sub-tolerance freezing makes the response piecewise-constant
    in the material parameters and floods reverse-mode gradients with
    mask-flip noise).  The fixed-trip program is REVERSE-MODE
    DIFFERENTIABLE (``lax.while_loop`` has no transpose rule) — the knob
    ``ops.calibrate`` uses to autodiff stress responses w.r.t. material
    parameters.

    Returns (f_end, sig, depl, algorithmic tangent).
    """
    sig0, epl0 = state
    dt = sig0.dtype
    N = sig0.shape[0]

    # trust region: cap the per-iteration stress correction so lanes whose
    # trial state lands outside the SVC training band (flat decision surface,
    # vanishing gradient) walk back stably instead of overshooting.  ANALYTIC
    # materials run uncapped: seq is 1-homogeneous and convex, the Newton is
    # stable at any distance, and the cap actively breaks convergence — a
    # strain-controlled trial overshoots the locus by ~500 MPa, which a
    # 0.1*sy cap walks back at 15 MPa/trip and maxiter=40 cannot finish
    # (measured: Drucker paths left |f| up to 130 at mid-path steps; uncapped
    # Newton converges the same lane in 8 trips)
    cap = 0.1 * m.scale_seq if m.is_svc else 1.e6 * m.scale_seq
    deps_s = deps / nsub

    def project(sig_in, depl_in, f0):
        """One cutting-plane projection of the substep trial state.

        ``f0`` is the yield function at (sig_in, depl_in) — threaded in
        from the previous substep's end state (or the one-time evaluation
        at the response start), so each projection costs exactly
        1 + n_newton fused f/grad kernel passes: the trial evaluation
        seeds the loop carry, every Newton update re-evaluates at its own
        end state, and the final carry IS the end-state (f, grad, khard)
        the consistent tangent needs — no separate trailing pass."""
        peeq_in = jt.eps_eq(epl0 + depl_in)
        if m.is_svc:
            toler = jnp.full_like(peeq_in, yf_tolerance * PROJ_TOL_SCALE)
        else:
            toler = yf_tolerance * PROJ_TOL_SCALE * flow_stress(m, peeq_in)
        sig_tr = sig_in + _mm(deps_s, CV.T)
        epl_in = epl0 + depl_in
        f_tr, a_tr, kh_tr = yf_and_fgrad(m, sig_tr, peeq_in, epl_in)
        plastic = f_tr > toler
        # elastic fraction of this substep (linear interpolation of f along
        # the trial path) — used to blend the reported secant tangent
        alpha = jnp.where(plastic & (f0 < 0.),
                          -f0 / jnp.where(f_tr - f0 == 0., 1., f_tr - f0),
                          jnp.where(plastic, 0., 1.))
        alpha = jnp.clip(alpha, 0., 1.)

        def body(s):
            sig, depl, f, a, kh, it = s
            ca = _mm(a, CV.T)
            denom = jnp.sum(ca * a, axis=-1) + kh
            denom = jnp.maximum(denom, 1e-12 * jnp.max(jnp.abs(CV)))
            # bidirectional Newton on the yield surface along the flow
            # direction: overshoot inside the locus (f < 0) is pulled out.
            # fixed_trip (the differentiable variant) polishes to machine
            # zero instead of freezing inside the +-toler band: lanes frozen
            # at arbitrary sub-tolerance residuals make the simulated stress
            # piecewise-constant in the material parameters, which floods
            # reverse-mode gradients with mask-flip noise (measured 1e7
            # gradient magnitudes at a 2e-7 loss)
            act = plastic if fixed_trip else (plastic & (jnp.abs(f) > toler))
            lam = jnp.where(act, f / denom, 0.)
            # for SVC materials f is dimensionless -> lam carries stress
            # units through a; the update is identical in both cases.
            dsig_norm = jnp.abs(lam) * jnp.linalg.norm(ca, axis=-1)
            scale = jnp.where(dsig_norm > cap, cap / jnp.where(
                dsig_norm == 0., 1., dsig_norm), 1.)
            lam = lam * scale
            sig = sig - lam[:, None] * ca
            depl = depl + lam[:, None] * a
            f, a, kh = yf_and_fgrad(m, sig, jt.eps_eq(epl0 + depl),
                                    epl0 + depl)
            return sig, depl, f, a, kh, it + 1

        def cond(s):
            sig, depl, f, a, kh, it = s
            active = plastic & (jnp.abs(f) > toler)
            return active.any() & (it < maxiter)

        init = (sig_tr, depl_in, f_tr, a_tr, kh_tr, 0)
        if fixed_trip:
            sig, depl, f_end, a, kh, _ = jax.lax.fori_loop(
                0, maxiter, lambda _, s: body(s), init)
        else:
            sig, depl, f_end, a, kh, _ = jax.lax.while_loop(cond, body, init)
        # lam == 0 for non-plastic lanes inside the loop, so masking is a
        # no-op safeguard (carried f/a stay consistent: those lanes never
        # moved off the trial state)
        sig = jnp.where(plastic[:, None], sig, sig_tr)
        depl = jnp.where(plastic[:, None], depl, depl_in)
        if not m.is_svc:
            # radial excess-stress fallback (host response convention,
            # reference material.py:310-342): sdim=3 materials carry a
            # ZERO shear flow gradient (principal-space semantics), so
            # shear-dominated overshoot cannot relax along the flow
            # direction — scale the whole stress back to the locus (seq is
            # 1-homogeneous, one factor is exact) and book the compensating
            # plastic strain through the pseudo-compliance
            seq_c = seq_hill(m, sig)
            over_c = plastic & (f_end > toler) & (seq_c > 1e-8)
            fac = jnp.where(over_c, f_end / jnp.where(seq_c == 0., 1., seq_c),
                            0.)
            dsig_x = sig * fac[:, None]
            SVc = _compliance(CV)
            sig = sig - dsig_x
            depl = depl + _mm(dsig_x, SVc.T)
            # analytic f/grad re-evaluation at the corrected state is cheap
            # (no kernel matrix); SVC materials reuse the loop carry
            f_end, a, kh = yf_and_fgrad(m, sig, jt.eps_eq(epl0 + depl),
                                        epl0 + depl)
        # substep tangent: alpha-blend of elastic stiffness and the
        # consistent tangent at the substep end state (path-average over
        # substeps approximates the secant the FE solver needs)
        ca = _mm(a, CV.T)
        denom = jnp.sum(ca * a, axis=-1) + kh
        denom = jnp.maximum(denom, 1e-12 * jnp.max(jnp.abs(CV)))
        Ct = CV[None] - ca[:, :, None] * ca[:, None, :] / denom[:, None, None]
        Cs = (alpha[:, None, None] * CV[None]
              + (1. - alpha)[:, None, None] * Ct)
        return sig, depl, f_end, plastic, Cs

    sig = sig0
    depl = jnp.zeros_like(sig0)
    any_plastic = jnp.zeros(N, dtype=bool)
    # one-time f at the response start state; each projection threads its
    # end-state f into the next substep's elastic-fraction blend
    f_end = yf(m, sig0, jt.eps_eq(epl0), epl0)
    if nsub == 1:
        sig, depl, f_end, any_plastic, grad = project(sig, depl, f_end)
    else:
        def sub_body(_, carry):
            sig, depl, f_end, any_p, gacc = carry
            sig, depl, f_end, pl, Cs = project(sig, depl, f_end)
            return sig, depl, f_end, any_p | pl, gacc + Cs / nsub

        sig, depl, f_end, any_plastic, grad = jax.lax.fori_loop(
            0, nsub, sub_body,
            (sig, depl, f_end, any_plastic,
             jnp.zeros((N, 6, 6), dt)))

    # Exact path secant (symmetric rank-one downdate of the elastic
    # stiffness).  The FE equilibrium loop (fe_kernels.load_step*) is a
    # SECANT iteration: it re-solves the FULL increment with K built from
    # this return value, so its fixed point satisfies discrete
    # equilibrium exactly only when grad @ deps == dsig holds per
    # element.  The alpha-blended consistent tangent above only
    # approximates that, leaving an O(blend error) equilibrium residual
    # at fixed inner counts (measured ~3% spurious transverse stress on
    # free-edge uniaxial loading).  With w = CV @ deps - dsig
    # (= CV @ effective plastic strain increment),
    #   C_sec = CV - w w^T / (w . deps)
    # satisfies the secant equation identically, is symmetric, and is
    # SPD iff w . deps > w^T CV^-1 w (Sherman-Morrison determinant
    # criterion).  For ideal plasticity that margin is tiny by nature
    # (den/q - 1 ~ elastic fraction of the step; the TRUE secant is
    # near-singular along the flow direction — exactly like the khard=0
    # consistent tangent), so instead of rejecting thin-margin lanes the
    # denominator is clamped to (1+mu) q: the downdate then keeps a
    # relative margin mu of directional stiffness and the secant stays
    # exact whenever den exceeds the clamp.  Lanes with den <= 0
    # (pathological non-proportional returns) keep the blended tangent.
    # The clamp margin is dtype-aware: it floors the downdated tangent's
    # smallest eigenvalue at ~mu * directional stiffness, i.e. caps the
    # element condition number at ~1/mu — float32 CG stalls (and a
    # stalled CG can diverge) beyond kappa ~ 1e3-1e4, while float64 can
    # afford near-exact secants.  Lanes at the clamp trade O(mu) secant
    # error for a solvable system.
    mu = 1e-5 if dt == jnp.float64 else 1e-4
    w = _mm(deps, CV.T) - (sig - sig0)
    den = jnp.sum(w * deps, axis=-1)
    q = jnp.sum(_mm(w, _inv6x6_spd(CV).T) * w, axis=-1)
    ok = any_plastic & (den > 0.) & (q > 0.)
    dsafe = jnp.where(ok, jnp.maximum(den, (1. + mu) * q), 1.)
    grad = jnp.where(ok[:, None, None],
                     CV[None] - w[:, :, None] * w[:, None, :]
                     / dsafe[:, None, None], grad)
    return f_end, sig, depl, grad
