"""Geometric multigrid preconditioner for the structured-mesh FE operator.

Jacobi-CG iteration counts on the 2-D elasticity operator grow linearly with
mesh resolution (kappa ~ N^2); a V-cycle preconditioner makes them
resolution-independent.  Everything here exploits the structured grid:

* coarsening averages the 2x2 fine element tangent-stiffness blocks (the
  bilinear-quad element matrix is size-independent in 2-D, so the coarse
  operator reuses the same element formulation),
* restriction is full weighting, prolongation bilinear interpolation — both
  fixed stencils implemented with static slicing (no gathers),
* smoothing is damped Jacobi; the coarsest level is smoothed harder.

The V-cycle is symmetric (equal pre/post smoothing), so it is a valid SPD
preconditioner for CG.  Displacement BCs are handled by zeroing fixed dofs
on every level (identity rows).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pylabfea_tpu.ops import fe_kernels as fek


def _grid_of(md):
    assert md.grid is not None, 'multigrid requires a structured mesh'
    return md.grid[:2]


def coarsen_mesh(md: fek.MeshData):
    """MeshData of the next-coarser level (half resolution, same element
    aspect ratio; the 2-D quad element matrix is size-invariant).

    The coarse displacement-BC mask is PIN-PRESERVING: a coarse node is
    fixed when ANY fine node in its 3x3 neighbourhood (the nodes that
    prolongate from it) is fixed.  Plain injection at the coinciding nodes
    (coarse (I, J) <-> fine (2I, 2J)) loses displacement constraints that
    sit only at odd fine indices (bcnode pins), leaving rigid-body modes in
    the coarse operators and a singular bottom solve.  Mapping a pin to its
    neighbouring coarse nodes slightly over-constrains the coarse
    correction, which is harmless — the coarse levels only precondition;
    the fine level enforces the BCs exactly."""
    NX, NY, lx, ly, uniax = md.grid
    mdc = fek.rect_mesh(NX // 2, NY // 2, LX=lx * NX, LY=ly * NY,
                        uniax='none', eps_tot=0., dtype=md.B.dtype)
    nXc, nYc = NX // 2 + 1, NY // 2 + 1
    fp = jnp.pad(md.fixed, ((0, 0), (1, 1), (1, 1)))
    fc = jnp.zeros(md.fixed.shape[:1] + (nXc, nYc), bool)
    for di in range(3):
        for dj in range(3):
            fc = fc | fp[:, di:di + 2 * nXc - 1:2, dj:dj + 2 * nYc - 1:2]
    return mdc._replace(fixed=fc)


#: tangent-independent coarse-mesh chains, keyed on the fine grid with the
#: fine ``fixed`` array held strongly so the ``is`` identity check can never
#: hit a recycled id (fe3d._mesh_chain3 twin).  Building the chain INSIDE a
#: traced program costs ~30 ms per hierarchy build at 1024^2 at run time
#: (measured v5e: jnp ops on concrete operands still become jaxpr equations
#: under trace, and XLA won't constant-fold mask-sized arrays).
_MESH_CHAIN_CACHE = {}


def _mesh_chain(md: fek.MeshData, min_size=8):
    key = (tuple(md.grid), min_size)
    hit = _MESH_CHAIN_CACHE.get(key)
    if hit is not None and hit[0] is md.fixed:
        return hit[1]
    with jax.ensure_compile_time_eval():
        chain = [md]
        while True:
            NX, NY = _grid_of(chain[-1])
            if NX % 2 or NY % 2 or NX // 2 < min_size or NY // 2 < min_size:
                break
            chain.append(coarsen_mesh(chain[-1]))
    chain = tuple(chain)
    # never park tracers in a module-level cache (jit-arg meshes keep
    # traced `fixed` masks through ensure_compile_time_eval)
    if not isinstance(md.fixed, jax.core.Tracer):
        _MESH_CHAIN_CACHE[key] = (md.fixed, chain)
        if len(_MESH_CHAIN_CACHE) > 32:
            _MESH_CHAIN_CACHE.pop(next(iter(_MESH_CHAIN_CACHE)))
    return chain


def coarsen_elstiff(md, elstiff):
    """Average the 2x2 fine element tangent blocks -> coarse element C.
    Planes layout (36, NX, NY) in and out (rows accepted for back-compat).
    (Kept for reference/tests; the hierarchy now coarsens the assembled
    element stiffness with the exact Galerkin patch transfer below.)"""
    NX, NY = _grid_of(md)
    if elstiff.ndim == 3 and elstiff.shape[0] == 36:
        e = elstiff.reshape(36, NX // 2, 2, NY // 2, 2)
        return e.mean(axis=(2, 4))
    e = elstiff.reshape(NX // 2, 2, NY // 2, 2, 6, 6)
    return e.mean(axis=(1, 3)).reshape(-1, 6, 6)


_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _galerkin_patch_T(dtype='float64'):
    """Static (4, 64, 64) patch-transfer matrices T_ab with
    Kc[(i,j)] = sum_kl T_ab[(i,j),(k,l)] Kf[(k,l)] for the fine element at
    offset (a, b) of its coarse cell: every fine node of that element
    bilinearly interpolates from the 4 corners of the SAME coarse cell, so
    summing the per-fine-element RAP contributions over the 2x2 patch and
    assembling the resulting coarse 'element' stiffnesses reproduces the
    exact Galerkin operator P^T K P of the V-cycle's bilinear prolongation."""
    import numpy as _np
    Ts = []
    for a, b in _CORNERS:
        M = _np.zeros((8, 8))
        for corner, (dx, dy) in enumerate(_CORNERS):
            x = (a + dx) / 2.
            y = (b + dy) / 2.
            for C, (DX, DY) in enumerate(_CORNERS):
                w = ((1. - x) if DX == 0 else x) *                     ((1. - y) if DY == 0 else y)
                for c in range(2):
                    M[2 * corner + c, 2 * C + c] = w
        T = _np.einsum('ki,lj->ijkl', M, M).reshape(64, 64)
        Ts.append(T)
    return _np.stack(Ts).astype(dtype)


def galerkin_coarsen_Ke(Kf):
    """Exact Galerkin coarsening of the element-stiffness planes:
    (8, 8, NX, NY) -> (8, 8, NX/2, NY/2) via four static (64, 64) MXU
    contractions (one per patch position).  Unlike rediscretizing from
    averaged tangents, P^T K P keeps coarse corrections effective on rough
    (plastified) tangent fields."""
    NX, NY = Kf.shape[2], Kf.shape[3]
    T = jnp.asarray(_galerkin_patch_T(), Kf.dtype)
    K6 = Kf.reshape(64, NX // 2, 2, NY // 2, 2)
    out = 0.
    for idx, (a, b) in enumerate(_CORNERS):
        blk = K6[:, :, a, :, b]
        out = out + jnp.einsum('mn,nxy->mxy', T[idx], blk,
                               preferred_element_type=Kf.dtype,
                               precision=jax.lax.Precision.HIGHEST)
    return out.reshape(8, 8, NX // 2, NY // 2)


def _fw_kernel(dtype):
    """Full-weighting 3x3 stencil = bilinear interpolation weights."""
    w = jnp.asarray([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]],
                    dtype)
    return w.reshape(1, 1, 3, 3)


def _restrict_plane(fine):
    # stride-2 3x3 convolution instead of strided slices: XLA keeps the
    # coarse-level arrays in (8, 128)-tiled 2-D layouts (strided slicing
    # collapses every coarse level to flat 1-D layouts, which made the
    # coarse smoothers cost 4x the fine level at 1024^2)
    out = jax.lax.conv_general_dilated(
        fine[None, None], _fw_kernel(fine.dtype), window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return out[0, 0]


def restrict(fine):
    """Restriction = exact transpose of ``prolong`` (weights 1, 1/2, 1/4,
    zero outside the domain), so the V-cycle stays symmetric and CG-safe.
    Operates on per-component plane tuples; coarse node (I,J) <-> fine
    (2I,2J)."""
    return tuple(_restrict_plane(p) for p in fine)


def _prolong_plane(c, nnXf, nnYf):
    # bilinear prolongation as the exact transpose of ``_restrict_plane``:
    # the same 3x3 kernel applied to the 2x-dilated coarse grid
    out = jax.lax.conv_general_dilated(
        c[None, None], _fw_kernel(c.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return out[0, 0]


def prolong(coarse, nnXf, nnYf):
    """Bilinear prolongation on per-component plane tuples."""
    return tuple(_prolong_plane(p, nnXf, nnYf) for p in coarse)


_RMAT_CACHE = {}


def _restrict_mat(nn, dtype):
    """(nc, nn) full-weighting rows [.., 0.5, 1, 0.5, ..] at stride 2 —
    the separable factor of the 3x3 transfer kernel as a dense matrix.

    The cache holds the HOST (numpy) constant and the conversion runs per
    call: ``jnp.asarray`` executed while tracing one jit program yields
    that trace's constant, and caching it would poison every LATER trace
    that shares a level size (observed: the 1024^2 step program filled
    the (513, 1025) entry, then building the 2048^2 hierarchy — whose
    second level is 1025-sized — died on UnexpectedTracerError)."""
    key = (nn, np.dtype(dtype).name)
    W = _RMAT_CACHE.get(key)
    if W is None:
        nc = nn // 2 + 1
        W = np.zeros((nc, nn), dtype)
        for I in range(nc):
            j = 2 * I
            W[I, j] = 1.
            if j - 1 >= 0:
                W[I, j - 1] = .5
            if j + 1 < nn:
                W[I, j + 1] = .5
        _RMAT_CACHE[key] = W
    return jnp.asarray(W)


def restrict_mm(fine):
    """Restriction as two small matmuls (Wx @ p @ Wy^T): identical math to
    the conv formulation (which runs the TPU conv at bf16 default — the
    matmuls are at least as accurate).  Used on levels whose K-apply is
    the Pallas stencil: `conv_general_dilated` cohabiting with the custom
    call in one program cost ~4-5 ms per V-cycle level at 1024^2 (an XLA
    layout/scheduling pathology, BENCH_NOTES.md); the matmul form maps
    onto the MXU and is layout-agnostic."""
    out = []
    for p in fine:
        Wx = _restrict_mat(p.shape[0], p.dtype)
        Wy = _restrict_mat(p.shape[1], p.dtype)
        q = jax.lax.dot_general(Wx, p, (((1,), (0,)), ((), ())))
        out.append(jax.lax.dot_general(q, Wy, (((1,), (1,)), ((), ()))))
    return tuple(out)


def prolong_mm(coarse, nnXf, nnYf):
    """Prolongation as the exact transpose of ``restrict_mm``."""
    out = []
    for p in coarse:
        Wx = _restrict_mat(nnXf, p.dtype)
        Wy = _restrict_mat(nnYf, p.dtype)
        q = jax.lax.dot_general(Wx, p, (((0,), (0,)), ((), ())))
        out.append(jax.lax.dot_general(q, Wy, (((1,), (0,)), ((), ()))))
    return tuple(out)


#: smoother selection: 'jacobi' (damped, omega=0.7) or 'chebyshev'
#: (degree-nu polynomial on D^-1 K, eigenvalue interval [lmax/4, lmax])
SMOOTHER = 'jacobi'


class MGLevel:
    """One level of the hierarchy: mesh data + assembled element stiffness
    (planes layout) + Jacobi diagonal, BC mask (plane tuples) and an
    estimate of the largest eigenvalue of D^-1 K (Chebyshev smoother).
    The coarsest level additionally carries the dense inverse of its
    operator (``kc_inv``) for an exact bottom solve."""

    def __init__(self, md, Ke, diag, fixed, lmax=None):
        self.md = md
        self.Ke = Ke
        self.diag = diag
        self.fixed = fixed
        self.lmax = lmax
        self.kc_inv = None


#: exact dense bottom solve when the coarsest level has at most this many
#: dofs (min_size=8 -> 162); replaces 8*nu latency-bound smoothing sweeps
#: of tiny grids with one matvec AND upgrades the coarse correction to
#: exact, keeping the V-cycle a valid SPD preconditioner
COARSE_DENSE_MAX = 700


def _dense_coarse_inv(level: MGLevel):
    """Dense SPD pseudo-inverse of the coarsest-level operator (identity
    rows on fixed dofs, symmetric: inputs are masked and outputs pass fixed
    values through, so K_dense = P K P^T + I_f).

    Uses a Jacobi-equilibrated eigendecomposition with small-eigenvalue
    clipping rather than ``jnp.linalg.inv`` (dtype-generic — TPU LU is
    f32-only — and robust to an exactly singular operator, which a plain
    inverse turns into inf/NaN that poisons the V-cycle).  The
    equilibration matters for the clip threshold: K_dense mixes identity
    rows (eigenvalue 1) with stiffness-scale rows (~E, 1e5+), so a clip
    relative to the RAW lambda_max can cut the BC-passthrough and genuine
    soft bending modes — symmetric scaling by diag(K)^-1/2 collapses that
    spread (all diagonals 1), after which the threshold only separates
    numerically-zero modes.  ``coarsen_mesh`` preserves pins, so a true
    nullspace cannot arise from mask injection any more; the clip is a
    secondary guard (manually constructed BC-free levels, roundoff)."""
    md = level.md
    nnX, nnY = md.grid[0] + 1, md.grid[1] + 1
    n = 2 * nnX * nnY
    eye = jnp.eye(n, dtype=level.Ke.dtype)

    def apply_vec(e):
        v = (e[:nnX * nnY].reshape(nnX, nnY),
             e[nnX * nnY:].reshape(nnX, nnY))
        o = fek.k_apply_t(md, level.Ke, v, level.fixed)
        return jnp.concatenate([o[0].ravel(), o[1].ravel()])

    K = jax.vmap(apply_vec)(eye)
    d = jnp.diagonal(K)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    Ks = s[:, None] * K * s[None, :]
    w, V = jnp.linalg.eigh(Ks)
    rel = 1e-11 if K.dtype == jnp.float64 else 3e-6
    cut = rel * jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
    winv = jnp.where(w > cut, 1. / jnp.where(w > cut, w, 1.), 0.)
    SV = s[:, None] * V
    return (SV * winv[None, :]) @ SV.T


def _attach_coarse_inv(levels):
    bot = levels[-1]
    nnX, nnY = bot.md.grid[0] + 1, bot.md.grid[1] + 1
    if 2 * nnX * nnY <= COARSE_DENSE_MAX:
        bot.kc_inv = _dense_coarse_inv(bot)
    return levels


def build_hierarchy(md: fek.MeshData, elstiff, min_size=8, attach_inv=True,
                    chain=None):
    """Build the level list (fine -> coarse) for the current tangent field.

    ``attach_inv=False`` skips the dense bottom-solve factorization — for
    callers that only keep the per-level stiffness planes (``hierarchy_kes``
    consumers), where tracing the ~n dense K-applies plus the
    eigendecomposition would inflate compile time of a program whose result
    discards them.

    The coarse-mesh chain is tangent-independent; pass a precomputed
    ``chain`` when calling from inside jit (``md`` traced), else it is
    served from a host-side cache (``_mesh_chain``)."""
    if chain is None:
        chain = _mesh_chain(md, min_size)
    levels = []
    Ke = fek.element_stiffness_planes(md, elstiff)
    for i, cur_md in enumerate(chain):
        levels.append(_make_level(cur_md, Ke))
        if i + 1 < len(chain):
            # exact Galerkin coarse operator; the coarse mesh only provides
            # the BC masks / grid metadata (same generator as the fine one)
            Ke = galerkin_coarsen_Ke(Ke)
    return _attach_coarse_inv(levels) if attach_inv else levels


def hierarchy_kes(levels):
    """The per-level element-stiffness planes — the only arrays a level
    holds that are expensive to recompute.  Passing these ACROSS a jit
    boundary (instead of building the hierarchy inside the solve program)
    pins them to default layouts: the Pallas stencil K-apply is a custom
    call with default-layout operand constraints, and an in-program
    Galerkin einsum output may get a non-default layout — XLA then
    inserts a full-size relayout copy of the fine-level planes before
    EVERY stencil call inside the CG while-loop (measured +37 ms per
    preconditioned iteration at 1024^2).

    When the coarsest level qualifies for the exact dense bottom solve,
    its factorization (a 2-D matrix, unambiguous next to the 4-D plane
    arrays) rides as a trailing tuple element: the eigendecomposition
    behind it costs ~30 ms PER SOLVE on TPU if recomputed inside the
    solve program, but is a pure function of the bottom-level planes —
    so it belongs with the hierarchy, rebuilt only when the tangent
    field changes (measured: 1024^2 solve fixed cost 38.5 -> ~8 ms)."""
    kes = tuple(l.Ke for l in levels)
    bot = levels[-1]
    nnX, nnY = bot.md.grid[0] + 1, bot.md.grid[1] + 1
    if 2 * nnX * nnY <= COARSE_DENSE_MAX:
        inv = bot.kc_inv if bot.kc_inv is not None \
            else _dense_coarse_inv(bot)
        return kes + (inv,)
    return kes


def levels_from_kes(md: fek.MeshData, kes, chain=None):
    """Rebuild the level list from per-level stiffness planes (Jacobi
    diagonals are cheap and recomputed in-trace; the coarse-mesh chain
    comes from the host-side ``_mesh_chain`` cache — or pass ``chain``
    when ``md`` is traced).  A trailing 2-D element is the precomputed
    dense bottom inverse (see ``hierarchy_kes``); legacy plane-only
    tuples factorize it here."""
    kc_inv = None
    if len(kes) > 1 and kes[-1].ndim == 2:
        kc_inv, kes = kes[-1], kes[:-1]
    if chain is None:
        chain = _mesh_chain(md, 8)
    levels = []
    for i, Ke in enumerate(kes):
        cur_md = chain[i] if i < len(chain) else coarsen_mesh(
            levels[-1].md)
        levels.append(_make_level(cur_md, Ke))
    if kc_inv is not None:
        levels[-1].kc_inv = kc_inv
        return levels
    return _attach_coarse_inv(levels)


def _make_level(cur_md, Ke):
    """MGLevel from mesh metadata + element-stiffness planes."""
    fixT = fek._split(cur_md.fixed)
    diag = fek.k_diag_t(cur_md, Ke, fixT)
    lmax = None
    if SMOOTHER == 'chebyshev':
        # power iteration for lambda_max(D^-1 K); deterministic start
        nnX, nnY = cur_md.grid[0] + 1, cur_md.grid[1] + 1
        i = jnp.arange(nnX * nnY, dtype=Ke.dtype).reshape(nnX, nnY)
        v = tuple(jnp.sin(i * (0.37 + 0.11 * c)) + 0.01
                  for c in range(2))
        minv = tuple(1. / d for d in diag)

        def pw(_, v):
            w = fek.k_apply_t(cur_md, Ke, v, fixT)
            w = tuple(m * x for m, x in zip(minv, w))
            nrm = jnp.maximum(fek._norm(w), 1e-30)
            return tuple(x / nrm for x in w)

        v = jax.lax.fori_loop(0, 10, pw, v)
        Av = fek.k_apply_t(cur_md, Ke, v, fixT)
        Av = tuple(m * x for m, x in zip(minv, Av))
        lmax = fek._dot(v, Av) / jnp.maximum(fek._dot(v, v), 1e-30)
    return MGLevel(cur_md, Ke, diag, fixT, lmax)


def _smooth(level: MGLevel, x, b, nu, omega=0.7, zero_start=False):
    """nu smoothing sweeps on K x = b (plane tuples): damped Jacobi, or a
    degree-nu Chebyshev polynomial in D^-1 K targeting [lmax/4, lmax]
    (stronger on rough tangent fields; SMOOTHER module switch).

    ``zero_start=True`` asserts ``x == 0`` so the first sweep's stiffness
    apply (``K @ 0``) is elided: the sweep collapses to the exact
    ``x = omega * D^-1 b`` (Jacobi) / ``r = b`` (Chebyshev) — one full
    element-stiffness-plane stream saved per V-cycle level, bitwise
    identical to sweeping from the zero vector."""
    if SMOOTHER == 'chebyshev' and level.lmax is not None:
        minv = tuple(1. / d for d in level.diag)
        lmax = 1.1 * level.lmax
        lmin = lmax / 4.
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        if zero_start:
            r = b
        else:
            Kx = fek.k_apply_t(level.md, level.Ke, x, level.fixed)
            r = tuple(bi - ki for bi, ki in zip(b, Kx))
        d = tuple(m * ri / theta for m, ri in zip(minv, r))
        rho = 1. / sigma
        for _ in range(max(nu, 1)):
            x = tuple(xi + di for xi, di in zip(x, d))
            Kd = fek.k_apply_t(level.md, level.Ke, d,
                               level.fixed)
            # fixed dofs: k_apply_t returns d there; keep residual zero
            r = tuple(jnp.where(f, 0., ri - ki)
                      for f, ri, ki in zip(level.fixed, r, Kd))
            rho_new = 1. / (2. * sigma - rho)
            d = tuple(rho_new * rho * di + 2. * rho_new / delta * m * ri
                      for di, m, ri in zip(d, minv, r))
            rho = rho_new
        return x

    minv = tuple(omega / d for d in level.diag)

    def body(_, x):
        Kx = fek.k_apply_t(level.md, level.Ke, x, level.fixed)
        return tuple(xi + m * (bi - ki)
                     for xi, m, bi, ki in zip(x, minv, b, Kx))

    if zero_start:
        # first sweep from x = 0: K @ 0 = 0, so x_1 = omega * D^-1 b
        # (fixed rows get b there, matching the K @ 0 identity-row path:
        # k_apply_t returns x on fixed dofs, i.e. 0, and b is pre-masked
        # to 0 on fixed rows by the v_cycle caller, so both forms are 0)
        x = tuple(m * bi for m, bi in zip(minv, b))
        nu = nu - 1
    return jax.lax.fori_loop(0, nu, body, x)


def v_cycle(levels, b, lvl=0, nu=2):
    """One symmetric V-cycle solving K e = b approximately (zero initial);
    vectors are per-component plane tuples."""
    level = levels[lvl]
    fix = level.fixed
    b = tuple(jnp.where(f, 0., bi) for f, bi in zip(fix, b))
    zero = tuple(jnp.zeros_like(bi) for bi in b)
    if lvl == len(levels) - 1:
        if level.kc_inv is not None:
            # exact bottom solve: one dense matvec instead of 8*nu
            # latency-bound sweeps of a tiny grid
            nnX, nnY = (level.md.grid[0] + 1, level.md.grid[1] + 1)
            bflat = jnp.concatenate([b[0].ravel(), b[1].ravel()])
            x = level.kc_inv @ bflat
            m = nnX * nnY
            return (x[:m].reshape(nnX, nnY), x[m:].reshape(nnX, nnY))
        return _smooth(level, zero, b, 8 * nu, zero_start=True)
    x = _smooth(level, zero, b, nu, zero_start=True)
    Kx = fek.k_apply_t(level.md, level.Ke, x, fix)
    r = tuple(jnp.where(f, 0., bi - ki) for f, bi, ki in zip(fix, b, Kx))
    NX, NY = _grid_of(level.md)
    # matmul transfers on stencil levels (conv cohabitation pathology)
    mm = fek._stencil_ok(level.md, level.Ke)
    rc = restrict_mm(r) if mm else restrict(r)
    ec = v_cycle(levels, rc, lvl + 1, nu)
    fc = levels[lvl + 1].fixed
    ec = tuple(jnp.where(f, 0., ei) for f, ei in zip(fc, ec))
    e = prolong_mm(ec, NX + 1, NY + 1) if mm else prolong(ec, NX + 1, NY + 1)
    x = tuple(xi + jnp.where(f, 0., ei) for xi, f, ei in zip(x, fix, e))
    return _smooth(level, x, b, nu)


def mg_cg_solve(levels, b, x0, tol=1.e-8, maxiter=200, nu=2):
    """CG with a V-cycle preconditioner on the finest level.

    The loop is arranged so the (large) V-cycle subprogram is instantiated
    exactly once in the compiled program — XLA compile time of the deep
    multigrid hierarchy is the binding constraint, not FLOPs.

    ``nu``: pre/post smoothing sweeps per level.  Measured on the 1024^2
    production (developed-plastic) tangent field, cold solve to 1e-6 on
    TPU v5e: nu=1 -> 16 iters / 187 ms, nu=2 -> 11 / 150, nu=3 -> 9 /
    138.  nu=2 stays the default: warm-started production solves run few
    iterations, where the extra per-iteration sweeps of nu=3 buy little.
    """
    level = levels[0]
    fix = level.fixed
    apply_fn = lambda v: fek.k_apply_t(level.md, level.Ke, v, fix)
    Ax0 = apply_fn(x0)
    r0 = tuple(jnp.where(f, 0., bi - ai) for f, bi, ai in zip(fix, b, Ax0))
    bnorm = jnp.maximum(fek._norm(b), 1e-30)
    p0 = tuple(jnp.zeros_like(ri) for ri in r0)
    rn0 = fek._norm(r0)
    b_f32 = r0[0].dtype == jnp.float32

    # stall exit: float32 CG bottoms out at a rounding floor
    # ~ kappa(M^-1 K) * eps32 relative; when `tol` sits below that floor
    # the tolerance test never fires and the loop burns the whole
    # `maxiter` budget making no progress (observed at 2048^2: 100
    # iterations where 1024^2 takes ~20, the last ~75 flat at ~2e-6).
    # Exit once the residual has not improved on its running best for 4
    # consecutive iterations — the iterate is then at the precision
    # floor, which is the best any further f32 Krylov work can deliver
    # (refine_du is the knob that pushes past it).
    def cond(s):
        # `rn` is the residual norm the body already computed — carrying
        # it saves one full-plane reduction per iteration vs recomputing
        # _norm(r) here
        x, r, p, rz, it, best, nstall, rn = s
        return (rn > tol * bnorm) & (it < maxiter) & (nstall < 4)

    def body(s):
        x, r, p, rz_prev, it, best, nstall, _ = s
        z = v_cycle(levels, r, nu=nu)
        rz = fek._dot(r, z)
        beta = jnp.where(it == 0, 0., rz / rz_prev)
        p = fek._axpy(beta, p, z)
        Ap = apply_fn(p)
        alpha = rz / fek._dot(p, Ap)
        x = fek._axpy(alpha, p, x)
        r = tuple(jnp.where(f, 0., ri - alpha * ai)
                  for f, ri, ai in zip(fix, r, Ap))
        rn = fek._norm(r)
        # < 5% improvement for 4 consecutive iterations = floor regime;
        # f32-only and counted only below 1e-3 relative (mid-solve CG
        # plateaus are legitimate — see fe_kernels.cg_solve)
        if b_f32:
            near_floor = rn < 1e-3 * bnorm
            nstall = jnp.where(rn < 0.95 * best, 0,
                               jnp.where(near_floor, nstall + 1, nstall))
        return x, r, p, rz, it + 1, jnp.minimum(best, rn), nstall, rn

    x, r, p, rz, it, _, _, rn = jax.lax.while_loop(
        cond, body,
        (x0, r0, p0, jnp.asarray(1., r0[0].dtype), 0, rn0, 0, rn0))
    return x, rn / bnorm, it
