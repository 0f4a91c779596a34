"""3-D structured-grid FE solver (trilinear hex8 elements) — device path.

A capability the reference package does not have: pyLabFEA's ``Model``
supports 1-D bars and 2-D plane stress/strain only (reference
model.py:157-197, ``dim`` restricted to 1/2).  The TPU-native design
generalizes the 2-D performance profile (``ops.fe_kernels``) to 3-D:

* **volume-tuple DOF layout**: nodal vectors are per-component
  (nnX, nnY, nnZ) volumes — the large nnZ axis lands on the TPU lane
  dimension (same rationale as the 2-D plane tuples,
  fe_kernels.MeshData).
* **partial-assembly K-apply**: the hex8 element stiffness is never
  formed.  K @ v runs as gather (24 shifted-slice corner volumes) ->
  per-Gauss-point strain (a static (48, 24) MXU contraction) ->
  pointwise tangent application (36 fused multiply-adds against the
  per-element stiffness volumes) -> B^T scatter.  Storing Ke would need
  24 x 24 = 576 volumes (4.8 GB at 128^3 in f32); the tangent field
  ``C`` needs 36 (300 MB) and the extra FLOPs ride the MXU/VPU.
* **rediscretized geometric multigrid**: coarse levels average the
  2x2x2 fine tangent blocks (the hex8 element matrix is aspect-ratio-
  invariant under uniform refinement), trilinear transfers are separable
  full-weighting matmuls, damped-Jacobi smoothing, exact dense bottom
  solve.  (The 2-D hierarchy's Galerkin patch transfer would need the
  576-volume Ke representation — rediscretization is the memory-sane
  3-D choice and measurably keeps iteration counts mesh-independent.)
* **constitutive layer unchanged**: the return maps
  (``ops.constitutive``) are dimension-agnostic — 6-component Voigt
  states with engineering shears (Voigt order 11, 22, 33, 23, 13, 12,
  core/tensors._VOIGT_IDX) — so every material of the 2-D/host paths
  (analytic J2/Hill/Drucker, SVC-ML with work hardening) serves 3-D
  as-is, including grouped multi-material meshes.

The solver mirrors the 2-D ``load_step`` semantics (reference
model.py:1270-1445 load stepping: elastic predictor + secant-Picard
equilibrium iterations with change-gated tangent updates).
"""
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import fe_kernels as fek


#: corner order (dx, dy, dz), z fastest — matches the gather/scatter slices
_CORNERS3 = tuple((dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                  for dz in (0, 1))


def _hex_B(lx, ly, lz, dtype=np.float64):
    """B matrices of the trilinear hex8 at the 8 Gauss points.

    Element dof order is corner-major, component-minor (dof = 3 a + c),
    strain rows in the package Voigt order (11, 22, 33, 23, 13, 12) with
    ENGINEERING shears — the contract of the constitutive kernels
    (core/tensors._VOIGT_IDX; reference model.py:439-512 uses the same
    convention for the 2-D B)."""
    cpos = np.sqrt(1. / 3.)
    L = (lx, ly, lz)
    Bs = np.zeros((8, 6, 24), dtype=dtype)
    for g, gc in enumerate(_CORNERS3):
        xi = np.array([(2 * c - 1) * cpos for c in gc])
        for a, cn in enumerate(_CORNERS3):
            s = np.array([2. * c - 1. for c in cn])
            f = 0.5 * (1. + s * xi)
            dN = np.empty(3)
            for d in range(3):
                prod = 0.5 * s[d] * 2. / L[d]
                for e in range(3):
                    if e != d:
                        prod *= f[e]
                dN[d] = prod
            B = Bs[g]
            ix, iy, iz = 3 * a, 3 * a + 1, 3 * a + 2
            B[0, ix] = dN[0]
            B[1, iy] = dN[1]
            B[2, iz] = dN[2]
            B[3, iy] = dN[2]
            B[3, iz] = dN[1]
            B[4, ix] = dN[2]
            B[4, iz] = dN[0]
            B[5, ix] = dN[1]
            B[5, iy] = dN[0]
    return Bs


def _hex_B_modes(lx, ly, lz):
    """Exact parity-mode factorization of the hex8 Gauss sum.

    B(xi) is multilinear in (xi, eta, zeta) and the 2x2x2 Gauss points
    are sign-symmetric, so with B = sum_p mu_p(xi) B_p over parity
    monomials mu_p = prod_d xi_d^{p_d} (p in {0,1}^3) the cross moments
    vanish: sum_g mu_p(xi_g) mu_q(xi_g) = 8 (1/3)^{|p|} delta_pq.  Hence

        sum_g B_g^T C B_g  =  sum_p w_p B_p^T C B_p,   w_p = 8 (1/3)^{|p|}

    EXACTLY — 7 non-empty modes (the xi*eta*zeta mode is empty because
    each dN_a/dx_d is constant in xi_d) with 288 total nonzeros versus
    576 across the 8 Gauss matrices, and the per-mode sigma stage prunes
    to the mode's active strain rows: ~714 plane-FMAs per apply instead
    of 1440.  The mode matrices are built ANALYTICALLY (expanding
    dN_a/dx_d = 0.25 s_d/L_d (1 + s_e1 xi_e1)(1 + s_e2 xi_e2)), so the
    sparsity is exact, not threshold-detected.

    Returns a tuple of (Bp: (6, 24) nested list, w_p: float, rows:
    tuple of active strain-row indices) for the non-empty modes.
    """
    L = (lx, ly, lz)
    # strain row 'a' receives dN/d(x_d) on the element-dof component c:
    # Voigt order (11, 22, 33, 23, 13, 12), engineering shears
    _ROWS_OF = ((0, 0), (1, 1), (2, 2), (3, 1), (3, 2), (4, 0), (4, 2),
                (5, 0), (5, 1))
    _D_OF = {(0, 0): 0, (1, 1): 1, (2, 2): 2, (3, 1): 2, (3, 2): 1,
             (4, 0): 2, (4, 2): 0, (5, 0): 1, (5, 1): 0}
    Bp = {p: np.zeros((6, 24)) for p in
          ((0, 0, 0),) + tuple(t for t in _CORNERS3 if t != (0, 0, 0))}
    for a, cn in enumerate(_CORNERS3):
        s = [2. * c - 1. for c in cn]
        for (row, comp) in _ROWS_OF:
            d = _D_OF[(row, comp)]
            e1, e2 = [e for e in range(3) if e != d]
            base = 0.25 * s[d] / L[d]
            i = 3 * a + comp
            p0 = [0, 0, 0]
            Bp[tuple(p0)][row, i] += base
            p1 = [0, 0, 0]; p1[e1] = 1
            Bp[tuple(p1)][row, i] += base * s[e1]
            p2 = [0, 0, 0]; p2[e2] = 1
            Bp[tuple(p2)][row, i] += base * s[e2]
            p3 = [0, 0, 0]; p3[e1] = 1; p3[e2] = 1
            Bp[tuple(p3)][row, i] += base * s[e1] * s[e2]
    modes = []
    for p, M in Bp.items():
        if not np.any(M):
            continue
        w = 8. * (1. / 3.) ** sum(p)
        rows = tuple(a for a in range(6) if np.any(M[a]))
        modes.append((M.tolist(), w, rows))
    return tuple(modes)


class MeshData3D(NamedTuple):
    """Structured 3-D mesh arrays for the device solver (see module doc).

    ``grid`` = (NX, NY, NZ, lx, ly, lz, uniax) static metadata; nodal
    fields are (3, nnX, nnY, nnZ); element state is (Nel, 6) in flat
    element order e = (ex * NY + ey) * NZ + ez.  ``perm``/``groups``
    follow the 2-D multi-material contract (fe_kernels.MeshData)."""
    B: jnp.ndarray           # (8, 6, 24) shared hex8 B matrices
    Bsum: jnp.ndarray        # (6, 24) element-average B
    jacw: jnp.ndarray        # scalar GP weight * |J| (= vel / 8)
    vel: jnp.ndarray         # element volume
    fixed: jnp.ndarray       # (3, nnX, nnY, nnZ) bool displacement mask
    fixed_val: jnp.ndarray   # prescribed displacement (per unit load)
    force: jnp.ndarray       # external force pattern (per unit load)
    perm: jnp.ndarray        # (Nel,) material sort; (0,) if single-material
    inv_perm: jnp.ndarray    # inverse permutation; (0,) if single-material
    ndof: int
    nel: int
    grid: tuple
    groups: tuple


def _md3_flatten(m):
    return (m[:-4], (m.ndof, m.nel, m.grid, m.groups))


def _md3_unflatten(aux, children):
    return MeshData3D(*children, ndof=aux[0], nel=aux[1], grid=aux[2],
                      groups=aux[3])


jax.tree_util.register_pytree_node(MeshData3D, _md3_flatten, _md3_unflatten)


def make_face_bcs(NX, NY, NZ, xlo=None, xhi=None, ylo=None, yhi=None,
                  zlo=None, zhi=None, nodes=()):
    """General structured-grid BC volumes from face specs.

    Each face spec maps a component (0/1/2 = x/y/z) to ``(bctype, value)``
    with bctype 'disp' or 'force' (TOTAL face force, trapezoid-distributed:
    per-node weight is the product of the per-axis end-node-halved weights
    — the 3-D analogue of the reference's half-corner-weight edge
    distribution, model.py:1147-1179).  ``nodes`` is an iterable of
    ``(ix, iy, iz, comp, bctype, value)``.  First-come displacement
    conflicts, in the order xlo, ylo, zlo, xhi, yhi, zhi, nodes."""
    nnX, nnY, nnZ = NX + 1, NY + 1, NZ + 1
    fixed = np.zeros((3, nnX, nnY, nnZ), dtype=bool)
    fval = np.zeros((3, nnX, nnY, nnZ))
    force = np.zeros((3, nnX, nnY, nnZ))
    sel = {'xlo': (0, slice(None), slice(None)),
           'xhi': (nnX - 1, slice(None), slice(None)),
           'ylo': (slice(None), 0, slice(None)),
           'yhi': (slice(None), nnY - 1, slice(None)),
           'zlo': (slice(None), slice(None), 0),
           'zhi': (slice(None), slice(None), nnZ - 1)}

    def trap(n):
        w = np.ones(n)
        w[0] = w[-1] = 0.5
        return w

    def face_weights(which):
        if which in ('xlo', 'xhi'):
            w = np.outer(trap(nnY), trap(nnZ))
        elif which in ('ylo', 'yhi'):
            w = np.outer(trap(nnX), trap(nnZ))
        else:
            w = np.outer(trap(nnX), trap(nnY))
        return w / w.sum()

    def apply_face(which, spec):
        if not spec:
            return
        ii = sel[which]
        for comp, (bctype, val) in spec.items():
            if bctype == 'disp':
                region = fixed[comp][ii]
                vals = fval[comp][ii]
                vals[~region] = val
                fval[comp][ii] = vals
                fixed[comp][ii] = True
            elif bctype == 'force':
                force[comp][ii] += val * face_weights(which)
            else:
                raise ValueError(f'unknown bctype {bctype!r}')

    for which, spec in (('xlo', xlo), ('ylo', ylo), ('zlo', zlo),
                        ('xhi', xhi), ('yhi', yhi), ('zhi', zhi)):
        apply_face(which, spec)
    for ix, iy, iz, comp, bctype, val in nodes:
        if bctype == 'disp':
            if not fixed[comp, ix, iy, iz]:
                fixed[comp, ix, iy, iz] = True
                fval[comp, ix, iy, iz] = val
        else:
            force[comp, ix, iy, iz] += val
    return fixed, fval, force


def box_mesh(NX, NY, NZ, LX=1., LY=1., LZ=1., uniax='z', eps_tot=0.01,
             dtype=jnp.float32, bc=None, mat_map=None):
    """Structured NX x NY x NZ hex8 mesh.

    Default BCs are the uniaxial-stress test: symmetry rollers on the
    three low faces (xlo: ux = 0, ylo: uy = 0, zlo: uz = 0) and the high
    face of the load axis pulled (uniax 'x'|'y'|'z'); the remaining faces
    are traction-free, so a homogeneous material sees an exact uniaxial
    stress state.  ``fixed_val``/``force`` are unit-load patterns scaled
    by the solver's load factor.

    ``bc`` (dict with keys xlo/xhi/ylo/yhi/zlo/zhi/nodes, see
    ``make_face_bcs``) replaces the defaults.  ``mat_map`` (NX, NY, NZ)
    int volume of material-group indices enables the grouped
    multi-material return map (same contract as the 2-D path)."""
    nnX, nnY, nnZ = NX + 1, NY + 1, NZ + 1
    lx, ly, lz = LX / NX, LY / NY, LZ / NZ
    nel = NX * NY * NZ
    ndof = 3 * nnX * nnY * nnZ
    B = _hex_B(lx, ly, lz)
    Bsum = B.mean(axis=0)
    vel = lx * ly * lz
    jacw = vel / 8.

    if bc is not None:
        fixed, fval, force = make_face_bcs(NX, NY, NZ, **bc)
    else:
        ax = {'x': 0, 'y': 1, 'z': 2}[uniax] if uniax != 'none' else None
        spec = dict(xlo={0: ('disp', 0.)}, ylo={1: ('disp', 0.)},
                    zlo={2: ('disp', 0.)})
        if ax is not None:
            hi = ('xhi', 'yhi', 'zhi')[ax]
            Ltot = (LX, LY, LZ)[ax]
            spec[hi] = {ax: ('disp', eps_tot * Ltot)}
        fixed, fval, force = make_face_bcs(NX, NY, NZ, **spec)

    perm = np.zeros(1, np.int32)
    inv_perm = np.zeros(1, np.int32)
    groups = None
    if mat_map is not None:
        mat_map = np.asarray(mat_map).reshape(nel)
        order = np.argsort(mat_map, kind='stable').astype(np.int32)
        nmat = int(mat_map.max()) + 1
        counts = np.bincount(mat_map, minlength=nmat)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        groups = tuple((int(s), int(c)) for s, c in zip(starts, counts))
        perm = order
        inv_perm = np.empty_like(order)
        inv_perm[order] = np.arange(nel, dtype=np.int32)

    return MeshData3D(
        B=jnp.asarray(B, dtype), Bsum=jnp.asarray(Bsum, dtype),
        jacw=jnp.asarray(jacw, dtype), vel=jnp.asarray(vel, dtype),
        fixed=jnp.asarray(fixed), fixed_val=jnp.asarray(fval, dtype),
        force=jnp.asarray(force, dtype),
        perm=jnp.asarray(perm), inv_perm=jnp.asarray(inv_perm),
        ndof=ndof, nel=nel, grid=(NX, NY, NZ, lx, ly, lz, uniax),
        groups=groups)


# ---------------------------------------------------------------- kernels

def _split3(v):
    """(3, nnX, nnY, nnZ) stacked volumes -> per-component tuple (the
    solvers carry tuples through lax loops; see fe_kernels._split)."""
    return (v[0], v[1], v[2])


def _merge3(t):
    return jnp.stack(t, 0)


def _gather_vols_list(md: MeshData3D, v):
    """Nodal volume tuple -> list of 24 (NX, NY, NZ) element-dof volumes
    (corner-major, component-minor) via static shifted slices — kept as a
    LIST so XLA fuses the slices into the consuming elementwise graph
    instead of materializing a stacked copy."""
    NX, NY, NZ = md.grid[:3]
    out = []
    for dx, dy, dz in _CORNERS3:
        for c in range(3):
            out.append(v[c][dx:dx + NX, dy:dy + NY, dz:dz + NZ])
    return out


def _gather_vols(md: MeshData3D, v):
    """Stacked (24, NX, NY, NZ) variant for batch consumers."""
    return jnp.stack(_gather_vols_list(md, v), 0)


def _scatter_vols(md: MeshData3D, f24):
    """24 (NX, NY, NZ) element-dof contributions (list or stacked array)
    -> nodal volume tuple (stencil scatter-add via static shifted-slice
    adds)."""
    NX, NY, NZ = md.grid[:3]
    nn = (NX + 1, NY + 1, NZ + 1)
    dt = f24[0].dtype
    out = [jnp.zeros(nn, dt), jnp.zeros(nn, dt), jnp.zeros(nn, dt)]
    for a, (dx, dy, dz) in enumerate(_CORNERS3):
        for c in range(3):
            out[c] = out[c].at[dx:dx + NX, dy:dy + NY, dz:dz + NZ].add(
                f24[3 * a + c])
    return tuple(out)


def elstiff_vols(md: MeshData3D, elstiff):
    """Tangent-stiffness field in volumes layout (36, NX, NY, NZ); accepts
    rows (Nel, 6, 6)."""
    if elstiff.ndim == 4 and elstiff.shape[0] == 36:
        return elstiff
    NX, NY, NZ = md.grid[:3]
    return elstiff.reshape(md.nel, 36).T.reshape(36, NX, NY, NZ)


#: static sparsity of the hex8 B rows: row a touches these element dofs
#: (normal rows: the 8 same-component dofs; shear rows: 16 dofs of the two
#: coupled components).  The PATTERN is Gauss-point-independent — only the
#: coefficients change with g — which is what makes the compile-cheap
#: fori-over-GP apply possible.
_ROW_DOFS = tuple(
    tuple(i for i in range(24)
          if _hex_B(1., 1., 1.)[0][a][i] != 0.) for a in range(6))
#: element-dof i participates in these strain rows (its component's normal
#: row + the two shears coupling that component)
_COL_ROWS = tuple(
    tuple(a for a in range(6)
          if _hex_B(1., 1., 1.)[0][a][i] != 0.) for i in range(24))


def _k_apply3_unrolled(md: MeshData3D, Cp, v):
    """Fully unrolled partial-assembly K @ v (no BC handling): for each
    Gauss point, strain from the gathered corner volumes (B has <= 16
    nonzeros per row — static-coefficient multiply-adds), pointwise
    tangent application against the 36 stiffness volumes, B^T scatter.

    Everything is an elementwise graph over (NX, NY, NZ) volumes with
    HOST-constant coefficients (B is recomputed from the static grid
    metadata — the traced ``md.B`` cannot be read at trace time), so XLA
    fuses the whole apply into a few VPU passes.  The einsum formulation
    ('abxyz,gbxyz->gaxyz') lowers to a huge-batch tiny-contraction dot —
    measured 49 ms at 128^3 on v5e vs 13 ms for this form."""
    NX, NY, NZ, lx, ly, lz = md.grid[:6]
    # host constants; Python-float coefficients keep JAX weak typing (a
    # numpy f64 scalar would promote f32 volumes under enable_x64)
    B = _hex_B(lx, ly, lz).tolist()
    jacw = lx * ly * lz / 8.
    up = _gather_vols_list(md, v)
    f24 = [None] * 24
    for g in range(8):
        eps = []
        for a in range(6):
            t = None
            for i in _ROW_DOFS[a]:
                w = B[g][a][i]
                t = up[i] * w if t is None else t + up[i] * w
            eps.append(t)
        sig = []
        for a in range(6):
            t = None
            for b in range(6):
                t = (Cp[6 * a + b] * eps[b] if t is None
                     else t + Cp[6 * a + b] * eps[b])
            sig.append(t)
        for i in range(24):
            t = None
            for a in _COL_ROWS[i]:
                w = B[g][a][i]
                t = sig[a] * w if t is None else t + sig[a] * w
            f24[i] = t if f24[i] is None else f24[i] + t
    return _scatter_vols(md, [jacw * f for f in f24])


def _k_apply3_fori(md: MeshData3D, Cp, v):
    """fori-over-Gauss-points partial assembly — ~8x smaller HLO graph
    than the unrolled form (one GP body instead of eight) at the cost of
    re-streaming the accumulator each iteration.  Used off-TPU: the
    unrolled graph costs ~8 s of XLA:CPU compile PER INSTANTIATION and a
    V-cycle instantiates it ~3x per level — the test suite's compile
    bill, not run time, was the binding constraint (the same
    platform-gating pattern as the 2-D Pallas stencil,
    fe_kernels._stencil_ok)."""
    NX, NY, NZ, lx, ly, lz = md.grid[:6]
    B = jnp.asarray(_hex_B(lx, ly, lz), Cp.dtype)      # (8, 6, 24) const
    jacw = lx * ly * lz / 8.
    up = _gather_vols_list(md, v)
    # seed the accumulator from the input (not a literal zeros): under
    # shard_map the carry must hold the inputs' varying-manual-axes type
    # or the fori_loop type check rejects the body (carry {} vs {V:x})
    zero = (v[0] * 0.).astype(Cp.dtype)

    def body(g, acc):
        Bg = jax.lax.dynamic_index_in_dim(B, g, 0, keepdims=False)
        eps = []
        for a in range(6):
            t = None
            for i in _ROW_DOFS[a]:
                t = up[i] * Bg[a, i] if t is None else t + up[i] * Bg[a, i]
            eps.append(t)
        sig = []
        for a in range(6):
            t = None
            for b in range(6):
                t = (Cp[6 * a + b] * eps[b] if t is None
                     else t + Cp[6 * a + b] * eps[b])
            sig.append(t)
        f24 = []
        for i in range(24):
            t = None
            for a in _COL_ROWS[i]:
                t = sig[a] * Bg[a, i] if t is None else t + sig[a] * Bg[a, i]
            f24.append(t)
        fg = _scatter_vols(md, f24)
        return tuple(ai + fi for ai, fi in zip(acc, fg))

    acc = jax.lax.fori_loop(0, 8, body, (zero, zero, zero))
    return tuple(jacw * a for a in acc)


#: tri-state switch for the fused Pallas volume kernel: None = auto
#: (float32 grids on TPU whose YZ tangent block fits VMEM), True/False
#: forced (fe_kernels.USE_STENCIL twin)
USE_STENCIL3 = None


def _stencil3_ok(md, Cp):
    if USE_STENCIL3 is False:
        return False
    if Cp.dtype != jnp.float32:
        return False
    from pylabfea_tpu.ops import volume_pallas as vp
    NX, NY, NZ = md.grid[:3]
    if NX < 32 or not vp.fits3(NY, NZ):
        return False
    if USE_STENCIL3:
        return True
    # pallas_call is not GSPMD-partitionable: with mesh3d's P(None, 'x')-
    # sharded tangent volumes the partitioner must fully replicate the
    # kernel operands (or fails), silently defeating the element-axis
    # sharding and risking per-device OOM at the scales the sharding
    # exists for.  Auto-selection therefore requires a single-device
    # process; concrete single-device inputs (fully-replicated or
    # unsharded) still qualify.  Force USE_STENCIL3 = True to override
    # (e.g. from inside a shard_map whose specs replicate the operands).
    if jax.device_count() > 1:
        try:
            sh = Cp.sharding
            if not (sh.is_fully_replicated
                    and len(sh.device_set) == 1):
                return False
        except Exception:   # tracer under jit: sharding unknowable here
            return False
    return fek._on_tpu()


def _k_apply3_raw(md: MeshData3D, Cp, v):
    """Partial-assembly K @ v (no BC handling); dispatched between the
    fused Pallas volume kernel (TPU f32, single-pass C streaming), the
    unrolled XLA form (TPU fallback), and the compile-cheap fori form
    (CPU — tests, multichip dryrun)."""
    if _stencil3_ok(md, Cp):
        from pylabfea_tpu.ops import volume_pallas as vp
        NX, NY, NZ, lx, ly, lz = md.grid[:6]
        return vp.k_apply3_stencil(Cp, v[0], v[1], v[2], lx, ly, lz)
    if fek._on_tpu():
        return _k_apply3_unrolled(md, Cp, v)
    return _k_apply3_fori(md, Cp, v)


def k_apply3_t(md: MeshData3D, Cp, v, fixed):
    """Matrix-free K @ v on volume tuples with identity rows on fixed dofs."""
    vm = tuple(jnp.where(f, 0., x) for f, x in zip(fixed, v))
    out = _k_apply3_raw(md, Cp, vm)
    return tuple(jnp.where(f, x, o) for f, x, o in zip(fixed, v, out))


def k_diag3_t(md: MeshData3D, Cp, fixed):
    """Diagonal of K as a volume tuple, 1 on fixed dofs: the per-element
    contributions are D @ C with the static (24, 36) map
    D[i, 6 a + b] = jacw * sum_g B[g, a, i] B[g, b, i] (trace-safe: B is
    a small constant, the einsum folds at compile time)."""
    D = (md.jacw * jnp.einsum('gai,gbi->iab', md.B, md.B)).reshape(24, 36)
    d24 = jnp.einsum('il,lxyz->ixyz', D.astype(Cp.dtype), Cp,
                     preferred_element_type=Cp.dtype)
    d = _scatter_vols(md, d24)
    return tuple(jnp.where(f, 1., x) for f, x in zip(fixed, d))


def element_deps3(md: MeshData3D, du):
    """Element-average strain increments (Nel, 6) from a nodal increment."""
    up = _gather_vols(md, _split3(du))
    deps = jnp.einsum('ai,ixyz->axyz', md.Bsum, up,
                      preferred_element_type=du.dtype)
    return deps.reshape(6, md.nel).T


# ------------------------------------------------------------- multigrid

def coarsen_mesh3(md: MeshData3D):
    """MeshData3D of the next-coarser level (half resolution; hex8 element
    matrices are aspect-ratio-invariant).  The coarse displacement mask is
    pin-preserving: a coarse node is fixed when ANY fine node in its 3x3x3
    prolongation neighbourhood is fixed (see multigrid.coarsen_mesh)."""
    NX, NY, NZ, lx, ly, lz, _ = md.grid
    mdc = box_mesh(NX // 2, NY // 2, NZ // 2, LX=lx * NX, LY=ly * NY,
                   LZ=lz * NZ, uniax='none', eps_tot=0., dtype=md.B.dtype)
    nXc, nYc, nZc = NX // 2 + 1, NY // 2 + 1, NZ // 2 + 1
    fp = jnp.pad(md.fixed, ((0, 0), (1, 1), (1, 1), (1, 1)))
    fc = jnp.zeros((3, nXc, nYc, nZc), bool)
    for di in range(3):
        for dj in range(3):
            for dk in range(3):
                fc = fc | fp[:, di:di + 2 * nXc - 1:2,
                             dj:dj + 2 * nYc - 1:2,
                             dk:dk + 2 * nZc - 1:2]
    return mdc._replace(fixed=fc)


def coarsen_C(Cp):
    """Average the 2x2x2 fine tangent blocks -> coarse tangent volumes.
    Rediscretized coarse operator: exact for smooth tangent fields and a
    serviceable preconditioner on rough (plastified) ones; the Galerkin
    alternative needs the 576-volume Ke representation (module doc)."""
    n = Cp.shape
    e = Cp.reshape(36, n[1] // 2, 2, n[2] // 2, 2, n[3] // 2, 2)
    return e.mean(axis=(2, 4, 6))


def _rmat(nn, dtype):
    """(nc, nn) full-weighting rows [.., 0.5, 1, 0.5, ..] at stride 2 —
    separable factor of the trilinear transfer (multigrid._restrict_mat
    twin; host numpy cached, converted per trace)."""
    from pylabfea_tpu.ops import multigrid as mg2
    return mg2._restrict_mat(nn, dtype)


def restrict3(fine):
    """Full-weighting restriction on volume tuples — three separable
    matmuls (MXU; conv cohabitation pathology avoided, see
    multigrid.restrict_mm)."""
    out = []
    for p in fine:
        Wx = _rmat(p.shape[0], p.dtype)
        Wy = _rmat(p.shape[1], p.dtype)
        Wz = _rmat(p.shape[2], p.dtype)
        q = jnp.einsum('Ix,xyz->Iyz', Wx, p)
        q = jnp.einsum('Jy,Iyz->IJz', Wy, q)
        out.append(jnp.einsum('Kz,IJz->IJK', Wz, q))
    return tuple(out)


def prolong3(coarse, nnXf, nnYf, nnZf):
    """Trilinear prolongation — exact transpose of ``restrict3``."""
    out = []
    for p in coarse:
        Wx = _rmat(nnXf, p.dtype)
        Wy = _rmat(nnYf, p.dtype)
        Wz = _rmat(nnZf, p.dtype)
        q = jnp.einsum('Ix,Iyz->xyz', Wx, p)
        q = jnp.einsum('Jy,xJz->xyz', Wy, q)
        out.append(jnp.einsum('Kz,xyK->xyz', Wz, q))
    return tuple(out)


class MGLevel3:
    """One level: mesh + tangent volumes + Jacobi diagonal + BC mask +
    lambda_max(D^-1 K) estimate (Chebyshev smoother); the coarsest level
    may carry a dense operator inverse."""

    def __init__(self, md, Cp, diag, fixed, lmax=None):
        self.md = md
        self.Cp = Cp
        self.diag = diag
        self.fixed = fixed
        self.lmax = lmax
        self.kc_inv = None


#: exact dense bottom solve cap (dofs); 4^3 grid -> 3 * 125 = 375
COARSE_DENSE_MAX3 = 1100


def _dense_coarse_inv3(level: MGLevel3):
    """Dense SPD pseudo-inverse of the coarsest operator (equilibrated
    eigendecomposition with small-eigenvalue clipping — dtype-generic and
    robust to exact singularity; see multigrid._dense_coarse_inv)."""
    md = level.md
    nnX, nnY, nnZ = md.grid[0] + 1, md.grid[1] + 1, md.grid[2] + 1
    m = nnX * nnY * nnZ
    n = 3 * m
    eye = jnp.eye(n, dtype=level.Cp.dtype)

    def apply_vec(e):
        v = (e[:m].reshape(nnX, nnY, nnZ),
             e[m:2 * m].reshape(nnX, nnY, nnZ),
             e[2 * m:].reshape(nnX, nnY, nnZ))
        o = k_apply3_t(md, level.Cp, v, level.fixed)
        return jnp.concatenate([o[0].ravel(), o[1].ravel(), o[2].ravel()])

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


def _make_level3(md, Cp, lmax=None):
    """Level record incl. a power-iteration estimate of
    lambda_max(D^-1 K) for the Chebyshev smoother.  Point-Jacobi is NOT a
    safe 3-D smoother: lambda_max(D^-1 K) of the hex8 elasticity operator
    is ~2.91 (measured, nu = 0.3) so the 2-D default damping omega = 0.7
    sits above its 2/lambda_max ~ 0.687 stability bound — the highest
    modes are amplified and the V-cycle stalls at rho ~ 0.97 (the 2-D
    bilinear-quad operator stays below the bound, which is why Jacobi
    works there).

    ``lmax`` (from an earlier hierarchy on the same mesh) skips the
    power iteration — 10 K-applies per level — for mid-step rebuilds:
    plastification SOFTENS the tangent, and lambda_max(D^-1 K) is scale
    free in the diagonal, so the entering estimate (already carrying the
    1.1x Chebyshev safety margin in ``_smooth3``) stays an upper bound."""
    fixT = _split3(md.fixed)
    diag = k_diag3_t(md, Cp, fixT)
    if lmax is not None:
        return MGLevel3(md, Cp, diag, fixT, lmax)
    # deterministic-start power iteration (multigrid._make_level twin)
    nnX, nnY, nnZ = (md.grid[0] + 1, md.grid[1] + 1, md.grid[2] + 1)
    i = jnp.arange(nnX * nnY * nnZ, dtype=Cp.dtype).reshape(nnX, nnY, nnZ)
    v = tuple(jnp.sin(i * (0.37 + 0.11 * c)) + 0.01 for c in range(3))
    minv = tuple(1. / d for d in diag)

    def pw(_, v):
        w = k_apply3_t(md, Cp, v, fixT)
        w = tuple(m * x for m, x in zip(minv, w))
        nrm = jnp.maximum(fek._norm(w), 1e-30)
        return tuple(x / nrm for x in w)

    v = jax.lax.fori_loop(0, 10, pw, v)
    Av = k_apply3_t(md, Cp, v, fixT)
    Av = tuple(m * x for m, x in zip(minv, Av))
    lmax = fek._dot(v, Av) / jnp.maximum(fek._dot(v, v), 1e-30)
    return MGLevel3(md, Cp, diag, fixT, lmax)


#: tangent-independent coarse-mesh chains, keyed on the fine grid with the
#: fine ``fixed`` array held strongly so an ``is`` identity check can never
#: hit a recycled id.  Rationale: building the chain INSIDE a traced
#: hierarchy build costs ~77 ms per 128^3 build at run time (measured v5e —
#: the box_mesh/fixed-dilation ops on captured device arrays are too large
#: for XLA constant folding), while the chain itself never changes.
_MESH_CHAIN3_CACHE = {}


def _mesh_chain3(md: MeshData3D, min_size):
    key = (tuple(md.grid), min_size)
    hit = _MESH_CHAIN3_CACHE.get(key)
    if hit is not None and hit[0] is md.fixed:
        return hit[1]
    # under an active jit trace, jnp ops on CONCRETE operands still become
    # jaxpr equations (there is no eager constant evaluation, and XLA's
    # constant folder skips volume-sized arrays) — so without the eval
    # guard the box_mesh/mask-dilation chain re-executes on device on
    # EVERY hierarchy build (~77 ms at 128^3 on v5e, measured)
    with jax.ensure_compile_time_eval():
        chain = [md]
        while True:
            NX, NY, NZ = chain[-1].grid[:3]
            if (NX % 2 or NY % 2 or NZ % 2 or NX // 2 < min_size
                    or NY // 2 < min_size or NZ // 2 < min_size):
                break
            chain.append(coarsen_mesh3(chain[-1]))
    # never park tracers in a module-level cache (shard_map/jit-arg meshes
    # keep traced `fixed` masks through ensure_compile_time_eval)
    if not any(isinstance(x, jax.core.Tracer)
               for m in chain for x in (m.fixed,)):
        _MESH_CHAIN3_CACHE[key] = (md.fixed, chain)
        if len(_MESH_CHAIN3_CACHE) > 32:
            _MESH_CHAIN3_CACHE.pop(next(iter(_MESH_CHAIN3_CACHE)))
    return chain


def build_hierarchy3(md: MeshData3D, elstiff, min_size=4, lmax_from=None,
                     chain=None):
    """Level list (fine -> coarse) for the current tangent field.

    ``lmax_from`` reuses per-level Chebyshev lambda_max estimates from a
    previous hierarchy on the same mesh (see ``_make_level3``), cutting a
    mid-step rebuild to the coarsen/diagonal chain + the dense bottom
    factorization (~22 ms vs ~120 ms at 128^3 on v5e).  The mesh chain
    itself is tangent-independent; pass a precomputed ``chain`` when
    calling from inside jit (``md`` traced), else it is served from a
    host-side cache."""
    if chain is None:
        chain = _mesh_chain3(md, min_size)
    levels = []
    Cp = elstiff_vols(md, elstiff)
    for i, cur_md in enumerate(chain):
        prev = lmax_from[i].lmax if lmax_from is not None else None
        levels.append(_make_level3(cur_md, Cp, lmax=prev))
        if i + 1 < len(chain):
            Cp = coarsen_C(Cp)
    bot = levels[-1]
    nnb = [g + 1 for g in bot.md.grid[:3]]
    if 3 * nnb[0] * nnb[1] * nnb[2] <= COARSE_DENSE_MAX3:
        bot.kc_inv = _dense_coarse_inv3(bot)
    return levels


def _smooth3(level: MGLevel3, x, b, nu, zero_start=False):
    """Degree-``nu`` Chebyshev smoothing on volume tuples (K x = b): a
    polynomial in D^-1 K targeting [lmax/4, lmax] with the level's
    measured lmax — stable by construction where fixed-damping Jacobi is
    not (see ``_make_level3``).  ``zero_start=True`` asserts x == 0 so
    the first residual evaluation elides K @ 0 (multigrid._smooth
    contract)."""
    minv = tuple(1. / d for d in level.diag)
    lmax = 1.1 * level.lmax
    lmin = lmax / 4.
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    if zero_start:
        r = b
    else:
        Kx = k_apply3_t(level.md, level.Cp, x, level.fixed)
        r = tuple(bi - ki for bi, ki in zip(b, Kx))
    d = tuple(m * ri / theta for m, ri in zip(minv, r))
    rho = jnp.asarray(1., r[0].dtype) / sigma

    # fori_loop, not Python unrolling: every unrolled sweep instantiates
    # another copy of the (large) unrolled K-apply graph — at 5 levels and
    # nu = 2 that tripled XLA compile time of the step program
    def body(_, carry):
        x, r, d, rho = carry
        x = tuple(xi + di for xi, di in zip(x, d))
        Kd = k_apply3_t(level.md, level.Cp, d, level.fixed)
        r = tuple(jnp.where(f, 0., ri - ki)
                  for f, ri, ki in zip(level.fixed, r, Kd))
        rho_new = 1. / (2. * sigma - rho)
        d = tuple(rho_new * rho * di + 2. * rho_new / delta * m * ri
                  for di, m, ri in zip(d, minv, r))
        return x, r, d, rho_new

    x, r, d, rho = jax.lax.fori_loop(0, max(nu, 1), body, (x, r, d, rho))
    return x


def v_cycle3(levels, b, lvl=0, nu=2):
    """One symmetric V-cycle (zero initial guess) on volume tuples."""
    level = levels[lvl]
    fix = level.fixed
    b = tuple(jnp.where(f, 0., bi) for f, bi in zip(fix, b))
    if lvl == len(levels) - 1:
        if level.kc_inv is not None:
            md = level.md
            nnX, nnY, nnZ = md.grid[0] + 1, md.grid[1] + 1, md.grid[2] + 1
            m = nnX * nnY * nnZ
            bflat = jnp.concatenate([bi.ravel() for bi in b])
            x = level.kc_inv @ bflat
            return (x[:m].reshape(nnX, nnY, nnZ),
                    x[m:2 * m].reshape(nnX, nnY, nnZ),
                    x[2 * m:].reshape(nnX, nnY, nnZ))
        zero = tuple(jnp.zeros_like(bi) for bi in b)
        return _smooth3(level, zero, b, 8 * nu, zero_start=True)
    zero = tuple(jnp.zeros_like(bi) for bi in b)
    x = _smooth3(level, zero, b, nu, zero_start=True)
    Kx = k_apply3_t(level.md, level.Cp, x, fix)
    r = tuple(jnp.where(f, 0., bi - ki) for f, bi, ki in zip(fix, b, Kx))
    rc = restrict3(r)
    ec = v_cycle3(levels, rc, lvl + 1, nu)
    fc = levels[lvl + 1].fixed
    ec = tuple(jnp.where(f, 0., ei) for f, ei in zip(fc, ec))
    NX, NY, NZ = level.md.grid[:3]
    e = prolong3(ec, NX + 1, NY + 1, NZ + 1)
    x = tuple(xi + jnp.where(f, 0., ei) for xi, f, ei in zip(x, fix, e))
    return _smooth3(level, x, b, nu)


def mg_cg_solve3(levels, b, x0, tol=1.e-8, maxiter=200, nu=2,
                 Cp_apply=None):
    """CG with a V-cycle preconditioner (volume tuples); carries the f32
    stall exit of the 2-D solver (multigrid.mg_cg_solve contract).

    ``Cp_apply`` optionally supplies the CURRENT tangent volumes for the
    Krylov operator while ``levels`` precondition with a (possibly stale)
    hierarchy — preconditioner staleness only costs iterations, never
    correctness, so one hierarchy build serves all equilibrium iterations
    of a load step."""
    level = levels[0]
    fix = level.fixed
    Cp_op = level.Cp if Cp_apply is None else Cp_apply
    apply_fn = lambda v: k_apply3_t(level.md, Cp_op, v, fix)
    Ax0 = apply_fn(x0)
    r0 = tuple(jnp.where(f, 0., bi - ai) for f, bi, ai in zip(fix, b, Ax0))
    bnorm = jnp.maximum(fek._norm(b), 1e-30)
    p0 = tuple(jnp.zeros_like(ri) for ri in r0)
    rn0 = fek._norm(r0)
    b_f32 = r0[0].dtype == jnp.float32

    def cond(s):
        x, r, p, rz, it, best, nstall, rn = s
        return (rn > tol * bnorm) & (it < maxiter) & (nstall < 4)

    def body(s):
        x, r, p, rz_prev, it, best, nstall, _ = s
        z = v_cycle3(levels, r, nu=nu)
        rz = fek._dot(r, z)
        beta = jnp.where(it == 0, 0., rz / rz_prev)
        p = fek._axpy(beta, p, z)
        Ap = apply_fn(p)
        alpha = rz / fek._dot(p, Ap)
        x = fek._axpy(alpha, p, x)
        r = tuple(jnp.where(f, 0., ri - alpha * ai)
                  for f, ri, ai in zip(fix, r, Ap))
        rn = fek._norm(r)
        if b_f32:
            near_floor = rn < 1e-3 * bnorm
            nstall = jnp.where(rn < 0.95 * best, 0,
                               jnp.where(near_floor, nstall + 1, nstall))
        return x, r, p, rz, it + 1, jnp.minimum(best, rn), nstall, rn

    x, r, p, rz, it, _, _, rn = jax.lax.while_loop(
        cond, body,
        (x0, r0, p0, jnp.asarray(1., r0[0].dtype), 0, rn0, 0, rn0))
    return x, rn / bnorm, it


# ---------------------------------------------------------------- solver

class SolverState3(NamedTuple):
    u: jnp.ndarray           # (3, nnX, nnY, nnZ)
    sig: jnp.ndarray         # (Nel, 6)
    epl: jnp.ndarray         # (Nel, 6)
    eps: jnp.ndarray         # (Nel, 6)
    elstiff: jnp.ndarray     # (36, NX, NY, NZ)


def init_state3(md: MeshData3D, CV, dtype=jnp.float32):
    NX, NY, NZ = md.grid[:3]
    if md.groups is not None:
        rows = np.zeros((md.nel, 6, 6))
        perm = np.asarray(md.perm)
        for k, (start, size) in enumerate(md.groups):
            rows[perm[start:start + size]] = np.asarray(CV[k])
        elstiff = jnp.asarray(
            rows.reshape(md.nel, 36).T.reshape(36, NX, NY, NZ), dtype=dtype)
    else:
        CV = jnp.asarray(CV, dtype=dtype)
        elstiff = jnp.broadcast_to(CV.reshape(36, 1, 1, 1),
                                   (36, NX, NY, NZ))
    return SolverState3(
        u=jnp.zeros(md.fixed.shape, dtype=dtype),
        sig=jnp.zeros((md.nel, 6), dtype=dtype),
        epl=jnp.zeros((md.nel, 6), dtype=dtype),
        eps=jnp.zeros((md.nel, 6), dtype=dtype),
        elstiff=elstiff)


def respond_grouped3(md: MeshData3D, mat, CV, sig, epl, deps, fast=True,
                     maxiter=12, nsub=1):
    """Batched return map with per-material dispatch — the constitutive
    layer is dimension-agnostic, so this is the 2-D ``respond_grouped``
    on the 3-D mesh's groups."""
    dt = sig.dtype
    if md.groups is None:
        CVd = jnp.asarray(CV, dt)
        if fast:
            return con.response_fast_chunked(mat, (sig, epl), deps, CVd,
                                             maxiter, nsub)
        return con.response_chunked(mat, (sig, epl), deps, CVd)
    sig_g, epl_g, deps_g = sig[md.perm], epl[md.perm], deps[md.perm]
    parts = []
    for k, (start, size) in enumerate(md.groups):
        if size == 0:
            continue
        sl = slice(start, start + size)
        CVk = jnp.asarray(CV[k], dt)
        if fast:
            parts.append(con.response_fast_chunked(
                mat[k], (sig_g[sl], epl_g[sl]), deps_g[sl], CVk,
                maxiter, nsub))
        else:
            parts.append(con.response_chunked(
                mat[k], (sig_g[sl], epl_g[sl]), deps_g[sl], CVk))
    fy_g, sig_n, depl_n, grad_n = (jnp.concatenate([p[i] for p in parts])
                                   for i in range(4))
    scat = lambda x: x[md.inv_perm]
    return scat(fy_g), scat(sig_n), scat(depl_n), scat(grad_n)


def load_step3(md: MeshData3D, state: SolverState3, mat, CV, load_frac,
               n_inner=2, cg_tol=None, cg_maxiter=100, fast=True, nsub=4,
               du0=None, rebuild_mid=True, cg_tol_inner=None):
    """One incremental load step of the 3-D device solver: elastic
    predictor + ``n_inner`` secant-Picard equilibrium iterations, each an
    MG-CG solve with the current tangent volumes followed by the batched
    return map and a change-gated tangent update — the 2-D ``load_step``
    semantics (reference model.py:1270-1445) on hex8 volumes.

    The multigrid hierarchy is built from the entering tangent field;
    with ``rebuild_mid`` (default) it is rebuilt ONCE more after the
    first inner iteration — reusing the per-level Chebyshev lambda_max
    estimates — so the plastified-tangent solves of a transition step
    precondition with fresh coarse operators instead of the elastic
    entry field (measured at 128^3: inner CG iterations 15+13 -> ~7+6).
    The Krylov operator itself always applies the CURRENT tangents via
    ``Cp_apply``; preconditioner staleness costs iterations, never
    correctness.

    Non-final inner solves run at ``cg_tol_inner`` (default
    ``max(cg_tol, 3e-5 relative)`` in f32) — inexact secant-Picard in
    the Eisenstat-Walker sense: intermediate increments only steer the
    tangent update, while the COMMITTED displacement field always comes
    from the final solve at the full ``cg_tol``.

    Each inner solve warm-starts from the previous iteration's
    increment, and ``du0`` warm-starts the first from the previous
    step's.  Returns (new_state, diagnostics)."""
    if cg_tol is None:
        cg_tol = 1.e-11 if state.u.dtype == jnp.float64 else 1.e-6
    if cg_tol_inner is None:
        loose = 1.e-9 if state.u.dtype == jnp.float64 else 3.e-5
        cg_tol_inner = max(cg_tol, loose)
    if du0 is None:
        du0 = jnp.zeros_like(state.u)
    # the tangent-independent coarse-mesh chain is built (and cached)
    # OUTSIDE the jitted step: as a traced-argument computation it costs
    # ~77 ms per hierarchy build at 128^3 (see _mesh_chain3)
    chain = _mesh_chain3(md, 4)
    return _load_step3_core(tuple(chain), state, mat, CV, load_frac, du0,
                            n_inner, float(cg_tol), cg_maxiter, fast,
                            nsub, bool(rebuild_mid), float(cg_tol_inner))


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def _load_step3_core(chain, state, mat, CV, load_frac, du0, n_inner,
                     cg_tol, cg_maxiter, fast, nsub, rebuild_mid,
                     cg_tol_inner):
    md = chain[0]
    if md.groups is None:
        CV = jnp.asarray(CV, dtype=state.u.dtype)
    bc_val = md.fixed_val * load_frac
    fixT = _split3(md.fixed)
    bcT = _split3(bc_val)
    frcT = _split3(md.force)
    levels = build_hierarchy3(md, elstiff_vols(md, state.elstiff),
                              chain=chain)

    def solve_with(levels, elstiff, x0, tol):
        Cp = elstiff_vols(md, elstiff)
        du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(fixT, bcT))
        neg = _k_apply3_raw(md, Cp, du_bc)
        rhs = tuple(jnp.where(f, b, fr * load_frac - q)
                    for f, b, fr, q in zip(fixT, bcT, frcT, neg))
        x0 = tuple(jnp.where(f, b, x) for f, b, x in zip(fixT, bcT, x0))
        duT, res, it = mg_cg_solve3(levels, rhs, x0, tol=tol,
                                    maxiter=cg_maxiter, Cp_apply=Cp)
        return _merge3(duT), res, it

    def inner(levels, carry, tol):
        elstiff, du_prev = carry
        du, cg_res, cg_it = solve_with(levels, elstiff, _split3(du_prev),
                                       tol)
        deps = element_deps3(md, du)
        fy, sig_n, depl_n, grad = respond_grouped3(
            md, mat, CV, state.sig, state.epl, deps, fast=fast,
            maxiter=12, nsub=nsub)
        gP = elstiff_vols(md, grad)
        dst = jnp.sqrt(jnp.sum((elstiff - gP) ** 2, axis=0))
        elstiff = jnp.where(dst > 1.e-3, gP, elstiff)
        return (elstiff, du), (du, fy, sig_n, depl_n, dst.max(), cg_res,
                               cg_it)

    carry = (state.elstiff, du0)
    dt = state.u.dtype
    if rebuild_mid and n_inner >= 1:
        carry, out0 = inner(levels, carry, cg_tol_inner)
        levels = build_hierarchy3(md, elstiff_vols(md, carry[0]),
                                  lmax_from=levels, chain=chain)
        tols = jnp.array([cg_tol_inner] * (n_inner - 1) + [cg_tol], dt)
        carry, outs = jax.lax.scan(lambda c, t: inner(levels, c, t),
                                   carry, tols)
        outs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b]), out0, outs)
    else:
        tols = jnp.array([cg_tol_inner] * n_inner + [cg_tol], dt)
        carry, outs = jax.lax.scan(lambda c, t: inner(levels, c, t),
                                   carry, tols)
    elstiff = carry[0]
    du = outs[0][-1]
    deps = element_deps3(md, du)
    new = SolverState3(u=state.u + du, sig=outs[2][-1],
                       epl=state.epl + outs[3][-1],
                       eps=state.eps + deps, elstiff=elstiff)
    diag = {'fy_max': outs[1][-1].max(), 'dstiff': outs[4],
            'cg_res': outs[5][-1], 'cg_iters': outs[6][-1],
            'cg_iters_hist': outs[6], 'du': du,
            'glob_sig': jnp.mean(new.sig, axis=0),
            'glob_eps': jnp.mean(new.eps, axis=0),
            'glob_epl': jnp.mean(new.epl, axis=0)}
    return new, diag


def solve_uniaxial3(md: MeshData3D, mat, CV, nsteps=10, n_inner=2,
                    dtype=None, nsub=4, cg_maxiter=100):
    """Full incremental solve: ``nsteps`` equal load fractions up to the
    mesh's unit-load BC pattern.  Returns the final state and the
    (glob_sig, glob_eps) history list."""
    if dtype is None:
        dtype = md.fixed_val.dtype
    state = init_state3(md, CV, dtype=dtype)
    hist = []
    # always an array: a None first step would trace load_step3 twice
    du0 = jnp.zeros_like(state.u)
    for i in range(1, nsteps + 1):
        prev = (i - 1) / nsteps
        frac = i / nsteps
        state, diag = load_step3(md, state, mat, CV, frac - prev,
                                 n_inner=n_inner, nsub=nsub,
                                 cg_maxiter=cg_maxiter, du0=du0)
        du0 = diag['du']  # equal fractions: previous du ~ next du
        hist.append((diag['glob_sig'], diag['glob_eps'], diag['cg_iters']))
    return state, hist


# ---------------------------------------------------------- post-processing

def field_volumes(md: MeshData3D, state: SolverState3):
    """Element fields reshaped to (NX, NY, NZ) volumes for inspection and
    plotting: 'seq' (J2 equivalent stress), 'peeq' (equivalent plastic
    strain), 'sig_i'/'eps_i'/'epl_i' Voigt components — the 3-D analogue
    of the host Model.plot selectors (reference model.py:1513-1785)."""
    from pylabfea_tpu.core import tensors as ct
    NX, NY, NZ = md.grid[:3]
    sig = np.asarray(state.sig)
    epl = np.asarray(state.epl)
    eps = np.asarray(state.eps)
    shape = (NX, NY, NZ)
    out = {'seq': ct.sig_eq_j2(sig).reshape(shape),
           'peeq': ct.eps_eq(epl).reshape(shape)}
    for k in range(6):
        out[f'sig_{k}'] = sig[:, k].reshape(shape)
        out[f'eps_{k}'] = eps[:, k].reshape(shape)
        out[f'epl_{k}'] = epl[:, k].reshape(shape)
    return out


def plot_midplane(md: MeshData3D, state: SolverState3, sel='seq', axis='y',
                  index=None, ax=None, show=True):
    """Mid-plane (or ``index``-plane) slice of an element field through the
    box, rendered with matplotlib.  ``axis`` in {'x','y','z'} selects the
    slicing direction."""
    import matplotlib.pyplot as plt
    vols = field_volumes(md, state)
    if sel not in vols:
        raise ValueError(f'unknown field {sel!r}; one of {sorted(vols)}')
    v = vols[sel]
    axn = {'x': 0, 'y': 1, 'z': 2}[axis]
    if index is None:
        index = v.shape[axn] // 2
    sl = np.take(v, index, axis=axn)
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(sl.T, origin='lower', cmap='viridis')
    plt.colorbar(im, ax=ax, label=sel)
    rest = [a for a in 'xyz' if a != axis]
    ax.set_xlabel(rest[0])
    ax.set_ylabel(rest[1])
    ax.set_title(f'{sel}, {axis} = plane {index}')
    if show:
        plt.show()
    return ax
