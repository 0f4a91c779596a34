"""Device FE kernels: batched element stiffness, matrix-free K-apply,
Jacobi-preconditioned CG, and the jitted load-step solver.

This is the performance profile of the FE layer.  Where the host solver
(``pylabfea_tpu.femodel``) assembles a dense K and LU-factorizes it per
iteration (matching the reference contract), the device solver never forms
K: the operator is ``v -> gather -> per-element Ke @ v_e -> scatter-add``,
evaluated as one batched einsum that XLA tiles onto the MXU, and the linear
system is solved by conjugate gradients under ``lax.while_loop``.
Displacement BCs are imposed by masking (identity rows on fixed dofs).

Meshes are structured quads built directly as arrays (`rect_mesh`) — no
Python per-element objects — so 10^6-element models are cheap to construct.
The multi-device variant (elements sharded over a ``jax.sharding.Mesh``)
lives in ``pylabfea_tpu.parallel.sharded``.
"""
import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pylabfea_tpu.ops import constitutive as con


class MeshData(NamedTuple):
    """Structured-mesh arrays for the device solver.

    DOF layout: on structured grids (``grid`` set) nodal vectors are
    **component-major 2-D planes** of shape (2, nnX, nnY) — the large nnY
    axis lands on the TPU lane dimension, making the stencil gather/scatter
    and the Jacobi/multigrid smoothers vector-unit-efficient (the
    interleaved (node, dof) layout wastes 126/128 lanes and measured 8x
    slower).  With ``grid=None`` (unstructured / sharded element path)
    vectors are flat (Ndof,) with dof = comp * nnode + node — the raveled
    twin of the same ordering.

    Multi-material meshes (``groups`` set): ``perm`` sorts elements into
    contiguous per-material blocks with static (start, size) extents in
    ``groups`` — the return map gathers each block, updates it with its own
    material/stiffness, and scatters back to mesh order (the expert-parallel
    analogue of per-material batching)."""
    dofs: jnp.ndarray        # (Nel, 8) int32 global dof indices (flat layout)
    B: jnp.ndarray           # (ngp, 6, 8) shared B matrices (uniform elements)
    Bsum: jnp.ndarray        # (6, 8) wght * sum_g B (element-average strain)
    jacw: jnp.ndarray        # scalar Jac * wght (uniform elements)
    vel: jnp.ndarray         # element volume (scalar; (Nel,) on 1-D bar meshes)
    fixed: jnp.ndarray       # (2, nnX, nnY) | (Ndof,) bool displacement-BC mask
    fixed_val: jnp.ndarray   # prescribed displacement values (per unit load)
    force: jnp.ndarray       # external force pattern (per unit load)
    perm: jnp.ndarray        # (Nel,) int32 material-sort permutation; (0,) if single-material
    inv_perm: jnp.ndarray    # (Nel,) int32 inverse of perm (inv_perm[perm[j]] = j); (0,) if single-material
    ps_b2: jnp.ndarray       # (8, NX, NY) per-element eps_33 condensation row (multi-material plane stress); (0,) else
    ndof: int                # static (aux data)
    nel: int                 # static (aux data)
    grid: tuple              # static (NX, NY, lx, ly, uniax) structured info, else None
    groups: tuple            # static ((start, size), ...) per material, else None


def _md_flatten(m):
    return (m[:-4], (m.ndof, m.nel, m.grid, m.groups))


def _md_unflatten(aux, children):
    return MeshData(*children, ndof=aux[0], nel=aux[1], grid=aux[2],
                    groups=aux[3])


jax.tree_util.register_pytree_node(MeshData, _md_flatten, _md_unflatten)


def _quad_B(lx, ly, dtype=np.float64, ps_CV=None, ps_E=None, ps_nu=None):
    """B matrices of the bilinear quad at the 4 Gauss points (reference
    element formulation, model.py:439-501).  With ``ps_CV/ps_E/ps_nu`` set,
    the plane-stress thickness-strain row eps_33 = -nu (sig_11 + sig_22)/E
    is folded into row 2 of each B (model.py:498-501), so the same 6-D
    constitutive update serves plane stress."""
    cpos = np.sqrt(1. / 3.)
    Bs = np.zeros((4, 6, 8), dtype=dtype)
    for i in range(4):
        sx = (-1) ** int(i / 2)
        sy = (-1) ** i
        x = 0.5 * (1. + sx * cpos) * lx
        y = 0.5 * (1. + sy * cpos) * ly
        xi1 = 2. * x / lx - 1.
        xi2 = 2. * y / ly - 1.
        hxm = 0.125 * (1. - xi1) / ly
        hym = 0.125 * (1. - xi2) / lx
        hxp = 0.125 * (1. + xi1) / ly
        hyp = 0.125 * (1. + xi2) / lx
        B = Bs[i]
        B[0, 0] = -hym
        B[0, 2] = -hyp
        B[0, 4] = hym
        B[0, 6] = hyp
        B[1, 1] = -hxm
        B[1, 3] = hxm
        B[1, 5] = -hxp
        B[1, 7] = hxp
        B[5, 0] = -hxm
        B[5, 1] = -hym
        B[5, 2] = hxm
        B[5, 3] = -hyp
        B[5, 4] = -hxp
        B[5, 5] = hym
        B[5, 6] = hxp
        B[5, 7] = hyp
        if ps_CV is not None:
            hh = np.asarray(ps_CV, dtype=dtype) @ B
            B[2, :] = -ps_nu * (hh[0, :] + hh[1, :]) / ps_E
    return Bs


def make_edge_bcs(NX, NY, left=None, right=None, bot=None, top=None,
                  nodes=()):
    """General structured-grid BC planes from host-style edge specs.

    Each edge spec maps a component (0 = x, 1 = y) to ``(bctype, value)``
    with bctype 'disp' (prescribed displacement) or 'force' (TOTAL edge
    force, distributed uniformly per node with half weight at the edge's
    end nodes — the reference convention, model.py:1147-1179).  ``nodes``
    is an iterable of ``(ix, iy, comp, bctype, value)`` single-node BCs
    ('force' = full per-node load, model.py:715 node sets).  Conflicting
    displacement BCs are first-come in the host order (left, bottom,
    right, top, node set).

    Returns numpy planes (fixed (2, nnX, nnY) bool, fixed_val, force) for
    a unit load factor.
    """
    nnX, nnY = NX + 1, NY + 1
    fixed = np.zeros((2, nnX, nnY), dtype=bool)
    fval = np.zeros((2, nnX, nnY))
    force = np.zeros((2, nnX, nnY))
    sel = {'left': (0, slice(None)), 'right': (nnX - 1, slice(None)),
           'bot': (slice(None), 0), 'top': (slice(None), nnY - 1)}

    def apply_edge(which, spec):
        if not spec:
            return
        ii, jj = sel[which]
        n_edge = nnY if which in ('left', 'right') else nnX
        for comp, (bctype, val) in spec.items():
            if bctype == 'disp':
                new = ~fixed[comp, ii, jj]
                v = fval[comp, ii, jj]
                v[new] = val
                fval[comp, ii, jj] = v
                fixed[comp, ii, jj] = True
            elif bctype == 'force':
                h = np.full(n_edge, 1. / max(n_edge - 1, 1))
                h[0] *= 0.5
                h[-1] *= 0.5
                force[comp, ii, jj] += val * h
            else:
                raise ValueError(f'unknown bctype {bctype!r}')

    for which, spec in (('left', left), ('bot', bot), ('right', right),
                        ('top', top)):
        apply_edge(which, spec)
    for ix, iy, comp, bctype, val in nodes:
        if bctype == 'disp':
            if not fixed[comp, ix, iy]:
                fixed[comp, ix, iy] = True
                fval[comp, ix, iy] = val
        else:
            force[comp, ix, iy] += val
    return fixed, fval, force


def rect_mesh(NX, NY, LX=1., LY=1., thick=1., uniax='y', eps_tot=0.01,
              dtype=jnp.float32, planestress=False, ps_CV=None, ps_E=None,
              ps_nu=None, eps_x=None, eps_y=None, bc=None, mat_map=None):
    """Structured NX x NY quad mesh.  Default BCs are uniaxial-displacement:
    left fixed in x, bottom fixed in y, top pulled in +y (if uniax='y') or
    right pulled in +x.  Returns MeshData; `fixed_val`/`force` are patterns
    for a unit load factor (scaled to eps_tot * L by the solver).

    ``planestress=True`` requires the plane-stress-reduced stiffness
    ``ps_CV`` (the one also fed to the solver as tangent) plus the isotropic
    ``ps_E``/``ps_nu`` — the eps_33 condensation is folded into the B
    matrices exactly as the host Element does.

    ``uniax='xy'`` prescribes displacements on BOTH the right (x) and top
    (y) edges with magnitudes ``eps_x``/``eps_y`` (signed strains) — the
    biaxial / shear load paths of ``Material.calc_properties``.

    ``bc`` (dict with keys left/right/bot/top/nodes, see ``make_edge_bcs``)
    replaces the uniax defaults with general displacement/force BCs —
    force-controlled edges with the reference's half-corner-weight
    distribution and single-node pins/loads.

    ``mat_map`` (NX, NY) int array of material-group indices enables the
    multi-material path: elements are permuted into contiguous per-material
    blocks (``perm``/``groups``) consumed by ``respond_grouped``; pass
    tuples of (DeviceMaterial, CV) to the solvers."""
    nnX, nnY = NX + 1, NY + 1
    nnode = nnX * nnY
    ndof = 2 * nnode
    lx, ly = LX / NX, LY / NY
    # element -> node connectivity (column-major node numbering as in the
    # reference structured mesher)
    ih = np.arange(NX * NY)
    n1 = (ih // NY) * nnY + ih % NY
    nodes = np.stack([n1, n1 + 1, n1 + nnY, n1 + nnY + 1], axis=1)
    # flat dof layout: comp-major (dof = c * nnode + node) — the raveled
    # twin of the (2, nnX, nnY) plane layout used on structured grids
    dofs = np.stack([nodes + d * nnode for d in range(2)],
                    axis=2).reshape(-1, 8)
    if bc is not None:
        fixed, fixed_val, force = make_edge_bcs(
            NX, NY, left=bc.get('left'), right=bc.get('right'),
            bot=bc.get('bot'), top=bc.get('top'), nodes=bc.get('nodes', ()))
        uniax = 'bc'
    else:
        fixed = np.zeros((2, nnX, nnY), dtype=bool)
        fixed_val = np.zeros((2, nnX, nnY))
        force = np.zeros((2, nnX, nnY))
        fixed[0, 0, :] = True                   # left: ux = 0
        fixed[1, :, 0] = True                   # bottom: uy = 0
        ex = eps_tot if eps_x is None else eps_x
        ey = eps_tot if eps_y is None else eps_y
        if uniax in ('y', 'xy'):
            fixed[1, :, -1] = True              # top: uy prescribed
            fixed_val[1, :, -1] = ey * LY
        if uniax in ('x', 'xy'):
            fixed[0, -1, :] = True              # right: ux prescribed
            fixed_val[0, -1, :] = ex * LX
    if mat_map is not None:
        ids = np.asarray(mat_map, dtype=np.int64).reshape(NX * NY)
        nmat = int(ids.max()) + 1
        perm = np.argsort(ids, kind='stable').astype(np.int32)
        inv_perm = np.argsort(perm).astype(np.int32)
        counts = np.bincount(ids, minlength=nmat)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        groups = tuple((int(s), int(c)) for s, c in zip(starts, counts))
    else:
        perm = np.zeros(0, dtype=np.int32)
        inv_perm = np.zeros(0, dtype=np.int32)
        groups = None
    ps_b2 = np.zeros(0)
    if planestress:
        if ps_CV is None or ps_E is None or ps_nu is None:
            raise ValueError('planestress=True requires ps_CV, ps_E, ps_nu')
        if groups is not None:
            # multi-material plane stress (the reference's laminate
            # workloads, model.py:498-501 / tests/test_basic.py:84-103):
            # the per-material eps_33 condensation row NEVER enters the
            # stiffness — the reduced CV has empty row/column 2, so
            # B^T C B is row-2-independent — it only evaluates the
            # thickness strain from the in-plane solution.  The shared B
            # therefore stays condensation-free and the per-element
            # condensation row lives in the ps_b2 planes consumed by
            # ``element_deps``:
            #   eps_33(e) = b2_k(e) . u_e,
            #   b2_k = -(nu_k / E_k) [(C_k Bsum)_0 + (C_k Bsum)_1]
            # (ps_CV / ps_E / ps_nu are tuples aligned with the material
            # groups).
            Bs = _quad_B(lx, ly)
            Bsum_np = Bs.sum(axis=0)
            ids2 = np.asarray(mat_map, dtype=np.int64).reshape(NX * NY)
            rows = np.zeros((len(ps_CV), 8))
            for k, (CVk, Ek, nuk) in enumerate(zip(ps_CV, ps_E, ps_nu)):
                hh = np.asarray(CVk, float) @ Bsum_np
                rows[k] = -nuk * (hh[0, :] + hh[1, :]) / Ek
            ps_b2 = rows[ids2].T.reshape(8, NX, NY)
        else:
            Bs = _quad_B(lx, ly, ps_CV=ps_CV, ps_E=ps_E, ps_nu=ps_nu)
    else:
        Bs = _quad_B(lx, ly)
    vel = lx * ly * thick
    md = MeshData(
        dofs=jnp.asarray(dofs, dtype=jnp.int32),
        B=jnp.asarray(Bs, dtype=dtype),
        Bsum=jnp.asarray(Bs.sum(axis=0), dtype=dtype),
        jacw=jnp.asarray(vel * 4., dtype=dtype),
        vel=jnp.asarray(vel, dtype=dtype),
        fixed=jnp.asarray(fixed),
        fixed_val=jnp.asarray(fixed_val, dtype=dtype),
        force=jnp.asarray(force, dtype=dtype),
        perm=jnp.asarray(perm),
        inv_perm=jnp.asarray(inv_perm),
        ps_b2=jnp.asarray(ps_b2, dtype=dtype),
        ndof=ndof, nel=NX * NY, grid=(NX, NY, lx, ly, uniax),
        groups=groups)
    # stash the UNROUNDED float64 geometry factors (B is computed in f64
    # above): mixed-precision refinement evaluates its residual against
    # the true operator, not the dtype-rounded one (see _m64_of)
    M64 = (vel * 4.) * np.einsum('gai,gbj->ijab',
                                 Bs.astype(np.float64),
                                 Bs.astype(np.float64)).reshape(64, 36)
    if len(_M64_CACHE) > 256:
        # evict the oldest half (insertion-ordered dict); never clear
        # wholesale — live fine meshes must keep their exact factors
        for k in list(_M64_CACHE)[:128]:
            del _M64_CACHE[k]
    # key from HOST data (rect_mesh may run inside a jit trace via
    # multigrid.coarsen_mesh, where md's arrays are tracers), cast to the
    # mesh dtype so _m64_of reconstructs the identical key from md
    npdt = np.dtype(dtype)
    _M64_CACHE[(np.asarray(Bs, npdt).tobytes(),
                float(npdt.type(vel)))] = M64
    return md


#: geometry key -> float64 (64, 36) element-stiffness contraction matrix
#: (true f64 geometry factors).  Keyed by VALUE (the dtype-cast B bytes +
#: element volume), so the multigrid coarse-level rect_mesh calls made
#: while tracing hierarchy programs add at most one entry per distinct
#: element geometry instead of polluting an identity-keyed cache.
_M64_CACHE = {}


def _m64_of(md: MeshData):
    """Float64 (64, 36) stiffness contraction matrix of a structured mesh.
    Served from the build-time stash (exact f64 B tables; host-concrete
    ``md`` only — callers are host-level like ``refine_du``); meshes
    built outside ``rect_mesh`` fall back to upcasting the stored
    dtype-rounded tables — refinement then floors at the
    operator-rounding error."""
    hit = _M64_CACHE.get((np.asarray(md.B).tobytes(),
                          float(np.asarray(md.vel))))
    if hit is not None:
        return hit
    B = np.asarray(md.B, np.float64)
    return float(md.jacw) * np.einsum('gai,gbj->ijab', B, B).reshape(64, 36)


_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _split(v):
    """(2, nnX, nnY) stacked planes -> per-component tuple.  The solvers
    carry the TUPLE through lax loops: with a stacked leading-2 axis XLA
    assigns some loop carries a (2, 128)-tiled layout (component axis on
    sublanes, 4x waste) and inserts relayout copies every CG iteration —
    observed 10 ms/copy at 1024^2.  Separate (nnX, nnY) planes always get
    the natural (8, 128) tiling."""
    return (v[0], v[1])


def _merge(t):
    return jnp.stack(t, 0)


def _gather_planes(md: MeshData, v):
    """Nodal plane tuple (ux, uy) -> tuple of 8 (NX, NY) element dof planes
    (corner-major, component-minor — matches the element dof order) via
    static shifted slices; no dynamic gather, no relayout."""
    NX, NY = md.grid[:2]
    out = []
    for dx, dy in _CORNERS:
        out.append(v[0][dx:dx + NX, dy:dy + NY])
        out.append(v[1][dx:dx + NX, dy:dy + NY])
    return tuple(out)


def _scatter_planes(md: MeshData, fp):
    """Tuple of 8 (NX, NY) element dof planes -> nodal plane tuple
    (stencil scatter-add via static shifted-slice adds)."""
    NX, NY = md.grid[:2]
    dt = fp[0].dtype
    out = [jnp.zeros((NX + 1, NY + 1), dt), jnp.zeros((NX + 1, NY + 1), dt)]
    for a, (dx, dy) in enumerate(_CORNERS):
        out[0] = out[0].at[dx:dx + NX, dy:dy + NY].add(fp[2 * a])
        out[1] = out[1].at[dx:dx + NX, dy:dy + NY].add(fp[2 * a + 1])
    return (out[0], out[1])


def _contract_planes(Kp, up):
    """fp_i = sum_j Kp[i, j] * up_j — 64 lane-wide fused multiply-adds."""
    return tuple(sum(Kp[i, j] * up[j] for j in range(8)) for i in range(8))


def _as_planes_K(md: MeshData, Ke):
    """Accept element stiffness in rows layout (Nel, 8, 8) or planes layout
    (8, 8, NX, NY); return planes."""
    if Ke.ndim == 4:
        return Ke
    NX, NY = md.grid[:2]
    return jnp.moveaxis(Ke, 0, -1).reshape(8, 8, NX, NY)


def gather_element(md: MeshData, v):
    """Nodal vector -> per-element (Nel, 8) local dof values (rows layout,
    for host-style consumers; the solver paths use ``_gather_planes``)."""
    if md.grid is not None:
        return jnp.stack(_gather_planes(md, _split(v)), 0).reshape(
            8, md.nel).T
    return v[md.dofs]


def scatter_element(md: MeshData, fe):
    """Per-element (Nel, 8) contributions -> nodal vector (scatter-add)."""
    if md.grid is not None:
        NX, NY = md.grid[:2]
        f8 = fe.T.reshape(8, NX, NY)
        return _merge(_scatter_planes(md, tuple(f8[i] for i in range(8))))
    return jnp.zeros(md.ndof, fe.dtype).at[md.dofs.reshape(-1)].add(
        fe.reshape(-1))


def element_stiffness(md: MeshData, elstiff):
    """Ke[e] = jacw * sum_g B_g^T C_e B_g  — batched (Nel, n, n).

    ``md.B`` may be SHARED (ngp, 6, n) with scalar jacw — the uniform
    structured-quad path — or PER-ELEMENT (Nel, ngp, 6, n) with (Nel,)
    jacw: the 1-D bar path, whose element lengths differ per section
    (host femodel._mesh_structured)."""
    if md.B.ndim == 4:
        Ke = jnp.einsum('egai,eab,egbj->eij', md.B, elstiff, md.B,
                        preferred_element_type=elstiff.dtype,
                        precision=jax.lax.Precision.HIGHEST)
        return md.jacw[:, None, None] * Ke
    return md.jacw * jnp.einsum('gai,eab,gbj->eij', md.B, elstiff, md.B,
                                preferred_element_type=elstiff.dtype,
                                precision=jax.lax.Precision.HIGHEST)


def elstiff_planes(md: MeshData, elstiff):
    """Tangent-stiffness field in planes layout (36, NX, NY).  Accepts the
    rows layout (Nel, 6, 6) and transposes (one relayout); planes pass
    through."""
    if elstiff.ndim == 3 and elstiff.shape[0] == 36:
        return elstiff
    NX, NY = md.grid[:2]
    return elstiff.reshape(md.nel, 36).T.reshape(36, NX, NY)


def element_stiffness_planes(md: MeshData, elstiff):
    """Element stiffness in planes layout (8, 8, NX, NY): 64 (NX, NY) planes
    so the K-apply contraction runs as lane-wide fused multiply-adds.

    Built as one (64, 36) static matrix contraction against the (36, NX, NY)
    tangent planes — M[(i,j),(a,b)] = jacw * sum_g B[g,a,i] B[g,b,j] — which
    XLA maps to the MXU; no per-element (8, 8) minor dims anywhere."""
    NX, NY = md.grid[:2]
    els = elstiff_planes(md, elstiff)
    M = md.jacw * jnp.einsum('gai,gbj->ijab', md.B, md.B,
                             preferred_element_type=els.dtype,
                             precision=jax.lax.Precision.HIGHEST)
    Ke = jnp.einsum('kl,lxy->kxy', M.reshape(64, 36), els,
                    preferred_element_type=els.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    return Ke.reshape(8, 8, NX, NY)


#: tri-state switch for the fused Pallas stencil K-apply: None = auto
#: (float32 structured grids with NX >= 128 on TPU), True/False = forced.
#: NOTE: on stencil levels the multigrid grid transfers run as matmuls —
#: `conv_general_dilated` cohabiting with the custom call in one program
#: cost ~4-5 ms per V-cycle level at 1024^2 (see BENCH_NOTES.md).
USE_STENCIL = None


def _stencil_default_on():
    return True


@functools.lru_cache(maxsize=1)
def _on_tpu():
    return jax.default_backend() == 'tpu'


def _stencil_ok(md, Kp):
    if USE_STENCIL is False:
        return False
    if Kp.dtype != jnp.float32 or md.grid is None:
        return False
    from pylabfea_tpu.ops import stencil_pallas as sp
    NX, NY = md.grid[:2]
    if NX < 128 or sp.auto_tile(NX, NY) == 0:
        return False
    return True if USE_STENCIL else (_stencil_default_on() and _on_tpu())


def k_apply_t(md: MeshData, Kp, v, fixed):
    """Matrix-free K @ v on plane TUPLES with identity rows on fixed dofs
    (the fast path used inside the grid solvers).  Measured 8x faster than
    the interleaved-dof rows formulation on TPU v5e (0.48 vs 3.9 ms at
    512^2); the tuple form additionally avoids XLA's (2, 128)-tiled loop
    carries (see ``_split``).

    On TPU, float32 fine-grid applies route through the fused Pallas
    stencil kernel (``ops.stencil_pallas``): 0.36 ms vs 1.0 ms per apply
    at 1024^2 on v5e — at the single-pass HBM bound for the 256 MB
    stiffness-plane read (1.44 ms at 2048^2, exactly 4x the bytes)."""
    vm = tuple(jnp.where(f, 0., x) for f, x in zip(fixed, v))
    if _stencil_ok(md, Kp):
        from pylabfea_tpu.ops import stencil_pallas as sp
        NX, NY = md.grid[:2]
        out = sp.k_apply_stencil(Kp, vm[0], vm[1], TX=sp.auto_tile(NX, NY))
    else:
        up = _gather_planes(md, vm)
        fp = _contract_planes(Kp, up)
        out = _scatter_planes(md, fp)
    return tuple(jnp.where(f, x, o) for f, x, o in zip(fixed, v, out))


def k_apply(md: MeshData, Ke, v):
    """Matrix-free K @ v with identity rows on fixed dofs.  On structured
    grids ``Ke`` may be rows (Nel, 8, 8) or planes (8, 8, NX, NY) layout
    and ``v`` is (2, nnX, nnY) stacked planes."""
    if md.grid is not None:
        out = k_apply_t(md, _as_planes_K(md, Ke), _split(v),
                        _split(md.fixed))
        return _merge(out)
    vm = jnp.where(md.fixed, 0., v)
    ue = vm[md.dofs]
    fe = jnp.einsum('eij,ej->ei', Ke, ue,
                    preferred_element_type=v.dtype)
    out = jnp.zeros(md.ndof, fe.dtype).at[md.dofs.reshape(-1)].add(
        fe.reshape(-1))
    return jnp.where(md.fixed, v, out)


def k_diag_t(md: MeshData, Kp, fixed):
    """Diagonal of K as a plane tuple, 1 on fixed dofs."""
    de = tuple(Kp[i, i] for i in range(8))
    d = _scatter_planes(md, de)
    return tuple(jnp.where(f, 1., x) for f, x in zip(fixed, d))


def k_diag(md: MeshData, Ke):
    """Diagonal of K (Jacobi preconditioner), 1 on fixed dofs."""
    if md.grid is not None:
        return _merge(k_diag_t(md, _as_planes_K(md, Ke), _split(md.fixed)))
    de = jnp.diagonal(Ke, axis1=1, axis2=2)
    d = scatter_element(md, de)
    return jnp.where(md.fixed, 1., d)


def _dot(a, b):
    """Pytree/shape-agnostic dot product (no ravel -> no TPU relayout)."""
    return sum(jnp.sum(x * y) for x, y in zip(jax.tree_util.tree_leaves(a),
                                              jax.tree_util.tree_leaves(b)))


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _axpy(a, x, y):
    """a * x + y over pytrees."""
    return jax.tree_util.tree_map(lambda u, v: a * u + v, x, y)


def cg_solve(apply_fn, b, x0, diag, tol=1.e-8, maxiter=2000):
    """Jacobi-preconditioned conjugate gradients under lax.while_loop.
    Vectors may be arrays or pytrees of planes (grid fast path).

    A STALL EXIT accompanies the tolerance test: float32 CG bottoms out at
    a rounding floor ~kappa * eps32 relative, and when the requested
    tolerance sits below that floor the loop would otherwise burn the full
    ``maxiter`` budget making no progress (observed at 2048^2: the same
    config that converges in ~20 iterations at 1024^2 ran all 100).  The
    loop exits once the residual has not improved on its running best for
    4 consecutive iterations."""
    tmap = jax.tree_util.tree_map
    minv = tmap(lambda d: 1. / d, diag)
    r = _axpy(-1., apply_fn(x0), b)
    z = tmap(lambda m, q: m * q, minv, r)
    p = z
    rz = _dot(r, z)
    bnorm = jnp.maximum(_norm(b), 1e-30)
    rn0 = _norm(r)
    b_f32 = jax.tree_util.tree_leaves(b)[0].dtype == jnp.float32

    def cond(s):
        x, r, p, rz, it, best, nstall = s
        return (_norm(r) > tol * bnorm) & (it < maxiter) & (nstall < 4)

    def body(s):
        x, r, p, rz, it, best, nstall = s
        Ap = apply_fn(p)
        alpha = rz / _dot(p, Ap)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = tmap(lambda m, q: m * q, minv, r)
        rz_new = _dot(r, z)
        p = _axpy(rz_new / rz, p, z)
        rn = _norm(r)
        # stall counting: four consecutive iterations improving by < 5%
        # means the solve is grinding at the f32 floor (measured at
        # 2048^2: the same system a cold solve finishes in 8 iterations
        # ground 78 at 0.5%/iteration after a warm start on a changed
        # tangent).  Guards: f32 only (f64 reaches its tolerance), and
        # only once the residual is already BELOW 1e-3 relative —
        # legitimate CG plateaus (clustered eigenvalues being resolved)
        # occur mid-solve and must not trigger the exit (observed: a
        # 21-dof f64 quadratic-bar solve plateaued > 4 iterations at 6e-2
        # relative, then converged)
        if b_f32:
            near_floor = rn < 1e-3 * bnorm
            nstall = jnp.where(rn < 0.95 * best, 0,
                               jnp.where(near_floor, nstall + 1, nstall))
        return x, r, p, rz_new, it + 1, jnp.minimum(best, rn), nstall

    x, r, p, rz, it, _, _ = jax.lax.while_loop(
        cond, body, (x0, r, p, rz, 0, rn0, 0))
    return x, _norm(r) / bnorm, it


def element_deps(md: MeshData, du):
    """Element-average strain increments from nodal displacement increment.
    Multi-material plane-stress meshes carry the per-element eps_33
    condensation row in ``md.ps_b2`` (the shared ``Bsum`` row 2 is zero
    there — see ``rect_mesh``)."""
    if md.grid is not None:
        up = _gather_planes(md, _split(du))
        planes = [sum(md.Bsum[a, i] * up[i] for i in range(8))
                  for a in range(6)]
        if md.ps_b2.ndim == 3:
            planes[2] = sum(md.ps_b2[i] * up[i] for i in range(8))
        return jnp.stack(planes, -1).reshape(md.nel, 6)
    ue = gather_element(md, du)
    if md.Bsum.ndim == 3:       # per-element B (1-D bars)
        return jnp.einsum('eai,ei->ea', md.Bsum, ue,
                          preferred_element_type=du.dtype)
    deps = jnp.einsum('ai,ei->ea', md.Bsum, ue,
                      preferred_element_type=du.dtype)
    if md.ps_b2.ndim == 3:
        e33 = jnp.einsum('ei,ei->e', md.ps_b2.reshape(8, -1).T, ue,
                         preferred_element_type=du.dtype)
        deps = deps.at[:, 2].set(e33)
    return deps


def respond_grouped(md: MeshData, mat, CV, sig, epl, deps, fast=True,
                    maxiter=12, nsub=1):
    """Batched return map with per-material dispatch.

    Single-material meshes (``md.groups is None``) run one chunked return
    map.  Multi-material meshes gather the element state into the static
    contiguous per-material blocks of ``md.perm``/``md.groups``, update
    each block with its own jitted return map (own DeviceMaterial and
    elastic stiffness — ``mat``/``CV`` are tuples indexed by group), and
    scatter the results back to mesh element order.  This is the
    expert-parallel analogue for constitutive models: the gathers are
    O(N * 6) while the return maps are O(N * nsv), so grouping costs
    almost nothing and each material pays only for its own elements.
    """
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
    # groups tile [0, Nel) in permuted order: original[perm[j]] = block[j],
    # i.e. original[i] = block[inv_perm[i]] — evaluated as a GATHER: TPU
    # row scatters of the (Nel, 6, 6) tangent block cost ~105 ms at 1024^2
    # where the equivalent inverse-permutation gather is several-fold
    # cheaper (scatters serialize on the update combiner)
    scat = lambda x: x[md.inv_perm]
    return scat(fy_g), scat(sig_n), scat(depl_n), scat(grad_n)


class SolverState(NamedTuple):
    u: jnp.ndarray           # (2, nnX, nnY) grid planes | (Ndof,) flat
    sig: jnp.ndarray         # (Nel, 6)
    epl: jnp.ndarray         # (Nel, 6)
    eps: jnp.ndarray         # (Nel, 6)
    elstiff: jnp.ndarray     # (36, NX, NY) grid planes | (Nel, 6, 6)


def init_state(md: MeshData, CV, dtype=jnp.float32):
    ushape = md.fixed.shape
    if md.groups is not None:
        # per-element elastic stiffness from the material groups
        rows = np.zeros((md.nel, 6, 6))
        perm = np.asarray(md.perm)
        for k, (start, size) in enumerate(md.groups):
            rows[perm[start:start + size]] = np.asarray(CV[k])
        if md.grid is not None:
            NX, NY = md.grid[:2]
            elstiff = jnp.asarray(
                rows.reshape(md.nel, 36).T.reshape(36, NX, NY), dtype=dtype)
        else:
            elstiff = jnp.asarray(rows, dtype=dtype)
        return SolverState(
            u=jnp.zeros(ushape, dtype=dtype),
            sig=jnp.zeros((md.nel, 6), dtype=dtype),
            epl=jnp.zeros((md.nel, 6), dtype=dtype),
            eps=jnp.zeros((md.nel, 6), dtype=dtype),
            elstiff=elstiff)
    CV = jnp.asarray(CV, dtype=dtype)
    if md.grid is not None:
        NX, NY = md.grid[:2]
        elstiff = jnp.broadcast_to(CV.reshape(36, 1, 1), (36, NX, NY))
    else:
        elstiff = jnp.broadcast_to(CV, (md.nel, 6, 6))
    return SolverState(
        u=jnp.zeros(ushape, dtype=dtype),
        sig=jnp.zeros((md.nel, 6), dtype=dtype),
        epl=jnp.zeros((md.nel, 6), dtype=dtype),
        eps=jnp.zeros((md.nel, 6), dtype=dtype),
        elstiff=elstiff)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def load_step(md: MeshData, state: SolverState, mat: con.DeviceMaterial,
              CV, load_frac, n_inner=3, cg_tol=None, cg_maxiter=2000,
              fast=True, nsub=4):
    """One incremental load step of the device solver.

    Elastic predictor + ``n_inner`` fixed equilibrium iterations: solve the
    linear system with the current tangent stiffness field (CG, matrix-free),
    evaluate the batched return map, update element tangents where they
    changed, re-solve.  Fixed trip count keeps the whole step one XLA
    program; the host outer loop controls load stepping.

    NOTE: on TPU, very large single-chip structured meshes (observed at
    512x512, 7-level multigrid) trigger an XLA miscompilation of this
    monolithic program (the equivalent split-program
    ``load_step_split`` produces correct results on identical inputs and is
    validated against it at smaller sizes).  Prefer ``load_step_split`` for
    large single-chip meshes; this fused variant remains the path for
    sharded execution and small/medium meshes.

    Returns (new_state, diagnostics dict).
    """
    if md.grid is not None and md.nel >= 512 * 512 \
            and jax.devices()[0].platform == 'tpu':
        import warnings
        warnings.warn(
            f'load_step: fused single-program path is not validated above '
            f'512x512 single-chip TPU meshes (this mesh: {md.nel} elements); '
            f'use load_step_split for large single-chip meshes.',
            stacklevel=2)
    if md.groups is None:
        CV = jnp.asarray(CV, dtype=state.u.dtype)
    if cg_tol is None:
        # f32 cannot reach 1e-8 relative residuals (a stalled CG can then
        # diverge); 1e-6 is reliably reachable with the MG preconditioner
        # and tight enough that the residual->error amplification of fine
        # meshes (error ~ ||r|| / lambda_min, lambda_min ~ E/N^2) stays
        # below the displacement signal
        cg_tol = 1.e-11 if state.u.dtype == jnp.float64 else 1.e-6
    bc_val = md.fixed_val * load_frac
    use_mg = md.grid is not None

    def solve_with(elstiff, u):
        from pylabfea_tpu.ops import multigrid as mg
        # rhs: prescribed displacement increment enters as -K @ du_bc
        if use_mg:
            # geometric-multigrid preconditioned CG on plane tuples:
            # mesh-size-independent iteration counts on structured grids
            Kp = element_stiffness_planes(md, elstiff)
            fixT = _split(md.fixed)
            bcT = _split(bc_val)
            frcT = _split(md.force)
            du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(fixT, bcT))
            fp = _contract_planes(Kp, _gather_planes(md, du_bc))
            neg = _scatter_planes(md, fp)
            rhs = tuple(jnp.where(f, b, fr * load_frac - q)
                        for f, b, fr, q in zip(fixT, bcT, frcT, neg))
            x0 = du_bc
            levels = mg.build_hierarchy(md, elstiff)
            duT, res, it = mg.mg_cg_solve(levels, rhs, x0, tol=cg_tol,
                                          maxiter=min(cg_maxiter, 100))
            return _merge(duT), Kp, res, it
        Ke = element_stiffness(md, elstiff)
        du_bc = jnp.where(md.fixed, bc_val, 0.)
        vm = gather_element(md, du_bc)
        fe = jnp.einsum('eij,ej->ei', Ke, vm,
                        preferred_element_type=u.dtype)
        rhs = -scatter_element(md, fe)
        rhs = jnp.where(md.fixed, bc_val, rhs + md.force * load_frac)
        x0 = jnp.where(md.fixed, bc_val, 0.)
        du, res, it = cg_solve(lambda v: k_apply(md, Ke, v), rhs, x0,
                               k_diag(md, Ke), tol=cg_tol,
                               maxiter=cg_maxiter)
        return du, Ke, res, it

    # single scan: each iteration solves with the current tangent field,
    # evaluates the batched return map on that du (so the final iteration's
    # stress state is consistent with its displacement increment), then
    # updates the tangents for the next iteration.  One solver instance and
    # one response instance in the compiled program — compile time of the
    # multigrid hierarchy dominates, so instance count matters.
    def inner(carry, _):
        elstiff = carry
        du, Ke, cg_res, cg_it = solve_with(elstiff, state.u)
        deps = element_deps(md, du)
        fy, sig_n, depl_n, grad = respond_grouped(
            md, mat, CV, state.sig, state.epl, deps, fast=fast,
            maxiter=12, nsub=nsub)
        if md.grid is not None:
            gP = elstiff_planes(md, grad)
            dst = jnp.sqrt(jnp.sum((elstiff - gP) ** 2, axis=0))
            elstiff = jnp.where(dst > 1.e-3, gP, elstiff)
        else:
            dst = jnp.linalg.norm((elstiff - grad).reshape(md.nel, -1),
                                  axis=1)
            elstiff = jnp.where((dst > 1.e-3)[:, None, None], grad, elstiff)
        return elstiff, (du, fy, sig_n, depl_n, dst.max(), cg_res, cg_it)

    elstiff, outs = jax.lax.scan(inner, state.elstiff, None,
                                 length=n_inner + 1)
    du = outs[0][-1]
    fy = outs[1][-1]
    res_sig = outs[2][-1]
    res_depl = outs[3][-1]
    dst_hist = outs[4]
    cg_res = outs[5][-1]
    cg_it = outs[6][-1]

    deps = element_deps(md, du)
    u_new = state.u + du
    eps_new = state.eps + deps
    new = SolverState(u=u_new, sig=res_sig, epl=state.epl + res_depl,
                      eps=eps_new, elstiff=elstiff)
    # homogenized element averages (volume-weighted; uniform elements)
    glob_sig = jnp.mean(res_sig, axis=0)
    glob_eps = jnp.mean(eps_new, axis=0)
    glob_epl = jnp.mean(new.epl, axis=0)
    diag = {'fy_max': fy.max(), 'dstiff': dst_hist,
            'cg_res': cg_res, 'cg_iters': cg_it,
            'glob_sig': glob_sig, 'glob_eps': glob_eps, 'glob_epl': glob_epl}
    return new, diag


@partial(jax.jit, static_argnums=(4, 5))
def solve_linear(md: MeshData, elstiff, bc_val, force=None, cg_tol=None,
                 cg_maxiter=100, x0=None):
    """One jitted linear solve with the current tangent field: prescribed
    displacements ``bc_val`` on fixed dofs, optional external nodal force
    increment ``force`` on free dofs, MG-CG on structured meshes.

    The WHOLE solve — multigrid hierarchy build (Galerkin coarsening)
    included — runs as one compiled program: dispatching the build
    eagerly cost ~20 ms of op-by-op round-trips per call on a
    tunnel-attached TPU.

    ``x0`` optionally warm-starts CG (fixed dofs are overwritten with the
    BC values): consecutive equilibrium iterations of a load step solve
    nearly identical systems, so the previous increment is an excellent
    initial guess — in the developed-plastic regime this recycles most of
    the Krylov work that made late load steps cost ~8x the elastic ones.
    Returns (du, res, iters)."""
    dtype = elstiff.dtype
    if cg_tol is None:
        cg_tol = 1.e-11 if dtype == jnp.float64 else 1.e-6
    # None -> zero arrays so a single jitted trace serves every call form
    # (zero force and zero x0 are exact no-ops in the formulation below)
    if force is None:
        force = jnp.zeros_like(bc_val)
    if x0 is None:
        x0 = jnp.zeros_like(bc_val)
    if md.grid is not None:
        # two jitted programs: the multigrid hierarchy is built in its own
        # program and its per-level stiffness planes cross the jit boundary
        # as ARGUMENTS of the solve program.  This pins them to default
        # layouts — the Pallas stencil K-apply is a custom call with
        # default-layout operand constraints, and when the Galerkin
        # coarsening lived inside the solve program XLA inserted a
        # full-size relayout copy of the fine planes before every stencil
        # call in the CG while-loop (measured +37 ms/iteration at 1024^2)
        kes = _hier_kes_jit(md, elstiff)
        return _mg_solve_jit(md, kes, bc_val, force, float(cg_tol),
                             int(cg_maxiter), x0)
    return _cg_flat_jit(md, elstiff, bc_val, force, float(cg_tol),
                        int(cg_maxiter), x0)


@jax.jit
def _hier_kes_core(chain, elstiff):
    from pylabfea_tpu.ops import multigrid as mg
    # attach_inv=False: hierarchy_kes itself factorizes the dense bottom
    # solve (once per tangent rebuild) and appends it to the kes tuple —
    # building it on the levels too would trace it twice
    return mg.hierarchy_kes(mg.build_hierarchy(chain[0], elstiff,
                                               attach_inv=False,
                                               chain=chain))


def _hier_kes_jit(md: MeshData, elstiff):
    """Jitted hierarchy build; the tangent-independent coarse-mesh chain
    crosses the jit boundary precomputed (multigrid._mesh_chain cache) —
    as traced-argument compute it cost ~30 ms per build at 1024^2."""
    from pylabfea_tpu.ops import multigrid as mg
    return _hier_kes_core(mg._mesh_chain(md), elstiff)


_hier_kes_jit.clear_cache = _hier_kes_core.clear_cache


@jax.jit
def _hier_kes_cond_core(chain, elstiff, kes_prev, dst):
    """Device-side conditional hierarchy rebuild: Galerkin-coarsen only
    when the tangent update actually replaced element stiffnesses
    (``dst > 1e-3`` — the same threshold the update itself applies, so
    ``dst <= 1e-3`` means ``elstiff`` is bitwise the field ``kes_prev``
    was coarsened from).  Keeping the decision on device lets the
    equilibrium loop queue solve/response rounds back-to-back with no
    host readback between them — a ``float(dst)`` here would drain the
    device pipeline once per inner iteration."""
    from pylabfea_tpu.ops import multigrid as mg

    def rebuild(_):
        return mg.hierarchy_kes(mg.build_hierarchy(chain[0], elstiff,
                                                   attach_inv=False,
                                                   chain=chain))

    return jax.lax.cond(dst > 1.e-3, rebuild, lambda _: kes_prev, None)


def _hier_kes_cond_jit(md: MeshData, elstiff, kes_prev, dst):
    from pylabfea_tpu.ops import multigrid as mg
    return _hier_kes_cond_core(mg._mesh_chain(md), elstiff, kes_prev, dst)


_hier_kes_cond_jit.clear_cache = _hier_kes_cond_core.clear_cache


@partial(jax.jit, static_argnums=(4, 5))
def _mg_solve_core(chain, kes, bc_val, force, cg_tol, cg_maxiter, x0):
    from pylabfea_tpu.ops import multigrid as mg
    md = chain[0]
    if _stencil_ok(md, kes[0]):
        # pin the stiffness planes to the default (row-major) layout ONCE:
        # the Pallas stencil custom call constrains its operands to default
        # layouts, and without the pin XLA may choose a different parameter
        # layout and insert a full-size relayout copy of the planes before
        # EVERY stencil call inside the CG while-loop (measured 53 ms per
        # preconditioned iteration vs ~4 ms at 1024^2)
        try:
            from jax.experimental import layout as _jl
            kes = tuple(_jl.with_layout_constraint(
                k, _jl.Layout(tuple(range(k.ndim)))) for k in kes)
        except Exception:  # pragma: no cover - layout API is experimental
            pass
    levels = mg.levels_from_kes(md, kes, chain=chain)
    Kp = kes[0]
    fixT = _split(md.fixed)
    bcT = _split(bc_val)
    frcT = _split(force)
    du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(fixT, bcT))
    fp = _contract_planes(Kp, _gather_planes(md, du_bc))
    neg = _scatter_planes(md, fp)
    rhs = tuple(jnp.where(f, b, fr - q)
                for f, b, fr, q in zip(fixT, bcT, frcT, neg))
    start = tuple(jnp.where(f, b, x)
                  for f, b, x in zip(fixT, bcT, _split(x0)))
    duT, res, it = mg.mg_cg_solve(levels, rhs, start, tol=cg_tol,
                                  maxiter=min(cg_maxiter, 100))
    return _merge(duT), res, it


def _mg_solve_jit(md: MeshData, kes, bc_val, force, cg_tol, cg_maxiter, x0):
    """Jitted MG-CG solve; see ``_hier_kes_jit`` for why the coarse-mesh
    chain crosses the jit boundary precomputed."""
    from pylabfea_tpu.ops import multigrid as mg
    return _mg_solve_core(mg._mesh_chain(md), kes, bc_val, force, cg_tol,
                          cg_maxiter, x0)


_mg_solve_jit.clear_cache = _mg_solve_core.clear_cache


@jax.jit
def _residual_f64_grid(md: MeshData, M64, elstiff, du64, force):
    """True residual ``force - K @ du`` of the BC-embedded system,
    evaluated in float64 against the TRUE operator: ``M64`` carries the
    unrounded f64 geometry factors (``_m64_of``) and the dtype-rounded
    tangent field is upcast exactly, so the residual measures the error
    vs the f64 discretization, not vs its f32 rounding.  Zero on fixed
    rows — ``du`` carries the prescribed values there exactly.

    Full effect requires ``jax_enable_x64``; without it the casts are
    no-ops and this degrades to an f32 recomputation (still a valid,
    weaker, refinement residual)."""
    f64 = jnp.float64
    NX, NY = md.grid[:2]
    els = elstiff_planes(md, elstiff).astype(f64)
    Kp = jnp.einsum('kl,lxy->kxy', jnp.asarray(M64, f64), els,
                    precision=jax.lax.Precision.HIGHEST).reshape(
                        8, 8, NX, NY)
    fixT = _split(md.fixed)
    duT = _split(du64)
    q = _scatter_planes(md, _contract_planes(Kp, _gather_planes(md, duT)))
    return _merge(tuple(jnp.where(f, 0., fr.astype(f64) - qq)
                        for f, fr, qq in zip(fixT, _split(force), q)))


def refine_du(md: MeshData, kes, elstiff, du, bc_val, force, cg_tol,
              cg_maxiter, n=1):
    """Mixed-precision iterative refinement of a linear-solve result on
    structured grids: compute the TRUE residual in float64 against the
    unrounded operator (one widened K-apply — cheap), re-solve the
    correction with the SAME f32 multigrid hierarchy, accumulate in
    float64.  Each pass multiplies the displacement error by
    ~kappa(K) * eps_f32, so one or two passes recover ~f64-quality
    solutions from f32 solves — the production accuracy knob for TPU,
    where native f64 is emulated and ~100x slower (see
    tools/acc_mixed.py / ACCURACY.md)."""
    dt = du.dtype
    M64 = _m64_of(md)
    du64 = du.astype(jnp.float64)
    zero_bc = jnp.zeros_like(bc_val)
    for _ in range(n):
        r = _residual_f64_grid(md, M64, elstiff, du64, force)
        d, _, _ = _mg_solve_jit(md, kes, zero_bc, r.astype(dt),
                                float(cg_tol), int(cg_maxiter),
                                jnp.zeros_like(bc_val))
        du64 = du64 + d.astype(jnp.float64)
    return du64.astype(dt)


@jax.jit
def _residual_f64_flat(md: MeshData, elstiff, du64, force):
    """Flat-layout twin of ``_residual_f64_grid``: true residual of the
    BC-embedded system in float64 with the element stiffnesses upcast
    exactly.  The geometry tables (``md.B``/``jacw``) are stored
    dtype-rounded, so without ``jax_enable_x64`` mesh construction this
    measures the error vs the rounded discretization — still the valid
    refinement residual for the SOLVE error (see ``refine_du``)."""
    f64 = jnp.float64
    Ke = element_stiffness(md, elstiff).astype(f64)
    ue = gather_element(md, du64)
    fe = jnp.einsum('eij,ej->ei', Ke, ue, preferred_element_type=f64)
    q = scatter_element(md, fe)
    return jnp.where(md.fixed, 0., force.astype(f64) - q)


def refine_du_flat(md: MeshData, elstiff, du, bc_val, force, cg_tol,
                   cg_maxiter, n=1):
    """Mixed-precision iterative refinement on flat (unstructured/1-D)
    meshes: f64 true residual + f32 correction re-solve with the same
    Jacobi-CG — the flat-layout twin of ``refine_du``."""
    dt = du.dtype
    du64 = du.astype(jnp.float64)
    zero_bc = jnp.zeros_like(bc_val)
    for _ in range(n):
        r = _residual_f64_flat(md, elstiff, du64, force)
        d, _, _ = _cg_flat_jit(md, elstiff, zero_bc, r.astype(dt),
                               float(cg_tol), int(cg_maxiter),
                               jnp.zeros_like(bc_val))
        du64 = du64 + d.astype(jnp.float64)
    return du64.astype(dt)


@partial(jax.jit, static_argnums=(4, 5))
def _cg_flat_jit(md: MeshData, elstiff, bc_val, force, cg_tol, cg_maxiter,
                 x0):
    dtype = elstiff.dtype
    Ke = element_stiffness(md, elstiff)
    du_bc = jnp.where(md.fixed, bc_val, 0.)
    vm = gather_element(md, du_bc)
    fe = jnp.einsum('eij,ej->ei', Ke, vm, preferred_element_type=dtype)
    rhs = -scatter_element(md, fe) + force
    rhs = jnp.where(md.fixed, bc_val, rhs)
    start = jnp.where(md.fixed, bc_val, x0)
    return cg_solve(lambda v: k_apply(md, Ke, v), rhs, start, k_diag(md, Ke),
                    tol=cg_tol, maxiter=cg_maxiter)


def _clear_solve_caches():
    """Drop compiled solve traces (needed when module-level switches like
    ``multigrid.SMOOTHER`` or ``USE_STENCIL`` change the traced program)."""
    _hier_kes_jit.clear_cache()
    _mg_solve_jit.clear_cache()
    _cg_flat_jit.clear_cache()


solve_linear.clear_cache = _clear_solve_caches


@partial(jax.jit, static_argnums=(5, 6))
def _respond_and_update(md: MeshData, state: SolverState, mat, CV, du,
                        fast=True, nsub=4):
    """Jitted response + tangent update for the split-program load step.
    Chunked above ~2M points: the live (N, nsv) SVC kernel matrices
    otherwise exceed HBM (observed OOM at 2048^2 x 512 SVs on v5e)."""
    deps = element_deps(md, du)
    fy, sig_n, depl_n, grad = respond_grouped(
        md, mat, CV, state.sig, state.epl, deps, fast=fast, maxiter=12,
        nsub=nsub)
    if md.grid is not None:
        gP = elstiff_planes(md, grad)
        dst = jnp.sqrt(jnp.sum((state.elstiff - gP) ** 2, axis=0))
        elstiff = jnp.where(dst > 1.e-3, gP, state.elstiff)
    else:
        dst = jnp.linalg.norm((state.elstiff - grad).reshape(md.nel, -1),
                              axis=1)
        elstiff = jnp.where((dst > 1.e-3)[:, None, None], grad,
                            state.elstiff)
    return fy, sig_n, depl_n, elstiff, deps, dst.max()


_GATE_SCALE_CACHE = {}


def _gate_scale(md: MeshData, mat):
    """Per-element normalization of the yield excess for the convergence
    gate: 1 for SVC groups (dimensionless decision values), the yield
    strength for analytic groups (f = seq - sflow in stress units).
    Cached per (mesh id, material id); the cache holds references to the
    keyed objects so their ids cannot be recycled, and is size-capped."""
    key = (id(md.perm), id(mat))
    hit = _GATE_SCALE_CACHE.get(key)
    if hit is not None:
        return hit[2]
    # NOTE: DeviceMaterial is itself a NamedTuple — test for it first
    mats = [mat] if isinstance(mat, con.DeviceMaterial) else list(mat)
    scale = np.ones(md.nel)
    if md.groups is not None and len(mats) > 1:
        perm = np.asarray(md.perm)
        for (start, size), m in zip(md.groups, mats):
            if not m.is_svc:
                scale[perm[start:start + size]] = float(m.sy)
    elif not mats[0].is_svc:
        scale[:] = float(mats[0].sy)
    out = jnp.asarray(scale, md.B.dtype)
    if len(_GATE_SCALE_CACHE) > 32:
        _GATE_SCALE_CACHE.clear()
    _GATE_SCALE_CACHE[key] = (md.perm, mat, out)
    return out


def load_step_split(md: MeshData, state: SolverState, mat, CV, load_frac,
                    n_inner=2, cg_tol=None, cg_maxiter=100, fast=True,
                    nsub=4, du0=None, gate=False, max_inner=15, kes0=None,
                    dst0=None, n_refine=0, gate_dst_rtol=1e-4,
                    commit_f64=False, commit_faithful=False):
    """Host-orchestrated load step from two small jitted programs (linear
    solve, response+tangent-update).  Functionally equivalent to
    ``load_step`` but compiles in seconds instead of tens of minutes for
    deep multigrid hierarchies, at the cost of a few extra host
    dispatches per step.  Preferred for large single-chip meshes.

    ``du0`` warm-starts the first solve (pass the previous step's ``du``
    from ``diag['du']`` when load fractions are equal — cuts the
    developed-plastic CG cost several-fold).

    ``gate=True`` replaces the fixed ``n_inner`` count with the
    reference's equilibrium-loop exit test (model.py:1305 ``while
    (change or not conv)``): iterate until the yield excess is inside
    tolerance AND the tangent field stopped changing, up to
    ``max_inner`` iterations.  Costs one scalar device sync per inner
    iteration; saves whole solve+response rounds on elastic or
    nearly-converged steps.  ``n_inner`` still sets the MINIMUM
    iteration count (>= 1 solve+response always runs).  The
    tangent-stall half of the test is absolute (the reference's 1e-3)
    in float64 and RELATIVE (``gate_dst_rtol * |CV|_F``, default 1e-4)
    in float32, whose tangents oscillate at the rounding floor far
    above the absolute threshold — see the inline comment.

    ``commit_f64=True`` (float32 states; requires ``jax_enable_x64``)
    re-integrates the COMMITTED element state once per step in float64:
    after the equilibrium loop settles, the final response is recomputed
    from the entering (sig, epl) and the converged displacement increment
    with float64 kernels, and the committed stress/plastic-strain fields
    are its (storage-rounded) result.  ``n_refine`` fixes the LINEAR
    solve's f32 error; this knob extends the accuracy story through the
    NONLINEAR return map — the committed field then deviates from a full
    f64 run only by the f32 tangent/iteration path (branch decisions),
    not by f32 response arithmetic.  Tangents stay f32 (they only
    precondition).  One extra f64 response pass per step — the accuracy
    profile's knob, off in the production configuration.

    ``commit_faithful=True`` finishes every step with a warm-started
    FAITHFUL TAIL: the inner equilibrium loop first converges on the
    fast cutting-plane projection (cheap tangents/du), then CONTINUES
    with the reference-faithful substepped return map
    (``constitutive.response`` — masked-lane ``response_batch``
    semantics) until the convergence gate fires again, so the committed
    state is the FAITHFUL integrator's equilibrium fixed point.  This
    closes the fixed-point-in-band selection gap between the two
    integrators (measured on the REF_SOLVE BVP: full-faithful f32
    agrees with the faithful-f64 anchor to 1.1e-5 where the fast path
    differs 9.6e-3 — both land inside the yield-tolerance band, but in
    different spots).  The tail is iterated, not one-shot: committing a
    single faithful response at the fast du leaves ~|C| x (plastic-
    increment integrator difference) of out-of-equilibrium stress that
    compounds across steps (measured 2.8e-1).  Warm-starting from the
    fast fixed point typically costs 1-3 faithful rounds per step
    instead of the full inner budget — the parity knob for small/medium
    meshes (the faithful map is ~500x the fast one per point at
    flagship sizes; combine with ``commit_f64`` for the anchor's f64
    commit arithmetic).

    ``kes0`` optionally passes the PREVIOUS step's multigrid hierarchy
    (``diag['kes']``) with ``dst0`` the device scalar ``diag['dstiff']``
    of the response it came from: the first inner solve then reuses the
    hierarchy through the device-side conditional rebuild (skipping the
    ~20 ms Galerkin coarsening at 1024^2 whenever the tangent field
    carried over bitwise unchanged) without any host readback — the
    whole multi-step solve queues on the device with no sync (see
    ``solve_uniaxial``)."""
    from pylabfea_tpu.core.tensors import yf_tolerance
    bc_val = md.fixed_val * load_frac
    force = md.force * load_frac
    elstiff = state.elstiff
    du = du0
    count = (max_inner if gate else n_inner) + 1
    kes = kes0
    dst = dst0
    # commit_faithful runs as a warm-started FAITHFUL TAIL: once the fast
    # phase converges (or its fixed count runs out), the SAME equilibrium
    # loop continues with the reference-faithful integrator until the
    # convergence gate fires again — so the committed state is the
    # faithful fixed point.  (A one-shot faithful re-commit at the fast
    # du does NOT work: at the yield transition the two integrators'
    # plastic increments differ by ~2e-5, which the elastic stiffness
    # amplifies to ~9 MPa of committed out-of-equilibrium stress that
    # compounds across steps — measured 2.8e-1 final parity.)
    faithful_tail = bool(commit_faithful and fast)
    tail = False
    if gate or faithful_tail:
        # tangent-stall exit threshold.  The element-stiffness change dst
        # is an absolute Frobenius norm on entries of the elastic scale
        # (~1e5 MPa for metals), so the reference's bare 1e-3 demands
        # ~1e-8 RELATIVE agreement.  float64 secant tangents genuinely
        # reach it (linear contraction ~0.1x/iteration) and the absolute
        # test pins the exact fixed point — keep it.  float32 tangents
        # CANNOT: they oscillate at O(eps * |CV|) ~ 1e-2 * |CV|_F * eps32
        # >> 1e-3, so the criterion never fires and every plastic step
        # burns the full max_inner budget chasing rounding noise while
        # the yield excess converged many rounds earlier.  In f32 the
        # exit therefore gates on gate_dst_rtol * |CV|_F (default 1e-4
        # relative), and requires a DEEP hold (dst <= 0.1 * threshold)
        # or two consecutive holds.  The default was swept on the
        # REF_SOLVE parity BVP (plasticity is PATH-DEPENDENT: an eager
        # exit on the yield-transition step commits plastic-increment
        # error no later iteration can undo): rtol=1e-3 saved only ~8%
        # of the inner rounds but drifted the converged-anchor parity
        # 4.7e-3 -> 1.7e-2, while 1e-4 is parity-identical to the
        # absolute test there (the threshold binds only at the f32
        # noise floor) and still exits bifurcation-stalled workloads in
        # ~a third of the absolute gate's rounds (flagship 48^2
        # transition: 97 -> ~40 rounds/8 steps; the absolute test never
        # fires on those).  gate_dst_rtol=0 forces the absolute test in
        # any dtype.
        if state.elstiff.dtype == jnp.float64:
            dst_exit = 1.e-3
        else:
            if isinstance(mat, con.DeviceMaterial):
                cv_scale = float(jnp.linalg.norm(jnp.asarray(CV, md.B.dtype)))
            else:
                cv_scale = max(
                    float(jnp.linalg.norm(jnp.asarray(c, md.B.dtype)))
                    for c in CV)
            dst_exit = max(1.e-3, gate_dst_rtol * cv_scale)
    held = False
    strict_abs = (gate or faithful_tail) \
        and (state.elstiff.dtype == jnp.float64 or gate_dst_rtol == 0.)
    cg_hist = []  # device scalars; read lazily by diagnostics consumers
    converged = False
    i = 0
    total_count = count + (max_inner if faithful_tail else 0)
    while i < total_count:
        # warm-start each equilibrium iteration with the previous increment
        # (near-identical systems; recycles the Krylov work)
        if md.grid is not None:
            # the tangent update only replaces element stiffnesses whose
            # change exceeds 1e-3, so dst <= 1e-3 means elstiff is
            # UNCHANGED and the multigrid hierarchy (Galerkin coarsening,
            # ~20 ms at 1024^2) can be reused verbatim; the decision runs
            # ON DEVICE (lax.cond) so no round-trip sync splits the
            # pipeline between inner iterations
            if kes is None or dst is None:
                # no hierarchy, or a caller-supplied kes0 of unknown
                # freshness (kes0 without dst0): rebuild
                kes = _hier_kes_jit(md, elstiff)
            else:
                kes = _hier_kes_cond_jit(md, elstiff, kes, dst)
            tol = cg_tol if cg_tol is not None else (
                1.e-11 if elstiff.dtype == jnp.float64 else 1.e-6)
            if du is None:
                x0 = jnp.zeros_like(bc_val)
            elif dst is None or elstiff.dtype == jnp.float64:
                # f64 keeps the warm start unconditionally: there is no
                # rounding floor to poison, and on hard (near-singular
                # secant) tangents the recycled Krylov subspace is what
                # keeps developed-plastic iteration counts flat
                x0 = du
            else:
                # f32 warm-start FRESHNESS gate (device scalar, no sync —
                # same condition as the hierarchy rebuild): when the
                # tangent update replaced element stiffnesses, the
                # previous increment poisons f32 CG — measured at 2048^2,
                # warm start on a changed system ground 36 iterations
                # stuck at 8.6e-5 relative while a zero start converged
                # to 8.8e-7 in 7; on an UNCHANGED system the warm start
                # is the 2-4-iteration fast path, so keep it there
                x0 = du * (dst <= 1.e-3)
            du, cg_res, cg_it = _mg_solve_jit(md, kes, bc_val, force,
                                              float(tol), int(cg_maxiter),
                                              x0)
            if n_refine:
                # mixed-precision accuracy knob: f64 true residual vs the
                # unrounded operator + f32 correction re-solve (same
                # hierarchy)
                du = refine_du(md, kes, elstiff, du, bc_val, force, tol,
                               cg_maxiter, n=n_refine)
        else:
            du, cg_res, cg_it = solve_linear(md, elstiff, bc_val, force,
                                             cg_tol, cg_maxiter, x0=du)
            if n_refine:
                tol = cg_tol if cg_tol is not None else (
                    1.e-11 if elstiff.dtype == jnp.float64 else 1.e-6)
                du = refine_du_flat(md, elstiff, du, bc_val, force, tol,
                                    cg_maxiter, n=n_refine)
        cg_hist.append(cg_it)
        st = state._replace(elstiff=elstiff)
        fy, sig_n, depl_n, elstiff, deps, dst = _respond_and_update(
            md, st, mat, CV, du, fast and not tail, nsub)
        gating = tail or (gate and i >= min(n_inner, count - 1))
        if gating:
            # host convergence test: normalized yield excess (SVC decision
            # values are dimensionless; analytic f carries stress units,
            # scaled per element group by the yield strength —
            # conservative under hardening).  NOTE the faithful
            # integrator's fy is the DISTANCE-type yield function (stress
            # units for SVC too) — same sign convention, stricter scale.
            fmax = float(jnp.max(fy / _gate_scale(md, mat)))
            dv = float(dst)
            dst_ok = (dv <= dst_exit) if strict_abs else (
                dv <= 0.1 * dst_exit or (held and dv <= dst_exit))
            if fmax <= yf_tolerance * 1.0001 and dst_ok:
                if faithful_tail and not tail:
                    # fast phase converged: continue the loop with the
                    # faithful integrator (warm du / tangents / hierarchy)
                    tail = True
                    held = False
                else:
                    converged = True
                    break
            else:
                held = dv <= dst_exit
                if faithful_tail and not tail and i >= count - 1:
                    # fast phase exhausted its budget without converging:
                    # hand over to the faithful tail anyway (its gate
                    # keeps iterating; the commit must be faithful)
                    tail = True
                    held = False
        elif faithful_tail and not tail and i == count - 1:
            # fixed-inner-count callers (gate=False): fast budget spent,
            # switch to the gated faithful tail
            tail = True
            held = False
        i += 1
    if not converged and (gate or tail):
        # reference behavior (model.py:1364): warn when the
        # equilibrium loop exhausts its iteration budget with the
        # yield excess still outside tolerance — typically a load
        # increment so large the trial states leave the ML locus's
        # training band (flat decision surface, vanishing gradient);
        # cut the step size or raise nsub
        fmax = float(jnp.max(fy / _gate_scale(md, mat)))
        if fmax > yf_tolerance * 1.0001:
            import warnings
            warnings.warn(
                f'load_step_split: no convergence of the plasticity '
                f'algorithm within max_inner={max_inner} iterations '
                f'(normalized yield excess {fmax:.3g} > tolerance '
                f'{yf_tolerance:.1e}); reduce the load increment or '
                f'increase nsub', stacklevel=2)
    if commit_f64 and state.sig.dtype == jnp.float32:
        # float64 commit recomputation (see docstring): re-integrate the
        # final response from the entering state with f64 kernels; the
        # equilibrium iteration path (tangents, du) stays f32.  With
        # commit_faithful also set, the f64 commit runs the faithful
        # substepped integrator — the anchor configuration exactly.
        f64 = jnp.float64
        mat64 = jax.tree_util.tree_map(lambda x: jnp.asarray(x, f64), mat)
        deps64 = element_deps(md, du.astype(f64))
        fy64, sig64, depl64, _ = respond_grouped(
            md, mat64, CV, state.sig.astype(f64), state.epl.astype(f64),
            deps64, fast=fast and not commit_faithful, maxiter=12,
            nsub=nsub)
        fy = fy64.astype(state.sig.dtype)
        sig_n = sig64.astype(state.sig.dtype)
        depl_n = depl64.astype(state.sig.dtype)
    new = SolverState(u=state.u + du, sig=sig_n, epl=state.epl + depl_n,
                      eps=state.eps + deps, elstiff=elstiff)
    diag = {'fy_max': fy.max(), 'dstiff': dst, 'cg_res': cg_res,
            'cg_iters': cg_it, 'cg_iters_hist': cg_hist, 'du': du,
            'glob_sig': jnp.mean(sig_n, axis=0),
            'glob_eps': jnp.mean(new.eps, axis=0),
            'glob_epl': jnp.mean(new.epl, axis=0)}
    if md.grid is not None:
        # hand the hierarchy to the next step — valid to reuse there only
        # when the LAST response replaced nothing (dstiff <= 1e-3)
        diag['kes'] = kes
    return new, diag


def solve_uniaxial(md: MeshData, mat: con.DeviceMaterial, CV, nsteps=20,
                   n_inner=3, dtype=jnp.float32, cg_tol=None,
                   cg_maxiter=2000, fast=True, nsub=4, split=True,
                   gate=False, n_refine=0, commit_faithful=False):
    """Host outer loop: apply the boundary displacement in ``nsteps`` equal
    increments; returns (final state, per-step global stress/strain).
    ``split=True`` (default) uses the split-program step — fast compiles
    and robust at large mesh sizes.  ``gate=True`` replaces the fixed
    inner count with the reference's equilibrium-convergence exit test
    (see ``load_step_split``)."""
    state = init_state(md, CV, dtype=dtype)
    hist = []
    du0 = None
    kes0 = None
    dst0 = None
    for _ in range(nsteps):
        if split:
            state, diag = load_step_split(
                md, state, mat, CV, 1. / nsteps, n_inner=n_inner,
                cg_tol=cg_tol, cg_maxiter=cg_maxiter, fast=fast, nsub=nsub,
                du0=du0, gate=gate, kes0=kes0, dst0=dst0, n_refine=n_refine,
                commit_faithful=commit_faithful)
            du0 = diag['du']  # equal fractions: previous du ~ next du
            # hand the hierarchy to the next step; the device-side
            # conditional rebuild (keyed on dstiff) decides whether the
            # entering tangent field still matches it — no host readback
            kes0 = diag.get('kes')
            dst0 = diag['dstiff']
        else:
            state, diag = load_step(md, state, mat, CV, 1. / nsteps,
                                    n_inner=n_inner, cg_tol=cg_tol,
                                    cg_maxiter=cg_maxiter, fast=fast,
                                    nsub=nsub)
        hist.append((diag['glob_sig'], diag['glob_eps'], diag['glob_epl']))
    return state, hist
