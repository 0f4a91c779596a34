"""Domain-decomposed multi-chip FE operator: halo exchange over ICI.

``parallel.mesh`` shards elements and keeps the DOF vector replicated (the
scatter-add becomes an AllReduce of the full vector).  That is simple and
correct, but the AllReduce volume is O(Ndof) per CG iteration.  This module
implements the scalable alternative: a 1-D **domain decomposition** of the
structured mesh into x-strips under ``shard_map`` — each device owns a
contiguous block of element columns and the node columns they touch, and the
only communication is a **ppermute halo exchange of one node column per
neighbor per K-apply** (O(nnY) instead of O(Ndof)).

Data layout per device (shard_map body sees the local block) follows the
TPU-native plane convention of ``ops.fe_kernels``: nodal vectors are
**tuples of per-component (NXd+1, nnY) planes** (the large nnY axis lands
on the TPU lane dimension; a stacked or interleaved dof axis wastes lanes
and provokes (2, 128)-tiled loop carries — see fe_kernels._split), and the
element stiffness is (8, 8, NXd, NY) planes built per tangent update.  The
shared boundary column is *duplicated* between neighbors; after the local
scatter both copies hold partial sums, and one ppermute per direction
completes them.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops import constitutive as con

_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))


class StripMesh:
    """Structured mesh partitioned into x-strips over a device mesh.

    Builds per-device blocks with a duplicated boundary node column:
    device d of D owns element columns [d*NXd, (d+1)*NXd) and node columns
    [d*NXd, d*NXd + NXd] (the last column is shared with device d+1).
    Nodal fields (``fixed``, ``fixed_val``, ``own``) are tuples of
    per-component (D, NXd+1, nnY) sharded planes.
    """

    def __init__(self, NX, NY, LX=1., LY=1., uniax='y', eps_tot=0.01,
                 n_devices=None, dtype=jnp.float32, bc=None, mat_map=None):
        devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
        D = len(devs)
        if NX % D:
            raise ValueError(f'NX={NX} must be divisible by {D} devices')
        self.mesh = Mesh(np.array(devs), ('x',))
        self.D = D
        self.NX, self.NY = NX, NY
        self.NXd = NX // D
        self.nnY = NY + 1
        self.lx, self.ly = LX / NX, LY / NY
        self.dtype = dtype
        self.eps_top = eps_tot * LY if uniax == 'y' else 0.
        Bs = fek._quad_B(self.lx, self.ly)
        self.B = jnp.asarray(Bs, dtype=dtype)
        self.Bsum = jnp.asarray(Bs.sum(axis=0), dtype=dtype)
        self.jacw = self.lx * self.ly * 4.
        sh = NamedSharding(self.mesh, P('x'))

        # global BC planes (2, nnX, nnY): general spec via make_edge_bcs,
        # or the legacy uniaxial defaults
        if bc is not None:
            gfix, gval, gforce = fek.make_edge_bcs(
                NX, NY, left=bc.get('left'), right=bc.get('right'),
                bot=bc.get('bot'), top=bc.get('top'),
                nodes=bc.get('nodes', ()))
        else:
            gfix = np.zeros((2, NX + 1, self.nnY), dtype=bool)
            gval = np.zeros((2, NX + 1, self.nnY))
            gforce = np.zeros((2, NX + 1, self.nnY))
            gfix[1, :, 0] = True                      # bottom: uy = 0
            gfix[0, 0, :] = True                      # left edge: ux = 0
            if uniax == 'y':
                gfix[1, :, -1] = True                 # top: uy prescribed
                gval[1, :, -1] = self.eps_top

        # slice into per-device strips with a DUPLICATED boundary column;
        # nodal values (incl. external forces) are consistent/replicated on
        # both copies — the `own` weights count them once in reductions
        def strips(g):
            out = np.zeros((2, D, self.NXd + 1, self.nnY), dtype=g.dtype)
            for d in range(D):
                out[:, d] = g[:, d * self.NXd: d * self.NXd + self.NXd + 1]
            return out

        fixed = strips(gfix)
        val = strips(gval)
        force = strips(gforce)
        self.fixed = tuple(jax.device_put(jnp.asarray(fixed[c]), sh)
                           for c in range(2))
        self.fixed_val = tuple(
            jax.device_put(jnp.asarray(val[c], dtype=dtype), sh)
            for c in range(2))
        self.force = tuple(
            jax.device_put(jnp.asarray(force[c], dtype=dtype), sh)
            for c in range(2))
        # ownership weight for reductions over the duplicated column: the
        # shared column (local index NXd) counts on the right neighbor only
        own = np.ones((D, self.NXd + 1, self.nnY))
        own[:-1, -1] = 0.
        own_arr = jax.device_put(jnp.asarray(own, dtype=dtype), sh)
        self.own = (own_arr, own_arr)
        # per-element material-group ids (multi-material strips): global
        # raster order e = ix * NY + iy is x-major, so the (D, NXd*NY)
        # blocking is a plain reshape
        if mat_map is not None:
            ids = np.asarray(mat_map, dtype=np.int32).reshape(NX * NY)
            blocks = ids.reshape(D, self.NXd * NY)
            self.mat_ids = jax.device_put(jnp.asarray(blocks), sh)
            # capacity-padded per-material gather tables for the grouped
            # return map: material k occupies a fixed per-strip capacity
            # cap_k = max over strips of its local element count (rounded
            # up to a sublane multiple), so every device runs the same
            # program on a (cap_k, 6) batch of ONLY material-k rows.
            # ``group_inv`` maps each local element to its (pass, lane)
            # slot in the concatenated per-pass output, so results come
            # back through one hazard-free gather instead of scatters.
            NL = self.NXd * NY
            nmat = int(ids.max()) + 1
            inv = np.zeros((D, NL), dtype=np.int32)
            idxs, caps = [], []
            off = 0
            for k in range(nmat):
                rows = [np.nonzero(blocks[d] == k)[0] for d in range(D)]
                top = max(len(w) for w in rows)
                if top == 0:
                    idxs.append(None)
                    caps.append(0)
                    continue
                cap = -(-top // 8) * 8
                idx = np.zeros((D, cap), dtype=np.int32)
                for d, w in enumerate(rows):
                    idx[d, :len(w)] = w
                    inv[d, w] = off + np.arange(len(w), dtype=np.int32)
                idxs.append(jax.device_put(jnp.asarray(idx), sh))
                caps.append(cap)
                off += cap
            self.group_idx = tuple(idxs)
            self.group_caps = tuple(caps)
            self.group_inv = jax.device_put(jnp.asarray(inv), sh)
        else:
            self.mat_ids = None
            self.group_idx = None

    def zeros_u(self):
        sh = NamedSharding(self.mesh, P('x'))
        z = jax.device_put(
            jnp.zeros((self.D, self.NXd + 1, self.nnY), self.dtype), sh)
        return (z, z)

    def shard_elements(self, arr_global):
        """(Nel, ...) element array -> (D, NXd*NY, ...) sharded blocks
        (cast to the mesh dtype)."""
        arr_global = jnp.asarray(arr_global, dtype=self.dtype)
        tail = arr_global.shape[1:]
        blocked = arr_global.reshape(self.D, self.NXd * self.NY, *tail)
        return jax.device_put(blocked, NamedSharding(self.mesh, P('x')))


def _halo_accumulate_plane(out):
    """Add the partial sums of the duplicated boundary columns of one
    (NXd+1, nnY) plane: each device sends its LAST column right and its
    (completed) FIRST column is sent back; one ppermute per direction over
    the ICI ring."""
    D = jax.lax.axis_size('x')
    if D == 1:
        return out
    # right boundary partial -> right neighbor's left column
    send_r = out[-1]
    recv_r = jax.lax.ppermute(send_r, 'x',
                              [(i, (i + 1) % D) for i in range(D)])
    idx = jax.lax.axis_index('x')
    out = out.at[0].add(jnp.where(idx > 0, 1., 0.) * recv_r)
    # completed left column -> left neighbor's right column (overwrite)
    send_l = out[0]
    recv_l = jax.lax.ppermute(send_l, 'x',
                              [(i, (i - 1) % D) for i in range(D)])
    out = out.at[-1].set(jnp.where(idx < D - 1, recv_l, out[-1]))
    return out


def _halo_accumulate(out):
    """Halo exchange on a per-component plane tuple."""
    return tuple(_halo_accumulate_plane(p) for p in out)


def _gather_local(u, NXd, NY):
    """Local plane tuple (ux, uy) of (NXd+1, nnY) -> tuple of 8 (NXd, NY)
    element dof planes (corner-major, component-minor)."""
    out = []
    for dx, dy in _CORNERS:
        out.append(u[0][dx:dx + NXd, dy:dy + NY])
        out.append(u[1][dx:dx + NXd, dy:dy + NY])
    return tuple(out)


def _scatter_local(fp, NXd, NY, nnY):
    """Tuple of 8 (NXd, NY) element dof planes -> local plane tuple."""
    dt = fp[0].dtype
    out = [jnp.zeros((NXd + 1, nnY), dt), jnp.zeros((NXd + 1, nnY), dt)]
    for a, (dx, dy) in enumerate(_CORNERS):
        out[0] = out[0].at[dx:dx + NXd, dy:dy + NY].add(fp[2 * a])
        out[1] = out[1].at[dx:dx + NXd, dy:dy + NY].add(fp[2 * a + 1])
    return (out[0], out[1])


def _contract(Kp, up):
    """fp_i = sum_j Kp[i, j] * up_j (lane-wide fused multiply-adds)."""
    return tuple(sum(Kp[i, j] * up[j] for j in range(8)) for i in range(8))


def _local_apply(Kp, vm, NXd, NY, nnY):
    """Strip-local K @ vm (no BC rows, no halo): the per-strip block has
    the same element/node structure as a single-chip grid, so the fused
    Pallas stencil kernel applies per strip when the shapes admit it —
    shard_map composes with pallas_call, each device runs the kernel on
    its own (NXd, NY) block at the single-pass HBM bound."""
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops import stencil_pallas as sp
    if (fek.USE_STENCIL is not False and Kp.dtype == jnp.float32
            and NXd >= 128 and sp.auto_tile(NXd, NY) > 0
            and (fek.USE_STENCIL
                 or (fek._stencil_default_on() and fek._on_tpu()))):
        # forced-on off TPU (tests) runs the kernel interpreter
        return sp.k_apply_stencil(Kp, vm[0], vm[1],
                                  TX=sp.auto_tile(NXd, NY),
                                  interpret=not fek._on_tpu(),
                                  vma=('x',))
    fp = _contract(Kp, _gather_local(vm, NXd, NY))
    return _scatter_local(fp, NXd, NY, nnY)


def element_Ke_planes(sm: StripMesh, el_loc):
    """Local element stiffness planes (8, 8, NXd, NY) from the local tangent
    blocks (nel_loc, 6, 6) — same static (64, 36) MXU contraction as the
    single-chip path."""
    els = el_loc.reshape(sm.NXd * sm.NY, 36).T.reshape(36, sm.NXd, sm.NY)
    M = sm.jacw * jnp.einsum('gai,gbj->ijab', sm.B, sm.B,
                             preferred_element_type=els.dtype,
                             precision=jax.lax.Precision.HIGHEST)
    Kp = jnp.einsum('kl,lxy->kxy', M.reshape(64, 36), els,
                    preferred_element_type=els.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    return Kp.reshape(8, 8, sm.NXd, sm.NY)


def make_k_apply(sm: StripMesh):
    """shard_map'ed matrix-free K-apply with halo exchange; vectors are
    per-component plane tuples of (D, NXd+1, nnY) sharded arrays, the
    element stiffness a (D, nel_loc, 6, 6) tangent block array."""
    NXd, NY, nnY = sm.NXd, sm.NY, sm.nnY

    # check_vma=False: the Pallas stencil's scratch-ref stores discharge to
    # dynamic_update_slice in interpreter mode, which the varying-mesh-axes
    # checker cannot type (the workaround its error message recommends)
    @partial(shard_map, mesh=sm.mesh,
             in_specs=(P('x'), (P('x'), P('x')), (P('x'), P('x'))),
             out_specs=(P('x'), P('x')), check_vma=False)
    def k_apply(el_loc, v_loc, fixed_loc):
        Kp = element_Ke_planes(sm, el_loc[0])
        v = tuple(x[0] for x in v_loc)
        fixed = tuple(f[0] for f in fixed_loc)
        vm = tuple(jnp.where(f, 0., x) for f, x in zip(fixed, v))
        out = _local_apply(Kp, vm, NXd, NY, nnY)
        out = _halo_accumulate(out)
        out = tuple(jnp.where(f, x, o) for f, x, o in zip(fixed, v, out))
        return tuple(o[None] for o in out)

    return k_apply


def make_dot(sm: StripMesh):
    """Global dot product that counts duplicated columns once."""

    @partial(shard_map, mesh=sm.mesh,
             in_specs=((P('x'), P('x')), (P('x'), P('x')),
                       (P('x'), P('x'))), out_specs=P())
    def gdot(a, b, own):
        loc = sum(jnp.sum(x * y * w) for x, y, w in zip(a, b, own))
        return jax.lax.psum(loc, 'x')

    return gdot


def make_schwarz_mg(sm: StripMesh, elstiff_blocks, min_size=8):
    """Additive-Schwarz preconditioner with a local multigrid V-cycle per
    strip: each device solves its own subdomain (Dirichlet conditions at
    strip interfaces) with the geometric multigrid of ``ops.multigrid`` —
    zero communication inside the preconditioner, mesh-size-independent
    strength per strip."""
    from pylabfea_tpu.ops import multigrid as mg
    md_loc = fek.rect_mesh(sm.NXd, sm.NY,
                           LX=sm.lx * sm.NXd, LY=sm.ly * sm.NY,
                           uniax='y', eps_tot=0., dtype=sm.dtype)
    D = sm.D

    @partial(shard_map, mesh=sm.mesh,
             in_specs=((P('x'), P('x')), P('x'), (P('x'), P('x')),
                       (P('x'), P('x'))),
             out_specs=(P('x'), P('x')))
    def precon(r_blocks, el_blocks, fixed_blocks, diag_blocks):
        r = tuple(x[0] for x in r_blocks)
        els = el_blocks[0]
        idx = jax.lax.axis_index('x')
        # Dirichlet at interior strip interfaces (left col for d>0, right
        # col for d<D-1), plus the global BC mask of this strip
        gfix = tuple(f[0] for f in fixed_blocks)
        left_if = jnp.where(idx > 0, True, False)
        right_if = jnp.where(idx < D - 1, True, False)
        fix = tuple(f.at[0].set(f[0] | left_if)
                     .at[-1].set(f[-1] | right_if) for f in gfix)
        # fe_kernels stores the grid mask stacked (2, nnX, nnY); the MG
        # levels split it back into plane tuples
        md_d = md_loc._replace(fixed=jnp.stack(fix, 0))
        levels = mg.build_hierarchy(md_d, els, min_size=min_size)
        # coarse levels inherit the *generator's* masks (approximate but
        # SPD-safe as a preconditioner)
        z = mg.v_cycle(levels, tuple(jnp.where(f, 0., x)
                                     for f, x in zip(fix, r)))
        # the local solve is Dirichlet (z = 0) on the interface columns; a
        # Jacobi patch there keeps the preconditioner nonsingular/SPD
        diag = tuple(d[0] for d in diag_blocks)
        out = []
        for c in range(2):
            iface = fix[c] & ~gfix[c]
            out.append(jnp.where(iface, r[c] / diag[c], z[c])[None])
        return tuple(out)

    return precon


def _coarse_weights(sm: StripMesh, nyc=None):
    """Separable bilinear weights for the strip-spanning coarse space of the
    two-level Schwarz preconditioner: coarse x-nodes at the strip boundaries
    (one per interface + domain edges), ``nyc`` coarse y-nodes.  Returns
    (Wx_blocks (D, NXd+1, D+1) sharded, Wy (nnY, nyc) replicated, nyc)."""
    D, NXd, nnY = sm.D, sm.NXd, sm.nnY
    nyc = min(nnY, 9) if nyc is None else min(nnY, nyc)
    xc = np.arange(D + 1) * NXd
    Wx = np.zeros((D, NXd + 1, D + 1))
    for d in range(D):
        xg = d * NXd + np.arange(NXd + 1)
        for i in range(D + 1):
            e = np.zeros(D + 1)
            e[i] = 1.
            Wx[d, :, i] = np.interp(xg, xc, e)
    yc = np.linspace(0., nnY - 1., nyc)
    k = np.arange(nnY)
    Wy = np.zeros((nnY, nyc))
    for m in range(nyc):
        e = np.zeros(nyc)
        e[m] = 1.
        Wy[:, m] = np.interp(k, yc, e)
    Wx_b = jax.device_put(jnp.asarray(Wx, sm.dtype),
                          NamedSharding(sm.mesh, P('x')))
    return Wx_b, jnp.asarray(Wy, sm.dtype), nyc


def build_coarse_inv(sm: StripMesh, elstiff_blocks, nyc=None):
    """Galerkin coarse operator Kc = P^T K P of the strip-spanning coarse
    space, assembled from per-device element contributions (one batched
    K-apply of all coarse basis functions, psum'd), then inverted
    redundantly on every device.  The duplicated boundary columns hold
    *partial* element sums per device, so the plain P^T followed by psum
    assembles each element exactly once."""
    NXd, NY, nnY, D = sm.NXd, sm.NY, sm.nnY, sm.D
    Wx_b, Wy, nyc = _coarse_weights(sm, nyc)
    nc2 = (D + 1) * nyc * 2

    @partial(shard_map, mesh=sm.mesh,
             in_specs=(P('x'), P('x'), (P('x'), P('x'))), out_specs=P())
    def assemble(el_b, Wx_bb, fixed_b):
        Kp = element_Ke_planes(sm, el_b[0])
        Wx = Wx_bb[0]
        gfix = tuple(f[0] for f in fixed_b)
        eye = jnp.eye(nc2, dtype=sm.dtype).reshape(nc2, D + 1, nyc, 2)

        def prolong(c):
            z = jnp.einsum('ja,kb,abc->cjk', Wx, Wy, c)
            return tuple(jnp.where(gfix[i], 0., z[i]) for i in range(2))

        def lapply(v):
            fp = _contract(Kp, _gather_local(v, NXd, NY))
            out = _scatter_local(fp, NXd, NY, nnY)
            return tuple(jnp.where(gfix[i], 0., out[i]) for i in range(2))

        def restrict(v):
            return jnp.einsum('ja,kb,cjk->abc', Wx, Wy,
                              jnp.stack(v, 0)).reshape(-1)

        def column(e):
            return restrict(lapply(prolong(e)))

        Kc_loc = jax.vmap(column)(eye)
        return jax.lax.psum(Kc_loc, 'x')

    Kc = assemble(elstiff_blocks, Wx_b, sm.fixed)
    # coarse dofs with (near-)empty support after Dirichlet masking would
    # make Kc singular — replace them by identity rows/cols
    dKc = jnp.diagonal(Kc)
    bad = dKc <= 1e-10 * jnp.max(dKc)
    Kc = jnp.where(bad[:, None] | bad[None, :], 0., Kc)
    Kc = Kc + jnp.diag(jnp.where(bad, 1., 0.).astype(Kc.dtype))
    return jnp.linalg.inv(Kc), Wx_b, Wy, nyc


def make_schwarz_two_level(sm: StripMesh, elstiff_blocks, min_size=8,
                           nyc=None):
    """Two-level additive Schwarz: local multigrid V-cycle per strip
    (``make_schwarz_mg``) PLUS a coarse correction on the strip-spanning
    coarse grid — the coarse space carries the long-range coupling that
    one-level Schwarz cannot, making iteration counts (nearly) independent
    of the number of strips.  M^-1 r = M_schwarz^-1 r + P Kc^-1 P^T r."""
    local_pre = make_schwarz_mg(sm, elstiff_blocks, min_size=min_size)
    Kc_inv, Wx_b, Wy, nyc = build_coarse_inv(sm, elstiff_blocks, nyc)
    D = sm.D

    @partial(shard_map, mesh=sm.mesh,
             in_specs=((P('x'), P('x')), (P('x'), P('x')),
                       (P('x'), P('x')), P(), P('x')),
             out_specs=(P('x'), P('x')))
    def coarse_corr(r_blocks, fixed_blocks, own_blocks, Kc_inv_r, Wx_bb):
        r = tuple(x[0] for x in r_blocks)
        gfix = tuple(f[0] for f in fixed_blocks)
        own = tuple(w[0] for w in own_blocks)
        Wx = Wx_bb[0]
        # count duplicated columns once
        rm = jnp.stack([jnp.where(gfix[c], 0., r[c]) * own[c]
                        for c in range(2)], 0)
        rc = jnp.einsum('ja,kb,cjk->abc', Wx, Wy, rm).reshape(-1)
        rc = jax.lax.psum(rc, 'x')
        c = (Kc_inv_r @ rc).reshape(D + 1, nyc, 2)
        zc = jnp.einsum('ja,kb,abc->cjk', Wx, Wy, c)
        return tuple(jnp.where(gfix[i], 0., zc[i])[None] for i in range(2))

    def precon(r, el_blocks, fixed_blocks, diag_blocks):
        z = local_pre(r, el_blocks, fixed_blocks, diag_blocks)
        zc = coarse_corr(r, fixed_blocks, sm.own, Kc_inv, Wx_b)
        return tuple(a + b for a, b in zip(z, zc))

    return precon


def cg_solve_strip(sm: StripMesh, el_blocks, rhs, x0, diag, tol=1e-8,
                   maxiter=1000, precon=None):
    """Preconditioned CG on the strip-decomposed operator.  All vectors
    live as per-component plane tuples of (D, NXd+1, nnY) sharded blocks;
    per-iteration communication is the two-column halo exchange plus scalar
    psums.  ``precon`` is an optional block preconditioner (e.g.
    ``make_schwarz_two_level``); default is Jacobi.  ``el_blocks`` is the
    (D, nel_loc, 6, 6) tangent field (the element stiffness planes are
    rebuilt inside the K-apply, fused with its consumers)."""
    k_apply = make_k_apply(sm)
    gdot = make_dot(sm)
    A = lambda v: k_apply(el_blocks, v, sm.fixed)
    if precon is None:
        minv = tuple(1. / d for d in diag)
        M = lambda r: tuple(m * q for m, q in zip(minv, r))
    else:
        M = precon
    Ax0 = A(x0)
    r0 = tuple(b - a for b, a in zip(rhs, Ax0))
    bnorm = jnp.maximum(jnp.sqrt(gdot(rhs, rhs, sm.own)), 1e-30)
    p0 = tuple(jnp.zeros_like(q) for q in r0)

    def cond(s):
        x, r, p, rz, it = s
        return (jnp.sqrt(gdot(r, r, sm.own)) > tol * bnorm) & (it < maxiter)

    def body(s):
        x, r, p, rz_prev, it = s
        z = M(r)
        rz = gdot(r, z, sm.own)
        beta = jnp.where(it == 0, 0., rz / rz_prev)
        p = tuple(zi + beta * pi for zi, pi in zip(z, p))
        Ap = A(p)
        alpha = rz / gdot(p, Ap, sm.own)
        x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
        r = tuple(ri - alpha * ai for ri, ai in zip(r, Ap))
        return x, r, p, rz, it + 1

    x, r, p, rz, it = jax.lax.while_loop(
        cond, body, (x0, r0, p0, jnp.asarray(1., r0[0].dtype), 0))
    return x, jnp.sqrt(gdot(r, r, sm.own)) / bnorm, it


@partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 11))
def strip_load_step(sm: StripMesh, elstiff_blocks, sig_blocks, epl_blocks,
                    mat, load_frac=1.0, n_inner=2,
                    cg_tol=1e-8, nsub=4, schwarz=2, CVs=None, grouped=True):
    """One load step on the strip-decomposed mesh: CG solve (halo-exchange
    K-apply), element-local batched return map (zero communication), tangent
    update, re-solve, final consistent response.  ``schwarz=2`` (default)
    preconditions with two-level additive Schwarz; ``schwarz=True`` is the
    one-level variant; falsy is Jacobi.

    Multi-material strips: pass ``mat`` as a tuple of DeviceMaterials and
    ``CVs`` as the matching tuple of elastic stiffnesses; the mesh must
    carry per-element group ids (``StripMesh(mat_map=...)``).  The return
    map then runs GROUPED: each material's elements are gathered into a
    fixed per-strip capacity batch (``StripMesh.group_idx``, capacity =
    the max local count over strips so every device runs the same
    program), the per-material kernels run on only their own rows, and
    results come back through one hazard-free inverse-permutation gather
    — total constitutive cost O(sum_k cap_k) ~ O(Nel) for blocky material
    maps, communication-free (elements never leave their strip).
    ``grouped=False`` falls back to the masked multi-pass (one pass per
    material over ALL elements, O(nmat * Nel)) — the right choice for
    fine-interleaved maps where per-strip capacities degenerate toward
    Nel each.

    Returns updated (sig, epl, du, diagnostics)."""
    multi = isinstance(mat, (tuple, list)) \
        and not isinstance(mat, con.DeviceMaterial)
    CV = elstiff_blocks.reshape(-1, 6, 6)[0]  # elastic reference (single)
    bc = tuple(v * load_frac for v in sm.fixed_val)
    dt = sig_blocks.dtype

    def respond_grouped(sig_b, epl_b, deps_b):
        """Per-material gather -> batched return map -> inverse gather."""
        mats = list(mat)
        live = [k for k in range(len(mats)) if sm.group_caps[k] > 0]
        tabs = tuple(sm.group_idx[k] for k in live)

        # check_vma=False: response_fast seeds its loop carries from
        # literals (zeros), which the varying-manual-axes checker rejects
        # against the device-varying outputs; the body is collective-free,
        # so the check adds nothing here
        @partial(shard_map, mesh=sm.mesh,
                 in_specs=(P('x'), P('x'), P('x'), P('x'),
                           (P('x'),) * len(tabs)),
                 out_specs=(P('x'), P('x'), P('x'), P('x')),
                 check_vma=False)
        def body(sig_bb, epl_bb, deps_bb, inv_b, tab_b):
            sig_l, epl_l, deps_l = sig_bb[0], epl_bb[0], deps_bb[0]
            outs = []
            for k, tab in zip(live, tab_b):
                idx = tab[0]
                CVk = jnp.asarray(CVs[k], dt)
                outs.append(con.response_fast(
                    mats[k], (sig_l[idx], epl_l[idx]), deps_l[idx],
                    CVk, 12, nsub))
            inv = inv_b[0]
            cat = tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                        for i in range(4))
            return tuple(c[inv][None] for c in cat)

        return body(sig_b, epl_b, deps_b, sm.group_inv, tabs)

    def respond(sig_b, epl_b, deps_b):
        if not multi:
            return con.response_fast(
                mat, (sig_b.reshape(-1, 6), epl_b.reshape(-1, 6)),
                deps_b.reshape(-1, 6), CV, 12, nsub)
        if grouped and getattr(sm, 'group_idx', None) is not None:
            fy, sig_n, depl_n, grad = respond_grouped(sig_b, epl_b, deps_b)
            return (fy.reshape(-1), sig_n.reshape(-1, 6),
                    depl_n.reshape(-1, 6), grad.reshape(-1, 6, 6))
        sig_rows = sig_b.reshape(-1, 6)
        epl_rows = epl_b.reshape(-1, 6)
        deps_rows = deps_b.reshape(-1, 6)
        ids = sm.mat_ids.reshape(-1)
        out = None
        for k, mk in enumerate(mat):
            CVk = jnp.asarray(CVs[k], sig_rows.dtype)
            ok = con.response_fast(mk, (sig_rows, epl_rows), deps_rows,
                                   CVk, 12, nsub)
            if out is None:
                out = ok
            else:
                sel = ids == k
                out = tuple(jnp.where(sel.reshape((-1,) + (1,) * (o.ndim - 1)),
                                      o, prev)
                            for prev, o in zip(out, ok))
        return out

    def diag_of(el_blocks):
        @partial(shard_map, mesh=sm.mesh,
                 in_specs=(P('x'), (P('x'), P('x'))),
                 out_specs=(P('x'), P('x')))
        def dcalc(el_loc, fixed_loc):
            Kp = element_Ke_planes(sm, el_loc[0])
            de = tuple(Kp[i, i] for i in range(8))
            d = _scatter_local(de, sm.NXd, sm.NY, sm.nnY)
            d = _halo_accumulate(d)
            fixed = tuple(f[0] for f in fixed_loc)
            return tuple(jnp.where(f, 1., x)[None]
                         for f, x in zip(fixed, d))
        return dcalc(el_blocks, sm.fixed)

    # Build the Schwarz preconditioner ONCE per load step from the entry
    # tangent field: the coarse inverse (dense jnp.linalg.inv of the
    # strip-spanning coarse operator) was previously rebuilt inside every
    # inner-iteration solve although a frozen preconditioner stays SPD and
    # nearly as effective — the local V-cycle still sees the CURRENT
    # tangents through its call-time el_blocks argument.
    pre = None
    if schwarz:
        pre = make_schwarz_two_level(sm, elstiff_blocks) if schwarz == 2 \
            else make_schwarz_mg(sm, elstiff_blocks)

    def solve_with(el_blocks, x0=None):
        k_apply = make_k_apply(sm)
        du_bc = tuple(jnp.where(f, b, 0.)
                      for f, b in zip(sm.fixed, bc))
        zmask = tuple(jnp.zeros_like(f) for f in sm.fixed)
        neg = k_apply(el_blocks, du_bc, zmask)
        rhs = tuple(jnp.where(f, b, fr * load_frac - q)
                    for f, b, fr, q in zip(sm.fixed, bc, sm.force, neg))
        diag = diag_of(el_blocks)
        M = None
        if pre is not None:
            M = lambda r: pre(r, el_blocks, sm.fixed, diag)
        # warm-start from the previous equilibrium iteration's increment
        # (recycled Krylov; BC rows overwritten with the prescribed values)
        start = du_bc if x0 is None else tuple(
            jnp.where(f, b, x) for f, b, x in zip(sm.fixed, bc, x0))
        du, res, it = cg_solve_strip(sm, el_blocks, rhs, start, diag,
                                     tol=cg_tol, precon=M)
        return du, res, it

    @partial(shard_map, mesh=sm.mesh, in_specs=((P('x'), P('x')),),
             out_specs=P('x'))
    def deps_of(du_blocks):
        up = _gather_local(tuple(x[0] for x in du_blocks), sm.NXd, sm.NY)
        planes = [sum(sm.Bsum[a, i] * up[i] for i in range(8))
                  for a in range(6)]
        return jnp.stack(planes, -1).reshape(sm.NXd * sm.NY, 6)[None]

    du, res, it = solve_with(elstiff_blocks)
    elstiff = elstiff_blocks
    for _ in range(n_inner):
        deps = deps_of(du)
        fy, sig_n, depl_n, grad = respond(sig_blocks, epl_blocks, deps)
        grad_b = grad.reshape(elstiff.shape)
        dst = jnp.linalg.norm((elstiff - grad_b).reshape(grad_b.shape[0], -1,
                                                         36), axis=2)
        elstiff = jnp.where((dst > 1e-3)[..., None, None], grad_b, elstiff)
        du, res, it = solve_with(elstiff, x0=du)
    deps = deps_of(du)
    fy, sig_n, depl_n, grad = respond(sig_blocks, epl_blocks, deps)
    sig_new = sig_n.reshape(sig_blocks.shape)
    epl_new = epl_blocks + depl_n.reshape(epl_blocks.shape)
    diag = {'cg_res': res, 'cg_iters': it,
            'glob_sig': jnp.mean(sig_n, axis=0),
            'glob_epl': jnp.mean(epl_new.reshape(-1, 6), axis=0)}
    return sig_new, epl_new, du, diag
