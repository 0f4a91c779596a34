"""3-D domain decomposition: x-slabs with halo-plane exchange over ICI.

``parallel.mesh3d`` element-shards the 3-D solver and keeps nodal volumes
replicated — fine to ~256^3, but the scatter-add AllReduce moves O(Ndof)
per CG iteration.  This module is the scalable alternative, the 3-D lift
of ``parallel.sharded``: the structured box mesh is partitioned into
**x-slabs** under ``shard_map`` — device d owns element layers
[d*NXd, (d+1)*NXd) and the node layers they touch, with the shared
boundary LAYER duplicated between neighbors — and the only communication
per K-apply is a **ppermute halo exchange of one (nnY, nnZ) node plane
per direction** (O(nnY*nnZ) instead of O(Ndof)) plus scalar psums in the
CG dots.

Layout per device (the shard_map body sees the local block): nodal
vectors are tuples of per-component (NXd+1, nnY, nnZ) volumes (the
single-chip ``ops.fe3d`` volume convention — the large nnZ axis lands on
the TPU lane dimension), the tangent field is a (36, NXd, NY, NZ) volume
block, and every local apply/diagonal/hierarchy reuses the single-chip
fe3d kernels on a slab-local ``MeshData3D`` template.

The CG runs INSIDE one shard_map body (unlike the 2-D module's
composed pieces): the slab-local multigrid hierarchy — the additive-
Schwarz subdomain solve, Dirichlet at slab interfaces — is then built
once per linear solve instead of once per preconditioner application.
The optional two-level variant adds a slab-spanning coarse grid
(separable trilinear basis: coarse x-nodes at the slab interfaces,
nyc x nzc coarse y/z nodes) whose Galerkin operator is psum-assembled
and inverted redundantly, carrying the long-range coupling that keeps
iteration counts (nearly) independent of the slab count.

Note: the fused Pallas volume kernel stays off inside shard_map
(``fe3d._stencil3_ok`` cannot see a tracer's sharding and multi-device
processes gate it off); slabs apply through the unrolled XLA form on
TPU and the fori form on CPU.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import fe3d
from pylabfea_tpu.ops import fe_kernels as fek


class SlabMesh3:
    """Structured 3-D box mesh partitioned into x-slabs over a device
    mesh.  Device d of D owns element layers [d*NXd, (d+1)*NXd) and node
    layers [d*NXd, d*NXd + NXd] (the last plane shared with d+1); nodal
    fields are tuples of per-component (D, NXd+1, nnY, nnZ) sharded
    volumes, element fields (D, NXd*NY*NZ, ...) sharded blocks in the
    slab-local raster order e = (ex*NY + ey)*NZ + ez."""

    def __init__(self, NX, NY, NZ, LX=1., LY=1., LZ=1., uniax='z',
                 eps_tot=0.01, n_devices=None, dtype=jnp.float32,
                 bc=None, mat_map=None):
        devs = jax.devices() if n_devices is None \
            else jax.devices()[:n_devices]
        D = len(devs)
        if NX % D:
            raise ValueError(f'NX={NX} must be divisible by {D} devices')
        self.mesh = Mesh(np.array(devs), ('x',))
        self.D = D
        self.NX, self.NY, self.NZ = NX, NY, NZ
        self.NXd = NX // D
        self.nnY, self.nnZ = NY + 1, NZ + 1
        self.dtype = dtype
        # slab-local single-chip mesh template: geometry/grid metadata for
        # every local apply, diagonal, deps and hierarchy build (its BC
        # fields are unused — the slab masks below replace them)
        self.md_loc = fe3d.box_mesh(self.NXd, NY, NZ,
                                    LX=LX * self.NXd / NX, LY=LY, LZ=LZ,
                                    uniax='none', eps_tot=0., dtype=dtype)
        sh = NamedSharding(self.mesh, P('x'))

        # global BC volumes (3, nnX, nnY, nnZ): general face spec or the
        # uniaxial-stress defaults of fe3d.box_mesh
        if bc is not None:
            gfix, gval, gforce = fe3d.make_face_bcs(NX, NY, NZ, **bc)
        else:
            ax = {'x': 0, 'y': 1, 'z': 2}[uniax] if uniax != 'none' \
                else None
            spec = dict(xlo={0: ('disp', 0.)}, ylo={1: ('disp', 0.)},
                        zlo={2: ('disp', 0.)})
            if ax is not None:
                hi = ('xhi', 'yhi', 'zhi')[ax]
                Ltot = (LX, LY, LZ)[ax]
                spec[hi] = {ax: ('disp', eps_tot * Ltot)}
            gfix, gval, gforce = fe3d.make_face_bcs(NX, NY, NZ, **spec)

        # per-device slabs with the DUPLICATED boundary plane; nodal
        # values (incl. external forces) are consistent on both copies —
        # the `own` weights count them once in reductions
        def slabs(g):
            out = np.zeros((3, D, self.NXd + 1, self.nnY, self.nnZ),
                           dtype=np.asarray(g).dtype)
            for d in range(D):
                out[:, d] = np.asarray(g)[
                    :, d * self.NXd: d * self.NXd + self.NXd + 1]
            return out

        fixed = slabs(gfix)
        val = slabs(gval)
        force = slabs(gforce)
        self.fixed = tuple(jax.device_put(jnp.asarray(fixed[c]), sh)
                           for c in range(3))
        self.fixed_val = tuple(
            jax.device_put(jnp.asarray(val[c], dtype=dtype), sh)
            for c in range(3))
        self.force = tuple(
            jax.device_put(jnp.asarray(force[c], dtype=dtype), sh)
            for c in range(3))
        own = np.ones((D, self.NXd + 1, self.nnY, self.nnZ))
        own[:-1, -1] = 0.   # shared plane counts on the right slab only
        own_arr = jax.device_put(jnp.asarray(own, dtype=dtype), sh)
        self.own = (own_arr, own_arr, own_arr)
        # global flat element order is x-major, so slab blocking of
        # (Nel, ...) element arrays is a plain reshape
        if mat_map is not None:
            ids = np.asarray(mat_map, dtype=np.int32).reshape(NX * NY * NZ)
            self.mat_ids = jax.device_put(
                jnp.asarray(ids.reshape(D, -1)), sh)
        else:
            self.mat_ids = None

    @property
    def nel_loc(self):
        return self.NXd * self.NY * self.NZ

    def zeros_u(self):
        sh = NamedSharding(self.mesh, P('x'))
        z = jax.device_put(
            jnp.zeros((self.D, self.NXd + 1, self.nnY, self.nnZ),
                      self.dtype), sh)
        return (z, z, z)

    def shard_elements(self, arr_global):
        """(Nel, ...) element array -> (D, nel_loc, ...) sharded blocks."""
        arr_global = jnp.asarray(arr_global, dtype=self.dtype)
        blocked = arr_global.reshape(self.D, self.nel_loc,
                                     *arr_global.shape[1:])
        return jax.device_put(blocked, NamedSharding(self.mesh, P('x')))

    def elstiff_blocks(self, CV):
        """Initial (D, 36, NXd, NY, NZ) tangent blocks from one elastic
        stiffness (or per-element (Nel, 6, 6) rows)."""
        CV = np.asarray(CV)
        if CV.ndim == 2:
            rows = np.broadcast_to(CV, (self.NX * self.NY * self.NZ, 6, 6))
        else:
            rows = CV
        vols = rows.reshape(self.D, self.nel_loc, 36).transpose(0, 2, 1) \
            .reshape(self.D, 36, self.NXd, self.NY, self.NZ)
        return jax.device_put(jnp.asarray(vols, self.dtype),
                              NamedSharding(self.mesh, P('x')))

    def gather_u(self, u_blocks):
        """Sharded slab tuple -> global (3, nnX, nnY, nnZ) host volume
        (drops the duplicated planes)."""
        comps = []
        for c in range(3):
            b = np.asarray(u_blocks[c])
            parts = [b[d][:-1] for d in range(self.D - 1)] + [b[-1]]
            comps.append(np.concatenate(parts, axis=0))
        return np.stack(comps, 0)


def _halo_accumulate3_vol(out):
    """Complete the partial sums on the duplicated boundary planes of one
    (NXd+1, nnY, nnZ) volume: send the last plane right, add into the
    receiver's first plane, then copy the completed first plane back to
    the left neighbor's last — one ppermute per direction over the ICI
    ring (the 2-D ``sharded._halo_accumulate_plane`` on planes)."""
    D = jax.lax.axis_size('x')
    if D == 1:
        return out
    send_r = out[-1]
    recv_r = jax.lax.ppermute(send_r, 'x',
                              [(i, (i + 1) % D) for i in range(D)])
    idx = jax.lax.axis_index('x')
    out = out.at[0].add(jnp.where(idx > 0, 1., 0.) * recv_r)
    send_l = out[0]
    recv_l = jax.lax.ppermute(send_l, 'x',
                              [(i, (i - 1) % D) for i in range(D)])
    out = out.at[-1].set(jnp.where(idx < D - 1, recv_l, out[-1]))
    return out


def _halo_accumulate3(out):
    return tuple(_halo_accumulate3_vol(p) for p in out)


def _coarse_weights3(sm: SlabMesh3, nyc=None, nzc=None):
    """Separable trilinear weights of the slab-spanning coarse space:
    coarse x-nodes at the slab interfaces (D+1), ``nyc``/``nzc`` coarse
    y/z nodes.  Returns (Wx_blocks (D, NXd+1, D+1) sharded, Wy, Wz
    replicated, nyc, nzc)."""
    D, NXd = sm.D, sm.NXd
    nyc = min(sm.nnY, 5) if nyc is None else min(sm.nnY, nyc)
    nzc = min(sm.nnZ, 5) if nzc is None else min(sm.nnZ, nzc)
    xc = np.arange(D + 1) * NXd
    Wx = np.zeros((D, NXd + 1, D + 1))
    for d in range(D):
        xg = d * NXd + np.arange(NXd + 1)
        for i in range(D + 1):
            e = np.zeros(D + 1)
            e[i] = 1.
            Wx[d, :, i] = np.interp(xg, xc, e)

    def wmat(nn, nc):
        yc = np.linspace(0., nn - 1., nc)
        k = np.arange(nn)
        W = np.zeros((nn, nc))
        for m in range(nc):
            e = np.zeros(nc)
            e[m] = 1.
            W[:, m] = np.interp(k, yc, e)
        return W

    Wx_b = jax.device_put(jnp.asarray(Wx, sm.dtype),
                          NamedSharding(sm.mesh, P('x')))
    return (Wx_b, jnp.asarray(wmat(sm.nnY, nyc), sm.dtype),
            jnp.asarray(wmat(sm.nnZ, nzc), sm.dtype), nyc, nzc)


def build_coarse_inv3(sm: SlabMesh3, C_blocks, nyc=None, nzc=None,
                      fixed=None):
    """Galerkin coarse operator Kc = P^T K P of the slab-spanning coarse
    space, psum-assembled from per-slab element contributions (the
    duplicated boundary planes hold PARTIAL sums per device, so plain
    local applies psum to the exact assembly), then inverted redundantly
    on every device.  Sequential ``lax.map`` over the coarse basis keeps
    peak memory at one local apply.

    ``fixed`` passes the slab BC masks explicitly — required when called
    inside a jitted program in a MULTI-PROCESS runtime, where closing
    over ``sm.fixed`` (an array spanning non-addressable devices) is an
    error."""
    Wx_b, Wy, Wz, nyc, nzc = _coarse_weights3(sm, nyc, nzc)
    D = sm.D
    nc = (D + 1) * nyc * nzc * 3
    md_loc = sm.md_loc

    @partial(shard_map, mesh=sm.mesh,
             in_specs=(P('x'), P('x'), (P('x'),) * 3), out_specs=P())
    def assemble(C_b, Wx_bb, fixed_b):
        Cp = C_b[0]
        Wx = Wx_bb[0]
        gfix = tuple(f[0] for f in fixed_b)
        eye = jnp.eye(nc, dtype=sm.dtype).reshape(nc, D + 1, nyc, nzc, 3)

        def prolong(c):
            z = jnp.einsum('ja,kb,lc,abcd->djkl', Wx, Wy, Wz, c)
            return tuple(jnp.where(gfix[i], 0., z[i]) for i in range(3))

        def lapply(v):
            out = fe3d._k_apply3_raw(md_loc, Cp, v)
            return tuple(jnp.where(gfix[i], 0., out[i]) for i in range(3))

        def restrict(v):
            return jnp.einsum('ja,kb,lc,djkl->abcd', Wx, Wy, Wz,
                              jnp.stack(v, 0)).reshape(-1)

        Kc_loc = jax.lax.map(lambda e: restrict(lapply(prolong(e))), eye)
        return jax.lax.psum(Kc_loc, 'x')

    Kc = assemble(C_blocks, Wx_b, sm.fixed if fixed is None else fixed)
    # coarse dofs with (near-)empty support after Dirichlet masking would
    # make Kc singular — replace them by identity rows/cols
    dKc = jnp.diagonal(Kc)
    bad = dKc <= 1e-10 * jnp.max(dKc)
    Kc = jnp.where(bad[:, None] | bad[None, :], 0., Kc)
    Kc = Kc + jnp.diag(jnp.where(bad, 1., 0.).astype(Kc.dtype))
    return jnp.linalg.inv(Kc), Wx_b, Wy, Wz, nyc, nzc


def make_slab_cg3(sm: SlabMesh3, two_level=True, nu=2):
    """Preconditioned CG on the slab-decomposed operator, the WHOLE loop
    inside one shard_map body: per iteration one halo-plane exchange (the
    K-apply) + scalar psums (the dots); the preconditioner is a slab-local
    multigrid V-cycle (Dirichlet at slab interfaces — additive Schwarz)
    built ONCE per solve, plus (``two_level``) the coarse correction
    P Kc^-1 P^T r.

    Returns ``cg(C_blocks, rhs, x0, coarse) -> (x, relres, iters)`` where
    ``coarse`` is the (Kc_inv, Wx_b, Wy, Wz, nyc, nzc) tuple of
    ``build_coarse_inv3`` (pass None/ignored when two_level=False)."""
    md_loc = sm.md_loc
    D = sm.D

    # check_vma=False: the varying-manual-axes checker rejects literal-
    # seeded loop carries against device-varying outputs (the 2-D module's
    # documented workaround); the body's collectives are explicit.
    @partial(shard_map, mesh=sm.mesh,
             in_specs=(P('x'), (P('x'),) * 3, (P('x'),) * 3,
                       (P('x'),) * 3, (P('x'),) * 3,
                       P(), P('x'), P(), P(), P(), P()),
             out_specs=((P('x'),) * 3, P(), P()), check_vma=False)
    def cg(C_b, rhs_b, x0_b, fixed_b, own_b, Kc_inv, Wx_bb, Wy, Wz,
           tol, maxiter):
        Cp = C_b[0]
        rhs = tuple(x[0] for x in rhs_b)
        x0 = tuple(x[0] for x in x0_b)
        gfix = tuple(f[0] for f in fixed_b)
        own = tuple(w[0] for w in own_b)
        Wx = Wx_bb[0]
        idx = jax.lax.axis_index('x')

        def A(v):
            vm = tuple(jnp.where(f, 0., x) for f, x in zip(gfix, v))
            out = fe3d._k_apply3_raw(md_loc, Cp, vm)
            out = _halo_accumulate3(out)
            return tuple(jnp.where(f, x, o)
                         for f, x, o in zip(gfix, v, out))

        def gdot(a, b):
            loc = sum(jnp.sum(x * y * w) for x, y, w in zip(a, b, own))
            return jax.lax.psum(loc, 'x')

        # slab-local hierarchy with Dirichlet at interior interfaces —
        # built once per solve (trace-time Python; runtime cost is the
        # per-level diagonals + lmax power iterations)
        left_if = idx > 0
        right_if = idx < D - 1
        fix_loc = tuple(f.at[0].set(f[0] | left_if)
                         .at[-1].set(f[-1] | right_if) for f in gfix)
        md_d = md_loc._replace(fixed=jnp.stack(fix_loc, 0))
        levels = fe3d.build_hierarchy3(md_d, Cp)
        diag = fe3d.k_diag3_t(md_loc, Cp, gfix)
        diag = _halo_accumulate3(diag)   # assemble across the interface

        def M(r):
            rm = tuple(jnp.where(f, 0., x) for f, x in zip(fix_loc, r))
            z = fe3d.v_cycle3(levels, rm, nu=nu)
            # Dirichlet interface planes get a Jacobi patch (keeps the
            # additive preconditioner nonsingular/SPD there)
            out = []
            for c in range(3):
                iface = fix_loc[c] & ~gfix[c]
                out.append(jnp.where(iface, r[c] / diag[c], z[c]))
            z = tuple(out)
            if two_level:
                rm2 = jnp.stack([jnp.where(gfix[c], 0., r[c]) * own[c]
                                 for c in range(3)], 0)
                rc = jnp.einsum('ja,kb,lc,djkl->abcd', Wx, Wy, Wz,
                                rm2).reshape(-1)
                rc = jax.lax.psum(rc, 'x')
                c = (Kc_inv @ rc).reshape(D + 1, Wy.shape[1],
                                          Wz.shape[1], 3)
                zc = jnp.einsum('ja,kb,lc,abcd->djkl', Wx, Wy, Wz, c)
                z = tuple(z[i] + jnp.where(gfix[i], 0., zc[i])
                          for i in range(3))
            return z

        Ax0 = A(x0)
        r0 = tuple(jnp.where(f, 0., b - a)
                   for f, b, a in zip(gfix, rhs, Ax0))
        bnorm = jnp.maximum(jnp.sqrt(gdot(rhs, rhs)), 1e-30)
        p0 = tuple(jnp.zeros_like(q) for q in r0)
        rn0 = jnp.sqrt(gdot(r0, r0))
        b_f32 = r0[0].dtype == jnp.float32

        def cond(s):
            x, r, p, rz, it, best, nstall, rn = s
            return (rn > tol * bnorm) & (it < maxiter) & (nstall < 4)

        def body(s):
            x, r, p, rz_prev, it, best, nstall, _ = s
            z = M(r)
            rz = gdot(r, z)
            beta = jnp.where(it == 0, 0., rz / rz_prev)
            p = tuple(zi + beta * pi for zi, pi in zip(z, p))
            Ap = A(p)
            alpha = rz / gdot(p, Ap)
            x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
            r = tuple(jnp.where(f, 0., ri - alpha * ai)
                      for f, ri, ai in zip(gfix, r, Ap))
            rn = jnp.sqrt(gdot(r, r))
            # f32 stall exit (fe3d.mg_cg_solve3 contract)
            if b_f32:
                near_floor = rn < 1e-3 * bnorm
                nstall = jnp.where(rn < 0.95 * best, 0,
                                   jnp.where(near_floor, nstall + 1,
                                             nstall))
            return (x, r, p, rz, it + 1, jnp.minimum(best, rn), nstall,
                    rn)

        x, r, p, rz, it, _, _, rn = jax.lax.while_loop(
            cond, body,
            (x0, r0, p0, jnp.asarray(1., r0[0].dtype), 0, rn0, 0, rn0))
        return (tuple(xi[None] for xi in x), rn / bnorm, it)

    def solve(C_blocks, rhs, x0, coarse=None, tol=1e-8, maxiter=400,
              fixed=None, own=None):
        # explicit fixed/own for multi-process jit callers (closing over
        # sm's global arrays spans non-addressable devices there)
        fixed = sm.fixed if fixed is None else fixed
        own = sm.own if own is None else own
        if two_level:
            Kc_inv, Wx_b, Wy, Wz, nyc, nzc = coarse
        else:
            # unused placeholders (the body skips the coarse correction)
            Wx_b, Wy, Wz, nyc, nzc = _coarse_weights3(sm, 2, 2)
            Kc_inv = jnp.eye((sm.D + 1) * nyc * nzc * 3, dtype=sm.dtype)
        return cg(C_blocks, rhs, x0, fixed, own, Kc_inv, Wx_b,
                  Wy, Wz, jnp.asarray(tol, sm.dtype),
                  jnp.asarray(maxiter, jnp.int32))

    return solve


def make_deps3(sm: SlabMesh3):
    """Element strain increments from a slab displacement increment:
    (D, nel_loc, 6) sharded blocks."""
    md_loc = sm.md_loc

    @partial(shard_map, mesh=sm.mesh, in_specs=((P('x'),) * 3,),
             out_specs=P('x'))
    def deps_of(du_b):
        du = jnp.stack([x[0] for x in du_b], 0)
        return fe3d.element_deps3(md_loc, du)[None]

    return deps_of


def slab_load_step3(sm: SlabMesh3, C_blocks, sig_blocks, epl_blocks, mat,
                    load_frac=1.0, n_inner=2, cg_tol=None, nsub=4,
                    CVs=None, two_level=True):
    """One incremental load step on the slab-decomposed 3-D mesh: CG
    solve (halo-plane K-apply, two-level Schwarz), element-local batched
    return map (zero communication — the constitutive rows are sharded
    along 'x' and XLA partitions the elementwise map), change-gated
    tangent update, re-solve, final consistent response — the fe3d
    ``load_step3`` semantics under domain decomposition.

    Multi-material slabs: pass ``mat``/``CVs`` as tuples and build the
    mesh with ``mat_map``; the return map runs as the masked multi-pass
    (one pass per material — the per-slab capacity-table optimization of
    the 2-D module is a known next step for many-material 3-D maps).

    Returns (sig, epl, du_blocks, diagnostics)."""
    # the slab mesh's global arrays enter the jitted core as ARGUMENTS: a
    # multi-process runtime rejects jit closures over arrays that span
    # non-addressable devices (the single-process path is unaffected)
    arrs = (sm.fixed, sm.fixed_val, sm.force, sm.own, sm.mat_ids)
    return _slab_step3_core(sm, C_blocks, sig_blocks, epl_blocks, arrs,
                            mat, float(load_frac), n_inner, cg_tol, nsub,
                            CVs, bool(two_level))


@partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 11))
def _slab_step3_core(sm: SlabMesh3, C_blocks, sig_blocks, epl_blocks,
                     arrs, mat, load_frac, n_inner, cg_tol, nsub, CVs,
                     two_level):
    fixed, fixed_val, force, own, mat_ids = arrs
    dt = sig_blocks.dtype
    multi = isinstance(mat, (tuple, list)) \
        and not isinstance(mat, con.DeviceMaterial)
    if cg_tol is None:
        cg_tol = 1.e-11 if dt == jnp.float64 else 1.e-6
    bc = tuple(v * load_frac for v in fixed_val)
    solve_cg = make_slab_cg3(sm, two_level=two_level)
    deps_of = make_deps3(sm)
    md_loc = sm.md_loc

    @partial(shard_map, mesh=sm.mesh,
             in_specs=(P('x'), (P('x'),) * 3, (P('x'),) * 3),
             out_specs=(P('x'),) * 3, check_vma=False)
    def rhs_of(C_b, bc_b, fixed_b):
        Cp = C_b[0]
        bcv = tuple(x[0] for x in bc_b)
        gfix = tuple(f[0] for f in fixed_b)
        du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(gfix, bcv))
        neg = fe3d._k_apply3_raw(md_loc, Cp, du_bc)
        neg = _halo_accumulate3(neg)
        return tuple(jnp.where(f, b, -q)[None]
                     for f, b, q in zip(gfix, bcv, neg))

    def respond(sig_b, epl_b, deps_b):
        sig_rows = sig_b.reshape(-1, 6)
        epl_rows = epl_b.reshape(-1, 6)
        deps_rows = deps_b.reshape(-1, 6)
        if not multi:
            return con.response_fast(mat, (sig_rows, epl_rows), deps_rows,
                                     jnp.asarray(CVs, dt), 12, nsub)
        ids = mat_ids.reshape(-1)
        out = None
        for k, mk in enumerate(mat):
            CVk = jnp.asarray(CVs[k], dt)
            ok = con.response_fast(mk, (sig_rows, epl_rows), deps_rows,
                                   CVk, 12, nsub)
            if out is None:
                out = ok
            else:
                sel = ids == k
                out = tuple(
                    jnp.where(sel.reshape((-1,) + (1,) * (o.ndim - 1)),
                              o, prev) for prev, o in zip(out, ok))
        return out

    force_rhs = tuple(f * load_frac for f in force)

    def solve_with(el_blocks, coarse, x0=None):
        # rhs rebuilt with the CURRENT tangents (the BC lift -K@u_bc
        # changes with the tangent update, fe3d.load_step3 contract)
        rhs_bc = rhs_of(el_blocks, bc, fixed)
        rhs = tuple(jnp.where(f, r, r + q) for f, r, q in
                    zip(fixed, rhs_bc, force_rhs))
        start = tuple(jnp.where(f, b, 0. if x0 is None else x)
                      for f, b, x in zip(fixed, bc,
                                         x0 if x0 is not None else bc))
        return solve_cg(el_blocks, rhs, start, coarse, tol=cg_tol,
                        fixed=fixed, own=own)

    # Schwarz coarse inverse built once per step from the ENTRY tangents:
    # preconditioner staleness only costs iterations, never correctness
    coarse = build_coarse_inv3(sm, C_blocks, fixed=fixed) \
        if two_level else None
    du, res, it = solve_with(C_blocks, coarse)
    elstiff = C_blocks
    for _ in range(n_inner):
        deps = deps_of(du)
        fy, sig_n, depl_n, grad = respond(sig_blocks, epl_blocks, deps)
        grad_b = grad.reshape(sm.D, sm.nel_loc, 36).transpose(0, 2, 1) \
            .reshape(elstiff.shape)
        dst = jnp.sqrt(jnp.sum((elstiff - grad_b) ** 2, axis=1,
                               keepdims=True))
        elstiff = jnp.where(dst > 1.e-3, grad_b, elstiff)
        du, res, it = solve_with(elstiff, coarse, x0=du)
    deps = deps_of(du)
    fy, sig_n, depl_n, grad = respond(sig_blocks, epl_blocks, deps)
    # final change-gated tangent update AFTER the committed response —
    # the elstiff carried to the next step matches fe3d.load_step3's
    # scan (solve -> respond -> update per iteration) exactly
    grad_b = grad.reshape(sm.D, sm.nel_loc, 36).transpose(0, 2, 1) \
        .reshape(elstiff.shape)
    dst = jnp.sqrt(jnp.sum((elstiff - grad_b) ** 2, axis=1,
                           keepdims=True))
    elstiff = jnp.where(dst > 1.e-3, grad_b, elstiff)
    sig_new = sig_n.reshape(sig_blocks.shape)
    epl_new = epl_blocks + depl_n.reshape(epl_blocks.shape)
    diag = {'cg_res': res, 'cg_iters': it, 'du': du, 'elstiff': elstiff,
            'glob_sig': jnp.mean(sig_n, axis=0),
            'glob_eps': jnp.mean(deps.reshape(-1, 6), axis=0),
            'glob_epl': jnp.mean(epl_new.reshape(-1, 6), axis=0)}
    return sig_new, epl_new, du, diag


def solve_uniaxial3_slab(sm: SlabMesh3, mat, CV, nsteps=10, n_inner=2,
                         nsub=4, two_level=True):
    """Incremental solve on the slab decomposition (fe3d.solve_uniaxial3
    twin): equal load fractions, per-step tangent carry.  Returns
    (sig_blocks, epl_blocks, u_blocks, history)."""
    C_blocks = sm.elstiff_blocks(CV if not isinstance(CV, (tuple, list))
                                 else CV[0])
    if isinstance(CV, (tuple, list)):
        # per-element initial stiffness from the material map
        ids = np.asarray(sm.mat_ids).reshape(-1)
        rows = np.asarray(CV)[ids]
        C_blocks = sm.elstiff_blocks(rows)
    sig = sm.shard_elements(jnp.zeros((sm.NX * sm.NY * sm.NZ, 6)))
    epl = sm.shard_elements(jnp.zeros((sm.NX * sm.NY * sm.NZ, 6)))
    u = sm.zeros_u()
    hist = []
    for i in range(nsteps):
        sig, epl, du, d = slab_load_step3(
            sm, C_blocks, sig, epl, mat, 1. / nsteps, n_inner=n_inner,
            nsub=nsub, CVs=CV, two_level=two_level)
        u = tuple(a + b for a, b in zip(u, du))
        C_blocks = d['elstiff']   # tangent carry into the next step
        hist.append((d['glob_sig'], d['glob_eps'], d['cg_iters']))
    return sig, epl, u, hist
