"""Bridge between the parity profile (host ``Model``) and the performance
profile (device solver).

``to_device`` converts a meshed, single-material, structured host model into
``(MeshData, DeviceMaterial, CV)`` for the jitted solvers; ``solve_on_device``
runs the load stepping there and writes the results back into the host model
(element stress/strain state, nodal displacements, global history), so the
standard post-processing (``plot``, ``calc_global``) keeps working.

Constraints of the device path (checked, with clear errors): 2-D structured
single-section mesh, one material, displacement-controlled uniaxial loading
on top (y) or right (x) with the default left/bottom supports.
"""
import numpy as np
import jax.numpy as jnp

from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import fe_kernels as fek


def _check_supported(model):
    if model.dim != 2:
        raise ValueError('device solver bridge supports 2-D models only')
    if model.Nnode is None:
        raise ValueError('mesh the model before converting')
    if model.shapefact != 1:
        raise ValueError('device solver bridge supports linear elements')
    lx = {round(el.Lelx, 12) for el in model.element}
    ly = {round(el.Lely, 12) for el in model.element}
    if len(lx) != 1 or len(ly) != 1:
        raise ValueError('device solver bridge requires a uniform mesh')
    NX = model.NnodeX - 1
    NY = model.NnodeY - 1
    if model.Nel != NX * NY:
        raise ValueError('device solver bridge requires a full structured '
                         'grid')


def _bc_spec(model):
    """Translate the host Model's edge/node BCs into the device
    ``make_edge_bcs`` spec: displacement-controlled components become
    fixed-value planes; force-controlled components on the incremental
    edges (right/top, model.py:1137-1179) become total-edge-force patterns
    with the half-corner-weight distribution; ``bcnode`` node sets become
    per-node pins/loads."""
    nnY = model.NnodeY
    spec = {}
    spec['left'] = {k: ('disp', model.bcl[k]) for k in range(2)
                    if model.ubcleft[k]}
    spec['bot'] = {k: ('disp', model.bcb[k]) for k in range(2)
                   if model.ubcbot[k]}
    spec['right'] = {k: ('disp', model.bcr[k]) if model.ubcright[k]
                     else ('force', model.bcr[k]) for k in range(2)}
    spec['top'] = {k: ('disp', model.bct[k]) if model.ubctop[k]
                   else ('force', model.bct[k]) for k in range(2)}
    nodes = []
    if model.noset is not None:
        for j in model.noset:
            n = int(np.ravel(j)[0])
            ix, iy = divmod(n, nnY)
            for k in range(2):
                if model.ubcn[k]:
                    nodes.append((ix, iy, k, 'disp', model.bcn[k]))
                elif abs(model.bcn[k]) > 1.e-12:
                    nodes.append((ix, iy, k, 'force', model.bcn[k]))
    spec['nodes'] = tuple(nodes)
    return spec


def to_device(model, dtype=jnp.float32, compress=None):
    """Convert a meshed host Model to ``(MeshData, mat(s), CV(s))``.

    Single-material models return one ``DeviceMaterial`` and one stiffness;
    multi-material models (inclusion/section meshes, model.py:758-952 /
    train_hill.py:110-167) return tuples aligned with the mesh's material
    groups, consumed by the grouped return map.  General displacement and
    force BCs (model.py:1070-1206 semantics) are translated into the
    device BC planes.  ``compress`` applies reduced-set compression to SVC
    materials (see ``constitutive.device_material_from``); a no-op for
    analytic materials."""
    _check_supported(model)
    NX = model.NnodeX - 1
    NY = model.NnodeY - 1
    # material groups in element raster order (elem = elcol * NY + elrow)
    mats = []
    ids = np.empty(model.Nel, dtype=np.int64)
    by_id = {}
    for i, el in enumerate(model.element):
        k = by_id.setdefault(id(el.Mat), len(by_id))
        if k == len(mats):
            mats.append(el.Mat)
        ids[i] = k
    multi = len(mats) > 1
    el0 = model.element[0]
    ps = {}
    if model.planestress:
        if multi:
            # per-material eps_33 condensation rows (reference laminate
            # workloads, model.py:498-501): rect_mesh folds them into the
            # ps_b2 planes consumed by element_deps; the stiffness is
            # condensation-independent (reduced CV, empty row/col 2)
            first_cv = {}
            for i, el in enumerate(model.element):
                first_cv.setdefault(ids[i], np.asarray(el.CV, float))
            ps = dict(planestress=True,
                      ps_CV=tuple(first_cv[k] for k in range(len(mats))),
                      ps_E=tuple(m.E for m in mats),
                      ps_nu=tuple(m.nu for m in mats))
        else:
            # plane stress: the host element folds the eps_33 condensation
            # into its B matrices and uses the reduced CV; replicate both
            ps = dict(planestress=True, ps_CV=np.asarray(el0.CV),
                      ps_E=el0.Mat.E, ps_nu=el0.Mat.nu)
    md = fek.rect_mesh(NX, NY, LX=model.lenx, LY=model.leny,
                       thick=model.thick, dtype=dtype,
                       bc=_bc_spec(model),
                       mat_map=ids.reshape(NX, NY) if multi else None,
                       **ps)
    if multi:
        # per-element CV by group (uniform within a material section)
        CVs = []
        first = {}
        for i, el in enumerate(model.element):
            k = ids[i]
            if k not in first:
                first[k] = np.asarray(el.CV, dtype=float)
        dms = tuple(con.device_material_from(m, dtype=dtype,
                                             compress=compress)
                    for m in mats)
        CVs = tuple(first[k] for k in range(len(mats)))
        return md, dms, CVs
    dm = con.device_material_from(el0.Mat, dtype=dtype, compress=compress)
    CV = np.asarray(el0.CV, dtype=float)
    return md, dm, CV


def to_device_1d(model, dtype=jnp.float32, compress=None):
    """Convert a meshed 1-D host bar model (linear OR quadratic elements,
    per-section element lengths — reference model.py:262-363) to
    ``(MeshData, mat(s), CV(s))`` for the flat-layout device solver.

    1-D elements carry PER-ELEMENT B tables / Jacobians (section lengths
    differ), stored as ``B (Nel, ngp, 6, n)`` / ``jacw (Nel,)`` — the flat
    kernels (`element_stiffness`, `element_deps`, CG) branch on the array
    rank.  DOF numbering equals host node numbering (dim=1)."""
    if model.dim != 1:
        raise ValueError('to_device_1d expects a 1-D model')
    if model.Nnode is None:
        raise ValueError('mesh the model before converting')
    els = model.element
    Nel = len(els)
    dofs = np.array([el.nodes for el in els], dtype=np.int32)
    B = np.stack([np.stack(el.Bmat) for el in els])
    jacw = np.array([el.Jac * el.wght for el in els], dtype=float)
    Bsum = np.array([el.wght * sum(el.Bmat) for el in els], dtype=float)
    ndof = model.Ndof
    fixed = np.zeros(ndof, dtype=bool)
    fval = np.zeros(ndof)
    force = np.zeros(ndof)
    if model.ubcleft[0]:
        fixed[model.noleft] = True
        fval[model.noleft] = model.bcl[0]
    else:
        # force BC on the left bar end (symmetric to the right-end branch
        # below — a left 'force' BC used to be silently dropped)
        force[model.noleft] = model.bcl[0]
    if model.ubcright[0]:
        fixed[model.noright] = True
        fval[model.noright] = model.bcr[0]
    else:
        force[model.noright] = model.bcr[0]
    mats, ids = _material_groups(model)
    multi = len(mats) > 1
    if multi:
        nmat = len(mats)
        perm = np.argsort(ids, kind='stable').astype(np.int32)
        inv_perm = np.argsort(perm).astype(np.int32)
        counts = np.bincount(ids, minlength=nmat)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        groups = tuple((int(s), int(c)) for s, c in zip(starts, counts))
    else:
        perm = np.zeros(0, dtype=np.int32)
        inv_perm = np.zeros(0, dtype=np.int32)
        groups = None
    md = fek.MeshData(
        dofs=jnp.asarray(dofs),
        B=jnp.asarray(B, dtype=dtype),
        Bsum=jnp.asarray(Bsum, dtype=dtype),
        jacw=jnp.asarray(jacw, dtype=dtype),
        vel=jnp.asarray(np.array([el.Vel for el in els]), dtype=dtype),
        fixed=jnp.asarray(fixed),
        fixed_val=jnp.asarray(fval, dtype=dtype),
        force=jnp.asarray(force, dtype=dtype),
        perm=jnp.asarray(perm), inv_perm=jnp.asarray(inv_perm),
        ps_b2=jnp.zeros(0, dtype=dtype),
        ndof=ndof, nel=Nel, grid=None, groups=groups)
    if multi:
        first = {}
        for i, el in enumerate(els):
            first.setdefault(ids[i], np.asarray(el.CV, float))
        dms = tuple(con.device_material_from(m, dtype=dtype,
                                             compress=compress)
                    for m in mats)
        CVs = tuple(first[k] for k in range(len(mats)))
        return md, dms, CVs
    dm = con.device_material_from(els[0].Mat, dtype=dtype,
                                  compress=compress)
    return md, dm, np.asarray(els[0].CV, float)


def _bc_planes(model, dbcr, dbct, dbcn, dtype):
    """Device BC planes for ONE load increment: prescribed-displacement
    values (static left/bottom absolutes, incremental right/top/node-set
    values) and the incremental force pattern — the device twin of the
    host's per-increment ``_calc_BC`` value assembly."""
    nnY = model.NnodeY
    NX, NY = model.NnodeX - 1, nnY - 1
    left = {k: ('disp', model.bcl[k]) for k in range(2) if model.ubcleft[k]}
    bot = {k: ('disp', model.bcb[k]) for k in range(2) if model.ubcbot[k]}
    right = {k: ('disp', dbcr[k]) if model.ubcright[k]
             else ('force', dbcr[k]) for k in range(2)}
    top = {k: ('disp', dbct[k]) if model.ubctop[k]
           else ('force', dbct[k]) for k in range(2)}
    nodes = []
    if model.noset is not None:
        for j in model.noset:
            n = int(np.ravel(j)[0])
            ix, iy = divmod(n, nnY)
            for k in range(2):
                if model.ubcn[k]:
                    nodes.append((ix, iy, k, 'disp', dbcn[k]))
                elif abs(dbcn[k]) > 1.e-12:
                    nodes.append((ix, iy, k, 'force', dbcn[k]))
    _, fval, force = fek.make_edge_bcs(NX, NY, left=left, right=right,
                                       bot=bot, top=top, nodes=tuple(nodes))
    return jnp.asarray(fval, dtype=dtype), jnp.asarray(force, dtype=dtype)


def _material_groups(model):
    """(materials, per-element group ids) in element raster order."""
    mats = []
    ids = np.empty(model.Nel, dtype=np.int64)
    by_id = {}
    for i, el in enumerate(model.element):
        k = by_id.setdefault(id(el.Mat), len(by_id))
        if k == len(mats):
            mats.append(el.Mat)
        ids[i] = k
    return mats, ids


def _calc_scf_np(groups, sig, epl, dsig, sld, verb):
    """Vectorized twin of the host load-step scaling statistics
    (Model._calc_scf / reference model.py:1036-1067), on numpy element
    arrays pulled from the device: per-element distance-to-yield scaling
    factors with the min-vs-(mean-std) selection and the double append for
    elements starting well inside the elastic regime."""
    from pylabfea_tpu.core.tensors import eps_eq
    Nel = len(sig)
    sref = np.zeros(Nel)
    yf0 = np.zeros(Nel)
    for mat, idx in groups:
        sref[idx] = np.atleast_1d(mat.calc_seq(dsig[idx]))
        if mat.sy is not None:
            yf0[idx] = np.atleast_1d(mat._yf_rows(sig[idx], epl[idx]))
            need = (sref[idx] > 0.1) & (yf0[idx] < -0.15)
            if mat.ML_yf and need.any():
                k = idx[need]
                yf0[k] = mat._ml_full_yf_rows(sig[k], epl[k], ld=sld,
                                              verb=verb)
    sc = []
    for mat, idx in groups:
        if mat.sy is None:
            continue
        m = sref[idx] > 0.1
        ii = idx[m]
        deep = yf0[ii] < -0.15
        hh = np.minimum(1., -yf0[ii][deep] / sref[ii][deep])
        sc.extend(hh)
        sc.extend(hh)  # host double append for deep-elastic elements
        rest = ii[~deep]
        sflow = np.sqrt(1.5) * mat._sflow_rows(epl[rest]) / sref[rest] \
            if len(rest) else np.zeros(0)
        sc.extend(np.minimum(1., sflow))
    if len(sc) == 0:
        sc = [1.]
    sc = np.asarray(sc)
    hh = np.std(sc)
    scf = np.amin(sc) if hh < 0.1 else np.maximum(1.e-3, np.mean(sc) - hh)
    return float(np.maximum(scf, 1.e-3))


def solve_on_device_adaptive(model, min_step=None, verb=False,
                             dtype=jnp.float64, fast=False, nsub=4):
    """Device-kernel twin of ``Model.solve``: mirrors the host's ADAPTIVE
    load stepping exactly — touch-yield scaling of the first increments
    (``_calc_scf`` statistics), up to 15 inner equilibrium iterations per
    increment with load halving (il < 6) and tangent averaging at the
    15th iteration, convergence on the normalized yield excess
    (reference model.py:1270-1445 control flow) — while every linear solve
    runs as the jitted MG-CG kernel and every constitutive update as the
    grouped batched return map.  With ``fast=False`` (the reference-faithful
    substepped return map) the results match the host solver to the
    constitutive parity level (~1e-6) on sdim=6 / coaxial paths.

    Writes displacements, element states and the per-increment global
    history back into the host model like ``Model.solve`` does.  A model
    with existing displacements RESUMES: like the host solver
    (reference model.py:1214-1239, 1446-1447), the BC memory
    ``bc{r,t,n}_mem`` marks the already-applied load, the device state is
    rebuilt from the stored element states/tangents, and only the
    remaining load is stepped, appending to the global history."""
    from pylabfea_tpu.femodel import _halve_increment
    from pylabfea_tpu.core.tensors import yf_tolerance
    resume = model.u is not None
    md, dm, CV = to_device(model, dtype=dtype)
    if md.groups is None:
        dm, CV = (dm,), (CV,)
        groups_idx = [np.arange(model.Nel)]
    else:
        perm = np.asarray(md.perm)
        groups_idx = [perm[s:s + z] for s, z in md.groups]
    mats, _ = _material_groups(model)
    groups = list(zip(mats, groups_idx))
    nonlin = any(m.sy is not None for m in mats)
    if resume:
        state = _state_from_model(model, md, dtype)
    else:
        state = fek.init_state(md, CV if md.groups is not None else CV[0],
                               dtype=dtype)
    NX, NY = md.grid[:2]

    def elstiff_rows(planes):
        return np.asarray(planes, dtype=float).reshape(36, -1).T.reshape(
            -1, 6, 6)

    # hierarchy reuse: when the preceding tangent update replaced nothing
    # (``change`` False -> elstiff values bitwise unchanged), the multigrid
    # hierarchy from the previous solve is identical and the Galerkin
    # coarsening can be skipped
    _kes = {'kes': None}

    def solve_inc(elstiff, dbcr, dbct, dbcn, x0=None, reuse=False):
        bc_val, force = _bc_planes(model, dbcr, dbct, dbcn, dtype)
        if md.grid is not None:
            if not reuse or _kes['kes'] is None:
                _kes['kes'] = fek._hier_kes_jit(md, elstiff)
                # warm-start freshness gate (see fe_kernels.
                # load_step_split): a previous increment on a CHANGED
                # tangent system poisons f32 CG
                if dtype != jnp.float64:
                    x0 = None
            tol = 1.e-11 if dtype == jnp.float64 else 1.e-6
            x0 = jnp.zeros_like(bc_val) if x0 is None else x0
            du, res, it = fek._mg_solve_jit(md, _kes['kes'], bc_val, force,
                                            tol, 100, x0)
        else:
            du, res, it = fek.solve_linear(md, elstiff, bc_val, force,
                                           x0=x0)
        return du

    # loading direction for ML yield-locus searches (host solve convention)
    sld = np.zeros(6)
    if np.abs(model.bcr[0]) > 1.e-6:
        sld[0] = np.sign(model.bcr[0])
    if np.abs(model.bct[1]) > 1.e-6:
        sld[1] = np.sign(model.bct[1])
    if np.abs(model.bcr[1]) > 1.e-6:
        sld[5] = np.sign(model.bcr[1])
    if np.abs(model.bct[0]) > 1.e-6:
        sld[5] = np.sign(model.bct[0])
    if np.linalg.norm(sld) < 1.e-3:
        sld[0] = 1.

    if resume:
        # BC memory: load already applied by previous solve() calls; only
        # the remainder up to the CURRENT bcr/bct/bcn is stepped
        bcr0 = np.array(model.bcr_mem, dtype=float)
        bct0 = np.array(model.bct_mem, dtype=float)
        bcn0 = (np.array(model.bcn_mem, dtype=float)
                if model.noset is not None else None)
        sgl = []
        egl = []
        epgl = []
    else:
        bcr0 = np.zeros(2)
        bct0 = np.zeros(2)
        bcn0 = np.zeros(2) if model.noset is not None else None
        sgl = [np.zeros(6)]
        egl = [np.zeros(6)]
        epgl = [np.zeros(6)]
    u_tot = state.u
    il = 0
    niter = []
    co_nconv = []
    nconv = 0
    bc_inc = True
    tangent_changed = True
    while bc_inc:
        max_dbct = model.bct - bct0
        max_dbcr = model.bcr - bcr0
        if min_step is not None:
            scd = np.maximum(1, min_step - il)
            max_dbct = max_dbct / scd
            max_dbcr = max_dbcr / scd
        dbcr = np.array(max_dbcr)
        dbct = np.array(max_dbct)
        if model.noset is not None:
            max_dbcn = model.bcn - bcn0
            if min_step is not None:
                max_dbcn = max_dbcn / np.maximum(1, min_step - il)
            dbcn = np.array(max_dbcn)
        else:
            max_dbcn = dbcn = None

        elstiff = state.elstiff
        du = solve_inc(elstiff, dbcr, dbct, dbcn,
                       reuse=not tangent_changed)
        nit = 0
        if nonlin:
            if il < 10:
                deps = np.asarray(fek.element_deps(md, du), dtype=float)
                dsig = np.einsum('nij,nj->ni', elstiff_rows(elstiff), deps)
                scale_bc = _calc_scf_np(groups, np.asarray(state.sig, float),
                                        np.asarray(state.epl, float),
                                        dsig, sld, verb)
            else:
                scale_bc = 1.
            dbcr = max_dbcr * scale_bc
            dbct = max_dbct * scale_bc
            change = True
            conv = False
            while (change or not conv) and nit <= 15:
                if il < 6 and nit > 1:
                    dbcr = _halve_increment(dbcr, max_dbcr, model.bcr, bcr0)
                    dbct = _halve_increment(dbct, max_dbct, model.bct, bct0)
                    if model.noset is not None:
                        dbcn = _halve_increment(dbcn, max_dbcn, model.bcn,
                                                bcn0)
                du = solve_inc(elstiff, dbcr, dbct, dbcn, x0=du,
                               reuse=not tangent_changed)
                deps_d = fek.element_deps(md, du)
                fy, res_sig, res_depl, grad = fek.respond_grouped(
                    md, dm if md.groups is not None else dm[0],
                    CV if md.groups is not None else CV[0],
                    state.sig, state.epl, deps_d, fast=fast, nsub=nsub)
                # normalized yield excess per plastic element (host conv)
                fy_np = np.asarray(fy, dtype=float)
                fnorm = np.zeros(model.Nel)
                epl_np = np.asarray(state.epl, dtype=float)
                for mat, idx in groups:
                    if mat.sy is not None:
                        fnorm[idx] = fy_np[idx] / mat._sflow_rows(epl_np[idx])
                conv = bool(np.all(fnorm <= yf_tolerance * 1.0001))
                if not conv:
                    nconv += 1
                # tangent update: replace above the change threshold,
                # average at the 15th iteration (host fallback)
                gP = fek.elstiff_planes(md, grad)
                dst = jnp.sqrt(jnp.sum((elstiff - gP) ** 2, axis=0))
                upd = dst > 1.e-3
                new = gP if nit < 15 else 0.5 * (gP + elstiff)
                elstiff = jnp.where(upd, new, elstiff)
                change = bool(jnp.any(upd))
                tangent_changed = change
                nit += 1
        else:
            deps_d = fek.element_deps(md, du)
            fy, res_sig, res_depl, grad = fek.respond_grouped(
                md, dm if md.groups is not None else dm[0],
                CV if md.groups is not None else CV[0],
                state.sig, state.epl, deps_d, fast=fast, nsub=nsub)

        u_tot = u_tot + du
        state = fek.SolverState(u=u_tot, sig=res_sig,
                                epl=state.epl + res_depl,
                                eps=state.eps + fek.element_deps(md, du),
                                elstiff=elstiff)
        il += 1
        niter.append(nit - 1 if nonlin else 0)
        co_nconv.append(nconv)
        bcr0 = bcr0 + dbcr
        bct0 = bct0 + dbct
        hl0 = abs(bcr0[0] - model.bcr[0]) > 1e-6 and abs(model.bcr[0]) > 1e-9
        hl1 = abs(bcr0[1] - model.bcr[1]) > 1e-6 and abs(model.bcr[1]) > 1e-9
        hr0 = abs(bct0[0] - model.bct[0]) > 1e-6 and abs(model.bct[0]) > 1e-9
        hr1 = abs(bct0[1] - model.bct[1]) > 1e-6 and abs(model.bct[1]) > 1e-9
        if model.noset is not None:
            bcn0 = bcn0 + dbcn
            hr0 = hr0 or (abs(bcn0[0] - model.bcn[0]) > 1e-6
                          and abs(model.bcn[0]) > 1e-9)
            hr1 = hr1 or (abs(bcn0[1] - model.bcn[1]) > 1e-6
                          and abs(model.bcn[1]) > 1e-9)
        bc_inc = hl0 or hl1 or hr0 or hr1
        sgl.append(np.asarray(jnp.mean(state.sig, axis=0), dtype=float))
        egl.append(np.asarray(jnp.mean(state.eps, axis=0), dtype=float))
        epgl.append(np.asarray(jnp.mean(state.epl, axis=0), dtype=float))

    _write_back(model, md, state, sgl, egl, epgl, append=resume)
    model.bct_mem = bct0
    model.bcr_mem = bcr0
    if model.noset is not None:
        model.bcn_mem = bcn0
    model.nsteps = il
    model.niter = niter
    model.co_nconv = co_nconv
    return model


def _state_from_model(model, md, dtype):
    """Device ``SolverState`` rebuilt from a previously solved host model
    (the resume path): displacements back into the (2, NXn, NYn) nodal
    layout (inverse of ``_write_back``), element states from the stored
    per-element Voigt vectors, tangents from the stored element
    stiffnesses (the host keeps the self-consistent plastic tangents
    across solve() calls, reference model.py:1446-1447)."""
    sh = md.fixed.shape                                # (2, NXn, NYn)
    u = jnp.asarray(np.asarray(model.u, dtype=float)
                    .reshape(sh[1], sh[2], sh[0])
                    .transpose(2, 0, 1), dtype=dtype)
    sig = np.array([el.sig for el in model.element], dtype=float)
    eps = np.array([el.eps for el in model.element], dtype=float)
    epl = np.array([el.epl for el in model.element], dtype=float)
    rows = np.array([el.elstiff for el in model.element], dtype=float)
    elstiff = fek.elstiff_planes(md, jnp.asarray(rows, dtype=dtype))
    return fek.SolverState(u=u, sig=jnp.asarray(sig, dtype=dtype),
                           epl=jnp.asarray(epl, dtype=dtype),
                           eps=jnp.asarray(eps, dtype=dtype),
                           elstiff=elstiff)


def _write_back(model, md, state, sgl, egl, epgl, append=False):
    """Write device results back into the host model (displacements,
    stress-consistent nodal forces, element states, global history).
    ``append=True`` (resume) extends the existing global history instead
    of replacing it."""
    model.u = np.asarray(state.u,
                         dtype=float).transpose(1, 2, 0).reshape(-1)
    fe = (md.jacw / 4.) * jnp.einsum('ai,ea->ei', md.Bsum, state.sig)
    f_dev = np.asarray(fek.scatter_element(md, fe), dtype=float)
    model.f = f_dev.transpose(1, 2, 0).reshape(-1)
    sig = np.asarray(state.sig, dtype=float)
    eps = np.asarray(state.eps, dtype=float)
    epl = np.asarray(state.epl, dtype=float)
    for i, el in enumerate(model.element):
        el.sig = sig[i]
        el.eps = eps[i]
        el.epl = epl[i]
    if append:
        model.sgl = np.append(model.sgl, np.array(sgl).reshape(-1, 6),
                              axis=0)
        model.egl = np.append(model.egl, np.array(egl).reshape(-1, 6),
                              axis=0)
        model.epgl = np.append(model.epgl, np.array(epgl).reshape(-1, 6),
                               axis=0)
    else:
        model.sgl = np.array(sgl)
        model.egl = np.array(egl)
        model.epgl = np.array(epgl)
    model.calc_global()


def solve_on_device(model, nsteps=20, n_inner=2, dtype=jnp.float32,
                    nsub=4, fast=True, cg_tol=None, n_refine=0,
                    compress='auto'):
    """Solve the (supported subset of) host model with the device solver and
    write displacements, element states and global history back.
    ``fast=False`` selects the reference-faithful substepped return map
    instead of the cutting-plane projection (tighter host parity);
    ``cg_tol`` overrides the linear-solve tolerance (default 1e-11 for
    float64, 1e-6 for float32); ``n_refine`` adds mixed-precision
    iterative-refinement passes to each linear solve (f64 true residual
    vs the unrounded operator, f32 correction — requires
    ``jax_enable_x64`` for full effect, see ``fe_kernels.refine_du``).
    ``compress`` (default 'auto') serves SVC materials through the
    reduced-set compression with an absolute decision-function error
    bound of 10% of the yield-tolerance band — the production serving
    path; pass None to serve the raw SV set (parity instrument; analytic
    materials are unaffected either way).

    1-D bar models (linear or quadratic elements) route through
    ``to_device_1d`` and the flat-layout CG solver; 2-D structured models
    through ``to_device`` and MG-CG."""
    if model.dim == 1:
        return _solve_on_device_1d(model, nsteps=nsteps, n_inner=n_inner,
                                   dtype=dtype, nsub=nsub, fast=fast,
                                   cg_tol=cg_tol, n_refine=n_refine,
                                   compress=compress)
    md, dm, CV = to_device(model, dtype=dtype, compress=compress)
    state = fek.init_state(md, CV, dtype=dtype)
    sgl = [np.zeros(6)]
    egl = [np.zeros(6)]
    epgl = [np.zeros(6)]
    du0 = None
    kes0 = None
    dst0 = None
    for _ in range(nsteps):
        state, diag = fek.load_step_split(md, state, dm, CV, 1. / nsteps,
                                          n_inner=n_inner, nsub=nsub,
                                          fast=fast, du0=du0,
                                          cg_tol=cg_tol, kes0=kes0,
                                          dst0=dst0, n_refine=n_refine)
        du0 = diag['du']
        kes0 = diag.get('kes')
        dst0 = diag['dstiff']
        sgl.append(np.asarray(diag['glob_sig'], dtype=float))
        egl.append(np.asarray(diag['glob_eps'], dtype=float))
        epgl.append(np.asarray(diag['glob_epl'], dtype=float))
    # write back: device node numbering == host structured numbering;
    # device layout is component-major (2, nnX, nnY) planes -> interleave
    model.u = np.asarray(state.u,
                         dtype=float).transpose(1, 2, 0).reshape(-1)
    # nodal forces from the element stresses.  The element-average stress
    # convention sums the 4 Gauss-point contributions (sigma_bar = sum_g
    # sigma_g), so the consistent internal force is (Jac*w/ngp) * Bsum^T
    # sigma_bar.
    fe = (md.jacw / 4.) * jnp.einsum('ai,ea->ei', md.Bsum, state.sig)
    f_dev = np.asarray(fek.scatter_element(md, fe), dtype=float)
    model.f = f_dev.transpose(1, 2, 0).reshape(-1)
    sig = np.asarray(state.sig, dtype=float)
    eps = np.asarray(state.eps, dtype=float)
    epl = np.asarray(state.epl, dtype=float)
    for i, el in enumerate(model.element):
        el.sig = sig[i]
        el.eps = eps[i]
        el.epl = epl[i]
    model.sgl = np.array(sgl)
    model.egl = np.array(egl)
    model.epgl = np.array(epgl)
    model.calc_global()
    return model


def _solve_on_device_1d(model, nsteps=20, n_inner=2,
                        dtype=jnp.float32, nsub=4, fast=True, cg_tol=None,
                        n_refine=0, compress='auto'):
    """1-D bar models on the device solver (see ``solve_on_device``).

    Uses the flat-layout kernels with per-element B tables (section
    lengths differ); global history is VOLUME-weighted on the host (the
    device diag's plain mean assumes uniform elements)."""
    import jax.numpy as _jnp

    md, dm, CV = to_device_1d(model, dtype=dtype, compress=compress)
    state = fek.init_state(md, CV, dtype=dtype)
    vels = np.asarray(md.vel, float)
    wv = vels / vels.sum()
    sgl = [np.zeros(6)]
    egl = [np.zeros(6)]
    epgl = [np.zeros(6)]
    du0 = None
    for _ in range(nsteps):
        state, diag = fek.load_step_split(md, state, dm, CV, 1. / nsteps,
                                          n_inner=n_inner, nsub=nsub,
                                          fast=fast, du0=du0,
                                          cg_tol=cg_tol, n_refine=n_refine)
        du0 = diag['du']
        sgl.append(np.asarray(state.sig, float).T @ wv)
        egl.append(np.asarray(state.eps, float).T @ wv)
        epgl.append(np.asarray(state.epl, float).T @ wv)
    model.u = np.asarray(state.u, dtype=float)
    # nodal forces from the FULL (unmasked) K @ u — reaction forces on the
    # fixed dofs included, like the host solver's f accumulation
    Ke = fek.element_stiffness(md, state.elstiff)
    ue = fek.gather_element(md, _jnp.asarray(model.u, dtype=dtype))
    fe = _jnp.einsum('eij,ej->ei', Ke, ue, preferred_element_type=Ke.dtype)
    model.f = np.asarray(fek.scatter_element(md, fe), dtype=float)
    sig = np.asarray(state.sig, dtype=float)
    eps = np.asarray(state.eps, dtype=float)
    epl = np.asarray(state.epl, dtype=float)
    for i, el in enumerate(model.element):
        el.sig = sig[i]
        el.eps = eps[i]
        el.epl = epl[i]
    model.sgl = np.array(sgl)
    model.egl = np.array(egl)
    model.epgl = np.array(epgl)
    model.calc_global()
    return model


def calc_properties_on_device(mat, size=2., Nel=16, eps=0.005, nsteps=20,
                              n_inner=3, dtype=jnp.float32,
                              load_cases=('stx', 'sty', 'et2', 'ect')):
    """``Material.calc_properties`` on the device solver: runs the canonical
    plane-stress load paths (uniaxial x/y, equibiaxial, pure shear —
    material.py:3125-3153 conventions) with the jitted MG-CG stepper and
    fills ``mat.prop`` / ``mat.propJ2`` / ``mat.sigeps`` exactly like the
    host version, so plotting (``plot_stress_strain``) keeps working.

    Unlike the host path this scales to fine meshes (``Nel``) — use it to
    characterize ML materials with well-resolved fields on TPU."""
    from pylabfea_tpu.core.tensors import eps_eq, sig_eq_j2

    # plane-stress-reduced stiffness (host Element convention)
    hh = mat.E / (1. - mat.nu * mat.nu)
    CV = np.zeros((6, 6))
    CV[0, 0] = CV[1, 1] = hh
    CV[0, 1] = CV[1, 0] = mat.nu * hh
    CV[5, 5] = mat.C44
    dm = con.device_material_from(mat, dtype=dtype)
    cases = {
        'stx': dict(uniax='x', eps_x=eps, eps_y=0.),
        'sty': dict(uniax='y', eps_x=0., eps_y=eps),
        'et2': dict(uniax='xy', eps_x=0.4 * eps, eps_y=0.4 * eps),
        'ect': dict(uniax='xy', eps_x=-0.8 * eps, eps_y=0.8 * eps),
    }
    for sel in load_cases:
        md = fek.rect_mesh(Nel, Nel, LX=size, LY=size, uniax=cases[sel]['uniax'],
                           eps_tot=0., eps_x=cases[sel]['eps_x'],
                           eps_y=cases[sel]['eps_y'], dtype=dtype,
                           planestress=True, ps_CV=CV, ps_E=mat.E,
                           ps_nu=mat.nu)
        state = fek.init_state(md, CV, dtype=dtype)
        # scale the first increment to touch the yield surface (host
        # calc_scf, model.py:1036-1067): elastic predictor at full load,
        # then the minimum per-element distance-to-locus scaling
        du, _, _ = fek.solve_linear(md, state.elstiff, md.fixed_val)
        sig_tr = np.asarray(fek.element_deps(md, du) @ jnp.asarray(
            CV, dtype=dtype).T, dtype=float)
        if dm.is_svc:
            dist = np.asarray(con.ml_yf_dist(
                dm, jnp.asarray(sig_tr, dtype=dtype),
                jnp.zeros(sig_tr.shape[0], dtype=dtype)))
            seq_tr = np.asarray(jnp.asarray(
                sig_eq_j2(sig_tr), dtype=dtype), dtype=float)
            scale = float(np.min((seq_tr - dist) / np.maximum(seq_tr, 1e-12)))
        else:
            seq_tr = mat.calc_seq(sig_tr)
            scale = float(mat.sy / max(np.max(seq_tr), 1e-12))
        scale = min(max(scale, 0.), 1.)
        fracs = [scale] + [(1. - scale) / nsteps] * nsteps if scale < 1. \
            else [1. / nsteps] * nsteps
        sgl = [np.zeros(6)]
        egl = [np.zeros(6)]
        epgl = [np.zeros(6)]
        for frac in fracs:
            state, diag = fek.load_step_split(md, state, dm, CV, frac,
                                              n_inner=n_inner)
            sgl.append(np.asarray(diag['glob_sig'], dtype=float))
            egl.append(np.asarray(diag['glob_eps'], dtype=float))
            epgl.append(np.asarray(diag['glob_epl'], dtype=float))
        sgl, egl, epgl = np.array(sgl), np.array(egl), np.array(epgl)
        seq = mat.calc_seq(sgl)
        eeq = eps_eq(egl)
        peeq = eps_eq(epgl)
        iys = np.nonzero(peeq < 1.e-2)[0]
        mat.prop[sel]['ys'] = seq[iys[-1]]
        mat.prop[sel]['seq'] = seq
        mat.prop[sel]['eeq'] = eeq
        mat.prop[sel]['peeq'] = peeq
        seqJ2 = sig_eq_j2(sgl)
        iys = np.nonzero(peeq < 1.e-6)[0]
        mat.propJ2[sel]['ys'] = seqJ2[iys[-1]]
        mat.propJ2[sel]['seq'] = seqJ2
        mat.propJ2[sel]['eeq'] = eeq
        mat.propJ2[sel]['peeq'] = peeq
        mat.sigeps[sel]['sig'] = sgl
        mat.sigeps[sel]['eps'] = egl
        mat.sigeps[sel]['epl'] = epgl
    mat.prop_calculated = True
    return mat
