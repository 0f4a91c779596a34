"""Differentiable FE: implicit-function-theorem gradients through the
equilibrium solve — finite element model updating (FEMU).

The production load step converges to the fixed point

    G(du) = K(C_sec(du)) @ du - rhs(bc) = 0

where C_sec is the exact path-secant tangent reported by the return map
(sig_n - sig0 = C_sec deps by construction), K the assembled stiffness of
that field, and rhs the prescribed-displacement driving terms.  G is a
well-defined nonlinear residual in du alone (start-of-step state fixed),
so the step can be wrapped in ``lax.custom_root``: the solve is the
production inner loop (tangent update + MG/CG linear solve), and the
DERIVATIVE of the converged displacement w.r.t. material parameters is
one linear tangent solve at the solution — no differentiation through
solver iterations at all.

This enables identification from FULL-FIELD data (virtual DIC / FEMU):
simulate an inhomogeneous specimen, compare the computed displacement or
stress fields against measurements, and descend the misfit w.r.t. the
constitutive parameters.  The reference package has no adjoint/sensitivity
capability of any kind; classically this requires hand-derived
semi-analytic sensitivities.

Forward-mode differentiation only (``jax.jacfwd`` — what the LM fit
consumes): the tangent solve is an iterative BiCGStab on the linearized
residual, which forward-mode applies directly; reverse mode would need a
transpose solve, not wired up here.

Scope (v1): displacement-controlled structured meshes, analytic material
groups, single chip.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import fe_kernels as fek


def _respond_ft(md, mats, CVs, sig0, epl0, deps, maxiter, nsub=4):
    """Groups-aware return map in the differentiable fixed-trip mode.
    mats/CVs: DeviceMaterial/(6,6) or tuples per ``md.groups``."""
    if md.groups is None:
        CVd = jnp.asarray(CVs, deps.dtype)
        return con.response_fast(mats, (sig0, epl0), deps, CVd,
                                 maxiter, nsub, fixed_trip=True)
    sig_g, epl_g, deps_g = sig0[md.perm], epl0[md.perm], deps[md.perm]
    parts = []
    for k, (start, size) in enumerate(md.groups):
        if size == 0:
            continue
        sl = slice(start, start + size)
        CVk = jnp.asarray(CVs[k], deps.dtype)
        parts.append(con.response_fast(
            mats[k], (sig_g[sl], epl_g[sl]), deps_g[sl], CVk,
            maxiter, nsub, fixed_trip=True))
    out = tuple(jnp.concatenate([p[i] for p in parts]) for i in range(4))
    # inverse-permutation GATHER (see fe_kernels.respond_grouped)
    scat = lambda x: x[md.inv_perm]
    return tuple(scat(x) for x in out)


def flatten_mesh(md):
    """Structured-grid MeshData -> flat-layout twin (grid=None).

    The planes layout (2, nnX, nnY) ravels to exactly the flat dof
    ordering (dof = comp*nnode + node), so only the BC arrays change
    shape.  femu uses the flat path unconditionally: its per-step
    custom_root unrolls n_inner linear solves into ONE program, and with
    the multigrid grid path each of those would inline its own hierarchy
    build — compile times explode long before the mesh sizes where MG
    wins (FEMU targets DIC-scale meshes, not the 1024^2 production runs).
    """
    if md.grid is None:
        return md
    return md._replace(grid=None,
                       fixed=md.fixed.reshape(-1),
                       fixed_val=md.fixed_val.reshape(-1),
                       force=md.force.reshape(-1))


def _k_full(md, Ke, v):
    """Full K @ v INCLUDING coupling to fixed dofs (k_apply masks them:
    its fixed rows/columns are identity, correct for the solver but not
    for the equilibrium residual, whose free rows need the -K_fc bc
    contribution)."""
    ue = fek.gather_element(md, v.reshape(-1) if md.grid is None else v)
    fe = jnp.einsum('eij,ej->ei', Ke, ue, preferred_element_type=Ke.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    return fek.scatter_element(md, fe)


def step_implicit(md, mats, CVs, sig0, epl0, bc_inc, maxiter=40,
                  n_inner=14, cg_tol=None, cg_maxiter=600,
                  tan_tol=1e-8, tan_maxiter=1200):
    """One displacement-controlled load step with implicit derivatives.

    bc_inc: the step's prescribed displacement increment embedded on the
    fixed dofs (same layout as ``md.fixed_val``; free entries ignored).
    Returns (du, sig_n, epl_n): the converged displacement increment and
    the updated element state — all differentiable w.r.t. the material
    parameters inside ``mats``/``CVs`` (forward mode).
    """
    fixed = md.fixed
    elastic_cv = CVs if md.groups is None else CVs
    # residual row scale: free rows carry force units (~K*du), bc rows
    # displacement units; balance them for the iterative tangent solve
    cv_ref = jnp.max(jnp.abs(jnp.asarray(
        CVs if md.groups is None else CVs[0])))
    scale_r = cv_ref * md.jacw

    def residual(du):
        deps = fek.element_deps(md, du)
        _, _, _, csec = _respond_ft(md, mats, CVs, sig0, epl0, deps,
                                    maxiter)
        Ke = fek.element_stiffness(md, csec)
        r = _k_full(md, Ke, du) / scale_r
        return jnp.where(fixed, du - bc_inc, r)

    elastic_planes = fek.init_state(md, CVs, dtype=bc_inc.dtype).elstiff

    def solve(f, du0):
        # the production inner loop: response -> secant tangent field ->
        # MG/CG linear solve (Picard on the secant stiffness; measured
        # linear contraction ~0.05x per round from an ELASTIC first
        # solve — starting from the raw bc embedding instead leaves the
        # plastic band oscillating between accumulation points).  Black
        # box: only the fixed point matters for the derivatives.
        del du0
        du, _, _ = fek.solve_linear(md, elastic_planes, bc_inc,
                                    cg_tol=cg_tol, cg_maxiter=cg_maxiter)

        def inner(du, _):
            deps = fek.element_deps(md, du)
            _, _, _, csec = _respond_ft(md, mats, CVs, sig0, epl0, deps,
                                        maxiter)
            du_new, _, _ = fek.solve_linear(
                md, csec if md.grid is None else fek.elstiff_planes(md,
                                                                    csec),
                bc_inc, cg_tol=cg_tol, cg_maxiter=cg_maxiter, x0=du)
            return du_new, None
        du, _ = jax.lax.scan(inner, du, None, length=n_inner)
        return du

    def tangent_solve(g, y):
        x, _ = jax.scipy.sparse.linalg.bicgstab(
            g, y, tol=tan_tol, maxiter=tan_maxiter)
        return x

    du0 = jnp.where(fixed, bc_inc, 0.)
    du = jax.lax.custom_root(residual, du0, solve, tangent_solve)
    deps = fek.element_deps(md, du)
    _, sig_n, depl, _ = _respond_ft(md, mats, CVs, sig0, epl0, deps,
                                    maxiter)
    return du, sig_n, epl0 + depl


def fit_field(md, build_mats, theta0, CVs, load_fracs, u_meas, steps=10,
              maxiter=40, **step_kw):
    """Identify material parameters from a measured displacement FIELD
    (virtual DIC / FEMU): Levenberg-Marquardt on r(theta) = u_sim(theta) -
    u_meas with the Jacobian from forward-mode AD through the implicit
    load steps — each column is one tangent solve per step, never a
    differentiation through solver iterations.

    ``build_mats(theta)``: pytree of parameters -> DeviceMaterial (or
    tuple per mesh group).  Returns (theta*, info with 'loss' history).
    """
    from jax.flatten_util import ravel_pytree

    x0, unravel = ravel_pytree(theta0)
    scale = jnp.maximum(jnp.max(jnp.abs(u_meas)), 1e-30)

    def resid(x):
        mats = build_mats(unravel(x))
        u, _, _, _ = simulate(md, mats, CVs, load_fracs,
                              dtype=u_meas.dtype, maxiter=maxiter,
                              **step_kw)
        return ((u - u_meas) / scale).ravel()

    resid = jax.jit(resid)
    jac = jax.jit(jax.jacfwd(resid))
    x = x0
    r = resid(x)
    cost = float(r @ r)
    hist = [cost]
    lam = 1e-3
    for _ in range(steps):
        J = jac(x)
        JTJ, JTr = J.T @ J, J.T @ r
        for _ in range(12):
            A = JTJ + lam * jnp.diag(jnp.maximum(jnp.diag(JTJ), 1e-12))
            dx = jnp.linalg.solve(A, -JTr)
            r_new = resid(x + dx)
            c_new = float(r_new @ r_new)
            if c_new < cost:
                x, r, cost = x + dx, r_new, c_new
                lam = max(lam * 0.3, 1e-14)
                break
            lam *= 4.
        hist.append(cost)
        if cost < 1e-24 or lam > 1e18:
            break
    return unravel(x), {'loss': hist}


def simulate(md, mats, CVs, load_fracs, dtype=jnp.float64, maxiter=40,
             **step_kw):
    """Run ``len(load_fracs)`` displacement-controlled steps; returns
    (u, sig, epl, du_steps) — u the accumulated displacement field, all
    differentiable w.r.t. the material parameters (forward mode).

    Python loop over steps (each wraps its own custom_root); step count
    is static anyway under jacfwd.

    Use production-sized load increments: the inner secant-Picard
    iteration contracts at ~0.05x per round for steps that carry the
    yield transition or moderate plastic growth, but DIVERGES when a
    single step drives far past yield (measured: one full-amplitude
    0.4%-strain step blows up; two half steps converge to 1e-9) — the
    same reason the production solver substeps its loads.
    """
    shape_in = md.fixed.shape
    md = flatten_mesh(md)
    nel = md.nel
    sig = jnp.zeros((nel, 6), dtype)
    epl = jnp.zeros((nel, 6), dtype)
    u = jnp.zeros(md.fixed.shape, dtype)
    dus = []
    for frac in load_fracs:
        bc_inc = md.fixed_val.astype(dtype) * frac
        du, sig, epl = step_implicit(md, mats, CVs, sig, epl, bc_inc,
                                     maxiter=maxiter, **step_kw)
        u = u + du
        dus.append(du.reshape(shape_in))
    return u.reshape(shape_in), sig, epl, dus
