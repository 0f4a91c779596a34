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

from pylabfea_tpu.ops import fe_kernels as fek


def _grid_of(md):
    assert md.grid is not None, 'multigrid requires a structured mesh'
    return md.grid[:2]


def coarsen_mesh(md: fek.MeshData):
    """MeshData of the next-coarser level (half resolution, same BCs and
    element aspect ratio; the 2-D quad element matrix is size-invariant)."""
    NX, NY, lx, ly, uniax = md.grid
    return fek.rect_mesh(NX // 2, NY // 2, LX=lx * NX, LY=ly * NY,
                         uniax=uniax, eps_tot=0., dtype=md.B.dtype)


def coarsen_elstiff(md, elstiff):
    """Average the 2x2 fine element tangent blocks -> coarse element C."""
    NX, NY = _grid_of(md)
    e = elstiff.reshape(NX // 2, 2, NY // 2, 2, 6, 6)
    return e.mean(axis=(1, 3)).reshape(-1, 6, 6)


def restrict(fine, NXc, NYc):
    """Restriction = exact transpose of ``prolong`` (weights 1, 1/2, 1/4,
    zero outside the domain), so the V-cycle stays symmetric and CG-safe.
    Fine grid has 2*N+1 nodes per axis; coarse node (I,J) <-> fine (2I,2J)."""
    fp = jnp.pad(fine, ((1, 1), (1, 1), (0, 0)), mode='constant')
    c = (fp[1:-1:2, 1:-1:2]
         + 0.5 * (fp[0:-2:2, 1:-1:2] + fp[2::2, 1:-1:2]
                  + fp[1:-1:2, 0:-2:2] + fp[1:-1:2, 2::2])
         + 0.25 * (fp[0:-2:2, 0:-2:2] + fp[2::2, 0:-2:2]
                   + fp[0:-2:2, 2::2] + fp[2::2, 2::2]))
    return c


def prolong(coarse, nnXf, nnYf):
    """Bilinear prolongation (nnXc, nnYc, 2) -> (nnXf, nnYf, 2)."""
    c = coarse
    out = jnp.zeros((nnXf, nnYf, c.shape[-1]), c.dtype)
    out = out.at[::2, ::2].set(c)
    out = out.at[1::2, ::2].set(0.5 * (c[:-1, :] + c[1:, :]))
    out = out.at[::2, 1::2].set(0.5 * (c[:, :-1] + c[:, 1:]))
    out = out.at[1::2, 1::2].set(0.25 * (c[:-1, :-1] + c[1:, :-1]
                                         + c[:-1, 1:] + c[1:, 1:]))
    return out


class MGLevel:
    """One level of the hierarchy: mesh data + assembled element stiffness
    + Jacobi diagonal."""

    def __init__(self, md, Ke, diag):
        self.md = md
        self.Ke = Ke
        self.diag = diag


def build_hierarchy(md: fek.MeshData, elstiff, min_size=8):
    """Build the level list (fine -> coarse) for the current tangent field."""
    levels = []
    cur_md, cur_el = md, elstiff
    while True:
        Ke = fek.element_stiffness(cur_md, cur_el)
        levels.append(MGLevel(cur_md, Ke, fek.k_diag(cur_md, Ke)))
        NX, NY = _grid_of(cur_md)
        if NX % 2 or NY % 2 or NX // 2 < min_size or NY // 2 < min_size:
            break
        nxt = coarsen_mesh(cur_md)
        # inherit the fine level's BC mask structure (same generator)
        cur_el = coarsen_elstiff(cur_md, cur_el)
        cur_md = nxt
    return levels


def _smooth(level: MGLevel, x, b, nu, omega=0.7):
    """nu damped-Jacobi sweeps on K x = b."""
    minv = omega / level.diag

    def body(_, x):
        r = b - fek.k_apply(level.md, level.Ke, x)
        return x + minv * r

    return jax.lax.fori_loop(0, nu, body, x)


def v_cycle(levels, b, lvl=0, nu=2):
    """One symmetric V-cycle solving K e = b approximately (zero initial)."""
    level = levels[lvl]
    md = level.md
    b = jnp.where(md.fixed, 0., b)
    if lvl == len(levels) - 1:
        return _smooth(level, jnp.zeros_like(b), b, 8 * nu)
    x = _smooth(level, jnp.zeros_like(b), b, nu)
    r = b - fek.k_apply(md, level.Ke, x)
    r = jnp.where(md.fixed, 0., r)
    NX, NY = _grid_of(md)
    rc = restrict(r.reshape(NX + 1, NY + 1, 2), NX // 2 + 1, NY // 2 + 1)
    rc = rc.reshape(-1)
    ec = v_cycle(levels, rc, lvl + 1, nu)
    mdc = levels[lvl + 1].md
    ec = jnp.where(mdc.fixed, 0., ec)
    e = prolong(ec.reshape(NX // 2 + 1, NY // 2 + 1, 2), NX + 1, NY + 1)
    x = x + jnp.where(md.fixed, 0., e.reshape(-1))
    return _smooth(level, x, b, nu)


def mg_cg_solve(levels, b, x0, tol=1.e-8, maxiter=200):
    """CG with a V-cycle preconditioner on the finest level.

    The loop is arranged so the (large) V-cycle subprogram is instantiated
    exactly once in the compiled program — XLA compile time of the deep
    multigrid hierarchy is the binding constraint, not FLOPs.
    """
    level = levels[0]
    md = level.md
    apply_fn = lambda v: fek.k_apply(md, level.Ke, v)
    r0 = jnp.where(md.fixed, 0., b - apply_fn(x0))
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)
    p0 = jnp.zeros_like(r0)

    def cond(s):
        x, r, p, rz, it = s
        return (jnp.linalg.norm(r) > tol * bnorm) & (it < maxiter)

    def body(s):
        x, r, p, rz_prev, it = s
        z = v_cycle(levels, r)
        rz = jnp.vdot(r, z)
        beta = jnp.where(it == 0, 0., rz / rz_prev)
        p = z + beta * p
        Ap = apply_fn(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = jnp.where(md.fixed, 0., r - alpha * Ap)
        return x, r, p, rz, it + 1

    x, r, p, rz, it = jax.lax.while_loop(
        cond, body, (x0, r0, p0, jnp.asarray(1., r0.dtype), 0))
    return x, jnp.linalg.norm(r) / bnorm, it
