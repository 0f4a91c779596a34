"""Fused Pallas TPU kernel for the 3-D hex8 matrix-free K-apply.

The partial-assembly XLA formulation (``fe3d._k_apply3_unrolled``) runs
~13 ms per apply at 128^3 f32 on v5e — ~3x the single-pass HBM bound —
because XLA re-streams the 36 tangent volumes once per Gauss point.
This kernel streams the tangent volumes through VMEM exactly once, one
element X-row per grid step (the Mosaic pipeline double-buffers the
~4.7 MB fetches at 128^2 YZ-planes), performs the full 8-Gauss-point
partial assembly on the VPU, and assembles the nodal output in-kernel:

* y/z corner offsets (the +1 shifts inside the YZ plane) via
  zero-initialised VMEM scratch written at static sublane/lane offsets,
* the +1-x corner offsets via a carry plane held in VMEM scratch across
  the sequential grid steps (the 2-D ``stencil_pallas`` row-carry
  pattern lifted one dimension), with the final carry (node row NX)
  exported through a constant-index output block.

Traffic per apply: C once + u twice + out once (~0.36 GB at 128^3 vs
~5 GB effective for the XLA unrolled form).  The element stiffness is
never formed anywhere: Ke volumes would be 576 planes (4.8 GB at 128^3)
against C's 36 (300 MB).

f32 only; used automatically by ``fe3d.k_apply3_t`` on TPU when the
YZ-plane block fits scoped VMEM (see ``fits3``).  Corner/dof order
follows ``fe3d._CORNERS3``.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_CORNERS3 = tuple((dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                  for dz in (0, 1))


def _hex_B_modes_static(lx, ly, lz):
    """Static per-mode kernel tables from ``fe3d._hex_B_modes``: for each
    of the 7 non-empty parity modes (exact factorization of the Gauss
    sum — see fe3d._hex_B_modes), the mode matrix with the Gauss weight
    w_p folded into the eps side, the raw matrix for the scatter side,
    the active strain rows, and per-row / per-dof sparsity lists."""
    from pylabfea_tpu.ops.fe3d import _hex_B_modes
    tables = []
    for Bm, w, rows in _hex_B_modes(lx, ly, lz):
        row_dofs = tuple(tuple(i for i in range(24) if Bm[a][i] != 0.)
                         for a in range(6))
        col_rows = tuple(tuple(a for a in rows if Bm[a][i] != 0.)
                         for i in range(24))
        Bw = [[w * Bm[a][i] for i in range(24)] for a in range(6)]
        tables.append((Bw, Bm, rows, row_dofs, col_rows))
    return tuple(tables)


def _kapply3_kernel(c_ref, ua0_ref, ua1_ref, ua2_ref, ub0_ref, ub1_ref,
                    ub2_ref, o0_ref, o1_ref, o2_ref, co_ref,
                    carry_ref, s_ref, *, NY, NZ, MODES, jacw):
    """One element X-row of the hex8 partial-assembly apply."""
    pid = pl.program_id(0)
    nnY, nnZ = NY + 1, NZ + 1
    dt = o0_ref.dtype

    # element dof planes u_j (j = 3 a + c) for this element row: corner a
    # at offset (dxa, dya, dza); dx chooses the aligned / +1-shifted row
    # ref, dy/dz are static sublane/lane slices of the (nnY, nnZ) plane
    ua = (ua0_ref, ua1_ref, ua2_ref)
    ub = (ub0_ref, ub1_ref, ub2_ref)
    u = []
    for (dxa, dya, dza) in _CORNERS3:
        refs = ub if dxa else ua
        for c in range(3):
            plane = refs[c][0]                       # (nnY, nnZ)
            u.append(plane[dya:NY + dya, dza:NZ + dza])

    # partial assembly over the 7 parity modes (exact Gauss-sum
    # factorization, fe3d._hex_B_modes): eps_p -> C eps_p -> B_p^T sig_p.
    # Versus the 8-Gauss-point loop this halves the plane-FMA count
    # (~714 vs 1440) and prunes the sigma stage to each mode's active
    # strain rows — the kernel is VPU-bound, so flops ~= wall clock.
    f24 = [None] * 24
    for (Bw, Bm, rows, ROW_DOFS, COL_ROWS) in MODES:
        eps = [None] * 6
        for a in rows:
            t = None
            for i in ROW_DOFS[a]:
                w = Bw[a][i]
                t = u[i] * w if t is None else t + u[i] * w
            eps[a] = t
        sig = [None] * 6
        for a in rows:
            t = None
            for b in rows:
                cab = c_ref[6 * a + b, 0]            # (NY, NZ)
                t = cab * eps[b] if t is None else t + cab * eps[b]
            sig[a] = t
        for i in range(24):
            t = None
            for a in COL_ROWS[i]:
                w = Bm[a][i]
                t = sig[a] * w if t is None else t + sig[a] * w
            if t is not None:
                f24[i] = t if f24[i] is None else f24[i] + t

    out_refs = (o0_ref, o1_ref, o2_ref)
    for c in range(3):
        # t0: corners with dx=0 (element row-aligned nodes);
        # t1: corners with dx=1 (contribute to node row I+1)
        acc = [None, None]
        for a, (dxa, dya, dza) in enumerate(_CORNERS3):
            s_ref[:] = jnp.zeros((nnY, nnZ), dt)
            s_ref[dya:NY + dya, dza:NZ + dza] = f24[3 * a + c] * jacw
            v = s_ref[:]
            acc[dxa] = v if acc[dxa] is None else acc[dxa] + v
        t0, t1 = acc
        cin = jnp.where(pid == 0, jnp.zeros((nnY, nnZ), dt),
                        carry_ref[c])
        out_refs[c][0] = t0 + cin
        carry_ref[c] = t1
        # final block's carry = node row NX (flushed once at grid end)
        co_ref[c] = t1


def fits3(NY, NZ):
    """True when the kernel's whole VMEM footprint fits the 24 MB scoped
    cap (``vmem_limit_bytes`` in ``k_apply3_stencil``) with headroom:

    * the double-buffered (36, 1, NY, NZ) tangent block pair (kept under
      ~10 MB so the Mosaic pipeline overlaps the HBM fetches),
    * double-buffered u/out/carry row blocks (13 (nnY, nnZ) planes x2),
    * scratch (4 planes) and ~70 live (NY, NZ) stack temporaries (24
      gathered dofs + 24 f24 + eps/sig + assembly views — the class of
      overhead that already forced the cap from 16 to 24 MB at 128^2).
    """
    nn = (NY + 1) * (NZ + 1) * 4
    pair = 36 * NY * NZ * 4 * 2
    total = pair + 13 * nn * 2 + 4 * nn + 70 * NY * NZ * 4
    return pair <= 10 * 2 ** 20 and total <= 22 * 2 ** 20


@functools.partial(jax.jit,
                   static_argnames=('lx', 'ly', 'lz', 'interpret', 'vma'))
def k_apply3_stencil(Cp, u0, u1, u2, lx, ly, lz, interpret=False, vma=None):
    """out = K @ u on a structured hex8 grid (no BC masking — callers
    pre-mask).  Cp (36, NX, NY, NZ) float32 tangent volumes; u0/u1/u2
    (nnX, nnY, nnZ) displacement-component volumes.  Returns
    (o0, o1, o2)."""
    NX, NY, NZ = Cp.shape[1:]
    nnY, nnZ = NY + 1, NZ + 1
    MODES = _hex_B_modes_static(lx, ly, lz)
    jacw = lx * ly * lz / 8.
    uB = (u0[1:], u1[1:], u2[1:])
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}

    def scr(shape):
        return pltpu.VMEM(shape, jnp.float32)

    kern = functools.partial(_kapply3_kernel, NY=NY, NZ=NZ, MODES=MODES,
                             jacw=jacw)
    row = pl.BlockSpec((1, nnY, nnZ), lambda i: (i, 0, 0), **mem)
    extra = {}
    if _HAS_PLTPU and not interpret:
        # at 128^2 YZ planes the kernel's stack temporaries put scoped
        # VMEM ~0.4 MB over the 16 MB default — raise the cap slightly
        extra['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 2 ** 20)
    with jax.enable_x64(False):
        o0, o1, o2, co = pl.pallas_call(
            kern,
            out_shape=tuple(
                jax.ShapeDtypeStruct(s, jnp.float32,
                                     **({'vma': frozenset(vma)}
                                        if vma else {}))
                for s in ((NX, nnY, nnZ), (NX, nnY, nnZ), (NX, nnY, nnZ),
                          (3, nnY, nnZ))),
            grid=(NX,),
            in_specs=[
                pl.BlockSpec((36, 1, NY, NZ), lambda i: (0, i, 0, 0),
                             **mem),
                row, row, row, row, row, row,
            ],
            out_specs=(row, row, row,
                       pl.BlockSpec((3, nnY, nnZ), lambda i: (0, 0, 0),
                                    **mem)),
            scratch_shapes=[scr((3, nnY, nnZ)), scr((nnY, nnZ))],
            interpret=interpret,
            **extra,
        )(Cp, u0, u1, u2, *uB)
    out0 = jnp.concatenate([o0, co[0:1]], axis=0)
    out1 = jnp.concatenate([o1, co[1:2]], axis=0)
    out2 = jnp.concatenate([o2, co[2:3]], axis=0)
    return out0, out1, out2
