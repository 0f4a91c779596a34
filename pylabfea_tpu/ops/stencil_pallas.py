"""Fused Pallas TPU kernel for the structured-grid matrix-free K-apply.

The fine-level stiffness apply dominates the MG-CG solve cost (6 applies
per preconditioned iteration).  The XLA formulation (``fe_kernels.
k_apply_t``: gather -> 64-term plane contraction -> scatter-add) re-reads
the 256 MB element-stiffness planes and the gathered displacement planes
across several fusions — measured ~2 ms per apply at 1024^2 on v5e, ~6x
above the single-pass HBM bound.

This kernel streams the (64, NX, NY) stiffness planes through VMEM
exactly once, row-block by row-block (the Mosaic pipeline double-buffers
the fetches), computes the per-element force planes fp_i = sum_j
Ke[i,j] * u_j on the VPU, and assembles the nodal output in-kernel:

* column scatter (the +1-y corner offsets) via zero-initialised VMEM
  scratch rows written at static lane offsets 0 / 1,
* row scatter (the +1-x corner offsets) via a carry row held in VMEM
  scratch across the sequential grid steps — the contribution of element
  row r0+TX-1 to node row r0+TX lands in the next block's first row, and
  the final carry (node row NX) is exported through a constant-index
  output block.

Traffic per apply: Ke once + u twice + out once (~280 MB at 1024^2,
vs ~1.5 GB effective for the XLA version).

Used automatically by ``fe_kernels.k_apply_t`` for float32 structured
grids with NX >= 128 on TPU (coarse multigrid levels and the f64/CPU
parity profile keep the XLA path).  Element order / corner conventions
follow ``fe_kernels._CORNERS`` (reference model.py:954-977 assembles the
same stencil as a dense Python-loop matrix).
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

_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _kapply_kernel(ke_ref, ua0_ref, ua1_ref, ub0_ref, ub1_ref,
                   o0_ref, o1_ref, co_ref,
                   carry_ref, s1_ref, s2_ref, *, TX, NY):
    """One row-block of the element-stiffness stencil apply."""
    pid = pl.program_id(0)
    nnY = NY + 1
    dt = o0_ref.dtype

    # element dof planes u_j for this block of element rows: dof j = 2*b+c,
    # corner b at offset (dxb, dyb); rows come from the aligned (dx=0) or
    # +1-shifted (dx=1) displacement arrays, columns are static lane slices
    uref = (ua0_ref, ua1_ref, ub0_ref, ub1_ref)
    u = []
    for b, (dxb, dyb) in enumerate(_CORNERS):
        for c in range(2):
            plane = uref[2 * dxb + c][:]          # (TX, nnY)
            u.append(plane[:, dyb:NY + dyb])      # (TX, NY)

    # fp_i = sum_j Ke[i, j] * u_j  — 64 lane-wide FMAs per component
    ke = ke_ref[:]                                # (64, TX, NY)
    fp = []
    for i in range(8):
        acc = ke[8 * i + 0] * u[0]
        for j in range(1, 8):
            acc = acc + ke[8 * i + j] * u[j]
        fp.append(acc)

    out_refs = (o0_ref, o1_ref)
    for c in range(2):
        # t0: corners with dx=0 (rows aligned with the node row);
        # t1: corners with dx=1 (contribute to node row I+1)
        s1_ref[:] = jnp.zeros((TX, nnY), dt)
        s1_ref[:, 0:NY] = fp[0 + c]               # a=0: (0,0)
        s2_ref[:] = jnp.zeros((TX, nnY), dt)
        s2_ref[:, 1:nnY] = fp[2 + c]              # a=1: (0,1)
        t0 = s1_ref[:] + s2_ref[:]
        s1_ref[:] = jnp.zeros((TX, nnY), dt)
        s1_ref[:, 0:NY] = fp[4 + c]               # a=2: (1,0)
        s2_ref[:] = jnp.zeros((TX, nnY), dt)
        s2_ref[:, 1:nnY] = fp[6 + c]              # a=3: (1,1)
        t1 = s1_ref[:] + s2_ref[:]

        # carry-in = previous block's last t1 row (zero on the first block)
        cin = jnp.where(pid == 0, jnp.zeros((1, nnY), dt),
                        carry_ref[c:c + 1, :])
        # row-shift t1 down by one with the carry at row 0 (scratch-based)
        s1_ref[0:1, :] = cin
        s1_ref[1:TX, :] = t1[0:TX - 1, :]
        out_refs[c][:] = t0 + s1_ref[:]
        last = t1[TX - 1:TX, :]
        carry_ref[c:c + 1, :] = last
        # final block's carry = node row NX (flushed once at grid end)
        co_ref[c:c + 1, :] = last


def auto_tile(NX, NY):
    """Largest row-tile whose double-buffered Ke block fits scoped VMEM
    (limit 16 MB; keep the 64-plane block pair under ~10 MB).  Returns 0
    when no admissible tile exists (caller falls back to XLA)."""
    for TX in (16, 8):
        if NX % TX == 0 and 64 * TX * NY * 4 * 2 <= 10 * 2 ** 20:
            return TX
    return 0


@functools.partial(jax.jit, static_argnames=('TX', 'interpret', 'vma'))
def k_apply_stencil(Kp, u0, u1, TX=16, interpret=False, vma=None):
    """out = K @ u on a structured grid (no BC masking — callers pre-mask).

    Kp (8, 8, NX, NY) float32 element-stiffness planes; u0/u1 (nnX, nnY)
    displacement-component planes.  Returns (out0, out1) (nnX, nnY).

    ``vma``: set to the mesh-axis tuple (e.g. ``('x',)``) when calling
    from inside ``shard_map`` — its varying-mesh-axes check requires the
    pallas output avals to declare how they vary.
    """
    NX, NY = Kp.shape[2], Kp.shape[3]
    nnY = NY + 1
    assert NX % TX == 0, (NX, TX)
    ke = Kp.reshape(64, NX, NY)
    uB0 = u0[1:, :]
    uB1 = u1[1:, :]
    grid = (NX // TX,)
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}

    def scr(shape):
        return pltpu.VMEM(shape, jnp.float32)

    with jax.enable_x64(False):
        o0, o1, co = pl.pallas_call(
            functools.partial(_kapply_kernel, TX=TX, NY=NY),
            out_shape=tuple(
                jax.ShapeDtypeStruct(s, jnp.float32,
                                     **({'vma': frozenset(vma)}
                                        if vma else {}))
                for s in ((NX, nnY), (NX, nnY), (8, nnY))),
            grid=grid,
            in_specs=[
                pl.BlockSpec((64, TX, NY), lambda i: (0, i, 0), **mem),
                pl.BlockSpec((TX, nnY), lambda i: (i, 0), **mem),
                pl.BlockSpec((TX, nnY), lambda i: (i, 0), **mem),
                pl.BlockSpec((TX, nnY), lambda i: (i, 0), **mem),
                pl.BlockSpec((TX, nnY), lambda i: (i, 0), **mem),
            ],
            out_specs=(pl.BlockSpec((TX, nnY), lambda i: (i, 0), **mem),
                       pl.BlockSpec((TX, nnY), lambda i: (i, 0), **mem),
                       pl.BlockSpec((8, nnY), lambda i: (0, 0), **mem)),
            scratch_shapes=[scr((8, nnY)), scr((TX, nnY)), scr((TX, nnY))],
            interpret=interpret,
        )(ke, u0, u1, uB0, uB1)
    out0 = jnp.concatenate([o0, co[0:1, :]], axis=0)
    out1 = jnp.concatenate([o1, co[1:2, :]], axis=0)
    return out0, out1
