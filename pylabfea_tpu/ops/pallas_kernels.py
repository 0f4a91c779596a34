"""Pallas TPU kernels for the hot SVC ops.

``svc_decision_pallas`` fuses the RBF decision function — pairwise squared
distances (matmul expansion on the MXU), kernel exponential (VPU) and the
dual-coefficient reduction — into one kernel, so the (N, nsv) kernel matrix
never round-trips through HBM.  Tiled over the evaluation points; feature
and support-vector dimensions are zero-padded to lane multiples (padding
features adds 0 to the distances; padded support vectors carry zero dual
coefficients, so they cannot contribute).

On non-TPU backends the kernel runs in interpreter mode (tests) or falls
back to the XLA implementation in ``ops.svc``.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(x_ref, sv_ref, dc_ref, out_ref, *, gamma):
    x = x_ref[:]                      # (TILE_N, F)
    sv = sv_ref[:]                    # (NSV, F)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)          # (TILE_N, 1)
    s2 = jnp.sum(sv * sv, axis=1, keepdims=True)        # (NSV, 1)
    cross = jax.lax.dot_general(x, sv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d2 = jnp.maximum(x2 + s2.T - 2. * cross, 0.)        # (TILE_N, NSV)
    k = jnp.exp(-gamma * d2)
    out_ref[:] = jax.lax.dot_general(k, dc_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=('gamma', 'rho', 'tile_n', 'interpret'))
def svc_decision_pallas(x, sv, dc, gamma, rho, tile_n=512, interpret=False):
    """Fused SVC decision function f(x) = sum_i dc_i K(x, sv_i) + rho.

    x (N, f), sv (nsv, f), dc (nsv,); gamma/rho static floats.
    Returns (N,) float32.
    """
    N, f = x.shape
    nsv = sv.shape[0]
    fp = _round_up(max(f, 1), 128)
    np_pad = _round_up(nsv, 128)
    Npad = _round_up(N, tile_n)
    xT = jnp.zeros((Npad, fp), jnp.float32).at[:N, :f].set(
        x.astype(jnp.float32))
    svT = jnp.zeros((np_pad, fp), jnp.float32).at[:nsv, :f].set(
        sv.astype(jnp.float32))
    dcT = jnp.zeros((np_pad, 1), jnp.float32).at[:nsv, 0].set(
        dc.astype(jnp.float32))

    grid = (Npad // tile_n,)
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    # index maps run under x64; Mosaic requires i32 block indices, so wrap
    # the pallas_call in a 32-bit scope
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, gamma=float(gamma)),
            out_shape=jax.ShapeDtypeStruct((Npad, 1), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, fp), lambda i: (i, 0), **mem),
                pl.BlockSpec((np_pad, fp), lambda i: (0, 0), **mem),
                pl.BlockSpec((np_pad, 1), lambda i: (0, 0), **mem),
            ],
            out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0), **mem),
            interpret=interpret,
        )(xT, svT, dcT)
    return out[:N, 0] + rho


def svc_decision_auto(params, x, tile_n=512, prefer_pallas=False):
    """Dispatch between the Pallas kernel and the XLA implementation.

    Measured on TPU v5e (N=2^20, nsv=1024, f32): XLA 4.8 ms vs Pallas
    11.3 ms — XLA's automatic fusion already handles this
    matmul+exp+reduce pattern well, so XLA is the default and the Pallas
    kernel stays available for experimentation (``prefer_pallas=True``).
    """
    from pylabfea_tpu.ops import svc as svc_ops
    if prefer_pallas and jax.devices()[0].platform == 'tpu':
        sv, dc = params.device_arrays(jnp.float32)
        return svc_decision_pallas(jnp.asarray(x, jnp.float32), sv, dc,
                                   params.gamma, params.intercept,
                                   tile_n=tile_n)
    return svc_ops.decision_function_jax(params, x)
