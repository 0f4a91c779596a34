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


def _fgrad_kernel(scal_ref, x_ref, svF_ref, dc_ref, f_ref, g_ref, *,
                  nfeat, with_grad):
    """Fused RBF decision function + feature-space gradient.

    The (TILE_N, nsv) kernel matrix never leaves VMEM: squared distances
    are accumulated exactly on the VPU with a static per-feature unroll
    (d2 += (x_f - sv_f)^2 — exact f32, unlike the bf16 matmul expansion),
    and the gradient identity  sum_s w_s (x - sv_s) = (sum_s w_s) x - w@sv
    reuses the same weighted kernel matrix, one lane-reduction per feature.
    Since f(x) - rho = sum_s w_s, the gradient's weight sum comes free.
    """
    gamma = scal_ref[0]
    rho = scal_ref[1]
    x = x_ref[:]                                    # (TILE_N, F8)
    d2 = jnp.zeros_like(dc_ref[0:1, :] * x[:, 0:1])  # (TILE_N, nsvp)
    for fi in range(nfeat):
        diff = x[:, fi:fi + 1] - svF_ref[fi:fi + 1, :]
        d2 = d2 + diff * diff
    w = dc_ref[0:1, :] * jnp.exp(-gamma * d2)       # (TILE_N, nsvp)
    ws = jnp.sum(w, axis=1, keepdims=True)          # (TILE_N, 1)
    f_ref[:] = ws + rho
    g_ref[:] = jnp.zeros_like(x)
    if with_grad:
        for fi in range(nfeat):
            gs = jnp.sum(w * svF_ref[fi:fi + 1, :], axis=1, keepdims=True)
            g_ref[:, fi:fi + 1] = -2. * gamma * (ws * x[:, fi:fi + 1] - gs)


def _fgrad_kernel_mxu(scal_ref, x_ref, svF_ref, svT_ref, dc_ref, s2_ref,
                      f_ref, g_ref, *, with_grad):
    """MXU variant: cross term and gradient contraction as HIGHEST-precision
    in-kernel matmuls; the VPU only pays the exponential and a handful of
    elementwise ops.  The (TILE_N, nsv) weight matrix stays in VMEM."""
    gamma = scal_ref[0]
    rho = scal_ref[1]
    x = x_ref[:]                                    # (TILE_N, F8)
    cross = jax.lax.dot_general(x, svF_ref[:], (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    d2 = jnp.maximum(x2 + s2_ref[0:1, :] - 2. * cross, 0.)
    w = dc_ref[0:1, :] * jnp.exp(-gamma * d2)       # (TILE_N, nsvp)
    ws = jnp.sum(w, axis=1, keepdims=True)
    f_ref[:] = ws + rho
    if with_grad:
        gsv = jax.lax.dot_general(w, svT_ref[:], (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
        g_ref[:] = -2. * gamma * (ws * x - gsv)
    else:
        g_ref[:] = jnp.zeros_like(x)


@functools.partial(jax.jit, static_argnames=('with_grad', 'tile_n',
                                             'interpret'))
def svc_f_grad_pallas_mxu(x, sv, dc, gamma, rho, with_grad=True, tile_n=0,
                          interpret=False):
    """MXU-variant fused SVC decision + gradient (see ``svc_f_grad_pallas``)."""
    N, f = x.shape
    nsv = sv.shape[0]
    F8 = _round_up(max(f, 1), 8)
    nsvp = _round_up(nsv, 128)
    if tile_n == 0:
        tile_n = max(128, min(512, (1 << 21) // nsvp * 128))
    Npad = _round_up(N, tile_n)
    xT = jnp.zeros((Npad, F8), jnp.float32).at[:N, :f].set(
        x.astype(jnp.float32))
    svf = sv.astype(jnp.float32)
    svF = jnp.zeros((F8, nsvp), jnp.float32).at[:f, :nsv].set(svf.T)
    svT = jnp.zeros((nsvp, F8), jnp.float32).at[:nsv, :f].set(svf)
    dcT = jnp.zeros((8, nsvp), jnp.float32).at[0, :nsv].set(
        dc.astype(jnp.float32))
    s2 = jnp.zeros((8, nsvp), jnp.float32).at[0, :nsv].set(
        jnp.sum(svf * svf, axis=1))
    scal = jnp.stack([jnp.asarray(gamma, jnp.float32),
                      jnp.asarray(rho, jnp.float32)])

    grid = (Npad // tile_n,)
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    smem = dict(memory_space=pltpu.SMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    with jax.enable_x64(False):
        fout, gout = pl.pallas_call(
            functools.partial(_fgrad_kernel_mxu, with_grad=with_grad),
            out_shape=(jax.ShapeDtypeStruct((Npad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((Npad, F8), jnp.float32)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2,), lambda i: (0,), **smem),
                pl.BlockSpec((tile_n, F8), lambda i: (i, 0), **mem),
                pl.BlockSpec((F8, nsvp), lambda i: (0, 0), **mem),
                pl.BlockSpec((nsvp, F8), lambda i: (0, 0), **mem),
                pl.BlockSpec((8, nsvp), lambda i: (0, 0), **mem),
                pl.BlockSpec((8, nsvp), lambda i: (0, 0), **mem),
            ],
            out_specs=(pl.BlockSpec((tile_n, 1), lambda i: (i, 0), **mem),
                       pl.BlockSpec((tile_n, F8), lambda i: (i, 0), **mem)),
            interpret=interpret,
        )(scal, xT, svF, svT, dcT, s2)
    return fout[:N, 0], gout[:N, :f]


@functools.partial(jax.jit, static_argnames=('with_grad', 'tile_n',
                                             'interpret'))
def svc_f_grad_pallas(x, sv, dc, gamma, rho, with_grad=True, tile_n=0,
                      interpret=False):
    """Fused SVC decision function (and gradient) for the return-map hot
    path: f(x) = sum_i dc_i K(x, sv_i) + rho, g(x) = df/dx.

    x (N, f) float32, sv (nsv, f), dc (nsv,); gamma/rho traced scalars
    (NOT static — the jitted FE program feeds them from DeviceMaterial).
    Returns (f (N,), g (N, f)) — g is zeros when ``with_grad=False``.

    Exact-f32 arithmetic throughout (VPU subtract-square distances):
    *more* accurate than the XLA path's HIGHEST-precision matmul
    expansion, and several times faster on TPU because the (N, nsv)
    kernel/weight matrices never round-trip HBM (measured in
    BENCH_NOTES.md).  VMEM bounds the support-vector count: the
    dispatcher in ``constitutive`` falls back to XLA above 4096 SVs.
    """
    N, f = x.shape
    nsv = sv.shape[0]
    F8 = _round_up(max(f, 1), 8)
    nsvp = _round_up(nsv, 128)
    if tile_n == 0:
        # keep the live (TILE_N, nsvp) tiles (d2, w + slack) under ~8 MB
        tile_n = max(128, min(512, (1 << 21) // nsvp * 128))
    Npad = _round_up(N, tile_n)
    xT = jnp.zeros((Npad, F8), jnp.float32).at[:N, :f].set(
        x.astype(jnp.float32))
    svF = jnp.zeros((F8, nsvp), jnp.float32).at[:f, :nsv].set(
        sv.astype(jnp.float32).T)
    dcT = jnp.zeros((8, nsvp), jnp.float32).at[0, :nsv].set(
        dc.astype(jnp.float32))
    scal = jnp.stack([jnp.asarray(gamma, jnp.float32),
                      jnp.asarray(rho, jnp.float32)])

    grid = (Npad // tile_n,)
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    smem = dict(memory_space=pltpu.SMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    with jax.enable_x64(False):
        fout, gout = pl.pallas_call(
            functools.partial(_fgrad_kernel, nfeat=f, with_grad=with_grad),
            out_shape=(jax.ShapeDtypeStruct((Npad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((Npad, F8), jnp.float32)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2,), lambda i: (0,), **smem),
                pl.BlockSpec((tile_n, F8), lambda i: (i, 0), **mem),
                pl.BlockSpec((F8, nsvp), lambda i: (0, 0), **mem),
                pl.BlockSpec((8, nsvp), lambda i: (0, 0), **mem),
            ],
            out_specs=(pl.BlockSpec((tile_n, 1), lambda i: (i, 0), **mem),
                       pl.BlockSpec((tile_n, F8), lambda i: (i, 0), **mem)),
            interpret=interpret,
        )(scal, xT, svF, dcT)
    return fout[:N, 0], gout[:N, :f]


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
