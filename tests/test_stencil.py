"""Fused Pallas stencil K-apply: parity with the XLA plane formulation.

Runs the kernel in interpreter mode (CPU suite); the real-TPU timing and
integration are exercised by the driver entry points and documented in
BENCH_NOTES.md.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops.stencil_pallas import k_apply_stencil, auto_tile


def _elastic_cv():
    E, nu = 200.e3, 0.3
    c11 = E * (1 - nu) / ((1 + nu) * (1 - 2 * nu))
    c12 = E * nu / ((1 + nu) * (1 - 2 * nu))
    c44 = E / (2 * (1 + nu))
    CV = np.zeros((6, 6))
    CV[:3, :3] = c12
    np.fill_diagonal(CV[:3, :3], c11)
    CV[3, 3] = CV[4, 4] = CV[5, 5] = c44
    return CV


@pytest.mark.parametrize('NX,NY,TX', [(16, 16, 8), (32, 16, 16), (16, 32, 8)])
def test_stencil_matches_xla_apply(NX, NY, TX):
    rng = np.random.default_rng(0)
    md = fek.rect_mesh(NX, NY, LX=1., LY=1.5, uniax='y', eps_tot=0.002,
                       dtype=jnp.float32)
    els = jnp.asarray(rng.uniform(0.5, 2.0, (36, NX, NY)) * 1e5, jnp.float32)
    Kp = fek.element_stiffness_planes(md, els)
    u0 = jnp.asarray(rng.normal(size=(NX + 1, NY + 1)), jnp.float32)
    u1 = jnp.asarray(rng.normal(size=(NX + 1, NY + 1)), jnp.float32)
    up = fek._gather_planes(md, (u0, u1))
    fp = fek._contract_planes(Kp, up)
    ref = fek._scatter_planes(md, fp)
    out = k_apply_stencil(Kp, u0, u1, TX=TX, interpret=True)
    for o, r in zip(out, ref):
        scale = float(jnp.abs(r).max())
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-6 * scale)


def test_stencil_uniform_elastic_exact_interior():
    """On a uniform elastic field the apply must equal the XLA operator to
    f32 round-off including all boundary rows/columns (carry handling)."""
    CV = _elastic_cv()
    NX = NY = 16
    md = fek.rect_mesh(NX, NY, dtype=jnp.float32)
    els = jnp.broadcast_to(
        jnp.asarray(CV, jnp.float32).reshape(36, 1, 1), (36, NX, NY))
    Kp = fek.element_stiffness_planes(md, els)
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.normal(size=(NX + 1, NY + 1)), jnp.float32)
    u1 = jnp.asarray(rng.normal(size=(NX + 1, NY + 1)), jnp.float32)
    ref = fek._scatter_planes(md, fek._contract_planes(
        Kp, fek._gather_planes(md, (u0, u1))))
    out = k_apply_stencil(Kp, u0, u1, TX=8, interpret=True)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=2e-6 * float(jnp.abs(r).max()))


def test_auto_tile_vmem_budget():
    assert auto_tile(1024, 1024) == 16
    assert auto_tile(2048, 2048) == 8
    assert auto_tile(4096, 4096) == 0          # falls back to XLA
    assert auto_tile(18, 18) == 0              # NX not divisible by tile


def test_stencil_composes_with_shard_map():
    """The per-strip local apply routes through the Pallas kernel when
    forced on (interpreter off-TPU): the strip CG K-apply with halo
    exchange must match the XLA formulation on the 8-device mesh."""
    from pylabfea_tpu.parallel import sharded as sh
    if len(jax.devices()) < 2:
        pytest.skip('needs the virtual multi-device mesh')
    rng = np.random.default_rng(2)
    NX, NY = 1024, 16    # NXd = 1024/8 = 128: smallest strip the gate takes
    sm = sh.StripMesh(NX, NY, dtype=jnp.float32)
    el = np.broadcast_to(np.asarray(_elastic_cv(), np.float32),
                         (NX * NY, 6, 6))
    el_b = sm.shard_elements(el)
    v0 = rng.normal(size=(sm.D, sm.NXd + 1, sm.nnY)).astype(np.float32)
    v1 = rng.normal(size=(sm.D, sm.NXd + 1, sm.nnY)).astype(np.float32)
    # duplicated halo columns must hold consistent values
    for v in (v0, v1):
        v[1:, 0] = v[:-1, -1]
    vt = (jnp.asarray(v0), jnp.asarray(v1))
    k_apply = sh.make_k_apply(sm)
    ref = k_apply(el_b, vt, sm.fixed)
    from pylabfea_tpu.ops import fe_kernels as fek
    old = fek.USE_STENCIL
    try:
        fek.USE_STENCIL = True   # forced on -> interpreter off-TPU
        out = k_apply(el_b, vt, sm.fixed)
    finally:
        fek.USE_STENCIL = old
    for o, r in zip(out, ref):
        scale = float(jnp.abs(r).max())
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-6 * max(scale, 1.))
