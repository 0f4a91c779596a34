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
    if len(set(id(el.Mat) for el in model.element)) != 1:
        raise ValueError('device solver bridge supports one material')
    lx = {round(el.Lelx, 12) for el in model.element}
    ly = {round(el.Lely, 12) for el in model.element}
    if len(lx) != 1 or len(ly) != 1:
        raise ValueError('device solver bridge requires a uniform mesh')
    if model.ubctop[1] and abs(model.bct[1]) > 0 and not model.ubcright[0]:
        return 'y', model.bct[1] / model.leny
    if model.ubcright[0] and abs(model.bcr[0]) > 0 and not model.ubctop[1]:
        return 'x', model.bcr[0] / model.lenx
    raise ValueError('device solver bridge supports uniaxial displacement '
                     'loading on top (y) or right (x)')


def to_device(model, dtype=jnp.float32):
    """Convert a meshed host Model to (MeshData, DeviceMaterial, CV)."""
    uniax, eps_tot = _check_supported(model)
    NX = model.NnodeX - 1
    NY = model.NnodeY - 1
    el0 = model.element[0]
    ps = {}
    if model.planestress:
        # plane stress: the host element folds the eps_33 condensation into
        # its B matrices and uses the reduced CV; replicate both
        ps = dict(planestress=True, ps_CV=np.asarray(el0.CV),
                  ps_E=el0.Mat.E, ps_nu=el0.Mat.nu)
    md = fek.rect_mesh(NX, NY, LX=model.lenx, LY=model.leny,
                       thick=model.thick, uniax=uniax, eps_tot=eps_tot,
                       dtype=dtype, **ps)
    mat = el0.Mat
    dm = con.device_material_from(mat, dtype=dtype)
    CV = np.asarray(model.element[0].CV, dtype=float)
    return md, dm, CV


def solve_on_device(model, nsteps=20, n_inner=2, dtype=jnp.float32,
                    nsub=4):
    """Solve the (supported subset of) host model with the device solver and
    write displacements, element states and global history back."""
    md, dm, CV = to_device(model, dtype=dtype)
    state = fek.init_state(md, CV, dtype=dtype)
    sgl = [np.zeros(6)]
    egl = [np.zeros(6)]
    epgl = [np.zeros(6)]
    for _ in range(nsteps):
        state, diag = fek.load_step_split(md, state, dm, CV, 1. / nsteps,
                                          n_inner=n_inner, nsub=nsub)
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
