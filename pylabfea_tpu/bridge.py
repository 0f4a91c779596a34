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
