"""Regenerate the didactic notebooks 01/02/04/06 at the reference's
teaching standard (narrative + full section inventory of the reference's
pyLabFEA_Introduction / Plasticity / ML-FlowRule / Composites notebooks,
SURVEY.md section 2.4) while keeping every code cell headless-executable.

Run: python tools/gen_notebooks.py   (writes notebooks/*.ipynb in place)
"""
import json
import os
import uuid

NBDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'notebooks')


def md(text):
    return {"cell_type": "markdown", "id": uuid.uuid4().hex[:8],
            "metadata": {}, "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "execution_count": None,
            "id": uuid.uuid4().hex[:8], "metadata": {}, "outputs": [],
            "source": text.splitlines(keepends=True)}


def write(name, cells):
    nb = {"cells": cells,
          "metadata": {"kernelspec": {"display_name": "Python 3",
                                      "language": "python",
                                      "name": "python3"},
                       "language_info": {"name": "python"}},
          "nbformat": 4, "nbformat_minor": 5}
    with open(os.path.join(NBDIR, name), 'w') as fh:
        json.dump(nb, fh, indent=1)
    print('wrote', name)


# ---------------------------------------------------------------- 01
intro = [
md("""# Finite Element Tutorial — Introduction to `pylabfea_tpu`

`pylabfea_tpu` is a **TPU-native Laboratory for Finite Element Analysis**: a
JAX/XLA rebuild with the capabilities of pyLabFEA.  It solves small-strain
elastic-plastic boundary-value problems on 1-D bar meshes and structured 2-D
quadrilateral meshes (plane stress or plane strain), with two execution
profiles that share one API:

* the **host profile** (NumPy) reproduces the reference package's numerics to
  its golden test values — every workflow in this notebook runs there;
* the **device profile** (jitted JAX kernels: batched return maps, matrix-free
  multigrid-CG) runs the same models on TPU at 10^6-element scale
  (`pylabfea_tpu.bridge.solve_on_device` — see the `05_TPU_Scaling` notebook).

This tutorial walks the full modeling workflow — model, geometry, materials,
section assignment, boundary conditions, meshing, solving, post-processing —
on a 1-D composite bar, then builds the two canonical 2-D laminate models
(iso-strain and iso-stress) and checks them against the analytic Voigt and
Reuss bounds."""),
md("""## Model

Everything starts from a `Model`: the container for geometry, materials,
boundary conditions, mesh, and results.  Its constructor fixes the spatial
dimension (`dim=1` bars, `dim=2` plane problems) and — for 2-D — whether the
out-of-plane direction is free (`planestress=True`, thin sheets) or
constrained (`planestress=False`, plane strain; the default).

The default boundary conditions clamp the left edge (x) and the bottom edge
(y); loads are applied on the right/top edges as either prescribed
displacements (`'disp'`) or total edge forces (`'force'`)."""),
code("""import numpy as np
import matplotlib.pyplot as plt
import pylabfea_tpu as FE

fe1 = FE.Model(dim=1)   # a 1-D bar model
print(type(fe1).__name__, '| dim =', fe1.dim)"""),
md("""## Geometry

`geom` defines the model's *sections*: contiguous regions that can carry
different materials.  For a 1-D bar the argument is a list of section
lengths; the total bar length is their sum.  (For 2-D models `geom` also
takes the height `LY`; sections then become vertical strips.)"""),
code("""fe1.geom([2., 1., 2.])       # three sections: 2 + 1 + 2 length units
print('sections:', fe1.Nsec, '| total length:', fe1.lenx)"""),
md("""## Materials

A `Material` holds the constitutive law.  Elasticity is defined via
`elasticity` (Young's modulus + Poisson ratio, or C11/C12/C44, or a full
6x6 stiffness); plasticity — not needed in this purely elastic tutorial —
via `plasticity` (yield strength, hardening, anisotropy; see the
`02_Plasticity` notebook).  Here we create a **soft** and a **stiff**
phase:"""),
code("""mat1 = FE.Material(num=1)
mat1.elasticity(E=100.e3, nu=0.35)   # soft phase: E = 100 GPa
mat2 = FE.Material(num=2)
mat2.elasticity(E=300.e3, nu=0.3)    # stiff phase: E = 300 GPa
print(f"C11 soft: {mat1.C11:.1f} MPa, C11 stiff: {mat2.C11:.1f} MPa")"""),
md("""## Assigning materials to model sections

`assign` maps one material to each section, in section order.  The middle
section of the bar gets the stiff phase — a 1-D composite:"""),
code("""fe1.assign([mat1, mat2, mat1])
print('materials per section:',
      [m.num for m in (mat1, mat2, mat1)])"""),
md("""## Boundary conditions

The bar is clamped on the left (`u = 0`) and pulled on the right to a total
strain of 1%.  Displacement control (`'disp'`) prescribes the boundary
value exactly; force control (`'force'`) prescribes the resultant and lets
the displacement follow."""),
code("""fe1.bcleft(0.)
fe1.bcright(0.01 * fe1.lenx, 'disp')   # 1% total strain"""),
md("""## Meshing

`mesh` discretizes the sections into elements — `NX` elements along the bar.
Elements never straddle section boundaries, so each element carries exactly
one material."""),
code("""fe1.mesh(NX=10)
print('elements:', fe1.Nel, '| nodes:', fe1.Nnode)"""),
md("""## Solver

`solve` applies the boundary conditions incrementally (for nonlinear
materials it iterates the constitutive response to equilibrium within each
increment; this elastic model converges in one).  Results live on the model:
nodal displacements `fe1.u`, nodal forces `fe1.f`, and per-element stress
and strain tensors."""),
code("""fe1.solve()
fe1.calc_global()   # volume-averaged (homogenized) quantities
print('global stress  :', fe1.glob['sig'][0].round(2), 'MPa')
print('global strain  :', fe1.glob['ebc1'])"""),
md("""## Post-processing

In the composite bar, **stress is constant** along the length (the sections
are in series — equilibrium demands one force through every cross-section)
while **strain jumps**: the soft sections stretch three times more per unit
stress than the stiff one.  The effective modulus is therefore the *harmonic*
(Reuss) average of the section moduli:"""),
code("""E_eff = fe1.glob['sig'][0] / 0.01
E_reuss = fe1.lenx / (2. / mat1.E + 1. / mat2.E + 2. / mat1.E)
print(f'FE effective modulus {E_eff:.1f} MPa vs series average '
      f'{E_reuss:.1f} MPa')
# per-element strain profile: the stiff middle section strains least
eps_el = np.array([el.eps[0] for el in fe1.element])
print('element strains:', eps_el.round(5))"""),
md("""## 2-dimensional model 1: iso-strain (Voigt)

Now the same two phases as a 2-D **laminate**: five vertical layers
(soft-stiff-soft-stiff-soft), loaded **parallel** to the layers by pulling
the top edge.  Compatibility forces every layer to the same axial strain
("iso-strain"), so each layer contributes stress in proportion to its
stiffness and the effective modulus is the volume-weighted *arithmetic*
(Voigt) average — the upper bound for two-phase composites.

Note the full 2-D workflow is the same sequence: model → geometry (with
`LY`) → assign → BCs on all four edges → mesh (`NX`, `NY`) → solve →
post-process."""),
code("""fem_v = FE.Model(dim=2, planestress=True)
fem_v.geom([2, 1, 2, 1, 2], LY=4.)   # 5 vertical layers
fem_v.assign([mat1, mat2, mat1, mat2, mat1])
fem_v.bcleft(0.)
fem_v.bcbot(0.)
fem_v.bcright(0., 'force')              # free lateral face
fem_v.bctop(0.1 * fem_v.leny, 'disp')   # pull top: load parallel to layers
fem_v.mesh(NX=16, NY=4)
fem_v.solve()
fem_v.calc_global()
mod_stiff = fem_v.glob['sig'][1] / fem_v.glob['eps'][1]
voigt = 6./8. * mat1.E + 2./8. * mat2.E
print(f"FE stiffness {mod_stiff:.1f} vs Voigt average {voigt:.1f} MPa")"""),
md("""The stress field shows the load partitioning directly: the stiff
layers (3x modulus at equal strain) carry 3x the stress of the soft
layers:"""),
code("""fem_v.plot('stress2', mag=2, showfig=False)
plt.show()"""),
md("""## 2-dimensional model 2: iso-stress (Reuss)

Rotating the load — pulling the **right** edge so the load crosses the
layers — puts the layers in series: equilibrium forces (nearly) equal
stress through every layer ("iso-stress"), strains add, and the effective
stiffness drops to the harmonic (Reuss) average — the lower bound."""),
code("""fem_r = FE.Model(dim=2, planestress=True)
fem_r.geom([2, 1, 2, 1, 2], LY=4.)
fem_r.assign([mat1, mat2, mat1, mat2, mat1])
fem_r.bcleft(0.)
fem_r.bcbot(0.)
fem_r.bctop(0., 'force')
fem_r.bcright(0.1 * fem_r.lenx, 'disp')   # pull right: load across layers
fem_r.mesh(NX=16, NY=4)
fem_r.solve()
fem_r.calc_global()
mod_stiff = fem_r.glob['sig'][0] / fem_r.glob['eps'][0]
reuss = 1. / (6./8. / mat1.E + 2./8. / mat2.E)
print(f"FE stiffness {mod_stiff:.1f} vs Reuss average {reuss:.1f} MPa")"""),
md("""The FE value sits slightly *above* the Reuss bound: at the layer
interfaces, compatibility constrains the lateral (Poisson) contraction that
the pure iso-stress assumption lets each layer do freely.  That residual
constraint stiffens the laminate — a real micromechanical effect, not a
numerical error.

## Summary

* A `Model` bundles geometry (sections), materials, boundary conditions,
  mesh and results; the workflow is always geom → assign → BCs → mesh →
  solve → post-process.
* Displacement- and force-controlled boundary conditions can be mixed per
  edge and per component.
* The two laminate orientations reproduce the classic Voigt (iso-strain,
  upper) and Reuss (iso-stress, lower) bounds — the standard sanity checks
  for any homogenization workflow (they anchor this package's regression
  tests, mirroring the reference's `tests/test_basic.py`).
* The same models run unchanged on TPU through
  `pylabfea_tpu.bridge.solve_on_device` — including multi-material plane
  stress (the per-layer thickness-strain condensation is handled on
  device)."""),
]

# ---------------------------------------------------------------- 02
plast = [
md("""# Plasticity

This notebook introduces elastic-plastic materials: the J2 (von Mises)
yield criterion with isotropic work-hardening, Hill-type anisotropy, and
their use inside the FE solver.

**Background.**  A plastic material is elastic until the *equivalent
stress* reaches the flow stress; beyond that, plastic strain accumulates
along the yield surface's normal (associated flow).  The constitutive
pieces are:

* the **yield function** f(σ) = σ_eq(σ) − σ_flow(ε_pl): negative = elastic,
  zero = plastic flow;
* the **flow stress** σ_flow = σ_y + H·ε_pl^eq (linear isotropic hardening
  with modulus `khard`; a saturating Voce term is also available);
* the **equivalent stress**: J2 for isotropic metals, the 3- or 6-parameter
  **Hill** quadratic for rolled/textured metals, plus Tresca, Barlat
  Yld2004-18p and Drucker/tension-compression-asymmetric forms.

`Material.calc_properties` *characterizes* a material by actually running
small plane-stress FE models along four canonical load paths — uniaxial x
(`stx`), uniaxial y (`sty`), equibiaxial (`et2`) and pure shear (`ect`) —
and recording the homogenized stress-strain curves.  The material measures
itself with the solver; this inversion (materials drive FE models) is a
design signature inherited from the reference."""),
code("""import numpy as np
import matplotlib.pyplot as plt
import pylabfea_tpu as FE

mat = FE.Material(name='J2 with hardening')
mat.elasticity(E=200.e3, nu=0.3)
mat.plasticity(sy=150., khard=2000., sdim=3)
mat.calc_properties(eps=0.05, sigeps=True)
for sel in ('stx', 'sty', 'et2', 'ect'):
    print(f"{sel}: yield strength {mat.propJ2[sel]['ys']:.2f} MPa")"""),
md("""For an isotropic J2 material all four paths yield at (almost) the
same equivalent stress — the yield locus is a circle in the deviatoric
plane.  The stress-strain curves show the elastic slope, the yield knee at
σ_y = 150 MPa, and the linear hardening branch:"""),
code("""mat.plot_stress_strain()"""),
md("""## Anisotropic (Hill) plasticity

The 3-parameter Hill criterion replaces J2's equal weighting of the
principal-stress differences with ratios h1:h2:h3 — the yield locus becomes
an ellipse whose axes no longer align with the isotropic one.  Physically
these arise from crystallographic texture (rolling directions).  With
`hill=[0.7, 1., 1.4]` the material is *stronger* along x and *weaker* along
y than its J2 counterpart:"""),
code("""mat_h = FE.Material(name='Hill')
mat_h.elasticity(E=200.e3, nu=0.3)
mat_h.plasticity(sy=150., hill=[0.7, 1., 1.4], khard=100., sdim=3)
mat_h.calc_properties(eps=0.05)
print('uniax-x ys:', round(mat_h.propJ2['stx']['ys'], 2))
print('uniax-y ys:', round(mat_h.propJ2['sty']['ys'], 2))"""),
md("""The yield locus plot makes the anisotropy visible (the dashed circle
is the isotropic J2 reference):"""),
code("""mat_h.plot_yield_locus(iso=True);"""),
md("""## Elastic-plastic FE model

Plastic materials drop into FE models exactly like elastic ones.  Here a
two-section model combines an elastic phase with the hardening J2 material
under vertical tension; the solver's incremental load stepping detects
yield onset (scaling the first increment to just touch the yield surface),
then iterates each increment's return map to equilibrium.

The `peeq` field (accumulated equivalent plastic strain) shows plasticity
concentrated in the softer yielding phase:"""),
code("""mat_el = FE.Material()
mat_el.elasticity(E=100.e3, nu=0.35)
fem = FE.Model(dim=2, planestress=False)
fem.geom([2, 2], LY=4.)
fem.assign([mat_el, mat])
fem.bcleft(0.); fem.bcbot(0.)
fem.bcright(0., 'force')
fem.bctop(0.1 * fem.leny, 'disp')
fem.mesh(NX=4, NY=4)
fem.solve()
fem.calc_global()
print('global plastic strain:', fem.glob['epl'].round(5))
fem.plot('peeq', mag=1, showfig=False)
plt.show()"""),
md("""## Summary

* `plasticity(sy=…, khard=…, hill=…, sdim=…)` defines the yield criterion;
  `sdim=3` works in principal-stress space, `sdim=6` on full Voigt stresses
  (needed for shear-anisotropic Hill-6p, Barlat, and ML yield functions).
* `calc_properties` characterizes any material by running the FE solver on
  canonical load paths; `plot_stress_strain` and `plot_yield_locus`
  visualize the result.
* On the device profile the same return map runs as a batched cutting-plane
  projection over all elements at once (`ops.constitutive.response_fast`) —
  see `05_TPU_Scaling` for the 10^6-element version of this workflow."""),
]

# ---------------------------------------------------------------- 04
mlfr = [
md("""# Machine-Learned Flow Rules

The package's distinguishing capability (inherited from the reference and
re-built TPU-first): an RBF-kernel **support vector classifier** trained on
stress states labeled elastic (−1) / plastic (+1) becomes *the yield
surface* of an FE material.  The SVC decision function

f(σ) = Σ_i α_i·exp(−γ‖x(σ) − x_i‖²) + ρ

is smooth, so its **analytic gradient** supplies the flow direction and its
Hessian the curvature — everything a return map and a consistent tangent
need.  On TPU, f and ∇f evaluate as one (N, n_sv) matmul + exp kernel over
all Gauss points at once — the constitutive hot loop maps straight onto the
MXU.

**Why learn a yield function at all?**  Real micromechanical data (CPFEM
simulations, experiments) rarely follow any closed-form criterion.  The SVC
interpolates *any* convex-ish locus from labeled stress states, including
work-hardening and texture dependence as extra feature dimensions (see the
`Train_CPFEM` / `Texture` examples).

Here we do the canonical exercise: train an ML yield function from a known
**Hill** reference, then verify the ML material reproduces the reference's
anisotropic strengths inside the FE solver."""),
code("""import numpy as np
import matplotlib.pyplot as plt
import pylabfea_tpu as FE

E, nu, sy = 200.e3, 0.3, 150.
mat_h = FE.Material(name='Hill reference')
mat_h.elasticity(E=E, nu=nu)
mat_h.plasticity(sy=sy, hill=[0.7, 1., 1.4], sdim=3)

mat_ml = FE.Material(name='ML flow rule')
mat_ml.elasticity(E=E, nu=nu)
mat_ml.plasticity(sy=sy, sdim=3)
x_train, y_train = mat_ml.create_sig_data(36, mat_ref=mat_h, extend=True)
train_sc, _ = mat_ml.setup_yf_SVM_3D(x_train, y_train, C=10, gamma=4., fs=0.3)
print(f'training score: {train_sc:.2f}%')"""),
md("""**What just happened:** `create_sig_data` distributed 36 load
directions evenly on the deviatoric circle, root-found the Hill locus along
each, and scaled the yield stresses into an elastic band (label −1) and a
plastic band (label +1).  `setup_yf_SVM_3D` mapped them to cylindrical
features (σ_eq/σ_y − 1, θ/π) — with periodic-θ augmentation so the locus
closes seamlessly — and fitted the SVC.

The polar plot compares the learned locus (line) against the Hill reference
(dots): the SVC interpolates the ellipse from 36 directions to a fraction
of the yield-band width."""),
code("""# polar plot of the learned yield locus vs. the Hill reference
mat_ml.polar_plot_yl(cmat=[mat_h], sJ2=True, show=False);
plt.show()"""),
md("""## Using the ML material in FEA

`calc_properties` runs the FE solver with the SVC as the constitutive
yield surface.  Every return map now involves locating the locus along the
stress path — a bracketed Brent root find on the decision function (the
host profile mirrors the reference's algorithm; the device profile runs the
same search as a vectorized while-loop over all points).  The ML strengths
land on the Hill reference's anisotropy:"""),
code("""mat_ml.calc_properties(eps=0.01, sigeps=True, min_step=12)
for sel in ('stx', 'sty', 'ect'):
    print(f"{sel}: ML ys = {mat_ml.propJ2[sel]['ys']:.2f} MPa  "
          f"(Hill reference anisotropy: {mat_h.propJ2[sel]['ys']:.2f})"
          if mat_h.prop_calculated else
          f"{sel}: ML ys = {mat_ml.propJ2[sel]['ys']:.2f} MPa")
mat_ml.plot_stress_strain()"""),
md("""## 6-D stress space and UMAT export

With `sdim=6` the SVC features are the full Voigt stress (6 components /
σ_y-scale), so shear anisotropy (Hill-6p, Barlat) and non-coaxial load
paths are learnable.  `train_SVC` is the one-call trainer: it generates the
training bands from the reference material, fits, and scores.

`export_MLparam` writes the trained parameters (support vectors, dual
coefficients, intercept, γ, scalings, elastic constants) to the
CSV + JSON interchange contract consumed by

* the **native C++ kernel** (`native/ml_umat.cpp`, a Fortran-ABI `umat_`
  shim for Abaqus — the TPU-era twin of the reference's `ml_umat.f`), and
* `Material.from_MLparam`, which reconstructs a working material from the
  files (the reference stubs this direction).

For serving, `Material.compress_svc` re-expresses the decision function
over fewer RBF centers with a guaranteed decision-function error bound
(reduced-set compression) — inference cost is linear in the center
count."""),
code("""mat_h6 = FE.Material(name='Hill-6D')
mat_h6.elasticity(E=E, nu=nu)
mat_h6.plasticity(sy=sy, hill=[1.4, 1., 0.7, 1.2, .8, 1.], sdim=6)
mat_6d = FE.Material('ML-Hill-6D')
mat_6d.train_SVC(C=2, gamma=0.5, mat_ref=mat_h6, Nseq=4, Nlc=300, Fe=0.7, Ce=0.95)
mat_6d.dev_only = False
import os; os.makedirs('models', exist_ok=True)
mat_6d.export_MLparam('notebook', file='ML-Hill-6D', path='models/')
print('exported models/ML-Hill-6D-svm.csv')
print('support vectors:', mat_6d._svc.support_vectors.shape)"""),
md("""## Summary

* `train_SVC` / `setup_yf_SVM_3D/6D` turn labeled stress states into a
  smooth, differentiable yield surface; any data source works (analytic
  reference, CPFEM databases via `Data`, experiments).
* The trained material behaves like any other `Material` in the solver —
  `calc_properties`, FE models, plotting all work unchanged.
* `export_MLparam` / `from_MLparam` / the native UMAT close the loop to
  commercial FE codes; `compress_svc` optimizes inference for serving.
* On TPU the decision function + gradient evaluate fused over the whole
  mesh per Newton iteration (`ops.constitutive.svc_decision_and_gradient`)
  — the flagship benchmark (`bench.py`) measures ~10^7 of these return
  maps per second on one chip."""),
]

# ---------------------------------------------------------------- 06
comp = [
md("""# Micromechanics of Elastic Composites

Laminate models of two-phase composites under iso-strain (Voigt) and
iso-stress (Reuss) conditions, and the effective stiffness across the full
volume-fraction range.  This mirrors the reference's `pyLabFEA_Composites`
notebook (sections/geom/assign/BC/mesh/solve/post) and extends it with the
bound-crossing study.

**The two classical bounds.**  For a two-phase composite with volume
fractions v₁, v₂ and moduli E₁, E₂:

* **Voigt** (iso-strain, layers parallel to load): E = v₁E₁ + v₂E₂ — the
  arithmetic mean, an *upper* bound;
* **Reuss** (iso-stress, layers in series): 1/E = v₁/E₁ + v₂/E₂ — the
  harmonic mean, a *lower* bound.

Any real microstructure falls between them; laminates loaded along /
across the layers *realize* them (up to interface-compatibility effects,
visible below)."""),
code("""import numpy as np
import matplotlib.pyplot as plt
import pylabfea_tpu as FE

mat1 = FE.Material(num=1)           # stiff phase
mat1.elasticity(E=300.e3, nu=0.3)
mat2 = FE.Material(num=2)           # compliant phase
mat2.elasticity(E=100.e3, nu=0.3)"""),
md("""## Laminate under iso-strain conditions (Voigt model)

Load applied *parallel* to the layers: compatibility forces every layer to
the same axial strain, so stresses partition by stiffness and the effective
modulus is the Voigt average."""),
code("""fem_v = FE.Model(dim=2, planestress=True)
fem_v.geom([2, 1, 2, 1, 2], LY=4.)              # 5 vertical sections
fem_v.assign([mat1, mat2, mat1, mat2, mat1])
fem_v.bcbot(0.)
fem_v.bcleft(0.)
fem_v.bcright(0., 'force')                      # lateral faces free
fem_v.bctop(0.004 * fem_v.leny, 'disp')         # uniaxial y-stretch
fem_v.mesh(NX=16, NY=4)
fem_v.solve()
fem_v.calc_global()
E_fem = fem_v.glob['sig'][1] / fem_v.glob['eps'][1]
vf1 = 6. / 8.
E_voigt = vf1 * 300.e3 + (1 - vf1) * 100.e3
print(f'FE modulus {E_fem:.1f} MPa, Voigt bound {E_voigt:.1f} MPa')"""),
md("""The axial-stress field shows the 3:1 partitioning between stiff and
soft layers at equal strain:"""),
code("""fem_v.plot('stress2', mag=10, shownodes=False)"""),
md("""## Laminate under iso-stress conditions (Reuss model)

Load applied *perpendicular* to the layers: every layer carries (nearly)
the same stress, strains add in series, and the stiffness drops to the
Reuss average."""),
code("""fem_r = FE.Model(dim=2, planestress=True)
fem_r.geom([2, 1, 2, 1, 2], LY=4.)
fem_r.assign([mat1, mat2, mat1, mat2, mat1])
fem_r.bcbot(0.)
fem_r.bcleft(0.)
fem_r.bctop(0., 'force')
fem_r.bcright(0.004 * fem_r.lenx, 'disp')       # stretch across the layers
fem_r.mesh(NX=16, NY=4)
fem_r.solve()
fem_r.calc_global()
E_fem_r = fem_r.glob['sig'][0] / fem_r.glob['eps'][0]
E_reuss = 1. / (vf1 / 300.e3 + (1 - vf1) / 100.e3)
print(f'FE modulus {E_fem_r:.1f} MPa, Reuss bound {E_reuss:.1f} MPa')"""),
md("""Note the FE value lies slightly *above* the Reuss bound — the layers
are laterally constrained by compatibility at the interfaces, which the
pure iso-stress assumption ignores.  The mismatch in Poisson contraction
between the phases builds an interface stress state that stiffens the
stack; the effect grows with the phase contrast and vanishes for matched
Poisson ratios."""),
md("""## Effective stiffness vs. volume fraction

Sweeping the stiff-phase fraction from 0 to 1 with an iso-strain laminate
traces the Voigt line; the Reuss curve is plotted for comparison.  Any
microstructure's effective stiffness lives between the two curves —
the fan they span is the *design space* of two-phase composites at a given
phase contrast."""),
code("""nmax = 8
vf = np.zeros(nmax + 1)
E_eff = np.zeros(nmax + 1)
for n in range(nmax + 1):
    w1 = n                         # width of stiff section
    fem = FE.Model(dim=2, planestress=True)
    if n == 0:
        fem.geom([nmax]); fem.assign([mat2])
    elif n == nmax:
        fem.geom([nmax]); fem.assign([mat1])
    else:
        fem.geom([w1, nmax - w1]); fem.assign([mat1, mat2])
    fem.geom_y = None
    fem.bcbot(0.); fem.bcleft(0.); fem.bcright(0., 'force')
    fem.bctop(0.002 * fem.leny, 'disp')
    fem.mesh(NX=nmax, NY=2)
    fem.solve(); fem.calc_global()
    vf[n] = n / nmax
    E_eff[n] = fem.glob['sig'][1] / fem.glob['eps'][1]

plt.plot(vf, vf * 300.e3 + (1 - vf) * 100.e3, 'k--', label='Voigt')
plt.plot(vf, 1. / (vf / 300.e3 + (1 - vf) / 100.e3), 'k:', label='Reuss')
plt.plot(vf, E_eff, 'ro-', label='FE (iso-strain laminate)')
plt.xlabel('volume fraction stiff phase'); plt.ylabel('E_eff (MPa)')
plt.legend(); plt.show()"""),
md("""## Summary

* Laminates loaded along / across their layers realize the Voigt / Reuss
  bounds; the FE models reproduce both (small deviations are real
  interface-compatibility physics, not numerics).
* These checks anchor this package's regression suite — as they do the
  reference's (`tests/test_basic.py`).
* Multi-material plane-stress laminates also run on the **device profile**
  (TPU): the per-layer thickness-strain condensation is carried in the
  mesh's `ps_b2` planes, so `bridge.solve_on_device` handles the models in
  this notebook unchanged — at 10^6-element scale for resolved
  microstructures (`05_TPU_Scaling`)."""),
]

write('01_Introduction.ipynb', intro)
write('02_Plasticity.ipynb', plast)
write('04_ML_FlowRule.ipynb', mlfr)
write('06_Composites.ipynb', comp)
