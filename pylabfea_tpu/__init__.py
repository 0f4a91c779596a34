"""pylabfea_tpu — TPU-native Laboratory for Finite Element Analysis.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of pyLabFEA
(AHartmaier/pyLabFEA v4.4.2): elastic-plastic FEA on 1-D/2-D meshes,
analytic yield functions (J2/Hill/Tresca/Barlat/Drucker/LHS), machine-learned
(SVC) yield functions with analytic gradients, micromechanical data import,
and trained-parameter export for Abaqus UMATs.

Public API mirrors the reference package so existing pyLabFEA workflows can
switch imports unchanged.
"""
from pylabfea_tpu import config  # noqa: F401  (enables x64; must be first)

from pylabfea_tpu.core.tensors import (  # noqa: F401
    Strain, Stress, a_vec, b_vec, yf_tolerance,
    eps_eq, sig_polar_ang, sig_princ2cyl,
    sig_eq_j2, sig_cyl2princ, sig_cyl2voigt, sig_princ,
    pickle2mat, sig_dev, sig_spherical_to_cartesian,
    seq_J2, sprinc, sp_cart, svoigt, s_cyl, sdev, polar_ang,
)

__version__ = "0.1.0"
#: reference-compatible alias (pylabfea exposes ``version``)
version = __version__
__all__ = [
    "Strain", "Stress", "a_vec", "b_vec", "yf_tolerance",
    "eps_eq", "sig_polar_ang", "sig_princ2cyl",
    "sig_eq_j2", "sig_cyl2princ", "sig_cyl2voigt", "sig_princ",
    "pickle2mat", "sig_dev", "sig_spherical_to_cartesian",
    "Model", "Material", "Data",
    "find_transition_index", "get_elastic_coefficients",
    "load_cases", "training_score", "create_test_sig",
]


def __getattr__(name):
    # lazy imports to keep basic tensor use light-weight
    if name == "Model":
        from pylabfea_tpu.femodel import Model
        return Model
    if name == "Material":
        from pylabfea_tpu.materials import Material
        return Material
    if name in ("Data", "find_transition_index", "get_elastic_coefficients",
                "ln_strain", "eng_strain", "interpolate_stress"):
        from pylabfea_tpu import dataio
        return getattr(dataio, name)
    if name in ("load_cases", "training_score", "create_test_sig",
                "uniform_hypersphere", "int_sin_m", "primes"):
        from pylabfea_tpu import training
        return getattr(training, name)
    if name == "bridge":
        import importlib
        return importlib.import_module("pylabfea_tpu.bridge")
    if name in ("fit_svc_jax", "train_svc_jax"):
        from pylabfea_tpu import ml_train
        return getattr(ml_train, name)
    raise AttributeError(f"module 'pylabfea_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | {
        "Model", "Material", "Data", "find_transition_index",
        "get_elastic_coefficients", "ln_strain", "eng_strain",
        "interpolate_stress", "load_cases", "training_score",
        "create_test_sig", "uniform_hypersphere", "int_sin_m", "primes",
        "bridge", "fit_svc_jax", "train_svc_jax"})
