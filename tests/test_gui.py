"""GUI composite-model physics, headless (no tkinter): the reference GUI
runs an elastic-plastic composite — J2+hardening matrix around an elastic
filler — with a lateral-BC selector (reference gui.py:88-92, 140)."""
import numpy as np
import pytest

from pylabfea_tpu.gui import build_composite_model


def test_composite_plastic_force_sides():
    fe = build_composite_model(NX=9, strain=0.02, sides='force')
    fe.solve()
    peeq = np.array([np.sqrt(2. / 3. * e.epl[:3] @ e.epl[:3])
                     for e in fe.element])
    assert peeq.max() > 1e-3          # the matrix actually yields
    mats = {id(e.Mat) for e in fe.element}
    assert len(mats) == 2
    # force-free sides: lateral global stress ~ 0
    assert abs(fe.glob['sig'][0]) < 1e-6 * abs(fe.glob['sig'][1])


def test_composite_lateral_disp_sides():
    fe = build_composite_model(NX=9, strain=0.02, sides='disp')
    fe.solve()
    # laterally constrained: transverse stress develops
    assert abs(fe.glob['sig'][0]) > 1e-3 * abs(fe.glob['sig'][1])


def test_composite_rejects_bad_sides():
    with pytest.raises(ValueError):
        build_composite_model(NX=6, sides='frce')
