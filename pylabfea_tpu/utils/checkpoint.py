"""Checkpoint / resume for solver state and materials.

The reference pickles whole Material objects (material.py:2275) and keeps
solver state implicitly on the Model for resumable loading.  Here state is
explicit: ``SolverState`` (device solver) and Model fields are PyTrees of
arrays, serialized to a single ``.npz`` with a JSON manifest — portable,
versionable, and loadable without unpickling code.
"""
import json

import numpy as np
import jax.numpy as jnp

from pylabfea_tpu.ops.fe_kernels import SolverState

_FORMAT_VERSION = 1


def save_state(path, state: SolverState, meta=None):
    """Write a SolverState (plus an optional JSON-serializable meta dict)."""
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    manifest = {'format': _FORMAT_VERSION, 'fields': list(state._fields),
                'meta': meta or {}}
    np.savez_compressed(path, __manifest__=json.dumps(manifest), **arrays)


def load_state(path, dtype=None):
    """Load a SolverState; returns (state, meta)."""
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z['__manifest__']))
        if manifest['format'] > _FORMAT_VERSION:
            raise ValueError(f'checkpoint format {manifest["format"]} is '
                             'newer than this build supports')
        arrays = {f: jnp.asarray(z[f], dtype=dtype)
                  for f in manifest['fields']}
    return SolverState(**arrays), manifest['meta']


def save_model(path, model, meta=None):
    """Checkpoint a host ``Model``: displacements, forces, element state and
    BC memory, so ``solve()`` can resume loading after a restart."""
    arrays = {
        'u': model.u, 'f': model.f,
        'sgl': model.sgl, 'egl': model.egl, 'epgl': model.epgl,
        'bct_mem': model.bct_mem, 'bcr_mem': model.bcr_mem,
        'el_sig': np.array([el.sig for el in model.element]),
        'el_eps': np.array([el.eps for el in model.element]),
        'el_epl': np.array([el.epl for el in model.element]),
        'el_elstiff': np.array([el.elstiff for el in model.element]),
    }
    if getattr(model, 'noset', None) is not None:
        arrays['bcn_mem'] = model.bcn_mem
    manifest = {'format': _FORMAT_VERSION, 'meta': meta or {},
                'nel': len(model.element)}
    np.savez_compressed(path, __manifest__=json.dumps(manifest), **arrays)


def load_model(path, model):
    """Restore a checkpoint into a meshed ``Model`` (same mesh/materials)."""
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z['__manifest__']))
        if manifest['nel'] != len(model.element):
            raise ValueError('checkpoint mesh does not match model mesh')
        model.u = z['u']
        model.f = z['f']
        model.sgl = z['sgl']
        model.egl = z['egl']
        model.epgl = z['epgl']
        model.bct_mem = z['bct_mem']
        model.bcr_mem = z['bcr_mem']
        if 'bcn_mem' in z:
            model.bcn_mem = z['bcn_mem']
        for i, el in enumerate(model.element):
            el.sig = z['el_sig'][i]
            el.eps = z['el_eps'][i]
            el.epl = z['el_epl'][i]
            el.elstiff = z['el_elstiff'][i]
            el.calc_Kel()
    return manifest['meta']
