"""Multi-chip execution: shard the element dimension over a device mesh.

The FE workload is data-parallel over elements/Gauss points: the return map
is purely elementwise, and the only cross-element coupling is the
scatter-add in the matrix-free K-apply.  We therefore shard every
(Nel, ...) array over a 1-D ``jax.sharding.Mesh`` axis ``'e'`` and keep the
global DOF vectors replicated; under ``jit`` XLA SPMD partitions the
batched einsums along the sharded axis and turns the scatter-add into an
AllReduce over ICI automatically — no hand-written collectives in the
solver.  (Domain-decomposed DOF sharding with ppermute halos is the planned
next stage for meshes whose DOF vectors no longer fit replicated.)
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pylabfea_tpu.ops.fe_kernels import MeshData, SolverState


def make_mesh(n_devices=None):
    """1-D device mesh over the element axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ('e',))


def shard_mesh_data(md: MeshData, mesh: Mesh) -> MeshData:
    """Place element-dimension arrays of a MeshData on the mesh (sharded
    over 'e'); shared/replicated arrays get fully-replicated sharding."""
    el = NamedSharding(mesh, P('e'))
    rep = NamedSharding(mesh, P())
    dev = lambda x, s: jax.device_put(x, s)
    return MeshData(
        dofs=dev(md.dofs, el),
        B=dev(md.B, rep),
        Bsum=dev(md.Bsum, rep),
        jacw=dev(md.jacw, rep),
        vel=dev(md.vel, rep),
        fixed=dev(md.fixed.reshape(-1), rep),
        fixed_val=dev(md.fixed_val.reshape(-1), rep),
        force=dev(md.force.reshape(-1), rep),
        perm=dev(md.perm, rep),
        inv_perm=dev(md.inv_perm, rep),
        ps_b2=dev(md.ps_b2, rep),
        ndof=md.ndof, nel=md.nel, grid=None, groups=md.groups)


def shard_state(state: SolverState, mesh: Mesh) -> SolverState:
    """Shard the element state over 'e'; nodal vectors stay replicated."""
    el = NamedSharding(mesh, P('e'))
    rep = NamedSharding(mesh, P())
    return SolverState(
        u=jax.device_put(state.u.reshape(-1), rep),
        sig=jax.device_put(state.sig, el),
        epl=jax.device_put(state.epl, el),
        eps=jax.device_put(state.eps, el),
        elstiff=jax.device_put(state.elstiff, el))
