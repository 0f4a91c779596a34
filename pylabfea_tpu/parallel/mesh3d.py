"""Multi-chip execution of the 3-D hex8 solver: shard the element axis.

The 3-D workload has the same communication structure as the 2-D one
(parallel/mesh.py): return maps are purely elementwise, and the only
cross-element coupling is the scatter-add of the partial-assembly
K-apply.  Element-dimension arrays — the (Nel, 6) states and the
(36, NX, NY, NZ) tangent volumes — are sharded over a 1-D device-mesh
axis ``'x'`` (the element x-axis, which the flat element order is major
in), while nodal volumes stay replicated; under ``jit`` XLA SPMD
partitions the elementwise graphs along the sharded axis and inserts the
AllReduce for the nodal scatter-adds automatically — no hand-written
collectives.  8-virtual-device parity vs the single-device step: 3e-14
(tests/test_fe3d.py).

Nodal volumes cannot shard on this JAX version because nnX = NX + 1 is
not divisible by the device count.  For meshes whose nodal fields no
longer fit replicated (at 256^3 the nodal tuple is ~0.8 GB — replication
holds to well beyond that), ``parallel/sharded3.py`` provides the
domain-decomposed alternative: x-slab volume sharding with explicit
ppermute halo-plane exchange and a two-level Schwarz preconditioner.

Known limitation: the fused Pallas volume kernel (``ops/volume_pallas``)
is not GSPMD-partitionable, so ``fe3d._stencil3_ok`` auto-disables it in
multi-device processes (the sharded step falls back to the unrolled XLA
apply, which XLA partitions along 'x' like every other elementwise
graph).  Single-chip runs keep the kernel."""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pylabfea_tpu.ops.fe3d import MeshData3D, SolverState3


def make_mesh3(n_devices=None):
    """1-D device mesh over the element x-axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ('x',))


def shard_mesh_data3(md: MeshData3D, mesh: Mesh) -> MeshData3D:
    """Replicate the shared/nodal arrays of a MeshData3D on the mesh (the
    element-dimension arrays live in the SolverState3)."""
    rep = NamedSharding(mesh, P())
    dev = lambda x: jax.device_put(x, rep)
    return md._replace(
        B=dev(md.B), Bsum=dev(md.Bsum), jacw=dev(md.jacw), vel=dev(md.vel),
        fixed=dev(md.fixed), fixed_val=dev(md.fixed_val),
        force=dev(md.force), perm=dev(md.perm), inv_perm=dev(md.inv_perm))


def shard_state3(state: SolverState3, mesh: Mesh) -> SolverState3:
    """Shard element states over 'x' (flat element order is x-major, so
    P('x') on the leading Nel axis aligns with P(None, 'x') on the tangent
    volumes); nodal vectors stay replicated."""
    el = NamedSharding(mesh, P('x'))
    elv = NamedSharding(mesh, P(None, 'x'))
    rep = NamedSharding(mesh, P())
    return SolverState3(
        u=jax.device_put(state.u, rep),
        sig=jax.device_put(state.sig, el),
        epl=jax.device_put(state.epl, el),
        eps=jax.device_put(state.eps, el),
        elstiff=jax.device_put(state.elstiff, elv))
