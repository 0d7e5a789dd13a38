"""Device meshes and sharded aggregation passes.

The reference's intra-node parallelism is a CPU thread pool where each worker
owns a `thread_index` slot of mutable aggregation state merged after the pass
(/root/reference/packages/vaex-core/vaex/multithreading.py:48-120 +
agg.py:291-303 split-K grid copies).  The TPU-native translation
(SURVEY.md §2.3): rows of every streamed chunk are sharded over a 1-D
`jax.sharding.Mesh` with `shard_map`, each device scatter-updates its own
grid replica (the leading axis of the state), and replicas are reduced once
when the pass finishes — `psum`-style merge without per-chunk collectives.

The same mesh machinery scales to multi-host: JAX multi-controller over DCN
presents one global mesh; nothing here changes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import settings

AXIS = "d"


def default_mesh():
    """1-D mesh over all visible devices; None for a single device."""
    if settings.compute.sharding == "none":
        return None
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    return Mesh(np.array(devices), (AXIS,))


def make_mesh(n_devices=None):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def replicate_state(state, n_devices):
    """Give every device its own grid replica: leading axis [D, ...]."""
    return jax.tree_util.tree_map(
        lambda a: jnp.tile(a[None], (n_devices,) + (1,) * a.ndim), state)


def merge_replicas(plans, states_np):
    """Host-side reduction of per-device replicas (axis 0) with each agg's
    merge op (the reference's Aggregator::merge, agg_base.hpp:70)."""
    merged = []
    for plan, state in zip(plans, states_np):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        n_dev = leaves[0].shape[0]
        acc = jax.tree_util.tree_unflatten(treedef, [l[0] for l in leaves])
        for d in range(1, n_dev):
            other = jax.tree_util.tree_unflatten(treedef, [l[d] for l in leaves])
            acc = plan.op.merge(acc, other)
        merged.append(acc)
    return merged


def merge_replicas_device(plans, states, mesh):
    """On-device tree reduction of the replica axis (axis 0) with each agg's
    merge op; outputs are fully replicated, so every process fetches its own
    local copy — the multi-host-safe merge (replicas on remote hosts reduce
    over ICI/DCN via the collectives XLA inserts for the resharding), and on
    a single host it shrinks the D2H fetch from D replicas to one grid."""
    from jax.sharding import NamedSharding

    def reduce_all(states):
        out = []
        for plan, state in zip(plans, states):
            leaves, treedef = jax.tree_util.tree_flatten(state)
            n_dev = leaves[0].shape[0]
            parts = [jax.tree_util.tree_unflatten(treedef, [l[d] for l in leaves])
                     for d in range(n_dev)]
            while len(parts) > 1:  # log-depth merge tree (merge is associative)
                half = len(parts) // 2
                merged = [plan.op.merge(parts[i], parts[half + i]) for i in range(half)]
                if len(parts) % 2:
                    merged.append(parts[-1])
                parts = merged
            out.append(parts[0])
        return tuple(out)

    replicated = NamedSharding(mesh, P())
    return jax.jit(reduce_all, out_shardings=replicated)(tuple(states))


def mesh_process_count(mesh):
    """Number of distinct host processes owning the mesh's devices."""
    return len({d.process_index for d in mesh.devices.flat})


def put_sharded(mesh, padded, replicate=False):
    """Host array → global device array laid out over the mesh.

    Row-sharded (axis 0 split over the mesh devices) or fully replicated.
    Works on multi-host meshes: each process places only the shards of its
    own addressable devices (jax.make_array_from_single_device_arrays)."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, P() if replicate else P(AXIS))
    devices = list(mesh.devices.flat)
    if mesh_process_count(mesh) == 1:
        return jax.device_put(padded, sharding)
    pidx = jax.process_index()
    if replicate:
        locals_ = [jax.device_put(padded, d) for d in devices if d.process_index == pidx]
    else:
        Ld = padded.shape[0] // len(devices)
        locals_ = [jax.device_put(padded[i * Ld:(i + 1) * Ld], d)
                   for i, d in enumerate(devices) if d.process_index == pidx]
    return jax.make_array_from_single_device_arrays(padded.shape, sharding, locals_)


def shard_pass(step_local, mesh, L_local):
    """Wrap a per-device step into a shard_map over rows.

    step_local(states, inputs, masks, n_valid, i1, row_offset) -> states
    where row_offset is this device's global starting row within the chunk
    and L_local is the static per-device row count.
    """
    def sharded(states, inputs, masks, n_valid, i1):
        def local(states, inputs, masks, n_valid, i1):
            d = jax.lax.axis_index(AXIS)
            row_offset = d.astype(jnp.int64) * L_local
            states = jax.tree_util.tree_map(lambda a: a.reshape(a.shape[1:]), states)
            new_states = step_local(states, inputs, masks, n_valid, i1, row_offset)
            return jax.tree_util.tree_map(lambda a: a[None], new_states)

        state_spec = jax.tree_util.tree_map(lambda _: P(AXIS), states)
        # runtime binner-limit / hashmap-table inputs are per-run values,
        # not row vectors — replicate them to every device
        # (execution._binner_slots / _hashmap_table_vars)
        in_spec = {k: (P() if k.startswith(("__binlims", "__hashtab")) else P(AXIS))
                   for k in inputs}
        mask_spec = jax.tree_util.tree_map(lambda _: P(AXIS), masks)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(state_spec, in_spec, mask_spec, P(), P()),
            out_specs=state_spec,
            check_vma=False,
        )(states, inputs, masks, n_valid, i1)

    return sharded
