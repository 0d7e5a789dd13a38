"""Multi-host bring-up: one global mesh spanning TPU hosts/slices.

The reference never built multi-node sharding (`packages/vaex-distributed/`
is a README stub; SURVEY.md §2.3 marks it as where this framework goes
beyond).  The TPU-native story is JAX multi-controller SPMD: every host
process runs the same program, `jax.distributed.initialize` wires the
processes into one runtime, and `jax.devices()` becomes the *global* device
list — the executor's existing mesh/shard_map path then spans hosts with no
further changes (grid replicas merge over ICI/DCN via XLA collectives).

Launch recipe (N hosts, same script on each)::

    # host i of N (TPU pods auto-detect all three values; on CPU/GPU pass
    # them explicitly or via env):
    import vaex_tpu.parallel.distributed as vdist
    vdist.initialize(coordinator_address="10.0.0.1:8476",
                     num_processes=N, process_id=i)
    import vaex_tpu as vaex
    df = vaex.open("data.hdf5")        # every host opens the same file
    df.mean("E", binby=["x", "y"], shape=256)   # one pass over the global mesh

Environment-variable equivalents: ``VAEX_TPU_COORDINATOR``,
``VAEX_TPU_NUM_PROCESSES``, ``VAEX_TPU_PROCESS_ID`` (standard JAX cluster
auto-detection — TPU metadata, SLURM, Open MPI — is tried first).

Every process streams the same chunk boundaries; each chunk's rows are
sharded over the global mesh, so each host's devices aggregate a distinct
row range and the final replica merge reduces over DCN.  Tested two-process
on a virtual CPU mesh in tests/distributed_test.py (the reference's
run-a-real-server-in-tests strategy, tests/common.py:225-241).
"""

from __future__ import annotations

import os

import numpy as np

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Wire this process into a multi-host JAX runtime.

    Arguments default to ``VAEX_TPU_COORDINATOR`` / ``VAEX_TPU_NUM_PROCESSES``
    / ``VAEX_TPU_PROCESS_ID`` env vars; on TPU pods all three are
    auto-detected by JAX and may be omitted entirely.  Must be called before
    any other JAX API touches the backend.  No-op if already initialized.
    """
    coordinator_address = coordinator_address or os.environ.get("VAEX_TPU_COORDINATOR")
    if num_processes is None and "VAEX_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VAEX_TPU_NUM_PROCESSES"])
    if process_id is None and "VAEX_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VAEX_TPU_PROCESS_ID"])
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_initialized():
    return jax._src.distributed.global_state.client is not None


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def global_mesh():
    """1-D mesh over every device of every host (row-sharded passes)."""
    from .mesh import AXIS
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (AXIS,))


def shutdown():
    if is_initialized():  # pragma: no cover - end-of-process cleanup
        jax.distributed.shutdown()
