"""Multi-host initialization and mesh construction (SURVEY 2.11).

The reference has no distributed backend at all (its only concurrency is
a single-host worker pool); the TPU-native replacement is jax collectives
over ICI within a slice and DCN across hosts.  This module is the thin
entry point:

* `init()` wires the process into a multi-controller jax.distributed
  cluster (coordinator/rank discovery via the standard env vars or
  explicit arguments) — call once per host before building meshes.
* `prover_mesh()` returns the 1-D "d" mesh every sharded op in this
  framework consumes (TpuMSM.run_sharded, parallel.sharded.ntt_sharded /
  group_intt_sharded, the provers' mesh= kwarg).  Device order is chosen
  so that neighboring mesh positions live on the same host where
  possible: the MSM's cross-device traffic is a few KB of window
  partials, but the four-step NTT's all-to-all moves each element once,
  so intra-host edges ride ICI and only the unavoidable residue crosses
  DCN.

Single-chip / single-host processes can use everything here without
calling init() — prover_mesh() just wraps the local devices.
"""

from __future__ import annotations

import os

import numpy as np


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host run.

    Arguments default to the standard launcher env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the TPU pod metadata when running on one).  Returns True when a
    multi-process cluster was initialized, False for single-process
    runs (nothing to do).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator_address is None and num_processes is None:
        # TPU pods self-discover through the runtime; elsewhere a single
        # process needs no cluster
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            try:
                jax.distributed.initialize()
                return True
            except (ValueError, RuntimeError):
                return False   # runtime without pod metadata: single host
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def prover_mesh(n_devices: int | None = None):
    """1-D Mesh(("d",)) over the cluster's devices, host-major ordered.

    Host-major order keeps contiguous mesh neighbors on the same host so
    the sharded NTT's all-to-all exchanges the minimum over DCN.
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


def local_shard_slice(n: int, mesh) -> slice:
    """The [start, stop) range of a length-n 'd'-sharded axis owned by
    THIS process (for host-side streaming of file sections to devices:
    each host reads only its shard of a .ptau/.zkey section)."""
    import jax

    ndev = mesh.shape["d"]
    per = -(-n // ndev)
    mine = [i for i, d in enumerate(mesh.devices.reshape(-1))
            if d.process_index == jax.process_index()]
    if not mine:
        return slice(0, 0)
    return slice(min(mine) * per, min((max(mine) + 1) * per, n))
