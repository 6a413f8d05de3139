"""Multi-host (multi-process) proving setup.

The reference's `parallel` cargo feature is single-process rayon
(crates/brainfuck_prover/Cargo.toml:13); the TPU analog spans pod slices:
each host process owns a subset of chips, `jax.distributed` wires them into
one global runtime, and the SAME mesh-parameterized prover
(`air.prove_brainfuck(machine, mesh=...)`) runs SPMD across all of them —
row-sharded tables/LogUp/constraints, stage-sharded CFFT (ppermute
butterfly exchanges over ICI), subtree-sharded Merkle, psum'd FRI folds.

Every host executes the identical Python program (standard JAX SPMD
contract); per-proof randomness is derived from the transcript, so all
hosts hold identical channels and the proof assembled on host 0 is
byte-identical to the single-chip proof (the shard-count invariance
asserted by tests/test_parallel.py and __graft_entry__.dryrun_multichip).

Multi-PROCESS execution is integration-tested on the CPU backend:
tests/test_distributed.py spawns two local processes with a localhost
coordinator (STWO_BF_NUM_PROCESSES=2 / STWO_BF_COORDINATOR /
STWO_BF_PROCESS_ID), runs the --distributed CLI prove in both, and asserts
the coordinator's proof is byte-identical to the single-chip proof while the
other host stays silent. Real pod slices additionally exercise ICI/DCN,
which this image (one TPU chip) cannot.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from .mesh import ROW_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the global distributed runtime.

    With no arguments, reads STWO_BF_NUM_PROCESSES / STWO_BF_COORDINATOR /
    STWO_BF_PROCESS_ID, falling back to JAX's cluster auto-detection
    (GKE/GCE TPU pods configure these automatically). On a single host this
    is a no-op, so the same entry point works everywhere.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("STWO_BF_NUM_PROCESSES", "1"))
    if coordinator_address is None:
        coordinator_address = os.environ.get("STWO_BF_COORDINATOR")
    if process_id is None and "STWO_BF_PROCESS_ID" in os.environ:
        process_id = int(os.environ["STWO_BF_PROCESS_ID"])
    if num_processes <= 1 and coordinator_address is None:
        return  # single-host: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """1-D row mesh over ALL chips of the pod slice (every process sees the
    global device list after initialize()). ICI carries the ppermute /
    all_gather traffic inside a slice; DCN only carries the (tiny) host-side
    transcript synchronization implicit in SPMD replay."""
    return Mesh(np.array(jax.devices()), (ROW_AXIS,))


def is_coordinator() -> bool:
    """True on the process that should write the proof file / print output."""
    return jax.process_index() == 0
