"""Multi-host coordination.

The reference has no distributed backend at all — users hand-split the video
list and run one process per GPU, with `.done` markers making concurrent runs
idempotent (reference README.md:11, tools/denseflow.cpp:63-76). Here that
workflow is first-class:

* `init_distributed()` brings up `jax.distributed` over a pod slice
  (ICI/DCN) and returns (host_id, num_hosts) to feed the video-list shard
  filter in io.reader.expand_jobs;
* `.done` markers live on shared storage, preserving idempotent resume
  across hosts and restarts (the reference's checkpoint granularity);
* `allreduce_counters()` is the run's ONLY collective: a psum of the
  (frames, flows) counters so host 0 can print the global summary line.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from denseflow_tpu.utils import Counters


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def _client_active() -> bool:
    """Is a jax.distributed client already connected? (private-API probe —
    the public alternative, jax.process_count(), side-effects backend init)."""
    try:
        from jax._src import distributed as _d

        return _d.global_state.client is not None
    except Exception:
        return False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Bring up jax.distributed and return (host_id, num_hosts) for
    video-list sharding.

    Resolution order for the slice topology:
    1. explicit arguments;
    2. DENSEFLOW_NUM_PROCESSES / DENSEFLOW_PROCESS_ID env vars (the CPU /
       manual-launch path — the coordinator comes from --coordinator);
    3. jax.distributed auto-detection (TPU pod metadata, SLURM, etc.) —
       `initialize()` with no args.

    Idempotent: if a distributed client is already connected, just return
    the topology. (Deliberately NOT probed via jax.process_count(), which
    would initialize the local backend and break a subsequent
    jax.distributed.initialize.)
    """
    if _client_active():
        return jax.process_index(), jax.process_count()
    if num_processes is None:
        num_processes = _env_int("DENSEFLOW_NUM_PROCESSES")
    if process_id is None:
        process_id = _env_int("DENSEFLOW_PROCESS_ID")
    if num_processes is not None and num_processes <= 1:
        return 0, 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already initialized (e.g. by an embedding application) is fine;
        # anything else (no coordinator resolvable) is a real config error
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()


def allreduce_counters(counters: Counters) -> Tuple[int, int, int]:
    """Global (videos, frames, flows) across all hosts — one psum at end of
    run, mirroring the reference's final summary (src/denseflow_gpu.cpp:492-496)
    but aggregated pod-wide."""
    local = np.array(
        [counters.total_videos, counters.total_frames, counters.total_flows],
        dtype=np.int64,
    )
    if jax.process_count() == 1:
        return tuple(int(x) for x in local)

    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(local).sum(axis=0)
    return tuple(int(x) for x in total)
