"""Real multi-process --distributed test (SURVEY.md §4: distributed tests
without a pod): two CPU processes form a jax.distributed slice over a local
coordinator, the videolist shards disjointly between them, and host 0
prints the pod-global summary from the counter all-reduce.

This replaces the reference's manual split-the-videolist-per-GPU workflow
(reference tools/denseflow.cpp:51-91, README.md:11) with a first-class path.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from conftest import make_translating_video

_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins TPU
from denseflow_tpu.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_run(tmp_path):
    vids = []
    for i in range(2):
        p, _ = make_translating_video(
            tmp_path / f"v{i}.avi", h=48, w=64, n=5, dx=1, seed=i
        )
        vids.append(p)
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(vids) + "\n")
    out = tmp_path / "out"
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            DENSEFLOW_NUM_PROCESSES="2",
            DENSEFLOW_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c", _DRIVER, str(lst), f"-o={out}",
                    "-s=1", "--pairBatch=4", "-v", "--distributed",
                    f"--coordinator=localhost:{port}",
                ],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=420)
        outs.append(stdout)
        assert p.returncode == 0, f"rc={p.returncode}\n{stdout[-800:]}\n{stderr[-800:]}"

    # disjoint video sharding: host 0 round-robins to v0, host 1 to v1
    assert "v0.avi" in outs[0] and "v1.avi" not in outs[0]
    assert "v1.avi" in outs[1] and "v0.avi" not in outs[1]
    # both videos completed (shared .done dir)
    assert (out / ".done" / "v0").is_file()
    assert (out / ".done" / "v1").is_file()
    # pod-global summary: printed exactly once, by host 0, with aggregated
    # counters (2 videos x 5 frames, 4 flows each)
    assert "2 videos (10 frames, 8 tvl1 flows)" in outs[0]
    assert "flows) processed" not in outs[1]


@pytest.mark.slow
def test_distributed_empty_shard_still_joins_allreduce(tmp_path):
    """1 video over 2 hosts: the jobless host must still reach the final
    counter all-reduce, or the working host hangs in the collective
    (regression: the empty-jobs early return deadlocked host 0)."""
    p, _ = make_translating_video(tmp_path / "only.avi", h=48, w=64, n=5, dx=1)
    lst = tmp_path / "list.txt"
    lst.write_text(p + "\n")
    out = tmp_path / "out"
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            DENSEFLOW_NUM_PROCESSES="2",
            DENSEFLOW_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c", _DRIVER, str(lst), f"-o={out}",
                    "-s=1", "--pairBatch=4", "--distributed",
                    f"--coordinator=localhost:{port}",
                ],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p_ in procs:
        stdout, stderr = p_.communicate(timeout=420)
        outs.append(stdout)
        assert p_.returncode == 0, f"rc={p_.returncode}\n{stdout[-800:]}\n{stderr[-800:]}"
    assert "1 videos (5 frames, 4 tvl1 flows)" in outs[0]
    assert "flows) processed" not in outs[1]
