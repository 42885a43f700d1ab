"""Measured (not projected) multi-process scaling row for BASELINE.md.

Runs the same videolist workload two ways on CPU devices and reports real
wall clocks including jax.distributed init and the final counter
all-reduce:

  * 1 process (baseline wall);
  * 2 processes under --distributed over a local coordinator (the real
    product path: jax.distributed.initialize, automatic videolist
    sharding, pod-global summary from host 0).

Round-3 verdict item 7: the host-scaling table was a share-nothing
projection; this makes the 2-host row a measurement.
Run: python tools/measure_2proc.py [n_videos] [frames]
"""

import os
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> None:
    import numpy as np

    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    tmp = tempfile.mkdtemp(prefix="df2proc_")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from conftest import make_translating_video  # noqa: E402

    vids = []
    for i in range(n_videos):
        p, _ = make_translating_video(
            os.path.join(tmp, f"v{i}.avi"), h=64, w=80, n=n_frames, dx=1,
            seed=i,
        )
        vids.append(p)
    lst = os.path.join(tmp, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(vids) + "\n")
    base_args = [lst, "-s=1", "--pairBatch=8"]

    # one machine stands in for N hosts, so each simulated host is pinned
    # to its own core (taskset) — the 1-host baseline gets ONE core too,
    # making this a true equal-hardware-per-host scaling measurement
    import re

    def _using(stdout: str) -> float:
        m = re.search(r"using ([0-9.]+)s", stdout)
        return float(m.group(1)) if m else float("nan")

    def run_single(tag, cpu="0"):
        out = os.path.join(tmp, tag)
        t0 = time.perf_counter()
        r = subprocess.run(
            ["taskset", "-c", cpu, sys.executable, "-c", _DRIVER,
             f"-o={out}", *base_args],
            cwd="/root/repo", capture_output=True, text=True,
        )
        dt = time.perf_counter() - t0
        assert r.returncode == 0, r.stderr[-500:]
        return dt, _using(r.stdout)

    # warm run populates the persistent XLA compile cache so both modes
    # measure steady-state work, not compiles
    run_single("warm")
    t1, u1 = run_single("single")

    out2 = os.path.join(tmp, "two")
    port = _free_port()
    t0 = time.perf_counter()
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
                    "taskset", "-c", str(pid),
                    sys.executable, "-c", _DRIVER, f"-o={out2}", *base_args,
                    "--distributed", f"--coordinator=localhost:{port}",
                ],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    u2 = 0.0
    for p in procs:
        stdout, stderr = p.communicate(timeout=1200)
        assert p.returncode == 0, f"{stdout[-400:]}\n{stderr[-400:]}"
        u2 = max(u2, _using(stdout))
    t2 = time.perf_counter() - t0

    n_flows = n_videos * (n_frames - 1)
    print(f"workload: {n_videos} videos x {n_frames} frames (64x80), tvl1")
    print(
        f"1 host (1 core)     : processing {u1:6.2f}s   whole-process wall"
        f" {t1:6.2f}s"
    )
    print(
        f"2 hosts (1 core each): processing {u2:6.2f}s   whole-process wall"
        f" {t2:6.2f}s   (MEASURED: real jax.distributed over a local"
        f" coordinator, incl. the counter all-reduce)"
    )
    print(
        f"processing speedup {u1/u2:.2f}x (efficiency {u1/(2*u2):.3f}); "
        f"fixed per-process overhead (interp import + Gloo handshake) "
        f"{t2-u2:.1f}s, amortized over real workloads"
    )


if __name__ == "__main__":
    main()
