"""Measured (not projected) N-process scaling rows for BASELINE.md.

Generalizes tools/measure_2proc.py (round-5 verdict item 3) to any rank
count. Runs the same videolist workload as:

  * 1 process pinned to one core (baseline wall);
  * N processes under --distributed over a local coordinator (the real
    product path: jax.distributed.initialize, automatic videolist
    sharding, pod-global summary from host 0), each rank pinned to core
    `rank % n_cores`.

HARDWARE CAP, stated up front: this machine has 2 physical cores. Ranks
1 and 2 are true equal-hardware-per-host measurements (each rank owns a
core). At N=4 two ranks share each core, so the expected IDEAL wall is
the 2-rank wall (same total silicon) — the 4-rank row therefore measures
the *overhead* of 4-way Gloo init, 4-way list sharding and the 4-way
counter all-reduce, not 4 hosts' worth of compute. A 4-rank wall ==
2-rank wall means the distribution machinery scales to 4 ranks with no
measurable cost; real 4-host hardware would then see the per-host
efficiency of the 2-rank row.

Run: python tools/measure_nproc.py [n_videos] [frames] [ranks...]
Defaults: 8 videos x 100 frames, ranks 1 2 4.
"""

import os
import re
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


def _using(stdout: str) -> float:
    m = re.search(r"using ([0-9.]+)s", stdout)
    return float(m.group(1)) if m else float("nan")


def run_ranks(n: int, tmp: str, base_args: list, n_cores: int,
              tag: str = ""):
    """Launch n ranks, return (max processing s, whole wall s)."""
    # unique outdir per invocation: .done resume would otherwise skip
    # everything on the second run of the same rank count
    out = os.path.join(tmp, f"out{n}{tag}")
    if n == 1:
        t0 = time.perf_counter()
        r = subprocess.run(
            ["taskset", "-c", "0", sys.executable, "-c", _DRIVER,
             f"-o={out}", *base_args],
            cwd="/root/repo", capture_output=True, text=True,
        )
        wall = time.perf_counter() - t0
        assert r.returncode == 0, r.stderr[-500:]
        return _using(r.stdout), wall
    port = _free_port()
    t0 = time.perf_counter()
    procs = []
    for pid in range(n):
        env = dict(
            os.environ,
            DENSEFLOW_NUM_PROCESSES=str(n),
            DENSEFLOW_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(pid % n_cores),
                 sys.executable, "-c", _DRIVER, f"-o={out}", *base_args,
                 "--distributed", f"--coordinator=localhost:{port}"],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    u = 0.0
    for p in procs:
        stdout, stderr = p.communicate(timeout=1800)
        assert p.returncode == 0, f"{stdout[-400:]}\n{stderr[-400:]}"
        u = max(u, _using(stdout))
    return u, time.perf_counter() - t0


def main() -> None:
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    ranks = [int(a) for a in sys.argv[3:]] or [1, 2, 4]
    n_cores = os.cpu_count() or 1

    tmp = tempfile.mkdtemp(prefix="dfnproc_")
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

    # warm run populates the persistent XLA compile cache so every mode
    # measures steady-state work, not compiles
    run_ranks(1, tmp, base_args, n_cores, tag="warm")

    print(f"workload: {n_videos} videos x {n_frames} frames (64x80), tvl1; "
          f"{n_cores} physical cores")
    results = {}
    for n in ranks:
        u, wall = run_ranks(n, tmp, base_args, n_cores)
        results[n] = u
        cores_used = min(n, n_cores)
        note = (
            "own core" if n <= n_cores
            else f"{n} ranks TIME-SLICED on {n_cores} cores — ideal wall "
            f"equals the {n_cores}-rank wall, row measures rank overhead"
        )
        print(f"{n} rank(s): processing {u:7.2f}s  whole wall {wall:7.2f}s "
              f"({note})", flush=True)
    u1 = results.get(1)
    for n in ranks[1:]:
        if u1 and n in results:
            hw = min(n, n_cores)
            eff = u1 / (hw * results[n])
            print(f"  {n}-rank speedup {u1/results[n]:.2f}x over 1 rank; "
                  f"efficiency vs {hw} core(s) of hardware: {eff:.3f}")
    if 4 in results and 2 in results and n_cores == 2:
        r = results[4] / results[2]
        print(f"  4-rank wall / 2-rank wall = {r:.3f} (1.0 = 4-way "
              f"distribution costs nothing beyond the shared silicon)")


if __name__ == "__main__":
    main()
