"""Scaling measurements for BASELINE.md's "Scaling" section.

BASELINE.json's north star asks for frames/s scaling at 1 chip / 1 host /
N hosts. Two measurable axes exist without a real pod:

* ``--chip``: on the real TPU chip, device-only TVL1 flows/s vs pair_batch
  (the intra-chip batching curve — the reference solves one pair at a time,
  src/denseflow_gpu.cpp:313-341, so its curve is flat; ours rises until the
  solver fills the chip).
* ``--hosts``: N-host work sharding measured as the reference's users run
  it (one process per shard of the videolist, share-nothing,
  `--numHosts/--hostId` instead of hand-split lists). Shards run
  back-to-back on this one machine and the parallel wall-clock is
  projected as max(shard times) — exact for share-nothing work; the
  all-reduce of summary counters is measured separately by
  tests/test_distributed.py. Efficiency = t_single / (N * max_t_shard).

Usage: python tools/scaling_probe.py [--chip] [--hosts] [--patch]
Writes scaling_results.json; --patch rewrites BASELINE.md's Scaling table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
WORK = Path("/tmp/denseflow_tpu_scaling")


def bench_chip_batches(batches=(4, 8, 16, 32, 64, 128)) -> dict:
    from bench import bench_device_only

    out = {}
    for b in batches:
        r = bench_device_only(pair_batch=b)
        out[str(b)] = round(r["flows_per_s"], 2)
        print(f"pair_batch {b}: {out[str(b)]} flows/s", flush=True)
    return out


def bench_host_sharding(n_videos: int = 8, n_frames: int = 48) -> dict:
    """Videolist sharded over N in {1, 2, 4} 'hosts' (sequential shards,
    projected parallel wall = max shard time; videos share nothing).

    Runs on CPU with the fast (nv) preset: the metric is the RELATIVE
    sharding overhead, and the deterministic local backend keeps it free
    of device-tunnel noise."""
    sys.path.insert(0, str(ROOT / "tools"))
    from fill_baseline import _make_video

    from denseflow_tpu.cli import main as cli_main

    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    vids = []
    for i in range(n_videos):
        v = WORK / "videos" / f"v{i}.avi"
        v.parent.mkdir(exist_ok=True, parents=True)
        _make_video(v, 120, 160, n_frames, seed=30 + i)
        vids.append(str(v))
    lst = WORK / "list.txt"
    lst.write_text("\n".join(vids) + "\n")

    def run_shard(n_hosts: int, host_id: int, tag: str) -> float:
        out = WORK / f"out_{tag}"
        t0 = time.perf_counter()
        rc = cli_main(
            [str(lst), f"-o={out}", "-a=nv", "-s=1", "-b=20",
             f"--numHosts={n_hosts}", f"--hostId={host_id}", "-f"]
        )
        assert rc == 0
        return time.perf_counter() - t0

    # warmup (compile)
    run_shard(n_videos, 0, "warm")
    results = {}
    t1 = run_shard(1, 0, "h1")
    results["1"] = {"wall_s": round(t1, 3), "efficiency": 1.0}
    for n in (2, 4):
        ts = [run_shard(n, i, f"h{n}_{i}") for i in range(n)]
        wall = max(ts)
        eff = t1 / (n * wall)
        results[str(n)] = {
            "wall_s": round(wall, 3),
            "shard_s": [round(t, 3) for t in ts],
            "efficiency": round(eff, 3),
        }
        print(f"{n} hosts: wall {wall:.2f}s, efficiency {eff:.3f}", flush=True)
    n_flows = n_videos * (n_frames - 1)
    for v in results.values():
        v["flows_per_s"] = round(n_flows / v["wall_s"], 2)
    return results


def patch_baseline_md(res: dict) -> None:
    md = (ROOT / "BASELINE.md").read_text()
    marker = "\n## Scaling"
    if marker in md:
        md = md[: md.index(marker)]
    lines = [md.rstrip(), "", "## Scaling", ""]
    if "chip_pair_batch" in res:
        lines += [
            "Device-only TVL1 flows/s vs pair batch (real TPU v5e chip, 256x341;",
            "the reference's CUDA path is serial per pair so its curve is flat):",
            "",
            "| pair_batch | flows/s |",
            "|---|---|",
        ]
        for b, v in res["chip_pair_batch"].items():
            lines.append(f"| {b} | {v} |")
        lines.append("")
    if "host_sharding" in res:
        lines += [
            "Videolist sharded across N hosts (share-nothing shards run",
            "back-to-back on one machine; parallel wall projected as",
            "max(shard time) — exact for share-nothing work; counter",
            "all-reduce cost covered by tests/test_distributed.py):",
            "",
            "| hosts | wall s | flows/s | efficiency |",
            "|---|---|---|---|",
        ]
        for n, v in res["host_sharding"].items():
            lines.append(
                f"| {n} | {v['wall_s']} | {v['flows_per_s']} | {v['efficiency']} |"
            )
        lines.append("")
    (ROOT / "BASELINE.md").write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    do_chip = "--chip" in sys.argv
    do_hosts = "--hosts" in sys.argv
    if do_hosts and not do_chip:
        import jax

        jax.config.update("jax_platforms", "cpu")
    path = ROOT / "scaling_results.json"
    res = json.loads(path.read_text()) if path.exists() else {}
    if do_chip:
        from denseflow_tpu.utils import enable_compile_cache

        enable_compile_cache()
        res["chip_pair_batch"] = bench_chip_batches()
    if do_hosts:
        res["host_sharding"] = bench_host_sharding()
    import jax

    res.setdefault("_meta", {})["backend"] = jax.default_backend()
    path.write_text(json.dumps(res, indent=2))
    if "--patch" in sys.argv:
        patch_baseline_md(res)
    print(json.dumps(res, indent=2))
