"""Measure every BASELINE.json config and fill BASELINE.md's results table.

The reference publishes no absolute numbers (BASELINE.md), so the
"Reference" column stays "—" (not measurable here: the reference needs a
CUDA GPU + OpenCV-CUDA); the "This framework" column is self-measured on
whatever backend JAX selects (the real TPU chip under the driver, CPU in
dev shells — the JSON records which).

Usage:  python tools/fill_baseline.py [--quick]
Writes baseline_results.json and patches the table in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
WORK = Path("/tmp/denseflow_tpu_baseline")


def _make_video(path: Path, h: int, w: int, n: int, seed: int = 0) -> None:
    import cv2
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    pad = 2 * n + 8
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (h + 16, w + pad)), 2.0
    ).astype(np.float32)
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h))
    assert vw.isOpened()
    for t in range(n):
        fr = np.clip(base[8 : 8 + h, 4 + 2 * t : 4 + 2 * t + w], 0, 255)
        vw.write(cv2.cvtColor(fr.astype(np.uint8), cv2.COLOR_GRAY2BGR))
    vw.release()


def _run(args: list, n_flows: int, warm_args: list | None = None) -> dict:
    from denseflow_tpu.cli import main

    if warm_args is not None:
        assert main(warm_args) == 0, "warmup failed"
    t0 = time.perf_counter()
    rc = main(args)
    dt = time.perf_counter() - t0
    assert rc == 0, f"run failed: {args}"
    return {"flows": n_flows, "seconds": round(dt, 3),
            "flows_per_s": round(n_flows / dt, 2)}


def main(quick: bool = False) -> dict:
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    n = 60 if quick else 300
    results: dict = {}

    # shared inputs
    vid_360 = WORK / "single.avi"
    _make_video(vid_360, 360, 480, n)
    short_vid = WORK / "short.avi"
    _make_video(short_vid, 240, 320, max(40, n // 4), seed=1)

    # --- config 1: Farneback, single short video, step=1, bound=20, jpg ---
    out = WORK / "c1"
    n1 = max(40, n // 4) - 1
    results["farneback_jpg"] = _run(
        [str(short_vid), f"-o={out}", "-a=farn", "-s=1", "-b=20"],
        n1,
        warm_args=[str(short_vid), f"-o={WORK/'c1w'}", "-a=farn", "-s=1", "-b=20"],
    )

    # --- config 2: TVL1, single video, step=1, bound=20 ---
    out = WORK / "c2"
    results["tvl1_jpg"] = _run(
        [str(vid_360), f"-o={out}", "-a=tvl1", "-s=1", "-b=20", "-ns=256"],
        n - 1,
        warm_args=[str(vid_360), f"-o={WORK/'c2w'}", "-a=tvl1", "-s=1",
                   "-b=20", "-ns=256"],
    )

    # --- config 3: Brox, single video, newShort=256 ---
    out = WORK / "c3"
    n3 = max(40, n // 4) - 1
    results["brox_ns256"] = _run(
        [str(short_vid), f"-o={out}", "-a=brox", "-s=1", "-b=20", "-ns=256"],
        n3,
        warm_args=[str(short_vid), f"-o={WORK/'c3w'}", "-a=brox", "-s=1",
                   "-b=20", "-ns=256"],
    )

    # --- config 4: TVL1 videolist, step=2, class folders, resume/.done ---
    lst = WORK / "list.txt"
    n4_frames = max(30, n // 6)
    lines = []
    for cls in ("classA", "classB"):
        d = WORK / "videos" / cls
        d.mkdir(parents=True)
        for i in range(2):
            v = d / f"v{i}.avi"
            _make_video(v, 240, 320, n4_frames, seed=10 + i)
            lines.append(str(v))
    lst.write_text("\n".join(lines) + "\n")
    out = WORK / "c4"
    n4 = 4 * (n4_frames - 2)  # step=2 -> frames-2 flows per video
    r = _run([str(lst), f"-o={out}", "-a=tvl1", "-s=2", "-b=20", "-cf"], n4)
    # resume semantics: a rerun must skip everything (all .done present)
    t0 = time.perf_counter()
    from denseflow_tpu.cli import main as cli_main

    assert cli_main([str(lst), f"-o={out}", "-a=tvl1", "-s=2", "-b=20", "-cf"]) == 0
    r["resume_rerun_seconds"] = round(time.perf_counter() - t0, 3)
    done = sorted(p.relative_to(out).as_posix() for p in (out / ".done").rglob("*") if p.is_file())
    assert len(done) == 4, done
    r["done_markers"] = len(done)
    results["tvl1_list_step2_classfolder"] = r

    # --- config 5: batched TVL1 over a UCF-101-style subset, h5, sharded ---
    lst5 = WORK / "ucf_subset.txt"
    n5_frames = max(30, n // 6)
    vids5 = []
    for i in range(4):
        v = WORK / "ucf" / f"v_Action_g{i:02d}_c01.avi"
        v.parent.mkdir(exist_ok=True)
        _make_video(v, 240, 320, n5_frames, seed=20 + i)
        vids5.append(str(v))
    lst5.write_text("\n".join(vids5) + "\n")
    out = WORK / "c5"
    n5 = 4 * (n5_frames - 1)
    # two host-shards run back-to-back (one real chip); wall-clock on a real
    # 2-host slice is ~max(shard times) since shards share nothing
    t0 = time.perf_counter()
    assert cli_main([str(lst5), f"-o={out}", "-a=tvl1", "-s=1", "-b=20",
                     "-st=h5", "--numHosts=2", "--hostId=0"]) == 0
    t_shard0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    assert cli_main([str(lst5), f"-o={out}", "-a=tvl1", "-s=1", "-b=20",
                     "-st=h5", "--numHosts=2", "--hostId=1"]) == 0
    t_shard1 = time.perf_counter() - t0
    h5s = sorted((out).glob("*.h5"))
    assert len(h5s) == 4, h5s
    results["tvl1_ucf_h5_sharded"] = {
        "flows": n5,
        "shard_seconds": [round(t_shard0, 3), round(t_shard1, 3)],
        "flows_per_s_2host_projection": round(n5 / max(t_shard0, t_shard1), 2),
        "h5_files": len(h5s),
    }

    import jax

    results["_meta"] = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "frames_per_video": n,
    }
    return results


def patch_baseline_md(results: dict) -> None:
    md = (ROOT / "BASELINE.md").read_text()
    backend = results["_meta"]["backend"]
    vals = {
        "Farneback, single short video": f"{results['farneback_jpg']['flows_per_s']} flows/s",
        "TVL1 pyramidal primal-dual, single video": f"{results['tvl1_jpg']['flows_per_s']} flows/s",
        "Brox, single video": f"{results['brox_ns256']['flows_per_s']} flows/s",
        "TVL1 on videolist.txt": (
            f"{results['tvl1_list_step2_classfolder']['flows_per_s']} flows/s; "
            f"resume rerun {results['tvl1_list_step2_classfolder']['resume_rerun_seconds']}s"
        ),
        "Batched TVL1, UCF-101 subset": (
            f"{results['tvl1_ucf_h5_sharded']['flows_per_s_2host_projection']} flows/s "
            f"(2-shard projection)"
        ),
    }
    lines = md.splitlines()
    for i, line in enumerate(lines):
        for key, val in vals.items():
            if line.startswith(f"| {key}"):
                cells = line.split("|")
                cells[-2] = f" {val} ({backend}) "
                lines[i] = "|".join(cells)
    (ROOT / "BASELINE.md").write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    results = main(quick)
    (ROOT / "baseline_results.json").write_text(json.dumps(results, indent=2))
    if not quick:
        patch_baseline_md(results)
    print(json.dumps(results, indent=2))
