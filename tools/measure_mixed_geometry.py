"""Mixed-resolution videolist: compile-count + first-run vs warm-run walls.

Round-3 verdict item 5: a UCF-101-style list at -ns=256 yields one height
but many widths; every distinct width is an XLA program compiled through
the remote-compile tunnel (20 s – minutes each). --widthBucket=64 pads
widths up on device and crops host-side, capping the distinct programs.

This measures, on the real device, an 8-video list with 5 distinct source
aspect ratios, once with --widthBucket=64 and once exact, each under a
FRESH compilation cache (temp dir — the global cache is left alone):
first-run wall (compiles included), warm-run wall, and the number of
distinct cache entries written.

Run: python tools/measure_mixed_geometry.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_videos(tmp):
    import cv2
    import numpy as np
    import scipy.ndimage as ndi

    # source (h, w) per video: 5 distinct aspect ratios, all min-side
    # > 256 so -ns=256 resizes every video to height 256 (the UCF-101
    # shape class); widths land at 341/384/455/320/427
    shapes = [
        (360, 480), (360, 540), (360, 640), (360, 450), (360, 600),
        (480, 640), (432, 768), (288, 384),
    ]
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate(shapes):
        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (h + 8, w + 56)), 2.0
        ).astype(np.float32)
        p = os.path.join(tmp, f"v{i}.avi")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h))
        for t in range(24):
            fr = np.clip(base[4 : 4 + h, 2 * t : 2 * t + w], 0, 255)
            vw.write(cv2.cvtColor(fr.astype(np.uint8), cv2.COLOR_GRAY2BGR))
        vw.release()
        paths.append(p)
    lst = os.path.join(tmp, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths) + "\n")
    return lst


def main() -> None:
    import jax

    tmp = tempfile.mkdtemp(prefix="dfmix_")
    lst = _make_videos(tmp)

    from denseflow_tpu.cli import main as cli_main

    results = {}
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    for bucket in (128, 0):
        cache = tempfile.mkdtemp(prefix=f"dfcache_b{bucket}_")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.clear_caches()
        args = [
            lst, f"-o={os.path.join(tmp, f'out_b{bucket}')}", "-s=1",
            "-ns=256", "--pairBatch=32", f"--widthBucket={bucket}", "-f",
        ]
        t0 = time.perf_counter()
        assert cli_main(list(args)) == 0
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        assert cli_main(list(args)) == 0
        warm = time.perf_counter() - t0
        entries = len(os.listdir(cache))
        results[bucket] = (cold, warm, entries)
        print(
            f"widthBucket={bucket}: first run {cold:7.1f}s  warm {warm:6.1f}s"
            f"  cache entries {entries}"
        )
    b, e = results[128], results[0]
    print(
        f"bucketing: {e[0]/b[0]:.1f}x faster cold, cache entries "
        f"{e[2]} -> {b[2]}"
    )


if __name__ == "__main__":
    main()
