"""Timeline profile of the e2e pipeline on the bench workload.

Monkeypatches DeviceExecutor upload/dispatch/collect (and the writer) with
wall-clock timestamps to show what actually overlaps on the real device
link — the round-4 question: bench wall ~3.9 s vs a ~1.9 s link-bound
model; where do the extra seconds serialize?

Run: python tools/profile_e2e.py [pair_batch] [chunk_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()
EVENTS = []


def ev(name, t_start):
    EVENTS.append((name, t_start - T0, time.perf_counter() - T0))


def main() -> None:
    from denseflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import bench
    from denseflow_tpu import executor as ex_mod
    from denseflow_tpu.cli import parse_args, run

    pair_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chunk_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    os.makedirs(bench.BENCH_DIR, exist_ok=True)
    video = os.path.join(bench.BENCH_DIR, "bench.avi")
    if not os.path.exists(video):
        bench._make_video(video)

    Ex = ex_mod.DeviceExecutor
    orig_upload = Ex.upload_chunk
    orig_dispatch = Ex.dispatch_chunk
    orig_collect = Ex.collect_chunk

    def upload(self, frames):
        t = time.perf_counter()
        r = orig_upload(self, frames)
        ev(f"upload({frames.shape[0]}f)", t)
        return r

    def dispatch(self, frames, n):
        t = time.perf_counter()
        r = orig_dispatch(self, frames, n)
        ev(f"dispatch({n}f)", t)
        return r

    def collect(self, outs):
        t = time.perf_counter()
        for item in orig_collect(self, outs):
            ev("collect_item", t)
            yield item
            t = time.perf_counter()

    Ex.upload_chunk = upload
    Ex.dispatch_chunk = dispatch
    Ex.collect_chunk = collect

    args = [
        video, f"-o={os.path.join(bench.BENCH_DIR, 'prof')}", "-a=tvl1",
        "-s=1", "-b=20", "-ns=256", f"--pairBatch={pair_batch}",
        f"--chunkFrames={chunk_frames}", "-f",
    ]
    # warm run (compiles), then the measured run
    run(parse_args(args))
    EVENTS.clear()
    global T0
    T0 = time.perf_counter()
    stats: dict = {}
    rc = run(parse_args(args), stats_out=stats)
    wall = time.perf_counter() - T0
    assert rc == 0
    print(f"\nwall {wall:.2f}s  stage_times {stats.get('stage_times')}")
    for name, a, b in EVENTS:
        bar = " " * int(a * 20) + "#" * max(1, int((b - a) * 20))
        print(f"{name:18s} {a:6.2f} -> {b:6.2f} ({b-a:5.2f}s) {bar}")


if __name__ == "__main__":
    main()
