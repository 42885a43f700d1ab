"""End-to-end pipeline/CLI tests on tiny synthetic videos
(SURVEY.md §4 golden-file strategy)."""

import os
from pathlib import Path

import cv2
import numpy as np
import pytest

from conftest import make_translating_video, write_video
from denseflow_tpu.cli import main, parse_args


def _expected_quant(val, bound):
    return round(255.0 * (val + bound) / (2.0 * bound))


@pytest.fixture
def vid(tmp_path):
    # content flow is (-2, 0): crop window moves right 2px/frame
    path, true_flow = make_translating_video(tmp_path / "v.avi", h=64, w=80, n=9, dx=2)
    return path, true_flow


class TestCLIParsing:
    def test_opencv_style_tokens(self):
        cfg = parse_args(["in.avi", "-a=farn", "-s=2", "-b=20", "-o=/out", "-v"])
        assert cfg.algorithm == "farn"
        assert cfg.step == 2
        assert cfg.bound == 20
        assert cfg.output_dir == "/out"
        assert cfg.verbose and not cfg.force

    def test_long_options(self):
        cfg = parse_args(["x", "--saveType=png", "--newShort=256", "--classFolder"])
        assert cfg.save_type == "png"
        assert cfg.new_short == 256
        assert cfg.has_class

    def test_help_returns_none(self):
        assert parse_args(["--help"]) is None
        assert parse_args([]) is None

    def test_extensions(self):
        cfg = parse_args(["x", "--pairBatch=8", "--numHosts=4", "--hostId=2"])
        assert cfg.pair_batch == 8
        assert cfg.num_hosts == 4 and cfg.host_id == 2


class TestFlowJpg:
    def test_end_to_end_values(self, vid, tmp_path, capsys):
        path, (fx, fy) = vid
        out = tmp_path / "out"
        rc = main([path, f"-o={out}", "-s=1", "-b=8", "--pairBatch=4"])
        assert rc == 0
        files_x = sorted((out / "v").glob("flow_x_*.jpg"))
        files_y = sorted((out / "v").glob("flow_y_*.jpg"))
        assert len(files_x) == len(files_y) == 8  # 9 frames - step
        img = cv2.imread(str(files_x[4]), cv2.IMREAD_GRAYSCALE)
        assert abs(img[16:-16, 16:-16].mean() - _expected_quant(fx, 8)) < 4
        img_y = cv2.imread(str(files_y[4]), cv2.IMREAD_GRAYSCALE)
        assert abs(img_y[16:-16, 16:-16].mean() - _expected_quant(fy, 8)) < 4
        summary = capsys.readouterr().out
        assert "1 videos (9 frames, 8 tvl1 flows)" in summary

    def test_step2_naming_and_magnitude(self, vid, tmp_path):
        path, (fx, _) = vid
        out = tmp_path / "out"
        assert main([path, f"-o={out}", "-s=2", "-b=8", "--pairBatch=4"]) == 0
        files = sorted((out / "v").glob("flow_x_p2_*.jpg"))
        assert len(files) == 7
        img = cv2.imread(str(files[3]), cv2.IMREAD_GRAYSCALE)
        # step=2 doubles the displacement
        assert abs(img[16:-16, 16:-16].mean() - _expected_quant(2 * fx, 8)) < 5

    @pytest.mark.parametrize("alg", ["farn", "brox", "nv"])
    def test_other_algorithms_end_to_end(self, alg, vid, tmp_path):
        """Every algorithm the reference dispatches (src/denseflow_gpu.cpp:285-304)
        runs through the full pipeline and tracks the known translation."""
        path, (fx, fy) = vid
        out = tmp_path / "out"
        rc = main([path, f"-o={out}", f"-a={alg}", "-s=1", "-b=8", "--pairBatch=4"])
        assert rc == 0
        files_x = sorted((out / "v").glob("flow_x_*.jpg"))
        assert len(files_x) == 8
        img = cv2.imread(str(files_x[4]), cv2.IMREAD_GRAYSCALE)
        assert abs(img[16:-16, 16:-16].mean() - _expected_quant(fx, 8)) < 8

    def test_negative_step(self, vid, tmp_path):
        path, (fx, _) = vid
        out = tmp_path / "out"
        assert main([path, f"-o={out}", "-s=-1", "-b=8", "--pairBatch=4"]) == 0
        files = sorted((out / "v").glob("flow_x_m1_*.jpg"))
        assert len(files) == 8
        assert files[0].name == "flow_x_m1_00001.jpg"  # named by right frame
        img = cv2.imread(str(files[3]), cv2.IMREAD_GRAYSCALE)
        # backward flow: later -> earlier frame, displacement negated
        assert abs(img[16:-16, 16:-16].mean() - _expected_quant(-fx, 8)) < 4


class TestFrameExtraction:
    def test_step0_extracts_colored_frames(self, vid, tmp_path, capsys):
        path, _ = vid
        out = tmp_path / "out"
        assert main([path, f"-o={out}", "-s=0"]) == 0
        files = sorted((out / "v").glob("img_*.jpg"))
        assert [f.name for f in files][:2] == ["img_00000.jpg", "img_00001.jpg"]
        assert len(files) == 9
        img = cv2.imread(str(files[0]))
        assert img.shape == (64, 80, 3)
        assert "9 frames, 0 tvl1 flows" in capsys.readouterr().out

    def test_step0_resize(self, vid, tmp_path):
        path, _ = vid
        out = tmp_path / "out"
        assert main([path, f"-o={out}", "-s=0", "-ns=32"]) == 0
        img = cv2.imread(str(out / "v" / "img_00000.jpg"))
        assert img.shape == (32, 40, 3)


class TestSaveTypes:
    def test_png(self, vid, tmp_path):
        path, (fx, fy) = vid
        out = tmp_path / "out"
        assert main([path, f"-o={out}", "-s=1", "-st=png", "--pairBatch=4"]) == 0
        files = sorted((out / "v").glob("flow_*.png"))
        assert len(files) == 8
        img = cv2.imread(str(files[4]), cv2.IMREAD_UNCHANGED)
        assert img.shape == (64, 80, 3)
        # decode: channel 2 top rows hold bound_x/4
        bx = float(img[0, 0, 2]) * 4
        rec_x = (img[16:-16, 16:-16, 0].astype(np.float32) - 128.0) * bx / 128.0
        assert abs(rec_x.mean() - fx) < 0.3

    def test_h5(self, vid, tmp_path):
        h5py = pytest.importorskip("h5py")
        path, (fx, fy) = vid
        out = tmp_path / "out"
        assert main([path, f"-o={out}", "-s=1", "-st=h5", "--pairBatch=4"]) == 0
        h5file = out / "v.h5"
        assert h5file.exists()
        with h5py.File(h5file) as f:
            keys = sorted(f.keys())
            assert "flow_x_00004" in keys and "flow_y_00007" in keys
            assert len(keys) == 16
            fx_data = f["flow_x_00004"][:]
            assert fx_data.dtype == np.float32
            assert abs(fx_data[16:-16, 16:-16].mean() - fx) < 0.3

    def test_h5_f16_wire(self, vid, tmp_path):
        """--h5Dtype=f16 halves the device-link bytes; disk datasets stay
        float32 and within f16 rounding of the exact run (round-3 verdict
        item 6: raw float32 was the worst-cased payload on a remote
        link)."""
        h5py = pytest.importorskip("h5py")
        path, _ = vid
        from denseflow_tpu.executor import WIRE_STATS

        def run(out, dtype):
            WIRE_STATS.reset()
            assert main(
                [path, f"-o={out}", "-s=1", "-st=h5", "--pairBatch=4",
                 f"--h5Dtype={dtype}"]
            ) == 0
            with h5py.File(out / "v.h5") as f:
                assert f["flow_x_00004"].dtype == np.float32
                return f["flow_x_00004"][:], WIRE_STATS.snapshot()

        exact, s32 = run(tmp_path / "o32", "f32")
        half, s16 = run(tmp_path / "o16", "f16")
        # f16 wire is a raw half-precision transfer; f32 wire is the v4
        # LOSSLESS pack (round 5) — still more bytes than f16 (the noisy
        # low-mantissa content packs at ~1.16x, not 2x), but no longer the
        # raw 2x (the old equality s16*2 == s32 asserted raw f32)
        assert s16["d2h_bytes"] < s32["d2h_bytes"]
        # f16 has ~3 decimal digits; flow values are O(1)
        assert np.abs(exact - half).max() < 2e-2

    def test_h5_dtype_validation(self):
        assert main(["x.avi", "-st=h5", "--h5Dtype=f64"]) == 1


class TestListModeAndResume:
    def _setup_list(self, tmp_path, n=2):
        vids = []
        for i in range(n):
            p, _ = make_translating_video(tmp_path / f"v{i}.avi", h=48, w=64, n=5, dx=1, seed=i)
            vids.append(p)
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(vids) + "\n")
        return lst, vids

    def test_done_markers_written_and_respected(self, tmp_path, capsys):
        lst, vids = self._setup_list(tmp_path)
        out = tmp_path / "out"
        assert main([str(lst), f"-o={out}", "-s=1", "--pairBatch=4"]) == 0
        assert (out / ".done" / "v0").is_file()
        assert (out / ".done" / "v1").is_file()
        first = capsys.readouterr().out
        assert "done video v0" in first
        # rerun: everything skipped
        assert main([str(lst), f"-o={out}", "-s=1", "-v", "--pairBatch=4"]) == 0
        second = capsys.readouterr().out
        assert "skip" in second
        # like the reference, nothing runs and no summary prints when every
        # video is already done (tools/denseflow.cpp:88-91)
        assert "flows) processed" not in second

    def test_force_redoes(self, tmp_path, capsys):
        lst, vids = self._setup_list(tmp_path, n=1)
        out = tmp_path / "out"
        assert main([str(lst), f"-o={out}", "-s=1", "--pairBatch=4"]) == 0
        capsys.readouterr()
        assert main([str(lst), f"-o={out}", "-s=1", "-f", "--pairBatch=4"]) == 0
        assert "1 videos (5 frames, 4 tvl1 flows)" in capsys.readouterr().out

    def test_error_isolation(self, tmp_path, capsys):
        lst, vids = self._setup_list(tmp_path, n=2)
        # corrupt the first video
        Path(vids[0]).write_bytes(b"not a video at all")
        out = tmp_path / "out"
        rc = main([str(lst), f"-o={out}", "-s=1", "--pairBatch=4"])
        assert rc == 1  # reports failure...
        assert (out / ".done" / "v1").is_file()  # ...but finished the rest
        assert not (out / ".done" / "v0").exists()

    def test_class_folder_output(self, tmp_path):
        d = tmp_path / "Jump"
        d.mkdir()
        p, _ = make_translating_video(d / "a.avi", h=48, w=64, n=4, dx=1)
        lst = tmp_path / "list.txt"
        lst.write_text(p + "\n")
        out = tmp_path / "out"
        assert main([str(lst), f"-o={out}", "-s=1", "-cf", "--pairBatch=4"]) == 0
        assert (out / "Jump" / "a" / "flow_x_00000.jpg").is_file()
        assert (out / ".done" / "Jump" / "a").is_file()


class TestDecodePool:
    def test_pooled_decode_byte_identical_to_serial(self, tmp_path):
        # 5 videos of different sizes/content: pooled stage-1 decode
        # interleaves their chunks in the frames queue; every emitted
        # file must match the serial (reference-shaped) pipeline exactly
        vids = []
        for i in range(5):
            p, _ = make_translating_video(
                tmp_path / f"v{i}.avi", h=40 + 8 * (i % 2), w=56, n=6 + i,
                dx=1, seed=10 + i,
            )
            vids.append(p)
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(vids) + "\n")

        def run(out, workers):
            rc = main(
                [str(lst), f"-o={out}", "-a=nv", "-s=1", "-b=8",
                 "--pairBatch=4", "--chunkFrames=4",
                 f"--decodeWorkers={workers}", "-f"]
            )
            assert rc == 0
            return {
                p.relative_to(out).as_posix(): p.read_bytes()
                for p in Path(out).rglob("*") if p.is_file()
            }

        serial = run(tmp_path / "o1", 1)
        pooled = run(tmp_path / "o3", 3)
        assert set(serial) == set(pooled)
        for k in serial:
            assert serial[k] == pooled[k], f"mismatch in {k}"


class TestCrashRestart:
    """SURVEY.md §4 fault-injection strategy: hard-kill a list job mid-run
    (a real SIGKILL-style os._exit inside the writer stage), rerun, and the
    union of outputs must be byte-identical to an uninterrupted run — the
    `.done`-marker resume makes crashes idempotent at video granularity."""

    def test_kill_midlist_rerun_matches_clean(self, tmp_path):
        import subprocess
        import sys as _sys

        vids = []
        for i in range(3):
            p, _ = make_translating_video(
                tmp_path / f"v{i}.avi", h=48, w=64, n=5, dx=1, seed=i
            )
            vids.append(p)
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(vids) + "\n")

        def snapshot(out):
            return {
                p.relative_to(out).as_posix(): p.read_bytes()
                for p in Path(out).rglob("*")
                if p.is_file() and ".done" not in p.parts
            }

        clean = tmp_path / "clean"
        assert main([str(lst), f"-o={clean}", "-s=1", "--pairBatch=4"]) == 0

        # crash run: os._exit(9) right after the first video's .done marker
        # lands — no queue drain, no atexit, like a preempted host
        crash_out = tmp_path / "crash"
        script = f"""
import os
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins TPU; env alone is ignored
import denseflow_tpu.pipeline as pl
real = pl.mark_done
def dying_mark_done(*a, **kw):
    real(*a, **kw)
    os._exit(9)
pl.mark_done = dying_mark_done
from denseflow_tpu.cli import main
main([{str(lst)!r}, "-o={crash_out}", "-s=1", "--pairBatch=4"])
"""
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [_sys.executable, "-c", script], cwd="/root/repo", env=env,
            capture_output=True, timeout=300,
        )
        assert proc.returncode == 9, proc.stderr.decode()[-500:]
        done = list((crash_out / ".done").iterdir())
        assert len(done) == 1  # exactly one video completed

        # restart: completed video skipped, the rest (incl. any partial
        # output) redone; final tree must match the uninterrupted run
        assert main([str(lst), f"-o={crash_out}", "-s=1", "--pairBatch=4"]) == 0
        assert snapshot(crash_out) == snapshot(clean)
        assert len(list((crash_out / ".done").iterdir())) == 3


class TestPreset:
    """--preset must actually change the solve (it was a dead flag in r1)."""

    def _run(self, path, out, preset=None):
        args = [path, f"-o={out}", "-s=1", "-b=8", "--pairBatch=4"]
        if preset:
            args.append(f"--preset={preset}")
        assert main(args) == 0
        return {
            f.name: f.read_bytes() for f in sorted((Path(out) / "v").iterdir())
        }

    def test_fast_preset_changes_output_but_stays_accurate(self, vid, tmp_path):
        path, (fx, _) = vid
        default = self._run(path, tmp_path / "default")
        fast = self._run(path, tmp_path / "fast", "fast")
        assert fast.keys() == default.keys()
        assert fast != default  # fewer warps/iterations -> different bytes
        img = cv2.imread(
            str(tmp_path / "fast" / "v" / "flow_x_00004.jpg"), cv2.IMREAD_GRAYSCALE
        )
        # still tracks the true (-2, 0) translation
        assert abs(img[16:-16, 16:-16].mean() - _expected_quant(fx, 8)) < 6

    def test_unknown_preset_rejected(self, vid, tmp_path, capsys):
        path, _ = vid
        rc = main([path, f"-o={tmp_path}", "-s=1", "--preset=warpspeed"])
        assert rc == 1
        assert "unknown preset" in capsys.readouterr().out

    def test_preset_resolves_params(self):
        from denseflow_tpu.algorithms import solver_params

        assert solver_params("tvl1", None).iterations == 300
        assert solver_params("tvl1", "fast").iterations < 300
        assert solver_params("farn", "fast").num_iters < 10
        assert solver_params("brox", "fast").outer_iterations < 77


class TestFrameFolderInput:
    def test_if_mode(self, vid, tmp_path):
        path, (fx, _) = vid
        # first extract frames, then run flow on the folder
        out1 = tmp_path / "frames_out"
        assert main([path, f"-o={out1}", "-s=0"]) == 0
        folder = out1 / "v"
        out2 = tmp_path / "flow_out"
        assert main([str(folder), f"-o={out2}", "-s=1", "-if", "-b=8", "--pairBatch=4"]) == 0
        files = sorted((out2 / "v").glob("flow_x_*.jpg"))
        assert len(files) == 8
        img = cv2.imread(str(files[4]), cv2.IMREAD_GRAYSCALE)
        assert abs(img[16:-16, 16:-16].mean() - _expected_quant(fx, 8)) < 5


class TestPipelineStress:
    """SURVEY.md §5 race-detection strategy: the 3-stage pipeline must be
    insensitive to stage timing. Inject randomized delays into the compute
    and encode stages and vary the chunk size; every run must emit
    byte-identical files."""

    def _run(self, path, out, chunk):
        rc = main(
            [path, f"-o={out}", "-a=nv", "-s=1", "-b=8",
             f"--chunkFrames={chunk}", "--pairBatch=2"]
        )
        assert rc == 0
        files = sorted((Path(out) / "v").iterdir())
        assert files, "no output emitted"
        return {f.name: f.read_bytes() for f in files}

    def test_randomized_stage_delays(self, tmp_path, monkeypatch):
        import random
        import time

        import denseflow_tpu.executor as ex_mod
        import denseflow_tpu.pipeline as pl_mod

        path, _ = make_translating_video(tmp_path / "v.avi", h=48, w=64, n=12, dx=1)
        clean = self._run(path, tmp_path / "clean", chunk=64)
        # chunked run (several halo-carried chunks) must match unchunked
        chunked = self._run(path, tmp_path / "chunked", chunk=5)
        assert chunked == clean

        for seed in (1, 2):
            rnd = random.Random(seed)
            orig_iter = ex_mod.DeviceExecutor.iter_chunk
            orig_write = pl_mod.Pipeline._write_item

            def slow_iter(self, frames, n_frames, _o=orig_iter, _r=rnd):
                for item in _o(self, frames, n_frames):
                    time.sleep(_r.uniform(0, 0.04))
                    yield item

            def slow_write(self, item, _o=orig_write, _r=rnd):
                time.sleep(_r.uniform(0, 0.02))
                _o(self, item)

            with monkeypatch.context() as m:
                m.setattr(ex_mod.DeviceExecutor, "iter_chunk", slow_iter)
                m.setattr(pl_mod.Pipeline, "_write_item", slow_write)
                jittered = self._run(path, tmp_path / f"jitter{seed}", chunk=5)
            assert jittered == clean
