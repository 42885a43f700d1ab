"""Output naming grammar + .done marker layout
(reference src/common.cpp:73-150, tools/denseflow.cpp:63-78)."""

import os

import numpy as np
import pytest

from denseflow_tpu.io.writer import (
    done_paths,
    flow_file_name,
    h5_file_name,
    mark_done,
    step_base,
    write_flow_images,
    write_images,
)


class TestStepInfix:
    def test_step1_plain(self):
        assert flow_file_name("flow_x", 1, 0) == "flow_x_00000.jpg"

    def test_step_positive_gt1(self):
        assert flow_file_name("flow_x", 2, 7) == "flow_x_p2_00007.jpg"

    def test_step_negative(self):
        assert flow_file_name("flow_y", -3, 12) == "flow_y_m3_00012.jpg"

    def test_png_ext(self):
        assert flow_file_name("flow", -1, 4, "png") == "flow_m1_00004.png"


class TestStepBase:
    """base = step>0 ? 0 : -step (reference src/common.cpp:85)."""

    @pytest.mark.parametrize("step,base", [(1, 0), (2, 0), (5, 0), (-1, 1), (-3, 3)])
    def test_base(self, step, base):
        assert step_base(step) == base


@pytest.mark.parametrize(
    "step,expect",
    [
        (1, ["flow_x_00005.jpg", "flow_x_00006.jpg", "flow_x_00007.jpg"]),
        (2, ["flow_x_p2_00005.jpg", "flow_x_p2_00006.jpg", "flow_x_p2_00007.jpg"]),
        (-1, ["flow_x_m1_00006.jpg", "flow_x_m1_00007.jpg", "flow_x_m1_00008.jpg"]),
        (-2, ["flow_x_m2_00007.jpg", "flow_x_m2_00008.jpg", "flow_x_m2_00009.jpg"]),
    ],
)
def test_write_flow_images_grammar(tmp_path, step, expect):
    write_flow_images([b"a", b"b", b"c"], str(tmp_path / "flow_x"), step, start=5)
    got = sorted(os.listdir(tmp_path))
    assert got == expect


def test_write_images_plain(tmp_path):
    write_images([b"a", b"b"], str(tmp_path / "img"), start=3)
    assert sorted(os.listdir(tmp_path)) == ["img_00003.jpg", "img_00004.jpg"]


class TestH5Name:
    def test_step1(self):
        assert h5_file_name("/out/vid", 1) == "/out/vid.h5"

    def test_p2(self):
        assert h5_file_name("/out/vid", 2) == "/out/vid_p2.h5"

    def test_m1(self):
        assert h5_file_name("/out/vid", -1) == "/out/vid_m1.h5"


class TestDonePaths:
    def test_no_class(self):
        outdir, donedir, donefile = done_paths("/out", "/data/v1.avi", False)
        assert outdir == "/out/v1"
        assert donedir == "/out/.done"
        assert donefile == "/out/.done/v1"

    def test_with_class(self):
        outdir, donedir, donefile = done_paths(
            "/out", "/data/Jump/v1.avi", True
        )
        assert outdir == "/out/Jump/v1"
        assert donedir == "/out/.done/Jump"
        assert donefile == "/out/.done/Jump/v1"


def test_mark_done_roundtrips_with_done_paths(tmp_path):
    # no class
    outdir, _, donefile = done_paths(str(tmp_path), "/data/v1.avi", False)
    os.makedirs(outdir)
    assert mark_done(outdir, False) == donefile
    assert os.path.isfile(donefile)
    # with class
    outdir, _, donefile = done_paths(str(tmp_path), "/data/Jump/v2.avi", True)
    os.makedirs(outdir)
    assert mark_done(outdir, True) == donefile
    assert os.path.isfile(donefile)


def test_hdf5_dataset_naming(tmp_path):
    h5py = pytest.importorskip("h5py")
    from denseflow_tpu.io.writer import create_h5_file, write_hdf5

    outdir = str(tmp_path / "vid")
    path = create_h5_file(outdir, 2)
    assert path.endswith("vid_p2.h5")
    planes = [np.ones((4, 5), np.float32) * i for i in range(3)]
    write_hdf5(planes, outdir, "flow_x", 2, start=10)
    with h5py.File(path) as f:
        assert sorted(f.keys()) == [
            "flow_x_p2_00010",
            "flow_x_p2_00011",
            "flow_x_p2_00012",
        ]
        np.testing.assert_array_equal(f["flow_x_p2_00011"][:], planes[1])
