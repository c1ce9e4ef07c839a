"""Core layer tests: config, acquisition, pipeline, system."""

import os

import numpy as np
import pytest

from heimdall_tpu.core.config import Config
from heimdall_tpu.core.acquisition import (ImageSourceFactory,
                                           SimulationImageSource)
from heimdall_tpu.core.pipeline import Pipeline, PipelineFactory
from heimdall_tpu.core.system import System


class TestConfig:
    def test_defaults(self):
        cfg = Config()
        assert cfg.get("system.production_speed") == 90000
        assert cfg.get("inspection.default.rejection_threshold") == 0.7
        assert cfg.get("communication.plc.protocol") == "modbus"
        assert cfg.get("communication.plc.port") == 502

    def test_dot_path_get_set(self):
        cfg = Config()
        cfg.set("a.b.c", 42)
        assert cfg.get("a.b.c") == 42
        assert cfg.get("a.b.missing", "dflt") == "dflt"

    def test_camera_station_merge(self):
        cfg = Config()
        cfg.add_camera("cam_x", {"width": 999})
        cam = cfg.get_camera_config("cam_x")
        assert cam["width"] == 999
        assert cam["type"] == "simulation"  # from default
        cfg.add_station("st1", {"camera_id": "cam_x"})
        st = cfg.get_station_config("st1")
        assert st["camera_id"] == "cam_x"
        assert st["rejection_threshold"] == 0.7  # inherited

    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.set("system.name", "roundtrip")
        path = str(tmp_path / "c.yaml")
        assert cfg.save_config(path)
        cfg2 = Config(path)
        assert cfg2.get("system.name") == "roundtrip"

    def test_json_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.set("tpu.batch_size", 7)
        path = str(tmp_path / "c.json")
        assert cfg.save_config(path)
        assert Config(path).get("tpu.batch_size") == 7

    def test_get_all(self):
        cfg = Config()
        cfg.add_camera("a", {})
        cfg.add_camera("b", {})
        cams = cfg.get_all_cameras()
        assert set(cams) == {"a", "b"}  # default excluded


class TestAcquisition:
    def test_simulation_source(self):
        src = SimulationImageSource("t", {"width": 64, "height": 48,
                                          "seed": 1})
        with src:
            ok, frame = src.read()
        assert ok and frame.shape == (48, 64, 3)

    def test_batch_read(self):
        src = SimulationImageSource("t", {"width": 64, "height": 48,
                                          "seed": 1})
        src.open()
        n, batch = src.read_batch(5)
        assert n == 5 and batch.shape == (5, 48, 64, 3)

    def test_deterministic_seed(self):
        a = SimulationImageSource("a", {"seed": 7, "width": 64,
                                        "height": 48})
        b = SimulationImageSource("b", {"seed": 7, "width": 64,
                                        "height": 48})
        a.open(); b.open()
        np.testing.assert_array_equal(a.read()[1], b.read()[1])

    def test_checkerboard(self):
        src = SimulationImageSource("t", {"pattern": "checker",
                                          "width": 100, "height": 100,
                                          "inject_defects": False})
        src.open()
        _, frame = src.read()
        assert frame[0, 0, 0] == 255 and frame[0, 50, 0] == 0

    def test_directory_source(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"img_{i}.png"),
                        np.full((8, 8, 3), i * 10, np.uint8))
        src = ImageSourceFactory.create_source(
            "d", {"type": "directory", "directory_path": str(tmp_path)})
        assert src.open()
        frames = []
        while True:
            ok, f = src.read()
            if not ok:
                break
            frames.append(f)
        assert len(frames) == 3

    def test_file_source(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, np.zeros((8, 8, 3), np.uint8))
        src = ImageSourceFactory.create_source(
            "f", {"type": "file", "file_path": p})
        assert src.open()
        ok, f = src.read()
        assert ok and f.shape == (8, 8, 3)

    def test_factory_unknown(self):
        with pytest.raises(ValueError):
            ImageSourceFactory.create_source("x", {"type": "nope"})


class TestPipeline:
    def test_contamination_pipeline_runs(self):
        pipe = PipelineFactory.create_pipeline("t", "contamination")
        img = np.full((48, 64, 3), 200, np.uint8)
        img[20:28, 30:38] = 10
        ctx = pipe.process(img)
        assert ctx["success"]
        assert ctx["result_image"].shape == (48, 64)
        assert set(ctx["stage_results"]) == {
            "grayscale", "blur", "threshold", "morphology"}
        assert ctx["total_time"] > 0

    def test_preform_pipeline(self):
        pipe = PipelineFactory.create_pipeline("t", "preform")
        img = np.random.RandomState(0).randint(
            0, 255, (48, 64, 3), np.uint8)
        ctx = pipe.process(img)
        assert ctx["success"]
        assert set(np.unique(ctx["result_image"])) <= {0, 255}

    def test_bottle_base_contours(self):
        pipe = PipelineFactory.create_pipeline("t", "bottle_base")
        img = np.full((64, 96, 3), 220, np.uint8)
        img[20:40, 30:60] = 10
        ctx = pipe.process(img)
        assert ctx["success"]
        assert "contour_count" in ctx
        assert ctx["result_image"].shape == (64, 96, 3)  # drawn color

    def test_batched_process(self):
        pipe = PipelineFactory.create_pipeline("t", "contamination")
        imgs = np.full((3, 48, 64, 3), 200, np.uint8)
        ctx = pipe.process_batch(imgs)
        assert ctx["success"]
        assert ctx["result_image"].shape == (3, 48, 64)

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            PipelineFactory.create_pipeline("t", "nope")


class TestSystem:
    def test_station_lifecycle(self):
        system = System()
        system.config.add_camera("cam_1", {
            "type": "simulation", "width": 64, "height": 48, "seed": 3})
        system.add_station("s1", {"camera_id": "cam_1",
                                  "pipeline_type": "contamination",
                                  "batch_size": 2})
        system.start()
        import time
        deadline = time.time() + 10
        while time.time() < deadline:
            if system.stations["s1"].frames_processed > 0:
                break
            time.sleep(0.1)
        status = system.get_status()
        system.stop()
        assert status["station_count"] == 1
        assert status["stations"]["s1"]["frames_processed"] > 0
        assert not system.stations["s1"].running

    def test_remove_station(self):
        system = System()
        system.config.add_camera("c", {"type": "simulation"})
        system.add_station("s", {"camera_id": "c"})
        assert system.remove_station("s")
        assert not system.remove_station("s")


class TestSidewallPipeline:
    def test_hough_lines_on_synthetic_edges(self):
        from heimdall_tpu import ops
        # a strong horizontal line of edge pixels
        edges = np.zeros((100, 200), np.uint8)
        edges[50, 20:180] = 255
        rho, theta, votes, valid = ops.hough_lines(edges, threshold=80)
        assert valid[0]
        # horizontal line: theta ~ pi/2, rho ~ 50
        assert abs(theta[0] - np.pi / 2) < 0.05
        assert abs(abs(rho[0]) - 50) <= 1

    def test_hough_lines_p_segments(self):
        from heimdall_tpu import ops
        edges = np.zeros((100, 200), np.uint8)
        edges[50, 20:180] = 255
        segs = ops.hough_lines_p(edges, threshold=80, min_line_length=50,
                                 max_line_gap=5)
        assert segs.shape[0] >= 1 and segs.shape[1:] == (1, 4)
        x1, y1, x2, y2 = segs[0, 0]
        assert abs(int(y1) - 50) <= 1 and abs(int(y2) - 50) <= 1
        assert abs(int(x2) - int(x1)) > 100

    def test_sidewall_pipeline_runs(self):
        from heimdall_tpu.core.pipeline import PipelineFactory
        pipe = PipelineFactory.create_pipeline("t", "sidewall")
        img = np.full((100, 160, 3), 220, np.uint8)
        img[30:70, 40] = 10   # vertical edge
        img[30:70, 120] = 10
        ctx = pipe.process(img)
        assert ctx["success"]
        assert "line_count" in ctx


class TestInstrumentedPipeline:
    def test_per_stage_timings(self):
        from heimdall_tpu.core.pipeline import Pipeline
        pipe = PipelineFactory.create_pipeline(
            "t", "contamination", {"instrumented": True})
        img = np.full((48, 64, 3), 200, np.uint8)
        ctx = pipe.process(img)
        assert ctx["success"]
        # instrumented mode: each stage individually timed (reference
        # context protocol, pipeline.py:47-54)
        assert set(ctx["stage_times"]) == {
            "grayscale", "blur", "threshold", "morphology"}
        assert all(t >= 0 for t in ctx["stage_times"].values())


class TestInspectorStation:
    def test_station_with_inspector_and_rejection(self):
        import time
        system = System()
        system.config.add_camera("cam_i", {
            "type": "simulation", "width": 96, "height": 64, "seed": 9,
            "defect_probability": 1.0})
        system.add_station("insp", {
            "camera_id": "cam_i",
            "inspector": "contamination",
            "inspector_config": {"contamination_detector_config": {
                "min_contaminant_size": 3, "contrast_threshold": 25,
                "min_confidence": 0.1, "include_contours": False}},
            "reject": True,
            "rejection_threshold": 0.1,
            "batch_size": 2})
        station = system.stations["insp"]
        assert station.inspector is not None
        assert station.rejector is not None
        system.start()
        # generous deadline: the loop exits on the first detection, but a
        # loaded CI machine can take >30 s just to jit the batch shape
        deadline = time.time() + 120
        while time.time() < deadline:
            if station.defects_detected > 0:
                break
            time.sleep(0.2)
        system.stop()
        assert station.frames_processed > 0
        assert station.defects_detected > 0
        assert station.rejector.stats()["scheduled"] > 0

    def test_unknown_inspector_raises(self):
        system = System()
        system.config.add_camera("c", {"type": "simulation"})
        with pytest.raises(ValueError):
            system.add_station("bad", {"camera_id": "c",
                                       "inspector": "nope"})
