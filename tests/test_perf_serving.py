"""Perf (metrics/profiling/reports), serving (dashboard/viewer), models."""

import json
import time
import urllib.request

import numpy as np
import pytest

from heimdall_tpu.perf.metrics import (MetricCounter, MetricsRegistry,
                                       SlidingWindow, ThroughputMeter, Timer)
from heimdall_tpu.perf.profiling import (ProfilingManager, ProfilingSession,
                                         measure_throughput, measure_time)
from heimdall_tpu.perf.reports import Report, ReportFormat


class TestMetrics:
    def test_sliding_window(self):
        w = SlidingWindow(3)
        for v in (1, 2, 3, 4):
            w.push(v)
        assert w.values == [2, 3, 4]
        assert w.min() == 2 and w.max() == 4 and w.avg() == 3
        assert w.percentile(99) == 4

    def test_counter_rate(self):
        c = MetricCounter("x")
        for _ in range(5):
            c.increment()
        assert c.count == 5
        assert c.rate_per_second() >= 0

    def test_timer(self):
        t = Timer("t")
        with t:
            time.sleep(0.01)
        assert t.stats()["avg_s"] >= 0.009

    def test_throughput(self):
        m = ThroughputMeter("t")
        for _ in range(3):
            m.record(10)
            time.sleep(0.01)
        assert m.total == 30
        assert m.throughput() > 0

    def test_registry_prometheus(self):
        reg = MetricsRegistry()
        reg.counter("frames").increment(5)
        reg.gauge("fps", 123.0)
        reg.histogram("lat", 1.5)
        text = reg.prometheus_text()
        assert "frames 5" in text
        assert "fps 123.0" in text
        assert 'lat{stat="avg"}' in text


class TestProfiling:
    def test_session_timings_and_report(self):
        s = ProfilingSession("test")
        with s.timing("step_a"):
            time.sleep(0.005)
        s.increment("frames", 3)
        s.sample_system()
        report = s.report()
        names = [m.name for m in report.stats]
        assert "step_a" in names and "rss" in names
        assert report.counters["frames"] == 3

    def test_report_formats(self):
        s = ProfilingSession("fmt")
        with s.timing("x"):
            pass
        r = s.report()
        assert json.loads(r.render(ReportFormat.JSON))["name"] == "fmt"
        assert "| x |" in r.render(ReportFormat.MARKDOWN)
        assert "x," in r.render(ReportFormat.CSV)
        assert "<table" in r.render(ReportFormat.HTML)
        assert "fmt" in r.render(ReportFormat.TEXT)

    def test_manager_saves(self, tmp_path):
        mgr = ProfilingManager(output_dir=str(tmp_path))
        s = mgr.start_session("run1")
        with s.timing("t"):
            pass
        path = mgr.end_session("run1")
        assert path and json.load(open(path))["name"] == "run1"
        assert mgr.history == ["run1"]

    def test_measure_helpers(self):
        r, t = measure_time(lambda: 42)
        assert r == 42 and t >= 0
        r, tp = measure_throughput(lambda: None, items=100)
        assert tp > 0


class TestDashboard:
    @pytest.fixture()
    def server(self):
        from heimdall_tpu.serving.dashboard import DashboardServer
        srv = DashboardServer(port=0, settings={"width": 64, "height": 48,
                                                "batch_size": 2})
        srv.start_background()
        yield srv
        srv.shutdown()

    def _get(self, server, path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}{path}", timeout=10) as r:
            return r.status, r.read()

    def _post(self, server, path, data=b""):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}{path}", data=data,
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read()

    def test_endpoints(self, server):
        status, body = self._get(server, "/")
        assert status == 200 and b"Heimdall" in body
        status, body = self._get(server, "/api/stats")
        assert status == 200
        stats = json.loads(body)
        assert "frames_processed" in stats and stats["running"] is False

        status, body = self._post(server, "/api/start")
        assert json.loads(body)["running"] is True
        deadline = time.time() + 90
        frames = 0
        while time.time() < deadline:
            stats = json.loads(self._get(server, "/api/stats")[1])
            frames = stats["frames_processed"]
            if frames > 0:
                break
            time.sleep(0.3)
        assert frames > 0
        status, body = self._get(server, "/api/latest")
        latest = json.loads(body)
        assert "defect_count" in latest

        status, body = self._post(server, "/api/settings",
                                  json.dumps({"batch_size": 4}).encode())
        assert json.loads(body)["settings"]["batch_size"] == 4
        self._post(server, "/api/stop")

        status, body = self._get(server, "/metrics")
        assert status == 200 and b"heimdall_frames_total" in body

    def test_404(self, server):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError):
            self._get(server, "/nope")


class TestResultsViewer:
    def test_groups_and_serves(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        for i in (1, 2):
            for kind in ("original", "processed", "visualization"):
                cv2.imwrite(str(tmp_path / f"{kind}_{i}.jpg"),
                            np.zeros((8, 8, 3), np.uint8))
        from heimdall_tpu.serving.web_viewer import (ResultsViewer,
                                                     group_results)
        sets = group_results(str(tmp_path))
        assert set(sets) == {"1", "2"} and len(sets["1"]) == 3

        viewer = ResultsViewer(str(tmp_path), port=0)
        viewer.start_background()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{viewer.port}/api/images",
                    timeout=10) as r:
                data = json.loads(r.read())
            assert data["count"] == 6
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{viewer.port}/images/original_1.jpg",
                    timeout=10) as r:
                assert r.status == 200
        finally:
            viewer.shutdown()


class TestModels:
    def test_classifier_train_and_predict(self):
        pytest.importorskip("flax")
        from heimdall_tpu.models.defect_classifier import (
            ClassifierTrainer, DefectClassifier)
        rng = np.random.RandomState(0)
        clf = DefectClassifier()
        trainer = ClassifierTrainer(clf, learning_rate=5e-3)
        # separable toy data: dark patches = defect
        n = 64
        dark = rng.randint(0, 60, (n // 2, 32, 32, 1)).astype(np.uint8)
        light = rng.randint(180, 255, (n // 2, 32, 32, 1)).astype(np.uint8)
        x = np.concatenate([dark, light])
        y = np.concatenate([np.ones(n // 2, np.int32),
                            np.zeros(n // 2, np.int32)])
        losses = [trainer.train_step(x, y) for _ in range(30)]
        assert losses[-1] < losses[0]
        probs = clf.predict(dark[:4])
        assert probs.shape == (4, 2)
        assert probs[:, 1].mean() > 0.5

    def test_checkpoint_roundtrip(self, tmp_path):
        pytest.importorskip("flax")
        from heimdall_tpu.models.defect_classifier import DefectClassifier
        clf = DefectClassifier(seed=1)
        clf.save(str(tmp_path / "ckpt"))
        clf2 = DefectClassifier(seed=2)
        clf2.load(str(tmp_path / "ckpt"))
        import jax
        a = jax.tree.leaves(clf.params)[0]
        b = jax.tree.leaves(clf2.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_extract_patches(self):
        from heimdall_tpu.detectors.contamination_detector import (
            ContaminationDetector)
        from heimdall_tpu.models.defect_classifier import (
            extract_blob_patches)
        img = np.full((2, 96, 128, 3), 220, np.uint8)
        img[0, 40:56, 60:76] = 20
        det = ContaminationDetector(config={"include_contours": False})
        table, conf, acc = det.run_device(img)
        patches = extract_blob_patches(img, table)
        assert patches.shape[1:] == (32, 32, 1)
        assert len(patches) >= 1


class TestAnomalyModel:
    def test_detects_injected_anomaly(self):
        pytest.importorskip("flax")
        from heimdall_tpu.models.anomaly import AnomalyDetector
        rng = np.random.RandomState(0)
        # good frames: smooth gradient + mild noise
        base = np.clip(
            np.linspace(100, 180, 128)[None, :, None].repeat(128, 2)
            .transpose(0, 2, 1), 0, 255)
        good = np.clip(base + rng.randn(24, 128, 128) * 3, 0,
                       255).astype(np.uint8)
        det = AnomalyDetector()
        det.fit(good[:16], epochs=16, batch_size=32)
        # anomalous frame: big dark blotch
        bad = good[16].copy()
        bad[40:90, 40:90] = 10
        scores_good = det.score(good[16:20])
        score_bad = det.score(bad[None])[0]
        assert score_bad > scores_good.max() * 2
        flags = det.is_anomalous(np.stack([good[17], bad]))
        assert not flags[0] and flags[1]


class TestDashboardSSE:
    def test_stream_pushes_frames(self):
        # the push channel must deliver per-frame events (no polling):
        # connect, start the line, read events off the raw socket.
        import socket
        from heimdall_tpu.serving.dashboard import DashboardServer
        srv = DashboardServer(port=0, settings={"width": 64, "height": 48,
                                                "batch_size": 2})
        srv.start_background()
        try:
            sock = socket.create_connection(("127.0.0.1", srv.port),
                                            timeout=10)
            sock.sendall(b"GET /api/stream HTTP/1.1\r\n"
                         b"Host: localhost\r\nAccept: text/event-stream\r\n"
                         b"\r\n")
            sock.settimeout(90)
            urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/api/start", data=b"",
                    method="POST"), timeout=30).read()
            buf = b""
            events = []
            while len(events) < 2:
                chunk = sock.recv(65536)
                assert chunk, "stream closed early"
                buf += chunk
                while b"\n\n" in buf:
                    block, buf = buf.split(b"\n\n", 1)
                    for line in block.splitlines():
                        if line.startswith(b"data: "):
                            events.append(json.loads(line[6:]))
            sock.close()
        finally:
            srv.shutdown()
        assert events[0]["seq"] < events[1]["seq"]
        assert "stats" in events[0] and "latest" in events[0]
        assert events[1]["stats"]["frames_processed"] >= 2
