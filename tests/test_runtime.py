"""Runtime layer tests: native bridge, feeder, recovery, diagnostics."""

import time

import numpy as np
import pytest

from heimdall_tpu import native_bridge
from heimdall_tpu.runtime.feeder import FrameRing, NativeCameraFeeder
from heimdall_tpu.runtime.recovery import (
    AcquisitionError, ErrorCategory, FaultInjector, HeimdallError,
    RecoveryAction, RecoveryStrategy, with_recovery)
from heimdall_tpu.runtime import diagnostics


class TestNativeBridge:
    def test_available(self):
        # the native lib builds in this repo; fallback still must work
        assert native_bridge.is_available() in (True, False)

    def test_detect_contamination(self):
        img = np.full((96, 128, 3), 200, np.uint8)
        img[40:56, 60:76] = 20
        out = native_bridge.detect_contamination(img, min_size=10,
                                                 max_size=3000, threshold=15)
        assert out["defect_count"] >= 1
        d = out["defects"][0]
        assert abs(d["position"][0] - 67) <= 3
        assert abs(d["position"][1] - 47) <= 3

    def test_process_image(self):
        img = np.random.RandomState(0).randint(0, 255, (64, 64, 3),
                                               np.uint8)
        out = native_bridge.process_image(img)
        assert out["processed_image"].shape[:2] == (64, 64)

    @pytest.mark.skipif(not native_bridge.is_available(),
                        reason="native lib not built")
    def test_benchmark(self):
        img = np.full((64, 64, 3), 128, np.uint8)
        out = native_bridge.benchmark_processing(img, iterations=3)
        assert out["native_ms_per_frame"] > 0
        assert out["tpu_ms_per_frame"] > 0


class TestFrameRing:
    def test_push_pop(self):
        ring = FrameRing(8, (16, 16))
        frame = np.arange(256, dtype=np.uint8).reshape(16, 16)
        assert ring.push(frame, 42)
        out, fid, lat = ring.pop()
        np.testing.assert_array_equal(out, frame)
        assert fid == 42
        assert lat >= 0

    def test_overflow_drops(self):
        ring = FrameRing(4, (4, 4))
        frame = np.zeros((4, 4), np.uint8)
        results = [ring.push(frame, i) for i in range(8)]
        assert not all(results)          # some dropped
        assert ring.stats()["drops"] > 0

    def test_pop_empty(self):
        ring = FrameRing(4, (4, 4))
        assert ring.pop() is None

    def test_pop_batch(self):
        ring = FrameRing(16, (8, 8))
        for i in range(5):
            ring.push(np.full((8, 8), i, np.uint8), i)
        batch = ring.pop_batch(5, timeout_s=0.5)
        assert batch.shape == (5, 8, 8)


class TestDeviceFeeder:
    def test_pull_mode_pipeline(self):
        from heimdall_tpu.runtime.feeder import DeviceFeeder
        import jax.numpy as jnp
        feeder = DeviceFeeder(lambda b: jnp.asarray(b).sum(), max_in_flight=2)
        done = []
        for i in range(5):
            out = feeder.submit(np.full((2, 2), i, np.uint8), meta=i)
            if out is not None:
                done.append(out)
        done.extend(feeder.drain())
        assert [m for _, m in done] == [0, 1, 2, 3, 4]
        assert [int(r) for r, _ in done] == [0, 4, 8, 12, 16]

    def test_push_mode_prompt_collection(self):
        from heimdall_tpu.runtime.feeder import DeviceFeeder
        import jax.numpy as jnp
        done = []
        feeder = DeviceFeeder(lambda b: jnp.asarray(b).sum(),
                              max_in_flight=3,
                              on_done=lambda r, m: done.append((int(r), m)))
        for i in range(7):
            assert feeder.submit(np.full((2, 2), i, np.uint8), meta=i) is None
        assert feeder.drain() == []
        # every result delivered, in submission order, with its meta
        assert done == [(4 * i, i) for i in range(7)]
        feeder.close()
        assert feeder._collector is None


class TestNativeCameraFeeder:
    def test_produces_frames(self):
        feeder = NativeCameraFeeder(width=64, height=48, fps=200,
                                    capacity=16, seed=1)
        with feeder:
            batch = feeder.ring.pop_batch(4, timeout_s=2.0)
        assert batch.shape == (4, 48, 64)
        stats = feeder.stats()
        assert stats["pushes"] >= 4


class TestRecovery:
    def test_retry_succeeds(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise AcquisitionError("transient")
            return "ok"

        strat = RecoveryStrategy(retry_count=5, delay_s=0.001)
        assert with_recovery(flaky, strat) == "ok"
        assert calls["n"] == 3

    def test_exhausted_raises(self):
        def always_fail():
            raise AcquisitionError("nope")
        with pytest.raises(AcquisitionError):
            with_recovery(always_fail,
                          RecoveryStrategy(retry_count=2, delay_s=0.001))

    def test_reset_action_called(self):
        resets = {"n": 0}
        calls = {"n": 0}

        class DevError(HeimdallError):
            category = ErrorCategory.PERMANENT

        def op():
            calls["n"] += 1
            if calls["n"] < 2:
                raise DevError("device gone")
            return 1

        strat = RecoveryStrategy(retry_count=2, delay_s=0.001,
                                 action=RecoveryAction.RESET_DEVICE)
        assert with_recovery(op, strat,
                             on_reset=lambda: resets.update(
                                 n=resets["n"] + 1)) == 1
        assert resets["n"] == 1

    def test_strategy_for_error(self):
        assert RecoveryStrategy.for_error(
            AcquisitionError("x")).action == RecoveryAction.RETRY
        fatal = HeimdallError("x", ErrorCategory.FATAL)
        assert RecoveryStrategy.for_error(fatal).action == \
            RecoveryAction.RESTART_SYSTEM

    def test_fault_injector_deterministic(self):
        inj = FaultInjector(failure_probability=0.5, seed=1)
        outcomes = []
        for _ in range(20):
            try:
                inj.maybe_fail()
                outcomes.append(False)
            except AcquisitionError:
                outcomes.append(True)
        assert any(outcomes) and not all(outcomes)


class TestDiagnostics:
    def test_device_and_compile(self):
        report = diagnostics.run_diagnostics(include_detection=False)
        names = [t.name for t in report.tests]
        assert "tpu_device" in names and "compile_sanity" in names
        assert report.passed

    def test_image_quality_gate(self):
        good = np.random.RandomState(0).randint(0, 255, (32, 32),
                                                np.uint8)
        assert diagnostics.check_image_quality(good).passed
        flat = np.full((32, 32), 128, np.uint8)
        assert not diagnostics.check_image_quality(flat).passed

    def test_detection_pipeline_check(self):
        assert diagnostics.check_detection_pipeline().passed

    def test_report_serialization(self, tmp_path):
        report = diagnostics.run_diagnostics(include_detection=False)
        path = str(tmp_path / "diag.json")
        report.save(path)
        import json
        data = json.load(open(path))
        assert "tests" in data and isinstance(data["passed"], bool)
        assert "PASS" in report.summary() or "FAIL" in report.summary()
