"""Camera HAL / GigE system / lighting subsystem tests.

Mirrors the reference's Rust unit-test coverage (SURVEY.md §4): camera
create/configure/acquire/trigger, Frame stats and FrameSet ops, SyncManager
lifecycle + jitter, recovery-wrapped acquisition with fault injection,
lighting full-interface exercise, calibration loops, monitoring trends.
"""

import numpy as np
import pytest

from heimdall_tpu.camera.hal import (Camera, CameraError, CameraFactory,
                                     PixelFormat, SimulatedCamera,
                                     TriggerMode)
from heimdall_tpu.camera.gige import (Frame, FrameSet, GigESystem,
                                      SyncManager, SyncMode)
from heimdall_tpu.lighting import (
    AdvancedAutoIntensityAdjuster, AutoIntensityAdjuster, IntensityAlgorithm,
    LightingControllerFactory, LightingSynchronizer,
    SerialLightingController, SimulatedLightingController, SyncEvent,
    UniformityCalibrator)
from heimdall_tpu.lighting.monitoring import (AlertLevel, AlertManager,
                                              LightingMonitor)
from heimdall_tpu.lighting.sync import (JitterMeasurement,
                                        compute_strobe_timing)


class TestCameraHAL:
    def test_create_and_acquire(self):
        cam = CameraFactory.create("simulator", "c0",
                                   {"width": 64, "height": 48, "fps": 500})
        cam.initialize()
        cam.start_acquisition()
        frame = cam.acquire_frame()
        assert frame.to_ndarray().shape == (48, 64)
        assert frame.pixel_format == PixelFormat.MONO8
        cam.stop_acquisition()

    def test_acquire_without_start_fails(self):
        cam = SimulatedCamera("c0")
        cam.initialize()
        with pytest.raises(CameraError):
            cam.acquire_frame()

    def test_software_trigger(self):
        cam = SimulatedCamera("c0", {"trigger_mode": "software",
                                     "width": 32, "height": 32})
        cam.initialize()
        cam.start_acquisition()
        cam.trigger()
        frame = cam.acquire_frame(timeout_s=1.0)
        assert frame.frame_id == 0

    def test_trigger_on_continuous_fails(self):
        cam = SimulatedCamera("c0")
        cam.initialize()
        with pytest.raises(CameraError):
            cam.trigger()

    def test_deterministic_defect_every_5th(self):
        cam = SimulatedCamera("c0", {"width": 64, "height": 64,
                                     "fps": 10000})
        cam.initialize()
        cam.start_acquisition()
        mins = [cam.acquire_frame().to_ndarray().min() for _ in range(5)]
        assert mins[4] < 30  # defect frame

    def test_enumerate(self):
        infos = CameraFactory.enumerate("aravis")
        assert len(infos) == 4
        assert infos[0].model == "acA1920-50gm"

    def test_unknown_backend(self):
        with pytest.raises(CameraError):
            CameraFactory.create("nope", "x")


class TestGigESystem:
    def _system(self, n=2, **kw):
        sys_ = GigESystem(backend="simulator", **kw)
        for i in range(n):
            sys_.add_camera(f"cam_{i}", {"width": 64, "height": 48,
                                         "fps": 1000})
        sys_.configure()
        return sys_

    def test_software_sync_frameset(self):
        sys_ = self._system(2)
        sys_.start()
        fs = sys_.acquire_frames()
        sys_.stop()
        assert fs.has_all_cameras(["cam_0", "cam_1"])
        batch = fs.to_batch()
        assert batch.shape == (2, 48, 64)

    def test_freerun(self):
        sys_ = GigESystem(backend="simulator", sync_mode=SyncMode.FREERUN)
        sys_.add_camera("cam_0", {"width": 32, "height": 32, "fps": 1000})
        sys_.configure()
        sys_.start()
        fs = sys_.acquire_frames(timeout_s=3.0)
        sys_.stop()
        assert "cam_0" in fs.frames

    def test_sync_jitter_stats(self):
        sys_ = self._system(1)
        sys_.start()
        for _ in range(5):
            sys_.acquire_frames()
        sys_.stop()
        stats = sys_.sync_manager.stats()
        assert stats["triggers"] == 5
        assert stats["mean_interval_ms"] >= 0

    def test_fault_injection_recovers(self):
        sys_ = self._system(1, fault_probability=0.3)
        sys_.start()
        ok = 0
        for _ in range(5):
            try:
                sys_.acquire_frames()
                ok += 1
            except Exception:
                pass
        sys_.stop()
        assert ok >= 3  # recovery absorbs most injected faults

    def test_discover(self):
        sys_ = GigESystem(backend="simulator")
        ids = sys_.discover()
        assert len(ids) == 4

    def test_frame_stats(self):
        f = Frame("c", np.arange(64, dtype=np.uint8).reshape(8, 8), 0.0, 0)
        assert f.mean() == pytest.approx(31.5)
        assert f.histogram().sum() == 64


class TestLighting:
    def test_full_interface(self):
        ctrl = SimulatedLightingController(n_channels=2)
        ctrl.initialize()
        ctrl.turn_on(0)
        ctrl.set_intensity(0, 0.5)
        ctrl.strobe(1, 100.0)
        ctrl.trigger_all(50.0)
        ctrl.turn_off(0)
        state = ctrl.get_channel_state(0)
        # turn_on + trigger_all strobe = 2 activations
        assert state.activation_count == 2
        assert not state.is_on
        assert ctrl.get_channel_state(1).activation_count == 2
        assert ctrl.health()["ok"]

    def test_serial_framing(self):
        ctrl = SerialLightingController(n_channels=2)
        ctrl.set_intensity(1, 0.5)
        ctrl.strobe(0, 1234)
        assert ctrl.sent[0] == b"@1I127\r\n"
        assert ctrl.sent[1] == b"@0S001234\r\n"

    def test_factory(self):
        for kind in ("simulator", "serial", "ethernet", "gpio"):
            assert LightingControllerFactory.create(kind) is not None
        with pytest.raises(ValueError):
            LightingControllerFactory.create("nope")

    def test_synchronizer(self):
        ctrl = SimulatedLightingController(n_channels=1)
        sync = LightingSynchronizer(ctrl, strobe_duration_us=10)
        sync.start()
        for _ in range(3):
            sync.send_event(SyncEvent.CAMERA_TRIGGER)
        import time
        deadline = time.time() + 3
        while time.time() < deadline and sync.stats()["success"] < 3:
            time.sleep(0.05)
        sync.stop()
        stats = sync.stats()
        assert stats["success"] == 3
        assert stats["avg_delay_us"] >= 0

    def test_strobe_timing(self):
        t = compute_strobe_timing(exposure_us=2000.0)
        assert 0 < t.duration_us < 2000
        assert t.delay_us >= 0

    def test_jitter_measurement(self):
        jm = JitterMeasurement(expected_period_us=1000)
        for _ in range(5):
            jm.record_event()
        assert jm.stats()["mean_us"] >= 0


class TestCalibration:
    def test_proportional_adjuster_converges(self):
        ctrl = SimulatedLightingController(n_channels=1)
        ctrl.set_intensity(0, 0.2)
        adj = AutoIntensityAdjuster(ctrl, 0, target_brightness=128,
                                    gain=0.004)
        # simulated plant: brightness = 255 * intensity
        for _ in range(60):
            adj.step(255 * ctrl.get_channel_state(0).intensity)
        assert abs(255 * ctrl.get_channel_state(0).intensity - 128) < 12

    @pytest.mark.parametrize("alg", list(IntensityAlgorithm))
    def test_advanced_algorithms(self, alg):
        ctrl = SimulatedLightingController(n_channels=1)
        ctrl.set_intensity(0, 0.9)
        adj = AdvancedAutoIntensityAdjuster(ctrl, 0,
                                            target_brightness=100,
                                            algorithm=alg, tolerance=5)
        final = adj.calibrate(
            lambda: 255 * ctrl.get_channel_state(0).intensity,
            max_iters=80)
        assert abs(255 * final - 100) < 20

    def test_uniformity_map(self):
        rng = np.random.RandomState(0)
        # vignetted flat field
        y, x = np.mgrid[:64, :64]
        vignette = 1.0 - 0.4 * (((y - 32) / 32) ** 2 + ((x - 32) / 32) ** 2)
        frames = np.clip(200 * vignette + rng.randn(8, 64, 64) * 2, 0,
                         255).astype(np.uint8)
        cal = UniformityCalibrator(smoothing_kernel=9)
        cal.build_map(frames)
        corrected = cal.apply(frames[0])
        assert cal.uniformity_score(corrected) > \
            cal.uniformity_score(frames[0])

    def test_uniformity_on_device(self):
        import jax.numpy as jnp
        cal = UniformityCalibrator(smoothing_kernel=5)
        frames = np.full((4, 16, 16), 100, np.uint8)
        cal.build_map(frames)
        out = cal.apply_on_device(jnp.asarray(frames))
        assert out.shape == (4, 16, 16)


class TestMonitoring:
    def test_trend_and_life(self):
        ctrl = SimulatedLightingController(n_channels=1)
        mon = LightingMonitor(ctrl)
        import time as _t
        for i in range(30):
            m = 200 - i * 0.5
            mon.record(m)
            # fake time progression by editing timestamps
            mon.measurements[-1].timestamp += i * 60.0
        trend = mon.trend()
        assert trend["slope_per_hour"] < 0
        assert mon.predict_remaining_life_hours() >= 0

    def test_anomaly_alert(self):
        ctrl = SimulatedLightingController(n_channels=1)
        alerts = AlertManager()
        mon = LightingMonitor(ctrl, alert_manager=alerts, anomaly_sigma=3)
        rng = np.random.RandomState(0)
        for _ in range(25):
            mon.record(100.0 + rng.randn())
        mon.record(400.0)  # gross anomaly
        assert len(alerts.active()) >= 1
        alerts.acknowledge_all()
        assert not alerts.active()

    def test_alert_callbacks(self):
        alerts = AlertManager()
        seen = []
        alerts.register_callback(seen.append)
        alerts.raise_alert(AlertLevel.ERROR, "test", "boom")
        assert len(seen) == 1 and seen[0].level == AlertLevel.ERROR
