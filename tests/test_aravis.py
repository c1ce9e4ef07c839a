"""Aravis binding: the REAL dlopen/ctypes plumbing against a fake libaravis.

The shim (native/aravis_shim.cpp) dlopens whatever HEIMDALL_ARAVIS_LIB
points at; these tests point it at native/libaravis_fake.so, so every
layer a production GigE deployment uses — ctypes wrapper, C shim, symbol
resolution, stream/buffer recycling — executes for real.  Each test runs
the shim in a fresh subprocess because the shim caches its dlopen result
process-wide (std::call_once).
"""

import json
import os
import pathlib
import subprocess
import sys
import textwrap

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
FAKE = ROOT / "native" / "libaravis_fake.so"
SHIM = ROOT / "native" / "libheimdall_aravis.so"

pytestmark = pytest.mark.skipif(
    not (FAKE.exists() and SHIM.exists()),
    reason="native libs not built (make -C native)")


def _run(snippet: str, fake: bool = True) -> dict:
    env = dict(os.environ)
    if fake:
        env["HEIMDALL_ARAVIS_LIB"] = str(FAKE)
    else:
        env["HEIMDALL_ARAVIS_LIB"] = "/nonexistent/libaravis.so"
        # also hide any system aravis so the "absent" path is deterministic
    env["PYTHONPATH"] = str(ROOT)
    code = textwrap.dedent(snippet)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_enumerate_and_grab_through_fake():
    r = _run("""
        import json
        import numpy as np
        from heimdall_tpu.camera.aravis import (hardware_available,
                                                enumerate_hardware)
        from heimdall_tpu.camera.hal import CameraFactory
        assert hardware_available()
        ids = enumerate_hardware()
        cam = CameraFactory.create("aravis-hw", "cam0",
                                   {"device_id": ids[0],
                                    "exposure_us": 2000.0})
        cam.initialize()
        cam.start_acquisition()
        frames = [cam.acquire_frame(1.0) for _ in range(3)]
        cam.trigger()
        img = frames[0].to_ndarray()
        dark = int((img < 40).sum())    # defect blob on frame 0
        cam.stop_acquisition()
        cam.close()
        print(json.dumps({
            "ids": ids,
            "shape": list(img.shape),
            "n_frames": len(frames),
            "bytes": int(frames[0].data.size),
            "dark_px": dark,
            "mean": float(img.mean()),
        }))
    """)
    assert r["ids"] == ["Fake-GigE-0", "Fake-GigE-1"]
    assert r["shape"] == [240, 320]
    assert r["bytes"] == 240 * 320
    assert r["n_frames"] == 3
    assert r["dark_px"] > 50          # the synthetic defect
    assert 60 < r["mean"] < 220


def test_unknown_device_raises():
    r = _run("""
        import json
        from heimdall_tpu.camera.hal import CameraFactory, CameraError
        cam = CameraFactory.create("aravis-hw", "cam0",
                                   {"device_id": "NoSuchCamera"})
        try:
            cam.initialize()
            print(json.dumps({"raised": False}))
        except CameraError as e:
            print(json.dumps({"raised": True,
                              "kind": e.kind.value}))
    """)
    assert r == {"raised": True, "kind": "not_found"}


def test_absent_library_degrades_gracefully():
    r = _run("""
        import json
        from heimdall_tpu.camera.aravis import (hardware_available,
                                                enumerate_hardware)
        from heimdall_tpu.camera.hal import CameraFactory, CameraError
        ok = hardware_available()
        ids = enumerate_hardware()
        cam = CameraFactory.create("aravis-hw", "cam0", {})
        try:
            cam.initialize()
            raised = False
        except CameraError:
            raised = True
        # the simulated "aravis" backend keeps working regardless
        sim = CameraFactory.create("aravis", "cam0", {})
        sim.initialize()
        sim.start_acquisition()
        f = sim.acquire_frame()
        print(json.dumps({"hw": ok, "ids": ids, "raised": raised,
                          "sim_w": f.width}))
    """, fake=False)
    assert r["hw"] is False
    assert r["ids"] == []
    assert r["raised"] is True
    assert r["sim_w"] > 0
