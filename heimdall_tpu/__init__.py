"""heimdall_tpu — TPU-native industrial machine-vision framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Heimdall
PET-bottle inspection system (reference: lkwik94/heimdall-vision).  The
per-frame OpenCV/Rust compute path of the reference becomes a single jitted
batched tensor program over NHWC uint8 frames resident in HBM: grayscale →
blur → adaptive threshold → morphology → connected-component labeling →
per-blob statistics → defect verdicts, with the surrounding runtime
(acquisition, stations, lighting, diagnostics, dashboard) preserved as the
public API surface.

Layers (mirrors reference layer map, SURVEY.md §1):
  ops/         TPU image kernels (cv2-numeric-parity JAX + Pallas)
  core/        Config / ImageSource / Pipeline / System
  detectors/   Defect model + ContaminationDetector (device-batched)
  inspection/  Inspector framework -> InspectionResult
  parallel/    Mesh, shardings, collectives (ICI/DCN scale-out)
  runtime/     host feeder, recovery taxonomy, diagnostics
  camera/      camera HAL + multi-camera GigE-style system (simulated)
  lighting/    lighting controllers, sync, calibration, monitoring
  perf/        metrics, profiling sessions, reports
  serving/     dashboard + results viewer (stdlib HTTP)
  models/      learned defect models (flax) + train step
"""

__version__ = "0.1.0"

from heimdall_tpu.core.config import Config
from heimdall_tpu.core.acquisition import ImageSource, ImageSourceFactory
from heimdall_tpu.core.pipeline import Pipeline, PipelineFactory, ProcessingStage
from heimdall_tpu.core.system import System, InspectionStation
from heimdall_tpu.core.results import ResultRepository
from heimdall_tpu.detectors.base import Defect, DefectDetector
from heimdall_tpu.detectors.contamination_detector import ContaminationDetector
from heimdall_tpu.inspection.base_inspector import Inspector, InspectionResult
from heimdall_tpu.inspection.contamination_inspector import (
    ContaminationInspector,
)
