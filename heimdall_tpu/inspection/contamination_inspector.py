"""Contamination inspector.

API-compatible with the reference (heimdall/inspection/
contamination_inspector.py:11-55): "contamination" pipeline + a
ContaminationDetector with the same overridden defaults (min 3 / max 3000 /
contrast 25 / confidence 0.3 / color on).
"""

from heimdall_tpu.inspection.base_inspector import Inspector
from heimdall_tpu.core.pipeline import PipelineFactory
from heimdall_tpu.detectors.contamination_detector import ContaminationDetector


class ContaminationInspector(Inspector):
    """Inspector for bottle contamination."""

    def _setup_pipeline(self):
        self.logger.info("Setting up contamination inspection pipeline")
        pipeline_type = self.config.get("pipeline_type", "contamination")
        self.pipeline = PipelineFactory.create_pipeline(
            f"{self.inspector_id}_pipeline",
            pipeline_type,
            self.config.get("pipeline_config", {}))

    def _setup_detectors(self):
        self.logger.info("Setting up contamination defect detectors")
        detector = ContaminationDetector(
            "contamination_detector",
            self.config.get("contamination_detector_config", {
                "min_contaminant_size": 3,
                "max_contaminant_size": 3000,
                "contrast_threshold": 25,
                "min_confidence": 0.3,
                "use_color": True,
            }))
        self.detectors.append(detector)
        self.logger.info("Configured %d detectors", len(self.detectors))
