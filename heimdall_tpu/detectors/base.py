"""Defect model and detector base class.

API-compatible with the reference (heimdall/detectors/base.py:7-84):
``Defect`` typed record with to_dict flattening metadata, ``DefectDetector``
with an abstract detect() and a callable protocol.  TPU-native addition:
``detect_batch`` on the base class so detectors can process [N, H, W, C]
batches in one device program (the default falls back to a Python loop for
detectors that are host-only).
"""

import logging
from typing import Any, Dict, List, Tuple

import numpy as np


class Defect:
    """A detected defect (type, position, size, confidence, metadata)."""

    def __init__(self, defect_type: str, position: Tuple[int, int],
                 size: float, confidence: float,
                 metadata: Dict[str, Any] = None):
        self.defect_type = defect_type
        self.position = position
        self.size = size
        self.confidence = confidence
        self.metadata = metadata or {}

    def __str__(self) -> str:
        return (f"Defect({self.defect_type}, pos={self.position}, "
                f"size={self.size:.1f}, conf={self.confidence:.2f})")

    __repr__ = __str__

    def to_dict(self) -> Dict[str, Any]:
        return {
            "type": self.defect_type,
            "position": self.position,
            "size": self.size,
            "confidence": self.confidence,
            **self.metadata,
        }


class DefectDetector:
    """Base class for defect detectors."""

    def __init__(self, name: str, config: Dict[str, Any] = None):
        self.name = name
        self.config = config or {}
        self.logger = logging.getLogger(f"heimdall.detector.{name}")

    def detect(self, image: np.ndarray,
               context: Dict[str, Any] = None) -> List[Defect]:
        raise NotImplementedError("Subclasses must implement this method")

    def detect_batch(self, images: np.ndarray,
                     context: Dict[str, Any] = None) -> List[List[Defect]]:
        """Batched detection over [N, H, W, C]; override for device paths."""
        return [self.detect(img, context) for img in images]

    def __call__(self, image: np.ndarray,
                 context: Dict[str, Any] = None) -> List[Defect]:
        if context is None:
            context = {}
        result = self.detect(image, context)
        self.logger.debug("Detector %s found %d defects",
                          self.name, len(result))
        return result
