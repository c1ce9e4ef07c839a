from heimdall_tpu.models.defect_classifier import (
    DefectClassifier,
    ClassifierTrainer,
    make_sharded_train_step,
    extract_blob_patches,
)
from heimdall_tpu.models.anomaly import AnomalyDetector
from heimdall_tpu.models.segmentation import (DefectSegmenter,
                                              SegmentationDetector)
from heimdall_tpu.models.capture import TrainingDataCapture
from heimdall_tpu.models.quantized import QuantizedSegmenter
