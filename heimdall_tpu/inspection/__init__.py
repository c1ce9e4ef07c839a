from heimdall_tpu.inspection.base_inspector import Inspector, InspectionResult
from heimdall_tpu.inspection.contamination_inspector import (
    ContaminationInspector,
)
