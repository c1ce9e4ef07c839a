from heimdall_tpu.runtime.feeder import FrameRing, NativeCameraFeeder, DeviceFeeder
from heimdall_tpu.runtime.recovery import (
    ErrorCategory,
    RecoveryAction,
    RecoveryStrategy,
    HeimdallError,
    with_recovery,
)
from heimdall_tpu.runtime.diagnostics import DiagnosticReport, run_diagnostics
