from heimdall_tpu.lighting.controller import (
    LightingController,
    LightingControllerFactory,
    LightingType,
    LightingSyncMode,
    ChannelState,
    SimulatedLightingController,
    SerialLightingController,
    EthernetLightingController,
)
from heimdall_tpu.lighting.sync import LightingSynchronizer, SyncEvent
from heimdall_tpu.lighting.calibration import (
    AutoIntensityAdjuster,
    AdvancedAutoIntensityAdjuster,
    IntensityAlgorithm,
    PIDController,
    UniformityCalibrator,
)
from heimdall_tpu.lighting.monitoring import LightingMonitor, AlertManager
