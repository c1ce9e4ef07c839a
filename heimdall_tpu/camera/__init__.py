from heimdall_tpu.camera.hal import (
    Camera,
    CameraError,
    CameraFactory,
    CameraInfo,
    PixelFormat,
    TriggerMode,
)
from heimdall_tpu.camera.gige import (
    Frame,
    FrameSet,
    GigESystem,
    SyncManager,
    SyncMode,
)
