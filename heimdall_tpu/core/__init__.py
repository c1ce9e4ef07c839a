from heimdall_tpu.core.config import Config
from heimdall_tpu.core.acquisition import ImageSource, ImageSourceFactory
from heimdall_tpu.core.pipeline import Pipeline, PipelineFactory, ProcessingStage
from heimdall_tpu.core.system import System, InspectionStation
