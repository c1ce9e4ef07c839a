from heimdall_tpu.serving.dashboard import DashboardServer
from heimdall_tpu.serving.web_viewer import ResultsViewer
