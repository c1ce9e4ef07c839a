from heimdall_tpu.perf.metrics import (
    SlidingWindow,
    MetricCounter,
    Timer,
    ThroughputMeter,
    MetricsRegistry,
)
from heimdall_tpu.perf.profiling import (
    Measurement,
    MetricType,
    ProfilingSession,
    ProfilingManager,
    measure_time,
    measure_throughput,
)
from heimdall_tpu.perf.reports import Report, ReportFormat
