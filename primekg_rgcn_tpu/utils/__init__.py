from primekg_rgcn_tpu.utils.telemetry import (
    MetricsLogger,
    device_memory_stats,
    profile_trace,
    StepTimer,
)

__all__ = ["MetricsLogger", "device_memory_stats", "profile_trace",
           "StepTimer"]
