from diffpiso_tpu.utils.io import Scene, read_sim_frame, save_source, write_sim_frame
from diffpiso_tpu.utils.profiling import StepTimer, device_memory_stats, trace
from diffpiso_tpu.utils.checkpoint import CheckpointManager

__all__ = [
    "Scene",
    "read_sim_frame",
    "save_source",
    "write_sim_frame",
    "StepTimer",
    "device_memory_stats",
    "trace",
    "CheckpointManager",
]
