from .child_process import ChildProcess
from .cluster import ClusterSubmission, MPISettings, kill_job, queue_status, watch
from .multihost import MultiHostLauncher, ThisProcess
from .result import Result

__all__ = [
    "ChildProcess",
    "ClusterSubmission",
    "MPISettings",
    "MultiHostLauncher",
    "Result",
    "ThisProcess",
    "kill_job",
    "queue_status",
    "watch",
]
