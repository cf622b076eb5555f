"""Inversion engines, config registry, train/test drivers.

The capability-equivalent of the reference's options/ + models/
(BaseModel machinery) + train/test drivers layer.
"""

from physicsbasedfwi2_tpu.engine.config import (
    ExperimentConfig, get_workload, list_workloads, register_workload,
)
from physicsbasedfwi2_tpu.engine.engines import (
    AcousticDIPEngine, ElasticDIPEngine, LatentInversionEngine,
    ClassicFWIEngine, SupervisedEngine, create_engine,
)

__all__ = [
    "ExperimentConfig",
    "get_workload",
    "list_workloads",
    "register_workload",
    "AcousticDIPEngine",
    "ElasticDIPEngine",
    "LatentInversionEngine",
    "ClassicFWIEngine",
    "SupervisedEngine",
    "create_engine",
]
