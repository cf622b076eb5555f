"""Data layer: .npy dataset loaders (reference-compatible contracts)
and synthetic workload generation."""

from physicsbasedfwi2_tpu.data.npy_datasets import (
    NpyDictDataset, create_dataset, register_dataset,
)
from physicsbasedfwi2_tpu.data.synthetic import (
    make_layered_model, make_marmousi_like, make_elastic_model,
    SyntheticAcousticWorkload, SyntheticElasticWorkload,
    acoustic_workload_from_disk,
    elastic_workload_from_disk,
)

__all__ = [
    "NpyDictDataset",
    "create_dataset",
    "register_dataset",
    "make_layered_model",
    "make_marmousi_like",
    "make_elastic_model",
    "SyntheticAcousticWorkload",
    "SyntheticElasticWorkload",
    "acoustic_workload_from_disk",
    "elastic_workload_from_disk",
]
