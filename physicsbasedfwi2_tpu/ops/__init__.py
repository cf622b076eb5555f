"""Differentiable wave-physics compute ops (the TPU-native
replacement for the reference's deepwave / DENISE / Devito engines)."""

from physicsbasedfwi2_tpu.ops.acoustic import (
    simulate_acoustic,
    acoustic_gradient,
    AcousticConfig,
)
from physicsbasedfwi2_tpu.ops.elastic import (
    simulate_elastic,
    elastic_gradient,
    ElasticConfig,
)
from physicsbasedfwi2_tpu.ops.misfit import (
    trace_normalize,
    l1_misfit,
    l2_misfit,
    huber_misfit,
    normalized_trace_misfit,
)
from physicsbasedfwi2_tpu.ops.gradproc import (
    depth_weighting,
    water_mask,
    taper_top,
    rescale_to_model,
)
from physicsbasedfwi2_tpu.ops.ssim import ssim

__all__ = [
    "simulate_acoustic",
    "acoustic_gradient",
    "AcousticConfig",
    "simulate_elastic",
    "elastic_gradient",
    "ElasticConfig",
    "trace_normalize",
    "l1_misfit",
    "l2_misfit",
    "huber_misfit",
    "normalized_trace_misfit",
    "depth_weighting",
    "water_mask",
    "taper_top",
    "rescale_to_model",
    "ssim",
]
