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


def acoustic_pallas(*args, **kw):
    """Differentiable Pallas TPU fast path (lazy import; TPU only).

    ~4x faster than the XLA scan path on a v5e chip: the whole time
    loop runs in VMEM (see ops/pallas_kernels.py, ops/pallas_adjoint.py).
    Same contract as :func:`simulate_acoustic`; gradient w.r.t. vp.
    Requires each shot's receivers to share one grid row.
    """
    from physicsbasedfwi2_tpu.ops.pallas_adjoint import (
        acoustic_pallas as _impl)
    return _impl(*args, **kw)


def select_acoustic(backend: str = "auto"):
    """Pick the propagator implementation: 'pallas' | 'xla' | 'auto'
    (pallas on TPU, xla elsewhere)."""
    import jax
    if backend == "xla":
        return simulate_acoustic
    if backend == "pallas":
        return acoustic_pallas
    return (acoustic_pallas if jax.devices()[0].platform == "tpu"
            else simulate_acoustic)

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
    "acoustic_pallas",
    "select_acoustic",
]
