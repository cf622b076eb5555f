"""Geometry, grids, wavelets, filters, and unit conventions."""

from physicsbasedfwi2_tpu.geo.grid import Grid2D, cfl_dt, check_cfl
from physicsbasedfwi2_tpu.geo.wavelets import ricker
from physicsbasedfwi2_tpu.geo.acquisition import (
    Acquisition,
    surface_line,
    marmousi_acoustic_acquisition,
    marmousi_elastic_acquisition,
    seam_elastic_acquisition,
)
from physicsbasedfwi2_tpu.geo.filters import (
    butter_lowpass_coeffs,
    lowpass_filter_time,
)
from physicsbasedfwi2_tpu.geo.units import (
    model_from_storage,
    model_to_storage,
)

__all__ = [
    "Grid2D",
    "cfl_dt",
    "check_cfl",
    "ricker",
    "Acquisition",
    "surface_line",
    "marmousi_acoustic_acquisition",
    "marmousi_elastic_acquisition",
    "seam_elastic_acquisition",
    "butter_lowpass_coeffs",
    "lowpass_filter_time",
    "model_from_storage",
    "model_to_storage",
]
