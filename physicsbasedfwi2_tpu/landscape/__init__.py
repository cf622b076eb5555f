"""Loss-landscape analysis side-car.

Capability-equivalent of the reference's loss_landscape/ package
(Li et al. NIPS'18 adapted to FWI, ~2.5k LoC): filter-normalized
random directions, 2D loss surfaces over the *physics* misfit, MPI
grid parallelism -> `vmap`/`shard_map` sweeps, Hessian eigenvalue
estimation via Hessian-vector products, and trajectory PCA.
"""

from physicsbasedfwi2_tpu.landscape.surface import (
    filter_normalized_direction, perturb_params, loss_surface_2d,
    loss_surface_2d_sharded,
)
from physicsbasedfwi2_tpu.landscape.hessian import (
    hvp, lanczos_extreme_eigs,
)
from physicsbasedfwi2_tpu.landscape.projection import trajectory_pca
from physicsbasedfwi2_tpu.landscape.vtp import surface_to_vtp

__all__ = [
    "filter_normalized_direction",
    "perturb_params",
    "loss_surface_2d",
    "loss_surface_2d_sharded",
    "hvp",
    "lanczos_extreme_eigs",
    "trajectory_pca",
    "surface_to_vtp",
]
