"""Unit conventions at the data boundary.

The reference stores elastic models divided by 100 ("hectometre"
units, data/unalignedVelABCDEl_dataset.py:84-87) and multiplies by 10
with a flipud before handing them to DENISE
(networks.py:7564-7593).  We absorb both quirks into one documented,
invertible transform so stored datasets from the reference remain
loadable while everything inside the framework is SI (m/s, kg/m^3)
with row 0 = surface.
"""

from __future__ import annotations

import jax.numpy as jnp

STORAGE_SCALE = 100.0


def model_from_storage(m, *, scale: float = STORAGE_SCALE, flip: bool = False):
    """Storage units -> SI. ``flip`` undoes a bottom-up row order."""
    m = jnp.asarray(m) * scale
    if flip:
        m = m[..., ::-1, :]
    return m


def model_to_storage(m, *, scale: float = STORAGE_SCALE, flip: bool = False):
    """SI -> storage units (inverse of :func:`model_from_storage`)."""
    m = jnp.asarray(m) / scale
    if flip:
        m = m[..., ::-1, :]
    return m
