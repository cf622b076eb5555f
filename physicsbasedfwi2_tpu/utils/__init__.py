"""Misc utilities (diagnostics, profiling helpers)."""

from physicsbasedfwi2_tpu.utils.diagnostics import (
    diagnose_params, is_legal, grad_norms,
)

__all__ = ["diagnose_params", "is_legal", "grad_norms"]
