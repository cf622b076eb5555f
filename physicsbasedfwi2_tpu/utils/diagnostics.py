"""Gradient/parameter diagnostics.

Capability-equivalents of the reference's NaN debugging aids:
``util/util.py:61 diagnose_network`` (mean |grad| per net) and the
L-BFGS line search's ``is_legal`` NaN/Inf guard
(functions/LBFGS.py:9-18).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_legal(tree) -> bool:
    """True iff every leaf is finite (the L-BFGS guard)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(jnp.isfinite(l).all()) for l in leaves)


def grad_norms(grads) -> dict:
    """Per-leaf L2 norms keyed by path (diagnose_network role)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                       for p in path)
        out[key] = float(jnp.linalg.norm(leaf.astype(jnp.float32)))
    return out


def diagnose_params(tree, name: str = "net") -> str:
    """Mean |value| + finiteness summary (printable)."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    count = sum(l.size for l in leaves)
    finite = is_legal(tree)
    return (f"[{name}] mean|x|={total / max(count, 1):.3e} "
            f"params={count} finite={finite}")
