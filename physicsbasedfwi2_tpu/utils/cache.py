"""Persistent XLA/Mosaic compilation cache for the CLI drivers.

On this target the Pallas kernels compile through a remote Mosaic
compiler at 5-10 minutes per cold kernel; without a persistent cache
every fresh ``fwi-train``/``fwi-test`` process pays that again.  The
reference never had this problem only because PyTorch eager has no
compile step — the TPU-native equivalent of its "just relaunch the
script" workflow (trainVelAutoElMar22ModelPhy.sh reruns with
--continue_train) requires the cache to be on by default.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache and return its path.

    Resolution order: explicit ``path`` arg, ``JAX_COMPILATION_CACHE_DIR``
    (jax reads it natively — we leave it alone), else ``.cache/jax``
    under the current directory (the bench.py convention, so driver
    and bench runs in a checkout share one warm cache).
    """
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    target = path or env or os.path.join(os.getcwd(), ".cache", "jax")
    if not env or path:
        jax.config.update("jax_compilation_cache_dir", target)
    os.makedirs(target, exist_ok=True)
    return target
