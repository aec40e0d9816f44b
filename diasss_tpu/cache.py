"""Persistent XLA compilation cache for the CLI / bench entry points.

First compile of the full pipeline costs ~140 s at 3k poses (~550 s at 12k)
through a remote-dispatch tunnel (PERF.md "Known costs") — once per shape,
per process.  JAX's persistent compilation cache makes that once per shape
per MACHINE instead: verified working through the axon remote backend
(second-process compile of the same program ~5x faster; cache files written).

The test suite configures its own cache (tests/conftest.py) so CI behavior
is unchanged; this helper is for the user-facing entry points.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$DIASSS_TPU_CACHE`` or ``~/.cache/diasss_tpu/xla``).  Returns the
    directory used.  Safe to call more than once."""
    import jax

    path = path or os.environ.get(
        "DIASSS_TPU_CACHE", os.path.expanduser("~/.cache/diasss_tpu/xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # pipeline programs all benefit; only skip trivial ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:
        # an unwritable cache location must never break the pipeline —
        # degrade to uncached compiles
        return ""
    return path
