"""Row-padding helpers shared by every capacity/mesh-alignment site.

Static-shape XLA programs force capacity+mask designs everywhere the
reference used growing ``std::vector``s (SURVEY §7 "hard parts"); these are
the one implementation of the append-fill-rows idiom (advisor r3: five
near-identical private copies had grown across matching/, parallel/, online).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_rows(a: jnp.ndarray, n_rows: int, fill=0) -> jnp.ndarray:
    """Pad axis 0 of ``a`` with ``fill`` up to ``n_rows`` (no-op if already
    at least that long).  Bool arrays pad with ``False`` under the default
    fill — the usual validity-mask convention."""
    pad = n_rows - a.shape[0]
    if pad <= 0:
        return a
    return jnp.concatenate([a, jnp.full((pad, *a.shape[1:]), fill, a.dtype)])


def pad_rows_tree(tree, n_rows: int, fill=0):
    """``pad_rows`` over every leaf of a pytree."""
    return jax.tree_util.tree_map(lambda a: pad_rows(a, n_rows, fill), tree)


def pad_to_multiple(a: jnp.ndarray, m: int, fill=0) -> jnp.ndarray:
    """Pad axis 0 up to the next multiple of ``m`` (mesh-alignment idiom)."""
    return pad_rows(a, a.shape[0] + ((-a.shape[0]) % m), fill)
