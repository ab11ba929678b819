"""Fixed-shape masked row packing and placement.

The recurring idiom behind the framework's fixed-capacity particle lifecycle
(SURVEY.md §7 hard part 2): compress masked rows to the front of a bounded
buffer (``pack_rows``), claim free slots for incoming rows (``place_rows``),
or build a compaction index (``compact_rows``) — all jit-friendly, all with
explicit overflow accounting instead of silent truncation.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_rows(mask):
    """Rank of each True row among the True rows: cumsum(mask) - 1."""
    return jnp.cumsum(mask.astype(jnp.int32)) - 1


def pack_rows(mask, fields, cap: int):
    """Scatter the masked rows of each field into the first ``cap`` slots of
    a zeroed buffer (order preserved).

    Args:
        mask: (n,) bool selection.
        fields: sequence of (n, ...) arrays.
        cap: buffer capacity.

    Returns:
        (buffers, n_valid, n_overflow): list of (cap, ...) buffers, the number
        of packed rows (<= cap), and the count of selected rows that did not
        fit.
    """
    rank = compact_rows(mask)
    slot = jnp.where(mask & (rank < cap), rank, cap)
    buffers = []
    for f in fields:
        buf_shape = (cap + 1,) + f.shape[1:]
        zero = jnp.zeros(buf_shape, f.dtype)
        src = jnp.where(
            mask.reshape((-1,) + (1,) * (f.ndim - 1)), f, 0
        )
        buffers.append(zero.at[slot].set(src, mode="drop")[:cap])
    total = jnp.sum(mask.astype(jnp.int32))
    n_valid = jnp.minimum(total, cap)
    return buffers, n_valid, total - n_valid


def place_rows(free_mask, new_fields, count, old_fields, valid=None):
    """Place the first ``count`` rows of ``new_fields`` into the free slots.

    The i-th free slot receives the i-th *valid* new row (rows are compacted
    by ``valid`` first when given, so invalid rows are never injected).

    Args:
        free_mask: (n,) bool — slots available for writing.
        new_fields: sequence of (k, ...) row sources.
        count: number of rows to place (clamped to both k and the free-slot
            count by construction).
        old_fields: sequence of (n, ...) arrays to update (same order).
        valid: optional (k,) bool marking usable rows of new_fields.

    Returns:
        (updated_fields, taken_mask, n_placed).
    """
    k = new_fields[0].shape[0]
    if valid is not None:
        new_fields, n_valid, _ = pack_rows(valid, new_fields, k)
        count = jnp.minimum(count, n_valid)
    rank = compact_rows(free_mask)
    take = free_mask & (rank < count)
    idx = jnp.clip(rank, 0, k - 1)
    updated = []
    for new, old in zip(new_fields, old_fields):
        gathered = jnp.take(new, idx, axis=0)
        cond = take.reshape((-1,) + (1,) * (old.ndim - 1))
        updated.append(jnp.where(cond, gathered.astype(old.dtype), old))
    n_placed = jnp.sum(take.astype(jnp.int32))
    return updated, take, n_placed
