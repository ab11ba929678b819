"""Shared utilities: fixed-shape masked packing/placement."""

from .packing import compact_rows, pack_rows, place_rows  # noqa: F401
