"""Shared DuckDB-oracle SQL fragments.

A LEAF module (imports nothing from this package) so every query module
can use the canonical normalization/tokenization fragments without
creating import cycles. The circular-import failure mode this prevents:
``analytics_queries`` needing a fragment from ``extra_queries`` while
``extra_queries`` imports ``analytics_queries``' registries at its
bottom — whichever imported first would snapshot the other's dicts
half-filled and silently drop every query registered after the cycle
point (regression-tested in tests/test_registry.py)."""

from __future__ import annotations

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"
