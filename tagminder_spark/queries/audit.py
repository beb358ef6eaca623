"""Placeholder registry — populated in this round."""

from __future__ import annotations

from tagminder_spark.queries import QueryFn

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}
