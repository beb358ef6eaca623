"""Report-layer building blocks: coverage snapshots and the HTML sink."""

from tagminder_spark.reports.html import render_dashboard
from tagminder_spark.reports.snapshots import (
    changelog_fingerprint,
    coverage_snapshot,
    snapshot_if_changed,
)

__all__ = [
    "changelog_fingerprint",
    "coverage_snapshot",
    "render_dashboard",
    "snapshot_if_changed",
]
