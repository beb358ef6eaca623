"""Orchestration entry points (reference: src/tagminder/app/tm_cli.py)."""

from tagminder_spark.app.runner import describe_step, list_steps, run_named_step

__all__ = ["describe_step", "list_steps", "run_named_step"]
