"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark_fn, oracle_sql) pair over the driver's testdata tables.

Each submodule registers into its own ``REGISTRY``; ``all_queries()`` /
``all_oracles()`` merge them for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from tagminder_spark.queries import (  # noqa: PLC0415
        audit,
        dedup,
        pipelinesteps,
        pipelinesteps_ext,
        pipelinesteps_grp,
        pipelinesteps_lookup,
        pipelinesteps_works,
        relational,
        relational_ext,
        reports,
        reports_insights,
        scalarfns,
        scale_q,
        simsearch,
        sources_q,
        textops,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        relational_ext,
        scalarfns,
        dedup,
        textops,
        simsearch,
        audit,
        pipelinesteps,
        pipelinesteps_ext,
        pipelinesteps_grp,
        pipelinesteps_lookup,
        pipelinesteps_works,
        reports,
        reports_insights,
        scale_q,
        sources_q,
    ):
        for name, (fn, sql) in mod.REGISTRY.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
            if sql is not None:
                oracles[name] = sql
    return queries, oracles
