"""Registry invariants: the driver records only the first 50 registered
queries, so these checks pin the window composition against accidental
edits (a gate silently falling out of the window loses its driver
evidence without any test failing)."""

from __future__ import annotations

from tagminder_spark.queries import GATE_WINDOW, merged
from tagminder_spark.queries.suites import SUITES


def test_window_is_exactly_the_first_fifty():
    qs, _ = merged()
    names = list(qs)
    assert len(GATE_WINDOW) == 50
    assert names[:50] == list(GATE_WINDOW)


def test_window_gates_have_oracles_except_rows_only():
    _, oracles = merged()
    rows_only = {"pl_step21_titlecase", "pl_chain_e2e"}
    missing = [n for n in GATE_WINDOW if n not in oracles and n not in rows_only]
    assert not missing, f"window gates without oracles: {missing}"


def test_suite_parts_are_registered_with_oracles():
    qs, oracles = merged()
    for suite, parts in SUITES.items():
        assert suite in qs and suite in oracles
        for part in parts:
            assert part in qs, f"{suite} part {part} not registered"
            assert part in oracles, f"{suite} part {part} has no oracle"


def test_every_pipeline_step_gate_in_window():
    step_gates = [n for n in merged()[0] if n.startswith("pl_step")]
    missing = [n for n in step_gates if n not in GATE_WINDOW]
    assert not missing, f"step gates outside the recorded window: {missing}"
