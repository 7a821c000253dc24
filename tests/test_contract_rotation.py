"""Driver-window rotation tests: the registry fronts forced-semantics
queries, then never-green / stalest queries, computed from the
CORRECTNESS_r*.json records rather than a hand-kept list."""

from __future__ import annotations

from ndl_core_data_pipeline_spark import contract


def test_force_front_names_exist():
    reg = contract.build_registry()
    assert set(contract._FORCE_FRONT) <= set(reg.queries)


def test_forced_lead_then_stalest():
    reg = contract.build_registry()
    names = list(reg.queries)
    n_forced = len(contract._FORCE_FRONT)
    assert names[:n_forced] == contract._FORCE_FRONT
    last = contract._last_green_rounds()
    # after the forced block, ordering is non-decreasing in last-green round
    ranks = [last.get(n, 0) for n in names[n_forced:]]
    assert ranks == sorted(ranks)


def test_every_query_has_oracle_or_is_declared():
    reg = contract.build_registry()
    # ordering rewrite must not drop oracle entries
    assert set(reg.oracles) <= set(reg.queries)
    assert len(reg.oracles) == len([n for n in reg.queries if n in reg.oracles])


def test_last_green_parses_driver_records():
    last = contract._last_green_rounds()
    # events queries had no green row in rounds 1-4; anything recorded
    # green maps to a positive round number
    assert all(isinstance(v, int) and v >= 1 for v in last.values())
    assert "q1_pricing_summary" in last
