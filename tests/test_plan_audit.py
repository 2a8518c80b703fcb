"""Repo-wide physical-plan audit over EVERY gate query.

Two invariants the 100-TB design depends on, enforced mechanically so a
future edit can't regress them silently:

- no CartesianProduct anywhere (broadcast nested-loop joins of tiny
  query/centroid sides are fine; an unbroadcast cartesian is never fine);
- no row-at-a-time Python UDF (BatchEvalPython) in any plan — Python only
  enters via Arrow (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas).

Plans are built, not executed — except d1d/d1e, whose one-time state setup
(memoized per session) runs a few small jobs before returning a pure,
auditable plan. Every gate query is audited, zero skips.
"""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", [q for q in entry.queries()])
def test_no_cartesian_no_rowwise_python(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
