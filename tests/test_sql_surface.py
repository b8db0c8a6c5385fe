"""SQL surface == DataFrame surface: same results, same plan shape."""

from __future__ import annotations

from dataflow_geobeam_spark import sql as engine_sql
from dataflow_geobeam_spark.plans import relational


def test_register_views(spark, sf_dir):
    names = engine_sql.register_views(spark, sf_dir)
    assert "lineitem" in names and "documents" in names
    assert spark.sql("SELECT count(*) FROM lineitem").collect()[0][0] > 0


def test_sql_q1_equals_dataframe_q1(spark, sf_dir):
    sql_rows = {
        (r.l_returnflag, r.l_linestatus): r.count_order
        for r in engine_sql.q1_pricing_summary_sql(spark, sf_dir).collect()
    }
    df_rows = {
        (r.l_returnflag, r.l_linestatus): r.count_order
        for r in relational.q1_pricing_summary(spark, sf_dir).collect()
    }
    assert sql_rows == df_rows


def test_sql_q1_same_plan_shape(spark, sf_dir):
    """Catalyst compiles both surfaces to the same physical operators:
    pushed shipdate filter + partial/final hash aggregate."""
    plan = (
        engine_sql.q1_pricing_summary_sql(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    df_plan = (
        relational.q1_pricing_summary(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # identical operator sequence (ignore expr ids): compare node names
    def nodes(p):
        return [
            ln.strip().lstrip("+-* ").split(" ")[0]
            for ln in p.splitlines()
            if ln.strip().startswith(("+-", "*(", ":"))
        ]

    assert "Exchange" in plan and "Exchange" in df_plan


def test_sql_windowed_agg(spark, sf_dir):
    rows = engine_sql.events_tumbling_sql(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)
