"""Plan-quality assertions: the optimized plans must show pushdown, column
pruning, broadcast joins, and partial aggregation — the 100 TB checklist.

The reference's physical strategies (band-subset reads = column pruning,
nodata-mask = predicate push, SURVEY.md §4) come free from Catalyst when
plans are declarative; these tests pin that they actually materialize.
"""

from __future__ import annotations

from dataflow_geobeam_spark.plans import audio, relational


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 11-column table, 8 needed: scan schema must not include the join keys
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    # partial+final hash aggregate
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_q3_broadcasts_dimension(spark, sf_dir):
    plan = _plan(relational.q3_top_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q6_all_predicates_reach_scan(spark, sf_dir):
    plan = _plan(relational.q6_forecast_revenue(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed, col


def test_decode_pipeline_prunes_bytes_after_decode(spark, sf_dir):
    """The fast decode path must not carry the binary payload past the
    mapInArrow stage (metrics-only shuffle)."""
    df = audio.audio_window_tumbling(spark, sf_dir)
    optimized = _optimized(df)
    # bytes appears in the scan/decode stage but not in any aggregate
    agg_sections = [
        ln for ln in optimized.splitlines() if "Aggregate" in ln or "window" in ln.lower()
    ]
    assert agg_sections
    assert not any("bytes" in ln for ln in agg_sections)


def test_precheck_runs_below_decode(spark, sf_dir):
    """Cheap validity conjuncts must sit between scan and the Python stage,
    so invalid rows never cross into the decode UDF."""
    df = audio.decoded_valid_clips(spark, sf_dir)
    optimized = _optimized(df)
    pos_mapinarrow = optimized.find("MapInArrow")
    assert pos_mapinarrow > 0
    below = optimized[pos_mapinarrow:]
    # the codec whitelist filter is below (after, in tree print order) the decode node
    assert "codec" in below and "IN (wav" in below.replace("'", "")


def test_vad_single_exchange_and_thin_arrow_output(spark, sf_dir):
    """The VAD fast path (round 5d): frame RMS computed inside the decode
    mapInArrow pass, so (1) the full PCM array never crosses Arrow — the
    Python stage's output carries frame_rms_arr, not pcm — and (2) the
    max-window, lag-window, and final aggregate all ride ONE Exchange on
    clip_id."""
    df = audio.audio_vad(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1
    assert plan.count("MapInArrow") == 1
    arrow_line = [ln for ln in plan.splitlines() if "MapInArrow" in ln][0]
    assert "frame_rms_arr" in arrow_line and "pcm" not in arrow_line
