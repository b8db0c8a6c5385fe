"""Streaming CEP: watermark-correct pattern matching.

``match_contiguous_stream`` is the streaming form of
``operators/cep.match_contiguous`` (PATTERN (A B C …) over CONSECUTIVE
events per key, bounded by a time window), ``match_absence_stream``
the streaming form of ``operators/cep.match_absence`` (negation /
timeout alerting — the pattern that NEEDS event-time timers, because
the interesting case is exactly the one where no further input arrives
for the key), and ``match_kleene_stream`` the streaming form of
``operators/cep.match_kleene`` (PATTERN (A B+ C) — variable-length
iteration, finalized per TERMINATOR rather than per anchor). All are
built on ``applyInPandasWithState`` with event-time timeouts — the same
stateful machinery as the clip<->transcript join
(``streaming/join.py``).

Correctness under late data: an anchor's match outcome depends only on
events with ``ts <= anchor_ts + within`` (later events cannot sit
between the anchor and its k-1 immediate successors without failing the
window bound, and events later than that bound fail it themselves). The
watermark guarantees no event older than it will be admitted, so an
anchor is FINALIZED — its outcome can never change — exactly when
``watermark > anchor_ts + within``. The per-key state buffers events
until finalized, emits matches for finalized anchors, evicts finalized
events, and schedules an event-time timeout so buffered keys flush when
the watermark advances without new data. Within those rules the emitted
set equals the batch operator run over the delivered (non-late) events —
pinned by ``test_round5.py`` against the oracle-gated batch form.

Input contract: an events stream with ``withWatermark`` already applied
on the timestamp column; at-least-once duplicate delivery is NOT
deduplicated here (put a ``dropDuplicatesWithinWatermark`` upstream if
the source can replay).

Scale: state per key = events inside one ``within`` horizon (the same
bound a session-window state store carries); each micro-batch touches
only keys with new rows or expiring timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def _out_schema(k: int) -> StructType:
    return StructType(
        [StructField("user_id", LongType(), False), StructField("anchor_id", LongType(), False)]
        + [StructField(f"t{i}_s", LongType(), False) for i in range(k)]
        + [StructField("span_s", LongType(), False)]
    )


def _make_fn(pattern: list[str], within_s: int):
    k = len(pattern)
    within_us = within_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 - worker-side import

        if state.exists:
            ts_l, id_l, ty_l = state.get
            buf = list(zip(ts_l, id_l, ty_l))
        else:
            buf = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    buf.append(
                        (
                            int(pd.Timestamp(row.ts).value // 1000),
                            int(row.event_id),
                            str(row.event_type),
                        )
                    )
        buf.sort()
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows = []
        keep_from = 0
        for i, (ts_us, eid, ty) in enumerate(buf):
            if ts_us + within_us >= wm_us:
                break  # not finalized yet; later anchors even less so
            keep_from = i + 1
            if ty != pattern[0] or i + k - 1 >= len(buf):
                continue
            succ = buf[i + 1 : i + k]
            if all(succ[j - 1][2] == pattern[j] for j in range(1, k)) and succ[-1][
                0
            ] <= ts_us + within_us:
                t_secs = [ts_us // 1_000_000] + [s[0] // 1_000_000 for s in succ]
                rows.append(
                    (int(key[0]), eid, *t_secs, t_secs[-1] - t_secs[0])
                )
        buf = buf[keep_from:]
        if buf:
            state.update(
                ([b[0] for b in buf], [b[1] for b in buf], [b[2] for b in buf])
            )
            # wake this key when its oldest anchor can finalize; clamp
            # above the current watermark (Spark rejects timeouts behind it)
            desired_ms = buf[0][0] // 1000 + within_s * 1000 + 1000
            state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1000))
        else:
            state.remove()
        if rows:
            cols = ["user_id", "anchor_id"] + [f"t{i}_s" for i in range(k)] + ["span_s"]
            yield pd.DataFrame(rows, columns=cols)

    return fn


def match_contiguous_stream(
    events: DataFrame,
    pattern: list[str],
    within_s: int,
) -> DataFrame:
    """Streaming contiguous-pattern matcher. ``events`` must be a
    watermarked stream with columns (user_id, event_id, ts, event_type).
    Output rows match the batch operator's schema:
    (user_id, anchor_id, t0_s .. t{k-1}_s, span_s), emitted once each
    anchor finalizes under the watermark."""
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    k = len(pattern)
    state_schema = StructType(
        [
            StructField("ts_us", _long_array(), True),
            StructField("ids", _long_array(), True),
            StructField("types", _str_array(), True),
        ]
    )
    return events.select("user_id", "event_id", "ts", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_fn(list(pattern), within_s),
        outputStructType=_out_schema(k),
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _make_absence_fn(first: str, absent: str, within_s: int):
    within_us = within_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 - worker-side import

        if state.exists:
            ts_l, id_l, ty_l = state.get
            buf = list(zip(ts_l, id_l, ty_l))
        else:
            buf = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    buf.append(
                        (
                            int(pd.Timestamp(row.ts).value // 1000),
                            int(row.event_id),
                            str(row.event_type),
                        )
                    )
        buf.sort()
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows = []
        keep_from = 0
        for i, (ts_us, eid, ty) in enumerate(buf):
            if ts_us + within_us >= wm_us:
                break  # not finalized yet (and neither is any later entry)
            keep_from = i + 1
            if ty != first:
                continue
            # cleared iff ANY absent-type event lands in the half-open
            # VALUE window (ts, ts + within] — scan forward over the
            # sorted, horizon-bounded buffer
            cleared = False
            for ts2, _eid2, ty2 in buf[i + 1 :]:
                if ts2 > ts_us + within_us:
                    break
                if ty2 == absent and ts2 > ts_us:
                    cleared = True
                    break
            if not cleared:
                rows.append((int(key[0]), eid, ts_us // 1_000_000))
        buf = buf[keep_from:]
        if buf:
            state.update(
                ([b[0] for b in buf], [b[1] for b in buf], [b[2] for b in buf])
            )
            desired_ms = buf[0][0] // 1000 + within_s * 1000 + 1000
            state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1000))
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "anchor_id", "t0_s"])

    return fn


def match_absence_stream(
    events: DataFrame,
    first: str,
    absent: str,
    within_s: int,
) -> DataFrame:
    """Streaming negation matcher — the timeout-alert pattern (a request
    with no response within T, a view never followed by a purchase):
    emits (user_id, anchor_id, t0_s) for every ``first``-type event with
    NO ``absent``-type event in the value window (ts, ts+T], exactly
    once, when the watermark finalizes the anchor
    (``watermark > ts + within_s`` — by then no admissible event can
    clear it).

    Same state discipline as ``match_contiguous_stream``: per-key sorted
    buffer bounded by one ``within`` horizon, finalized-prefix eviction
    (an absent-type event that could still clear an unfinalized anchor
    is necessarily unfinalized itself, so eviction never loses a
    clearer), and an event-time timeout so silence — the very thing the
    pattern detects — still flushes the key when the watermark advances.
    Output equals the batch ``operators/cep.match_absence`` over the
    delivered (non-late) events; pinned by tests/test_round5b.py."""
    state_schema = StructType(
        [
            StructField("ts_us", _long_array(), True),
            StructField("ids", _long_array(), True),
            StructField("types", _str_array(), True),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("anchor_id", LongType(), False),
            StructField("t0_s", LongType(), False),
        ]
    )
    return events.select("user_id", "event_id", "ts", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_absence_fn(first, absent, within_s),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _make_kleene_fn(a_ty: str, b_ty: str, c_ty: str, within_s: int):
    within_us = within_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 - worker-side import

        if state.exists:
            ts_l, id_l, ty_l, done_l = state.get
            buf = list(zip(ts_l, id_l, ty_l))
            done_us = int(done_l)
        else:
            buf, done_us = [], -(1 << 62)
        if not state.hasTimedOut:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    buf.append(
                        (
                            int(pd.Timestamp(row.ts).value // 1000),
                            int(row.event_id),
                            str(row.event_type),
                        )
                    )
        buf.sort()
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows = []
        for i, (ts_us, eid, ty) in enumerate(buf):
            if ts_us >= wm_us:
                break  # a later event could still insert before this one
            if ts_us < done_us or ty != c_ty:
                continue
            # nearest non-b predecessor: walk back over the b-run. The
            # buffer is a contiguous time-suffix from the previous cut
            # (prev_wm - within); since ts_c >= done_us = prev_wm, every
            # event a VALID island could contain (anchor >= ts_c - within)
            # is still buffered — hitting the buffer start means the true
            # anchor already failed the time bound.
            j = i - 1
            n_b = 0
            while j >= 0 and buf[j][2] == b_ty:
                n_b += 1
                j -= 1
            if (
                n_b >= 1
                and j >= 0
                and buf[j][2] == a_ty
                and ts_us <= buf[j][0] + within_us
            ):
                t0 = buf[j][0] // 1_000_000
                t_end = ts_us // 1_000_000
                rows.append((int(key[0]), buf[j][1], n_b, t0, t_end, t_end - t0))
        done_us = max(done_us, wm_us)
        # evict only what no FUTURE c (ts >= wm) can reach: its island is
        # time-bounded by within, so anything older than wm - within is
        # out of reach for every not-yet-finalized terminator
        keep_from = 0
        while keep_from < len(buf) and buf[keep_from][0] + within_us < wm_us:
            keep_from += 1
        buf = buf[keep_from:]
        if buf:
            state.update(
                (
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                    done_us,
                )
            )
            # wake when the oldest unemitted candidate can finalize, else
            # when the oldest retained delimiter becomes evictable
            pending = next((b[0] for b in buf if b[0] >= done_us), None)
            if pending is not None:
                desired_ms = pending // 1000 + 1000
            else:
                desired_ms = (buf[0][0] + within_us) // 1000 + 1000
            state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1000))
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["user_id", "anchor_id", "n_b", "t0_s", "t_end_s", "span_s"],
            )

    return fn


def match_kleene_stream(
    events: DataFrame,
    pattern: tuple[str, str, str],
    within_s: int,
) -> DataFrame:
    """Streaming iteration matcher — PATTERN (A B+ C) over consecutive
    events per key, the streaming form of ``operators/cep.match_kleene``.

    Finalization: a terminator (``c``) row's outcome depends ONLY on its
    predecessors (nearest non-``b``, the run between, the time bound), so
    it is final exactly when the watermark passes its own timestamp — no
    admissible event can insert before it anymore. Emission therefore
    advances a per-key high-water mark (``done_us``): each batch emits
    terminators with ``done_us <= ts < watermark`` exactly once.

    Eviction keeps a longer tail than emission: an unfinalized terminator
    (``ts >= watermark``) can reach back ``within`` seconds for its
    island, so only events with ``ts + within < watermark`` are dropped —
    and since matched islands are time-bounded (``ts_c <= anchor +
    within``), a walk-back that runs off the buffer start proves the true
    anchor fails the bound anyway. Event-time timeouts flush buffered
    terminators when the watermark advances without new rows for the key.

    Output equals the batch operator over the delivered (non-late)
    events restricted to finalized terminators; pinned by
    tests/test_cep_api.py.
    """
    a_ty, b_ty, c_ty = pattern
    state_schema = StructType(
        [
            StructField("ts_us", _long_array(), True),
            StructField("ids", _long_array(), True),
            StructField("types", _str_array(), True),
            StructField("done_us", LongType(), True),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("anchor_id", LongType(), False),
            StructField("n_b", LongType(), False),
            StructField("t0_s", LongType(), False),
            StructField("t_end_s", LongType(), False),
            StructField("span_s", LongType(), False),
        ]
    )
    return events.select("user_id", "event_id", "ts", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_kleene_fn(a_ty, b_ty, c_ty, within_s),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _match_set(name: str) -> frozenset:
    """Labels/types that satisfy a pattern step: the step's own name (the
    dispatcher's label projection emits full names, alternations
    included) plus each alternation branch (raw event types when no
    projection ran)."""
    return frozenset([name]) | frozenset(name.split("|"))


def _make_bounded_fn(a: str, b: str, c: str, m: int, n: int, within_s: int):
    within_us = within_s * 1_000_000
    a_set, b_set, c_set = _match_set(a), _match_set(b), _match_set(c)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 - worker-side import

        if state.exists:
            ts_l, id_l, ty_l = state.get
            buf = list(zip(ts_l, id_l, ty_l))
        else:
            buf = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    buf.append(
                        (
                            int(pd.Timestamp(row.ts).value // 1000),
                            int(row.event_id),
                            str(row.event_type),
                        )
                    )
        buf.sort()
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows = []
        keep_from = 0
        for i, (ts_us, eid, ty) in enumerate(buf):
            if ts_us + within_us >= wm_us:
                break  # anchor not finalized; later anchors even less so
            keep_from = i + 1
            if ty not in a_set:
                continue
            for k in range(n, m - 1, -1):  # GREEDY: largest width first
                j = i + k + 1
                if j >= len(buf):
                    continue
                if buf[j][0] > ts_us + within_us or buf[j][2] not in c_set:
                    continue
                if all(buf[i + x][2] in b_set for x in range(1, k + 1)):
                    t0, te = ts_us // 1_000_000, buf[j][0] // 1_000_000
                    rows.append((int(key[0]), eid, k, t0, te, te - t0))
                    break
        buf = buf[keep_from:]
        if buf:
            state.update(
                ([x[0] for x in buf], [x[1] for x in buf], [x[2] for x in buf])
            )
            desired_ms = buf[0][0] // 1000 + within_s * 1000 + 1000
            state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1000))
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["user_id", "anchor_id", "n_b", "t0_s", "t_end_s", "span_s"],
            )

    return fn


def match_bounded_stream(
    events: DataFrame,
    pattern: tuple[str, str, str],
    bounds: tuple[int, int],
    within_s: int,
) -> DataFrame:
    """Streaming bounded-repetition matcher — PATTERN (A B{m,n} C) with
    GREEDY semantics over consecutive events per key, the streaming form
    of ``operators/cep.match_bounded`` (round 5e).

    Finalization is ANCHOR-based, like the contiguous matcher: an
    anchor's verdict depends only on events within ``within_s`` after it
    (every candidate width requires its C row inside the window, and
    rows beyond the window cannot flip any narrower width), so the
    anchor is final once the watermark passes ``anchor_ts + within``.
    Alternation step names (``'x|y'``) match either raw branch types or
    the dispatcher's projected labels. Output equals the batch operator
    over the delivered events restricted to finalized anchors; pinned by
    tests/test_cep_api.py::test_match_bounded_stream_equals_batch.
    """
    a_ty, b_ty, c_ty = pattern
    m, n = bounds
    if m < 0 or n < m or n == 0:
        raise ValueError(f"bad bounds {{{m},{n}}}")
    state_schema = StructType(
        [
            StructField("ts_us", _long_array(), True),
            StructField("ids", _long_array(), True),
            StructField("types", _str_array(), True),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("anchor_id", LongType(), False),
            StructField("n_b", LongType(), False),
            StructField("t0_s", LongType(), False),
            StructField("t_end_s", LongType(), False),
            StructField("span_s", LongType(), False),
        ]
    )
    return events.select("user_id", "event_id", "ts", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_bounded_fn(a_ty, b_ty, c_ty, m, n, within_s),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _long_array():
    from pyspark.sql.types import ArrayType

    return ArrayType(LongType())


def _str_array():
    from pyspark.sql.types import ArrayType, StringType

    return ArrayType(StringType())


def match_pattern_stream(
    events: DataFrame,
    pattern: str,
    within_s: int,
    defines: dict | None = None,
) -> DataFrame:
    """Declarative entry point for the STREAMING matchers — the
    streaming counterpart of ``operators/cep.match_pattern``. Parses the
    same PATTERN grammar (``"a b c"``, ``"a b+ c"``, ``"a !b"``) and
    dispatches to :func:`match_contiguous_stream`,
    :func:`match_kleene_stream`, or :func:`match_absence_stream`.

    ``defines`` (MATCH_RECOGNIZE DEFINE, round 5: batch/streaming parity
    for the dispatcher) maps a step name to an arbitrary per-row Column
    predicate over the INCOMING stream's columns, replacing the default
    ``event_type == name`` test exactly as in the batch entry point. The
    streaming matchers buffer one LABEL per event in typed state, so the
    predicates are compiled upstream into a pure-Catalyst label
    projection BEFORE the stateful stage: each row is labeled with the
    first pattern step (in pattern order) whose predicate it satisfies;
    a row satisfying no step keeps a non-step label (``"¬" + type``) so
    it still occupies its position — breaking contiguity, terminating
    Kleene runs, and never clearing an absence — just as a
    no-step-matching row does in the batch plans. Single-labeling is
    exact when the step predicates are pairwise DISJOINT per row (the
    MATCH_RECOGNIZE norm and the only case with one well-defined
    answer); a row satisfying two DEFINEs takes the earlier step, where
    the batch Kleene form would let it satisfy both (reluctant-B+
    termination). Equality with the batch operator under disjoint
    DEFINEs is pinned by
    tests/test_cep_api.py::test_match_pattern_stream_defines_equals_batch.
    ``events`` must already carry ``withWatermark`` on ``ts``.
    """
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators.cep import _step_pred, parse_pattern

    steps = parse_pattern(pattern)
    if defines:
        unknown = set(defines) - {s.name for s in steps}
        if unknown:
            raise ValueError(f"DEFINE for step(s) not in pattern: {sorted(unknown)}")
    if defines or any("|" in s.name for s in steps):
        # label projection: alternation steps (round 5e) resolve through
        # the same _step_pred as the batch compiler, so an alternation
        # row is labeled with the full step name ('click|error')
        lbl = F.concat(F.lit("¬"), F.col("event_type"))
        for s in reversed(steps):
            pred = _step_pred(s.name, defines, "event_type")
            lbl = F.when(pred, F.lit(s.name)).otherwise(lbl)
        events = events.select(
            "user_id", "event_id", "ts", lbl.alias("event_type")
        )
    if any(s.negated for s in steps):
        if len(steps) == 2 and not steps[0].negated and steps[0].quant == "1":
            return match_absence_stream(
                events, first=steps[0].name, absent=steps[1].name, within_s=within_s
            )
        raise ValueError(
            "negation is supported as the second step of a 2-step pattern "
            "('A !B'); compose longer shapes from match_*_stream directly"
        )
    quant_at = [i for i, s in enumerate(steps) if s.quant != "1"]
    if not quant_at:
        return match_contiguous_stream(events, [s.name for s in steps], within_s)
    if quant_at == [1] and len(steps) == 3:
        names = (steps[0].name, steps[1].name, steps[2].name)
        if steps[1].quant == "+":
            return match_kleene_stream(events, names, within_s)
        return match_bounded_stream(events, names, steps[1].bounds(), within_s)
    raise ValueError(
        "quantifiers (+, ?, {m,n}) are supported on the middle step of a "
        "3-step pattern; compose longer shapes from match_*_stream directly"
    )
