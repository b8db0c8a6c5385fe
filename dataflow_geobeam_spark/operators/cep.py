"""Complex-event-processing (CEP) pattern matching over keyed event
streams — the sequence-detection tier of the north rule's
"structured-streaming / CEP engine".

Four declarative match semantics, all with exact ANSI-SQL equivalents so
the driver gate hash-checks them against DuckDB (no goldens needed):

* ``match_contiguous`` — MATCH_RECOGNIZE's simplest PATTERN (A B C ...)
  over CONSECUTIVE events per key (no gaps), bounded by a time window.
  Compiles to lead() window expressions: ONE shuffle on the key, one
  sort, zero joins — the same plan shape as a session window, so it
  scales exactly as far.
* ``match_funnel`` — "skip-till-next-match": for every anchor event
  (first pattern step), greedily take the EARLIEST later event of each
  subsequent step, bounded by a time window. Overlapping matches are
  allowed (one attempt per anchor), the standard product-analytics
  funnel semantics. Compiles to per-key sorted step arrays + array
  binary pruning (F.filter/F.get) — one groupBy shuffle + one
  co-partitioned join, zero per-row Python.
* ``match_absence`` — the negation pattern (``A NOT B`` within T /
  Flink's notFollowedBy): a value-based RANGE frame counts absent-type
  events in (ts, ts+T] per anchor — one exchange, one sort, no joins;
  the oracle is an independently-formulated correlated NOT EXISTS.
* ``match_kleene`` — iteration (``A B+ C`` over consecutive events):
  the variable-length middle lead() cannot express, compiled
  gaps-and-islands style (last non-B attributes over an UNBOUNDED
  PRECEDING frame) — one exchange, two window passes, no joins.

Both order events by (ts, event_id) — the total order the SQL oracle
uses — and do window arithmetic on raw microsecond timestamps (truncated
epoch seconds only appear in the OUTPUT columns, computed identically by
both engines).

Scale notes (100 TB): contiguous is window-function-shaped — partial
nothing, one exchange on the key, sort, lead; skew on the key falls to
the same salting machinery as any keyed window. Funnel materializes
per-key per-step timestamp arrays: bounded per-key event cardinality is
the standing assumption of per-user funnel analytics (same bound the
session-window state store needs); keys above the bound should be
pre-capped like the dedup hot buckets.

The streaming form (watermark-correct contiguous matching with
late-data buffering) is ``streaming/cep.py:match_contiguous_stream``.

Reference parity: the reference engine (Beam ingestion glue) has no CEP
surface at all; this is north-rule scope (``BASELINE.json: north_star``,
"structured-streaming/CEP engine").
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataflow_geobeam_spark.util import epoch_seconds


def _interval_seconds(n: int) -> Column:
    return F.make_interval(secs=F.lit(int(n)))


def _step_pred(
    name: str, defines: dict[str, Column] | None, type_col: str
) -> Column:
    """Resolve a pattern-step name to a null-safe boolean predicate.

    ``defines`` is the MATCH_RECOGNIZE DEFINE clause: name -> arbitrary
    Column predicate (e.g. ``purchase := event_type = 'purchase' AND
    value >= 5``). Undefined names default to type equality, so plain
    string patterns keep their original meaning. Predicates are wrapped
    in coalesce(, false): a NULL predicate (e.g. ``value > x`` on a NULL
    value) must mean "step does not match", never poison a conjunction.

    Round 5e: ``name`` may be an ALTERNATION ``'a|b|c'`` (the parsed form
    of the pattern token ``(a|b|c)``): each branch resolves independently
    through DEFINE-or-type-equality and the step predicate is their OR.
    """
    if "|" in name and not (defines is not None and name in defines):
        branch = [_step_pred(p, defines, type_col) for p in name.split("|")]
        out = branch[0]
        for b in branch[1:]:
            out = out | b
        return out
    pred = (
        defines[name]
        if defines is not None and name in defines
        else (F.col(type_col) == name)
    )
    return F.coalesce(pred, F.lit(False))


def match_contiguous(
    df: DataFrame,
    pattern: list[str],
    within_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    defines: dict[str, Column] | None = None,
) -> DataFrame:
    """Match ``pattern`` over CONSECUTIVE events per key, with the whole
    run inside ``within_s`` seconds.

    Output: (key, anchor_id, t0_s .. t{k-1}_s, span_s) — one row per
    anchor position whose next k-1 events (in (ts, id) order) carry
    exactly the remaining pattern types and whose last timestamp is
    within the window. Epoch-second columns truncate like DuckDB's
    ``floor(epoch(ts))``; the window bound compares raw timestamps.

    ``defines`` (round 5: the MATCH_RECOGNIZE DEFINE clause) maps a step
    name to an arbitrary per-row predicate; steps not named fall back to
    ``type_col == name``. The step predicates are evaluated BEFORE the
    window pass (projected booleans), so lead() still carries one small
    column per step and the plan stays one exchange + one sort + one
    Window node.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    k = len(pattern)
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    out = df.select(
        key_col,
        ts_col,
        type_col,
        id_col,
        *[
            _step_pred(p, defines, type_col).alias(f"_m{i}")
            for i, p in enumerate(pattern)
        ],
    )
    for i in range(1, k):
        out = out.withColumn(f"_ok{i}", F.lead(f"_m{i}", i).over(w)).withColumn(
            f"_ts{i}", F.lead(ts_col, i).over(w)
        )
    cond = F.col("_m0")
    for i in range(1, k):
        cond = cond & F.col(f"_ok{i}")
    cond = cond & (
        F.col(f"_ts{k - 1}") <= F.col(ts_col) + _interval_seconds(within_s)
    )
    ts_cols = [epoch_seconds(F.col(ts_col)).alias("t0_s")] + [
        epoch_seconds(F.col(f"_ts{i}")).alias(f"t{i}_s") for i in range(1, k)
    ]
    return out.where(cond).select(
        F.col(key_col),
        F.col(id_col).alias("anchor_id"),
        *ts_cols,
        (epoch_seconds(F.col(f"_ts{k - 1}")) - epoch_seconds(F.col(ts_col))).alias(
            "span_s"
        ),
    )


def match_funnel(
    df: DataFrame,
    pattern: list[str],
    within_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    defines: dict[str, Column] | None = None,
) -> DataFrame:
    """Skip-till-next-match funnel: for every ``pattern[0]`` event, take
    the EARLIEST strictly-later ``pattern[1]`` event, then the earliest
    strictly-later ``pattern[2]``, …; keep matches whose final step is
    within ``within_s`` seconds of the anchor.

    Output: (key, anchor_id, t0_s .. t{k-1}_s, span_s). Strictly-later
    means raw-timestamp ``>`` (ties at identical microseconds are not
    taken — the SQL oracle's ``e2.ts > e1.ts`` contract).

    ``defines`` (round 5) as in :func:`match_contiguous`: per-step
    predicates folded into the collect_list filters and the anchor
    filter — plan shape unchanged.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    k = len(pattern)
    steps = pattern[1:]
    arrs = df.groupBy(key_col).agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(_step_pred(p, defines, type_col), F.col(ts_col))
                )
            ).alias(f"_a{i}")
            for i, p in enumerate(steps, start=1)
        ]
    )
    anchors = df.where(_step_pred(pattern[0], defines, type_col)).select(
        key_col, F.col(id_col).alias("anchor_id"), F.col(ts_col).alias("_ts0")
    )
    j = anchors.join(arrs, key_col)
    prev = F.col("_ts0")
    for i in range(1, k):
        # earliest step-i timestamp strictly after the previous pick:
        # the array is sorted, so the first survivor of the filter is the
        # minimum; F.get returns NULL on an empty survivor list (never
        # raises, unlike ANSI element_at)
        j = j.withColumn(f"_ts{i}", F.get(F.filter(F.col(f"_a{i}"), _after(prev)), 0))
        prev = F.col(f"_ts{i}")
    cond = F.col("_ts1").isNotNull()
    for i in range(2, k):
        cond = cond & F.col(f"_ts{i}").isNotNull()
    cond = cond & (
        F.col(f"_ts{k - 1}") <= F.col("_ts0") + _interval_seconds(within_s)
    )
    ts_cols = [epoch_seconds(F.col(f"_ts{i}")).alias(f"t{i}_s") for i in range(k)]
    return j.where(cond).select(
        F.col(key_col),
        "anchor_id",
        *ts_cols,
        (epoch_seconds(F.col(f"_ts{k - 1}")) - epoch_seconds(F.col("_ts0"))).alias(
            "span_s"
        ),
    )


def _after(prev: Column):
    """Filter lambda factory: pyspark infers lambda arity from the
    signature, so the outer column must be bound via a closure, not a
    default arg."""

    def _f(x: Column) -> Column:
        return x > prev

    return _f


def match_absence(
    df: DataFrame,
    first: str,
    absent: str,
    within_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    defines: dict[str, Column] | None = None,
) -> DataFrame:
    """Negation pattern (MATCH_RECOGNIZE's ``A NOT B`` / Flink CEP
    ``notFollowedBy``): one row per ``first``-type event with NO
    ``absent``-type event for the same key in the half-open window
    ``(ts, ts + within_s]`` — abandonment detection (a view never
    followed by a purchase), timeout alerting (a request with no
    response), the canonical absence queries.

    Plan: a value-based RANGE frame over raw microsecond timestamps —
    ``count(absent) OVER (PARTITION BY key ORDER BY unix_micros(ts)
    RANGE BETWEEN 1 FOLLOWING AND within_us FOLLOWING)`` — so
    microsecond ties are excluded by VALUE (strictly-later contract,
    same as match_funnel), never by row position. ONE exchange on the
    key + one sort, zero joins; the oracle is an independent
    formulation (correlated NOT EXISTS).

    Output: (key, anchor_id, t0_s), the anchors where the count is 0.

    ``defines`` (round 5) as in :func:`match_contiguous`: per-step
    predicates replace the two type-equality tests.
    """
    within_us = int(within_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(1, within_us)
    )
    # predicates are evaluated on the FULL input row (a DEFINE may read
    # any column), then only the two booleans ride the window pass
    n_absent = F.count(F.when(F.col("_m_absent"), F.lit(1))).over(w)
    return (
        df.select(
            key_col,
            ts_col,
            type_col,
            id_col,
            _step_pred(first, defines, type_col).alias("_m_first"),
            _step_pred(absent, defines, type_col).alias("_m_absent"),
        )
        .withColumn("_n_absent", n_absent)
        .where(F.col("_m_first") & (F.col("_n_absent") == 0))
        .select(
            F.col(key_col),
            F.col(id_col).alias("anchor_id"),
            epoch_seconds(F.col(ts_col)).alias("t0_s"),
        )
    )


def match_kleene(
    df: DataFrame,
    pattern: tuple[str, str, str],
    within_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    defines: dict[str, Column] | None = None,
) -> DataFrame:
    """Iteration pattern ``A B+ C`` over CONSECUTIVE events per key
    (MATCH_RECOGNIZE ``PATTERN (A B+ C)``): an anchor of type ``a``,
    immediately followed by ONE OR MORE events of type ``b``, then one
    of type ``c``, the whole run inside ``within_s`` seconds. The
    variable-length middle is what lead()-compilation (match_contiguous)
    cannot express — this is the gaps-and-islands compilation instead.

    Plan: row_number per key in (ts, id) order, then ONE window pass
    computing, for every event, the row number / type / ts / id of the
    most recent NON-``b`` event strictly before it
    (``last(when(type != b, ...), ignorenulls) ROWS UNBOUNDED PRECEDING
    .. 1 PRECEDING``). A ``c`` event matches iff that event has type
    ``a`` and sits ``n_b + 1`` rows back with ``n_b >= 1`` — every event
    between them is a ``b`` by construction. Two window passes over one
    exchange on the key, zero joins.

    Output: (key, anchor_id, n_b, t0_s, t_end_s, span_s).

    ``defines`` (round 5) as in :func:`match_contiguous`: per-step
    predicates are projected on the full input row first (``_ma/_mb/
    _mc``), then only booleans flow through the two window passes — a
    "non-b" row is one where the B predicate is false, and the island
    anchor must satisfy the A predicate at its own row.
    """
    a_ty, b_ty, c_ty = pattern
    w_rn = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("_rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_b = ~F.col("_mb")

    def _last(col: str) -> Column:
        return F.last(col, ignorenulls=True).over(w_prev)

    # project the when() inputs FIRST so all four last() expressions share
    # one Window node (interleaved Projects would split them into four)
    pre = (
        df.select(
            key_col,
            ts_col,
            type_col,
            id_col,
            _step_pred(a_ty, defines, type_col).alias("_ma"),
            _step_pred(b_ty, defines, type_col).alias("_mb"),
            _step_pred(c_ty, defines, type_col).alias("_mc"),
        )
        .withColumn("_rn", F.row_number().over(w_rn))
        .select(
            "*",
            F.when(non_b, F.col("_rn")).alias("_c_rn"),
            F.when(non_b, F.col("_ma")).alias("_c_a"),
            F.when(non_b, F.col(ts_col)).alias("_c_ts"),
            F.when(non_b, F.col(id_col)).alias("_c_id"),
        )
    )
    out = pre.select(
        key_col,
        ts_col,
        type_col,
        "_mc",
        "_rn",
        _last("_c_rn").alias("_nc_rn"),
        _last("_c_a").alias("_nc_a"),
        _last("_c_ts").alias("_nc_ts"),
        _last("_c_id").alias("_nc_id"),
    ).withColumn("n_b", (F.col("_rn") - 1 - F.col("_nc_rn")).cast("long"))
    return out.where(
        F.col("_mc")
        & F.col("_nc_a")
        & (F.col("n_b") >= 1)
        & (F.col(ts_col) <= F.col("_nc_ts") + _interval_seconds(within_s))
    ).select(
        F.col(key_col),
        F.col("_nc_id").alias("anchor_id"),
        "n_b",
        epoch_seconds(F.col("_nc_ts")).alias("t0_s"),
        epoch_seconds(F.col(ts_col)).alias("t_end_s"),
        (epoch_seconds(F.col(ts_col)) - epoch_seconds(F.col("_nc_ts"))).alias("span_s"),
    )


def match_bounded(
    df: DataFrame,
    pattern: tuple[str, str, str],
    bounds: tuple[int, int],
    within_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    defines: dict[str, Column] | None = None,
) -> DataFrame:
    """Bounded repetition ``A B{m,n} C`` over CONSECUTIVE events per key
    (round 5e) — MATCH_RECOGNIZE's ``PATTERN (A B{m,n} C)`` with GREEDY
    semantics: per anchor, the longest repetition count in [m, n] that
    matches wins.

    Compilation: ONE lead()-window pass. The three step predicates are
    projected once; ``lead`` pulls the B-predicate at offsets 1..n and
    the C-predicate/timestamp at offsets m+1..n+1 (Spark collapses all
    leads over the same windowspec into a single Window node), and a
    greedy CASE picks the LARGEST matching repetition count per anchor.
    One exchange on the key, one sort, one Window node, zero joins, no
    union — the quantifier's width costs extra lead columns, not extra
    shuffles or passes. Output: (key, anchor_id, n_b, t0_s, t_end_s,
    span_s).

    ``m=0`` (from ``B?`` or ``B{0,n}``) makes the middle step optional:
    the ``A C`` adjacent pair is a valid (shortest) match.
    """
    a, b, c = pattern
    m, n = bounds
    if m < 0 or n < m or n == 0:
        raise ValueError(f"bad bounds {{{m},{n}}}")
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    pre = df.select(
        key_col,
        ts_col,
        id_col,
        _step_pred(a, defines, type_col).alias("_pa"),
        _step_pred(b, defines, type_col).alias("_pb"),
        _step_pred(c, defines, type_col).alias("_pc"),
    )
    for i in range(1, n + 1):
        pre = pre.withColumn(f"_b{i}", F.coalesce(F.lead("_pb", i).over(w), F.lit(False)))
    for k in range(m, n + 1):
        pre = pre.withColumn(
            f"_c{k + 1}", F.coalesce(F.lead("_pc", k + 1).over(w), F.lit(False))
        ).withColumn(f"_ts{k + 1}", F.lead(ts_col, k + 1).over(w))
    # cond_k: anchor matches A, next k rows match B, row k+1 matches C
    # inside the window. Greedy: ascending wrap puts the largest k
    # outermost in the chained CASE, so it is checked first.
    n_b = F.lit(None).cast("long")
    t_end = F.lit(None).cast("timestamp")
    for k in range(m, n + 1):
        cond = F.col("_pa")
        for i in range(1, k + 1):
            cond = cond & F.col(f"_b{i}")
        cond = (
            cond
            & F.col(f"_c{k + 1}")
            & (F.col(f"_ts{k + 1}") <= F.col(ts_col) + _interval_seconds(within_s))
        )
        n_b = F.when(cond, F.lit(k).cast("long")).otherwise(n_b)
        t_end = F.when(cond, F.col(f"_ts{k + 1}")).otherwise(t_end)
    out = pre.withColumn("n_b", n_b).withColumn("_t_end", t_end)
    return out.where(F.col("n_b").isNotNull()).select(
        F.col(key_col),
        F.col(id_col).alias("anchor_id"),
        "n_b",
        epoch_seconds(F.col(ts_col)).alias("t0_s"),
        epoch_seconds(F.col("_t_end")).alias("t_end_s"),
        (epoch_seconds(F.col("_t_end")) - epoch_seconds(F.col(ts_col))).alias(
            "span_s"
        ),
    )


# ---------------------------------------------------------------------------
# Declarative pattern API (round 5): MATCH_RECOGNIZE-lite
# ---------------------------------------------------------------------------

_NAME = r"[A-Za-z_][A-Za-z0-9_]*"
_TOKEN_RE = re.compile(
    rf"^(!)?(\({_NAME}(?:\|{_NAME})+\)|{_NAME})(\+|\?|\{{\d+,\d+\}})?$"
)


@dataclass(frozen=True)
class Step:
    """One parsed pattern step: ``name`` (resolved via DEFINE or type
    equality; ``'a|b'`` for an alternation token ``(a|b)``), ``quant``
    in {'1', '+', '?', '{m,n}'}, ``negated`` for ``!name``."""

    name: str
    quant: str = "1"
    negated: bool = False

    def bounds(self) -> tuple[int, int]:
        """(min, max) repetitions this step's quantifier allows; max=-1
        means unbounded (Kleene plus)."""
        if self.quant == "1":
            return (1, 1)
        if self.quant == "+":
            return (1, -1)
        if self.quant == "?":
            return (0, 1)
        m, n = self.quant[1:-1].split(",")
        return (int(m), int(n))


def parse_pattern(pattern: str) -> list[Step]:
    """Parse a MATCH_RECOGNIZE-lite PATTERN string.

    Grammar: whitespace-separated tokens; each token is ``atom``,
    ``atom+`` (Kleene plus, one-or-more consecutive), ``atom?``
    (optional), ``atom{m,n}`` (bounded repetition), or ``!name``
    (negation / notFollowedBy), where ``atom`` is a ``name`` or an
    alternation ``(name|name|...)``. Examples::

        "view click purchase"          -> strict sequence
        "view click+ purchase"         -> PATTERN (A B+ C)
        "view (click|cart){1,2} buy"   -> alternation + bounded repeat
        "view !purchase"               -> A not followed by B

    Which shapes each match MODE supports is enforced by
    :func:`match_pattern` (this function only tokenizes).
    """
    steps: list[Step] = []
    toks = pattern.split()
    if not toks:
        raise ValueError("empty pattern")
    for tok in toks:
        m = _TOKEN_RE.match(tok)
        if not m:
            raise ValueError(
                f"bad pattern token {tok!r}: expected name, (a|b), and an "
                "optional +/?/{{m,n}} quantifier, or !name"
            )
        neg, name, quant = m.groups()
        if neg and quant:
            raise ValueError(f"token {tok!r}: negation cannot carry a quantifier")
        if name.startswith("("):
            name = name[1:-1]
        if quant and quant.startswith("{"):
            lo, hi = (int(x) for x in quant[1:-1].split(","))
            if hi < lo or hi == 0:
                raise ValueError(f"token {tok!r}: bad bounds {{{lo},{hi}}}")
        steps.append(Step(name, quant or "1", bool(neg)))
    return steps


def match_pattern(
    df: DataFrame,
    pattern: str,
    within_s: int,
    mode: str = "contiguous",
    defines: dict[str, Column] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Compile a declarative pattern spec to one of the four matcher
    plans — the user-facing MATCH_RECOGNIZE-lite entry point unifying
    this module.

    ``pattern`` is parsed by :func:`parse_pattern`; ``defines`` is the
    DEFINE clause (step name -> arbitrary per-row Column predicate;
    unnamed steps default to ``type_col == name``; NULL predicates read
    as non-matches). ``mode``:

    * ``'contiguous'`` — AFTER MATCH SKIP TO NEXT ROW over consecutive
      events. Supported shapes: all-single steps (lead()-compiled,
      :func:`match_contiguous`); ``A B+ C`` with exactly one Kleene
      middle (gaps-and-islands, :func:`match_kleene`); ``A !B``
      (RANGE-frame negation, :func:`match_absence`). If the DEFINEs of
      a Kleene pattern let one row satisfy both B and C, the row
      terminates the match (reluctant B+); with default type-equality
      steps the cases are disjoint. Round 5e: any step may be an
      alternation ``(a|b|c)`` (OR of branch predicates), and the middle
      step of a 3-step pattern may carry ``?`` or ``{m,n}`` (GREEDY
      bounded repetition, expansion-compiled: :func:`match_bounded`).
    * ``'skip'`` — skip-till-next-match funnel semantics
      (:func:`match_funnel`); quantifiers/negation are rejected (the
      funnel's earliest-next-step semantics already skip over
      non-matching rows, so ``+`` adds nothing).

    Everything compiles to pure Catalyst window/aggregate plans — one
    exchange on the key, no joins (one co-partitioned join for 'skip')
    — so the API inherits the scale behavior pinned in
    tests/test_round5*.py and BENCH/PLANS.md.
    """
    steps = parse_pattern(pattern)
    cols = dict(key_col=key_col, ts_col=ts_col, type_col=type_col, id_col=id_col)
    if mode == "skip":
        if any(s.quant == "+" or s.negated for s in steps):
            raise ValueError("mode='skip' supports plain steps only")
        return match_funnel(
            df, [s.name for s in steps], within_s, defines=defines, **cols
        )
    if mode != "contiguous":
        raise ValueError(f"unknown mode {mode!r}: expected 'contiguous' or 'skip'")
    if any(s.negated for s in steps):
        if len(steps) == 2 and not steps[0].negated and steps[0].quant == "1":
            return match_absence(
                df,
                first=steps[0].name,
                absent=steps[1].name,
                within_s=within_s,
                defines=defines,
                **cols,
            )
        raise ValueError(
            "negation is supported as the second step of a 2-step pattern "
            "('A !B'); compose longer shapes from match_* directly"
        )
    quant_at = [i for i, s in enumerate(steps) if s.quant != "1"]
    if not quant_at:
        return match_contiguous(
            df, [s.name for s in steps], within_s, defines=defines, **cols
        )
    if quant_at == [1] and len(steps) == 3:
        mid = steps[1]
        if mid.quant == "+":
            return match_kleene(
                df,
                (steps[0].name, steps[1].name, steps[2].name),
                within_s,
                defines=defines,
                **cols,
            )
        return match_bounded(
            df,
            (steps[0].name, steps[1].name, steps[2].name),
            mid.bounds(),
            within_s,
            defines=defines,
            **cols,
        )
    raise ValueError(
        "quantifiers (+, ?, {m,n}) are supported on the middle step of a "
        "3-step pattern; compose longer shapes from match_* directly"
    )
