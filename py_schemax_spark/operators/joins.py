"""Relational extensions Spark lacks as built-ins: as-of joins.

An as-of join attaches, to each left row, the right row with the
largest ``on`` value not exceeding the left's (``backward``; mirror
for ``forward``) within each ``by`` group — the standard time-series
enrichment ("most recent prior purchase/quote/state for this event").

Spark has no ASOF JOIN operator (DuckDB/pandas do), and the naive
range-join formulation (``l.ts >= r.ts`` + window-min over the join
output) explodes to O(|L|·|R|) per key. The implementation here is
the scalable union-and-carry form:

    union(left ⊕ right) → one window per ``by`` group sorted on
    (``on``, side) → ``last(right-struct, ignorenulls)`` carries the
    latest right row forward → keep left rows.

One shuffle (the window partitioning), no pair explosion — cost is a
sort within each ``by`` partition, exactly what a 1000-executor run
wants. Right rows sort BEFORE left rows at equal ``on``, so an exact
tie matches (ASOF ``>=`` semantics, same as DuckDB's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the carried columns of
    the matching ``right`` row (null when the group has no prior /
    following right row, or the match falls outside ``tolerance``).

    ``right_cols``: right columns to carry (default: all but ``on`` /
    ``by``). Carried as one struct so a legitimately-null right value
    is distinguishable from "no match" — ``ignorenulls`` skips only
    genuinely missing rows.

    ``right`` should be unique per (``by``, ``on``); pre-aggregate
    with ``max_by`` otherwise (ties would be nondeterministic).

    ``tolerance``: SQL interval literal body (e.g. ``'30 MINUTES'``)
    for timestamp keys — a match further back (resp. ahead) than this
    is nulled, mirroring ``pandas.merge_asof`` tolerance.

    ``direction``: ``backward`` (match ≤, the default) or ``forward``
    (match ≥) — forward is the same carry run in reverse sort order.

    Null keys (``pandas.merge_asof`` raises on them; we stay total
    over dirty event data instead): a right row with a null ``on`` can
    never be "the most recent prior" — it is dropped up front
    (otherwise Spark's nulls-first ascending sort would carry it into
    every left row with no genuine match). A left row with a null
    ``on`` gets no match. Null ``by`` values form their own group and
    match each other, like any join key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    clash = sorted(set(rcols) & set(left.columns))
    if clash:
        raise ValueError(
            f"right_cols {clash} already exist on the left side — rename "
            "or pre-select to avoid silently clobbering left columns"
        )

    lt = left.withColumn("_side", F.lit(1))
    rt = (
        right.filter(F.col(on).isNotNull())
        .select(by, on, *rcols)
        .withColumn("_side", F.lit(0))
        .withColumn(
            "_r",
            F.struct(F.col(on).alias("_r_on"), *[F.col(c) for c in rcols]),
        )
    )
    u = lt.unionByName(rt.drop(*rcols), allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(on).asc(), F.col("_side").asc()]
    else:
        order = [F.col(on).desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null-on left rows never match (guarded here because the window
    # sort would otherwise hand them a carried row: nulls sort first
    # ascending / last descending)
    carried = F.when(
        F.col(on).isNotNull(), F.last("_r", ignorenulls=True).over(w)
    )

    out = u.withColumn("_m", carried).filter(F.col("_side") == 1)
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            ok = F.col("_m._r_on") >= F.col(on) - bound
        else:
            ok = F.col("_m._r_on") <= F.col(on) + bound
        out = out.withColumn("_m", F.when(ok, F.col("_m")))
    for c in rcols:
        out = out.withColumn(c, F.col("_m").getField(c))
    return out.drop("_side", "_r", "_m")
