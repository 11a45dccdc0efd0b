"""As-of join — for each left row, the most recent right row at-or-before
its timestamp, per key. The reference's prior-day score lookup
(epss/client.py:462-470) is the degenerate daily-grid case of this.

Spark has no native ASOF JOIN; the scalable formulation is the union-sort
trick: tag both sides, union on (key, time), and carry the right side's
latest values forward with last_value(ignoreNulls) over a single window.
One shuffle on `key`, no range-explosion, no per-row probes — this is the
shape that survives 100 TB (contrast: a naive theta join t_left >= t_right
is O(n*m) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str | None = None,
    right_values: list[str] | None = None,
    suffix: str = "_right",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with right_time <= left_time per key.

    Right-side duplicates at the same (key, time) are resolved by taking the
    last after an ascending sort of the remaining columns — deterministic.

    `tolerance` (pandas merge_asof parity): maximum allowed staleness of
    the matched right row — left rows whose nearest prior right row is
    older than `left_time - tolerance` get NULLs instead. Microseconds
    for timestamp columns, the column's own units otherwise. Costs
    nothing structural: the matched right row is by construction the
    NEAREST prior one, so tolerance is a post-fill null-out on the same
    single window — no extra shuffle, and any older row is further away,
    so there is never a fallback match to search for."""
    right_time = right_time or left_time
    right_values = right_values or [c for c in right.columns if c not in (key, right_time)]

    # The right-side values travel as ONE packed struct, and the forward
    # fill is a single last(ignorenulls) over that struct — so every output
    # row's values come from the SAME right row. (A per-column fill would
    # look past a NULL field to an OLDER right row for that column only,
    # stitching together values that never co-occurred.)
    from pyspark.sql.types import MapType

    # with tolerance the matched right row's own time rides in the fill
    # struct (packed only in that mode, so tolerance-free plans — and
    # their pinned shapes — are byte-identical to before)
    r_fields = [F.col(c).alias(c) for c in right_values]
    if tolerance is not None:
        r_fields.append(F.col(right_time).alias("__rt"))
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*r_fields).alias("__r"),
    )
    r_type = r_tag.schema["__r"].dataType
    l_tag = (
        left.withColumn("__is_left", F.lit(1))
        .withColumn("__t", F.col(left_time))
        .withColumn("__r", F.lit(None).cast(r_type))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Right rows sort before left rows at equal time (__is_left asc) so an
    # exactly-simultaneous right row is visible to the left row (>= semantics).
    # The value fields complete the order: with multiple right rows at the
    # same (key, time), the forward-fill takes the last row of the ascending
    # value sort (i.e. the field-wise maximum row), the same on every run
    # and partitioning — without them the pick would be partition order,
    # i.e. nondeterministic. Map-typed fields are unorderable in Spark and
    # are skipped in the ORDER (ties then resolve on the orderable fields)
    # but still ride in the fill struct, so they are returned consistently.
    tiebreaks = [
        F.col("__r").getField(f.name).asc()
        for f in r_type.fields
        if not isinstance(f.dataType, MapType)
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__r", F.last(F.col("__r"), ignorenulls=True).over(w))
    if tolerance is not None:
        lt, rt = F.col("__t"), F.col("__r").getField("__rt")
        is_ts = dict(left.dtypes).get(left_time, "").startswith("timestamp")
        gap = (
            F.unix_micros(lt) - F.unix_micros(rt) if is_ts else lt - rt
        )
        filled = filled.withColumn(
            "__r", F.when(gap <= F.lit(int(tolerance)), F.col("__r"))
        )
    out = filled.filter(F.col("__is_left") == 1).drop("__is_left", "__t")
    for c in right_values:
        out = out.withColumn(f"{c}{suffix}" if c in left.columns else c, F.col("__r").getField(c))
    return out.drop("__r")
