"""Custom join operators Spark lacks natively: as-of join, range join.

Named in the north star as the canonical "operator the engine must
add" examples. Both are compositions of existing DataFrame ops chosen
for their shuffle shape — no Python in the row path, no quadratic
blowup:

- **as-of join**: for each left row, the most recent right row with
  ``right.ts <= left.ts`` per key. Implemented as union + keyed window
  (``last(..., ignorenulls)`` over rows-unbounded-preceding): ONE
  shuffle on the key, state linear in rows — the classic
  trades-quotes pattern without a join explosion. A sort-merge
  inequality join would shuffle both sides too but then scan
  per-key cross products; the union trick is strictly better.
- **range join**: ``l.key == r.key AND r.ts ∈ (l.ts, l.ts + window]``.
  Implemented by bucketing time into window-sized cells: the left row
  joins its own and the next bucket (explode of 2 ids), equi-join on
  (key, bucket), exact interval filter after. Candidates per row are
  bounded by 2 buckets — never the full key group. This is the same
  plan Spark's optimizer produces for a range-join hint on Delta, done
  by hand.

Ordering determinism: ties on ts resolve by (side, tiebreaker column)
so results are reproducible across engines — the DuckDB oracles replay
the exact window ordering.
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
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row: attach the latest right row with
    ``right[on] <= left[on]``, matching on ``by``. Inclusive at equal
    timestamps. Left rows with no prior right row keep nulls.

    ``tiebreak``: column (present on both sides) ordering rows within
    an identical timestamp; defaults to ``on`` only.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    # keep the tiebreak column's own type (a long cast would NULL out
    # string ids and collapse fractional values — nondeterministic
    # ties); the left side carries a typed NULL filler for the union
    if tiebreak:
        r_tb = F.col(tiebreak).alias("__tb")
        l_tb = F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb")
    else:
        r_tb = F.lit(0).alias("__tb")
        l_tb = F.lit(0).alias("__tb")
    # a right row with NULL ts can never be "the most recent row at or
    # before" anything — and Spark's NULLS-FIRST ascending ordering
    # would otherwise park it at the partition head where last(...,
    # ignorenulls) hands it to every left row as a bogus match
    r_tagged = right.where(F.col(on).isNotNull()).select(
        F.col(by), F.col(on), F.lit(0).alias("__side"),
        r_tb,
        F.lit(None).cast(left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType).alias("__l"),
        r_payload.alias("__r"),
    )
    # tiebreak orders right rows within an identical timestamp; left
    # rows sort after all right rows at the same ts via __side anyway
    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("__side"),
        l_tb,
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(right.select(r_payload.alias("s")).schema["s"].dataType).alias("__r"),
    )
    u = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = matched.where(F.col("__side") == 1).select(
        F.col("__l.*"),
        *[F.col("__match")[c].alias(c + suffix) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Pairs (l, r) with ``l[by] == r[by]`` and
    ``r[right_ts] ∈ (l[left_ts], l[left_ts] + window_seconds]``.

    Bucketed: candidates come from an equi-join on (by, time-bucket),
    never the whole key group.

    Timestamps convert to fractional epoch seconds as double — exact
    to the microsecond (µs epochs stay under 2^53), so the interval
    filter keeps sub-second precision; a long cast would truncate to
    seconds and both drop and fabricate boundary pairs.
    """
    if window_seconds <= 0:
        # floor(x / 0) is NULL in Spark SQL — every bucket would be
        # NULL and the join would silently return nothing
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")
    l_b = left.select(
        F.col(by).alias("__by"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        lsec.alias("__lsec"),
        F.explode(
            F.array(
                F.floor(lsec / window_seconds),
                F.floor(lsec / window_seconds) + 1,
            )
        ).alias("__bucket"),
    )
    r_b = right.select(
        F.col(by).alias("__by"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
        rsec.alias("__rsec"),
        F.floor(rsec / window_seconds).alias("__bucket"),
    )
    joined = l_b.join(r_b, ["__by", "__bucket"]).where(
        (F.col("__rsec") > F.col("__lsec"))
        & (F.col("__rsec") <= F.col("__lsec") + window_seconds)
    )
    # no distinct needed: r lives in exactly one bucket, so each
    # qualifying (l, r) pair joins exactly once
    lcols = [F.col(f"__l.{c}").alias(c + suffixes[0]) for c in left.columns]
    rcols = [F.col(f"__r.{c}").alias(c + suffixes[1]) for c in right.columns]
    return joined.select(*lcols, *rcols)
