"""Distributed global ranking — the `Exchange SinglePartition` eliminator.

An unpartitioned window (``Window.orderBy(...)`` with no ``partitionBy``)
plans an ``Exchange SinglePartition``: the entire input is shipped to ONE
task, which is fine for a 365-row daily series and fatal for a 1.5B-row
customer table at 100 TB. These helpers compute the same *exact* results
as the global window with a fully distributed two-pass plan:

1. ``repartitionByRange`` on the (total) ordering — ascending key ranges
   land on ascending partition ids — then ``sortWithinPartitions``, so
   the global order is exactly (partition id, position within partition).
2. A per-partition local index. For :func:`global_row_number` this is
   pure JVM since round 11: ``monotonically_increasing_id()`` IS
   ``partition_id · 2³³ + row_offset`` by its documented contract, so
   one codegen'd expression yields both the partition id (``id >> 33``)
   and the 1-based local index (``(id & (2³³−1)) + 1``) with ZERO
   Python-boundary cost (guide §4: the old ``mapInPandas`` spelling
   paid a full Arrow transpose of the table in each direction just to
   add a counter). The running-SUM/MAX helpers still use
   ``mapInPandas``: a per-row prefix needs partition-local running
   state, and the JVM window spelling (``PARTITION BY pid``) would add
   a second full shuffle of the data — the Arrow pass is the cheaper
   boundary there.
3. A bounded aggregate of per-partition row counts (one row per
   partition — hundreds, not billions) turned into cumulative offsets;
   the only single-partition window in the plan runs over THAT, and the
   offsets broadcast back onto the data.

``global row_number = offset(partition) + local index`` — exact, and
deterministic whenever the ordering is total (every caller breaks ties
down to a unique key). The range-sampled partition boundaries only decide
which partition a row lands in, never its final rank. The ranked input is
``localCheckpoint``-ed between the two passes so both read the SAME
partition assignment (at cluster scale: persist/checkpoint — the standard
multi-pass discipline, same as the LSH edge set in ml/dedup.py).

``ntile(k)`` is derived from the global row number in closed form
(matching Spark/ANSI semantics: with n rows, q = n div k, r = n mod k,
the first r buckets get q+1 rows), so quantile binning over a 100 TB fact
table needs no single-partition exchange either.

Caller contract: ``repartitionByRange`` runs a boundary-sampling job that
RECOMPUTES the input once before the shuffle pass (same cost profile as
``orderBy``). Rank correctness is boundary-independent — any monotone
boundary set yields the same final ranks — but (a) an expensive upstream
(multi-join aggregate) is worth ``localCheckpoint``-ing first to avoid
the double compute (see q_rfm_segmentation), and (b) the ordering keys
themselves must be recompute-deterministic: integers, or doubles whose
derivation survives re-execution bit-for-bit at the key's granularity
(e.g. the Pareto micros, where float noise is ≪ the rounding step).

Retention: each helper ``localCheckpoint``-s its ranged intermediate and
holds no reference after returning — the blocks are freed by Spark's
ContextCleaner once the returned DataFrame (and its lineage) is garbage
collected, not at action completion. Callers that invoke a helper many
times in one long-lived session (benchmark loops, repeated evaluations)
pay that transient storage; it is bounded by the helper input's size and
self-cleans, so no explicit unpersist hook is exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

_PID = "_gr_pid"
_LRN = "_gr_lrn"
_CNT = "_gr_cnt"  # per-partition ROW COUNTS (global_row_number)
_TOT = "_gr_tot"  # per-partition value SUMS (global_running_sum)
_OFF = "_gr_off"


def global_row_number(df: DataFrame, order: list, name: str = "rn") -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY *order)`` without a
    single-partition exchange.

    ``order`` must define a TOTAL order (break ties to a unique key) —
    the same requirement the repo's hash-matched oracles already impose
    on every global ranking query. Returns ``df``'s columns plus
    ``name`` (long, 1-based).

    The (pid, local index) pair is decoded from
    ``monotonically_increasing_id()`` — its documented layout is
    ``partitionId << 33 | rowOffsetWithinPartition``, and the offset is
    assigned in physical row order, which after ``sortWithinPartitions``
    IS the total order within the partition. The id is evaluated once
    (the ``localCheckpoint`` materializes it), so its
    per-recomputation nondeterminism can never be observed — the same
    pinning the old Arrow spelling needed for its TaskContext
    partition ids.
    """
    mid = "_gr_mid"
    ranged = df.repartitionByRange(*order).sortWithinPartitions(*order)
    local = (
        ranged.withColumn(mid, F.monotonically_increasing_id())
        .withColumn(_PID, F.expr(f"shiftright({mid}, 33)"))
        .withColumn(_LRN, F.expr(f"({mid} & {(1 << 33) - 1}) + 1"))
        .drop(mid)
        .localCheckpoint()
    )
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    # One row per partition: this window's SinglePartition input is bounded
    # by the shuffle-partition count, not the data.
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(off_w), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(name, F.col(_OFF) + F.col(_LRN))
        .drop(_PID, _LRN, _OFF)
    )


def global_running_sum(
    df: DataFrame, order: list, value_col: str, name: str = "cum"
) -> DataFrame:
    """Exact ``SUM(value) OVER (ORDER BY *order ROWS UNBOUNDED PRECEDING)``
    without a single-partition exchange.

    ``value_col`` must be integral (long): integer addition is associative,
    so the partition-offset decomposition is bit-exact regardless of how
    the range partitioner splits the data. (For doubles the re-association
    would perturb low-order bits — callers convert to an exact integer
    grid first, e.g. cents/micros, which this repo's hash-matched queries
    already do.) Same two-pass shape as :func:`global_row_number`:
    per-partition local cumsum via ``mapInPandas``, then broadcast
    per-partition totals as offsets.
    """
    lcum = "_gr_lcum"
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(_PID, LongType(), False), StructField(lcum, LongType(), False)]
    )

    def add_local_cumsum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[_PID] = pid
            c = pdf[value_col].cumsum() + running
            pdf[lcum] = c
            if len(c):
                running = int(c.iloc[-1])
            yield pdf

    ranged = df.repartitionByRange(*order).sortWithinPartitions(*order)
    local = ranged.mapInPandas(add_local_cumsum, schema=out_schema).localCheckpoint()
    totals = local.groupBy(_PID).agg(F.sum(value_col).alias(_TOT))
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum(_TOT).over(off_w), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(name, (F.col(_OFF) + F.col(lcum)).cast("long"))
        .drop(_PID, lcum, _OFF)
    )


def global_running_max(
    df: DataFrame, order: list, value_col: str, name: str = "runmax"
) -> DataFrame:
    """Exact ``MAX(value) OVER (ORDER BY *order ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — the EXCLUSIVE prefix maximum — without
    a single-partition exchange.

    ``value_col`` must be integral (long). max is associative and
    idempotent, so the partition-offset decomposition is exact for any
    range split. ``name`` is NULL on the global first row (no preceding
    rows), mirroring the window spelling — callers treat NULL as "nothing
    dominates yet" (the §2.BS skyline device). Same two-pass shape as
    :func:`global_row_number`: per-partition exclusive cummax via
    ``mapInPandas``, then per-partition maxima broadcast as prefix
    offsets (``greatest`` skips NULLs, so the first partition's rows see
    only their local prefix)."""
    lmax = "_gr_lmax"
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(_PID, LongType(), False), StructField(lmax, LongType(), True)]
    )

    def add_local_cummax(batches):
        from pyspark import TaskContext

        import numpy as np
        import pandas as pd

        pid = TaskContext.get().partitionId()
        running = None  # max over all prior rows in this partition
        for pdf in batches:
            pdf = pdf.copy()
            pdf[_PID] = pid
            a = pdf[value_col].to_numpy()
            excl = np.empty(len(a), dtype=object)
            if len(a):
                incl = np.maximum.accumulate(a)
                excl[0] = running
                if len(a) > 1:
                    prev = incl[:-1]
                    if running is not None:
                        prev = np.maximum(prev, running)
                    excl[1:] = [int(x) for x in prev]
                running = int(incl[-1]) if running is None else max(
                    running, int(incl[-1])
                )
            pdf[lmax] = pd.array(list(excl), dtype="Int64")
            yield pdf

    ranged = df.repartitionByRange(*order).sortWithinPartitions(*order)
    local = ranged.mapInPandas(add_local_cummax, schema=out_schema).localCheckpoint()
    totals = local.groupBy(_PID).agg(F.max(value_col).alias(_TOT))
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(_PID, F.max(_TOT).over(off_w).alias(_OFF))
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(name, F.greatest(F.col(_OFF), F.col(lmax)).cast("long"))
        .drop(_PID, lmax, _OFF)
    )


def global_ntile(df: DataFrame, order: list, k: int, name: str = "bucket") -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY *order)`` (ANSI bucket sizing)
    from the distributed global row number — no single-partition pass.
    """
    rn_col = f"_gr_rn_{name}"
    ranked = global_row_number(df, order, rn_col)
    total = ranked.agg(F.count(F.lit(1)).alias("_gr_n"))
    # Pure long arithmetic (`div` is integer division): ceil(a / b) over
    # positive longs is (a - 1) div b + 1, so bucket ids never round-trip
    # through doubles. q = n div k, r = n mod k; the first r buckets hold
    # q+1 rows (covering `big` rows), the rest hold q. The otherwise-branch
    # divisor q is 0 only when n < k, in which case every row has
    # rn <= big and the branch is never selected (div-by-zero yields NULL
    # in the unselected branch, which CASE discards).
    rn = F.col(rn_col)
    q = F.expr(f"_gr_n div {k}")
    r = F.expr(f"_gr_n % {k}")
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    bucket = F.when(
        rn <= big, F.expr(f"({rn_col} - 1) div (_gr_n div {k} + 1)") + 1
    ).otherwise(
        r
        + F.expr(
            f"({rn_col} - (_gr_n % {k}) * (_gr_n div {k} + 1) - 1) div (_gr_n div {k})"
        )
        + 1
    )
    return (
        ranked.join(F.broadcast(total), how="cross")
        .withColumn(name, bucket.cast("long"))
        .drop(rn_col, "_gr_n")
    )
