"""Deterministic dense docid assignment.

The reference maps user-facing ids to dense internal integer ids
assigned sequentially by insertion order
(``pylate/indexes/fast_plaid.py:194-227``: ``plaid_ids =
range(current_max_id + 1, ...)``) and keeps the two-way mapping
persisted (``fast_plaid.py:136-174``). Our assignment is *rank in the
global url sort order*: deterministic (independent of partitioning and
cluster size — the rank of a unique key in a total order is a pure
function of the data), dense, and range-shardable.

Implementation is the classic two-phase zipWithIndex shape without
leaving the DataFrame API:

1. range-repartition + local sort by ``url`` (Spark's sort machinery —
   scales to any size; no global single-partition window),
2. per-partition local rank via a window on ``spark_partition_id()``,
3. tiny per-partition count collect → cumulative offsets → broadcast
   join.

``shard = docid // shard_size`` then gives contiguous docid ranges —
the salting dimension of the build (SURVEY §7.3) and the scatter
dimension of the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_docids(
    pages: DataFrame,
    shard_size: int,
    key_col: str = "url",
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(pages + docid + shard, cache_handle)``.

    ``docid`` is the row's rank in the global ``key_col`` sort order;
    ``shard = docid // shard_size``. The second element is the persisted
    intermediate — callers unpersist it after materializing the result.
    ``partitions`` controls the range-partitioner width; defaults to the
    session shuffle parallelism.
    """
    from pyspark import StorageLevel

    spark = pages.sparkSession
    if partitions is None:
        # at least one range partition per input split: with few
        # shuffle partitions (a narrow cluster) the default would pack
        # the whole corpus text into a handful of ~GB sort tasks —
        # measured as the worst-scaling build phase (profile_build.py)
        partitions = max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            pages.rdd.getNumPartitions(),
        )

    ordered = (
        pages.repartitionByRange(partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # One pass over the sorted data for counts, a second for ranks; the
    # persist pins the (sampled) range partitioning so both passes see
    # identical partition contents. The caller must materialize the
    # result (e.g. write the docmap) and then release the cache via the
    # returned handle's ``unpersist``. DISK_ONLY, deliberately: the
    # pinned corpus is full document text (≫ executor heaps at scale);
    # streamed from executor-local disk (tmpfs in the local harness,
    # NVMe on a cluster) both passes cost one sequential read, whereas
    # a memory cache makes staging throughput depend on aggregate
    # executor cache memory — which shrinks with cluster size and
    # measurably broke build scaling at the 1-executor leg.
    ordered = ordered.persist(StorageLevel.DISK_ONLY)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(key_col)
    out = (
        ordered.withColumn("_rank", F.row_number().over(w))
        .withColumn("docid", (offmap[F.col("_pid")] + F.col("_rank") - 1).cast("long"))
        .withColumn("shard", (F.col("docid") / F.lit(shard_size)).cast("long"))
        .drop("_pid", "_rank")
    )
    return out, ordered
