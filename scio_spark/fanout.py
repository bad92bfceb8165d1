"""Scan-width fan-out for expression-heavy first stages.

Problem (guide §2.5 "input skew", found r15-opt): a parquet input with
fewer splits than the session has cores serializes the ENTIRE first
stage — shingling, per-token md5, k-gram hashing, map-side partial
aggregation — on one or two tasks while the rest of the cluster idles.
The bench fixtures are single-row-group files, so every heavy text/dedup
operator was paying its pre-shuffle CPU on 1 of 32 cores.

``fan_out_scan`` inserts one round-robin repartition to scheduling width
ONLY when the input provably cannot fill it: fewer files than ~width/2
AND too few total bytes for the size-based splitter to produce ~width/2
splits. At production scale (many files / multi-GB tables) both checks
short-circuit and the plan is untouched — the trigger derives from the
actual scan layout vs ``defaultParallelism`` at run time, not from a
local-mode constant. Catalyst pushes filters and column pruning straight
through a ``Repartition`` node (verified in plans/r15), so scan pushdown
is unaffected; the repartition moves only the pruned columns.

Inputs with no files behind them (in-memory fixtures, streams) are left
alone. Cost of the check: one ``inputFiles()`` (~1 ms against the
session's cached file index) plus at most width/2 FileStatus calls in
the small case.

Correctness: a round-robin exchange permutes row-to-partition assignment
only. Every caller is an operator whose result is a pure function of the
row SET (hash aggregations, joins, banded self-joins), pinned by the
whole-suite value oracle.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)

_DEFAULT_MAX_PARTITION_BYTES = 128 << 20


def _max_partition_bytes(spark) -> int:
    try:
        v = spark.conf.get("spark.sql.files.maxPartitionBytes")
        digits = "".join(c for c in v if c.isdigit())
        n = int(digits)
        suffix = v[len(digits):].strip().lower()
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(
            suffix[:1] if suffix and suffix[0] in "kmg" else "", 1
        )
        return n * mult or _DEFAULT_MAX_PARTITION_BYTES
    except Exception:
        return _DEFAULT_MAX_PARTITION_BYTES


def fan_out_scan(df: DataFrame, min_fill: float = 0.5) -> DataFrame:
    """Repartition ``df`` to scheduling width iff its file layout cannot
    keep the executors busy for the per-row work that follows. No-op
    (and adds no exchange) whenever the scan already splits at least
    ``min_fill`` × defaultParallelism wide — the normal state at cluster
    scale — or the input is not file-backed."""
    try:
        spark = df.sparkSession
        width = spark.sparkContext.defaultParallelism
        need = max(1, int(width * min_fill))
        files = df.inputFiles()
        if not files or len(files) >= need:
            return df
        # Few files — the size-based splitter may still fan the scan out
        # (one split per maxPartitionBytes, bounded by row groups). Only
        # repartition when even the byte-optimistic split count is short.
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(conf).getFileStatus(p).getLen()
        # Ceil, not floor (ADVICE r15): the floor under-estimated the
        # splitter's count by up to one split per input, adding a
        # redundant exchange on medium few-file inputs right at the
        # boundary. Still deliberately optimistic at small totals — a
        # single-row-group file yields one WORKING task no matter how many
        # byte splits the planner cuts, and ~maxPartitionBytes is the
        # row-group target, so this estimate tracks achievable scan
        # parallelism better than the bytesPerCore-shrunk split size.
        mpb = _max_partition_bytes(spark)
        if -(-total // mpb) >= need:
            return df
    except Exception:
        # Diagnosable, never fatal: a py4j/FileSystem hiccup silently
        # disabling the fan-out on one path but not another is exactly the
        # kind of asymmetry a debug log line pins down (ADVICE r15).
        _LOG.debug("fan_out_scan: layout check failed; leaving scan as-is",
                   exc_info=True)
        return df
    return df.repartition(width)
