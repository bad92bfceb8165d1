"""LeaderBoard — streaming team scores with watermarked fixed windows
(scio-examples/.../complete/game/LeaderBoard.scala:111-170: fixed windows +
AfterWatermark trigger; our mapping: SURVEY §2.5 / §4.4.1).

Two stages, mirroring the reference example:
1. team scores as a plain watermarked update-mode aggregation — the
   watermark-expressible subset (late-but-admissible rows re-fire);
2. the FULL LeaderBoard trigger — AfterWatermark.pastEndOfWindow()
   .withEarlyFirings(AfterProcessingTime...).withLateFirings(
   AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)) — via
   `watermark_panes`: EARLY panes on a wall-clock cadence before the
   watermark crossing, the ON_TIME pane delivered even in a data-less
   micro-batch, LATE panes for admissible replays.

Run: python examples/leaderboard_streaming.py
"""

import datetime as dt
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark.context import build_session  # noqa: E402
from scio_spark.streaming.core import (  # noqa: E402
    StreamFixture,
    state_partitions,
    watermark_panes,
    windowed_stream_agg,
)


def t(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


def accumulating_totals(spark):
    fx = StreamFixture(spark, "user string, team string, score int, event_time timestamp")
    # three micro-batches; the third is late for window 1 but inside
    # allowed lateness (10 minutes watermark delay)
    fx.add_batch([("u1", "red", 5, t(1)), ("u2", "blue", 3, t(4))])
    fx.add_batch([("u3", "red", 2, t(12)), ("u4", "blue", 7, t(14))])
    fx.add_batch([("u5", "red", 4, t(6))])  # late arrival for window [12:00,12:10)

    def pipeline(stream):
        return windowed_stream_agg(
            stream, "event_time", "10 minutes", "10 minutes", ["team"],
            [F.sum("score").alias("total")],
        )

    out = fx.run(pipeline, output_mode="update")
    print("update-mode emissions (ACCUMULATING panes analog):")
    out.orderBy("window_start", "team", "total").show(truncate=False)
    fx.close()


def full_trigger(spark):
    fx = StreamFixture(spark, "team string, event_time timestamp, score int")
    fx.add_batch([("red", t(1), 5), ("blue", t(4), 3)])
    # lateness must be wide enough that the 12:06 replay stays admissible
    # AFTER the 12:35 row advances the watermark: with 2 h the delayed
    # watermark is 10:35 < window end, so state survives and LATE fires
    # (20 min would evict the window and drop the replay)
    panes = watermark_panes(
        fx.stream(), "event_time", "10 minutes", "2 hours", ["team"],
        "score", late_delay_ms=1000, early_delay_ms=1000,
    )
    rows = []
    with state_partitions(spark, 2):
        q = (
            panes.writeStream.outputMode("update")
            .foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .trigger(processingTime="250 milliseconds")
            .start()
        )

    def wait(pred, deadline_s=60.0):
        end = time.time() + deadline_s
        while time.time() < end and not pred():
            time.sleep(0.2)

    try:
        wait(lambda: any(r.timing == "EARLY" for r in rows))
        fx.add_batch([("red", t(35), 2)])  # watermark → 12:35 > window end
        wait(lambda: any(r.timing == "ON_TIME" for r in rows))
        fx.add_batch([("blue", t(6), 7)])  # late-but-admissible replay
        wait(lambda: any(r.timing == "LATE" for r in rows))
    finally:
        q.stop()
        fx.close()
    print("full AfterWatermark composite (EARLY → ON_TIME → LATE panes):")
    for r in sorted(rows, key=lambda r: (r.window_start, r.team, r.pane_index)):
        print(
            f"  {r.team:4s} window={r.window_start:%H:%M} pane={r.pane_index}"
            f" {r.timing:7s} value={r.pane_value} total={r.total_so_far}"
        )


def main():
    spark = build_session("leaderboard")
    spark.sparkContext.setLogLevel("ERROR")
    accumulating_totals(spark)
    full_trigger(spark)


if __name__ == "__main__":
    main()
