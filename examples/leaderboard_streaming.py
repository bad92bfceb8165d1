"""LeaderBoard — streaming team scores with watermarked fixed windows
(scio-examples/.../complete/game/LeaderBoard.scala:111-170: fixed windows +
AfterWatermark trigger; our mapping: watermark + update-mode aggregation,
SURVEY §2.5 / §4.4.1).

Run: python examples/leaderboard_streaming.py
Feeds scripted micro-batches (TestStream analog) and prints per-window team
totals as the watermark advances.
"""

import datetime as dt
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark.context import build_session  # noqa: E402
from scio_spark.streaming.core import StreamFixture, windowed_stream_agg  # noqa: E402


def t(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


def main():
    spark = build_session("leaderboard")
    spark.sparkContext.setLogLevel("ERROR")
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


if __name__ == "__main__":
    main()
