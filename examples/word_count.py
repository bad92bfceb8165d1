"""WordCount — the reference's first golden example
(scio-examples/.../WordCount.scala; JobTest in WordCountTest.scala:28-35).

Run: python examples/word_count.py [input_glob] [output_dir]
The job function is importable and runs unmodified under JobTest
(tests/test_enrich_io.py::test_jobtest_swaps_io uses the same shape).
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402


def word_count_job(ctx: ScioContext, in_path: str, out_path: str):
    lines = ctx.text_file(in_path, io_id="text:in")
    counts = (
        lines.flat_map(F.split(F.col("value"), r"\s+"), alias="word")
        .filter("word != ''")
        .map("word")
        .count_by_value()
        .map(line=F.concat_ws(": ", F.col("word"), F.col("count").cast("string")))
    )
    counts.save_as_text_file(out_path, io_id="text:out")
    return counts


if __name__ == "__main__":
    in_path = sys.argv[1] if len(sys.argv) > 1 else "README.md"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wordcount_out"
    ctx = ScioContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")
    result = word_count_job(ctx, in_path, out_path)
    result.df.orderBy(F.desc("count")).show(10, truncate=False)
    print(f"written to {out_path}")
