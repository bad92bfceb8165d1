"""Named-IO registry + JobTest harness — scio's test-substitution machinery.

Reference: every ScioIO carries a ``testId`` (io/ScioIO.scala:59-116); JobTest
(scio-test/.../JobTest.scala:63-75) registers keyed inputs/outputs in
TestDataManager, then runs the UNMODIFIED job main(); reads/writes branch on
test mode (ScioIO.scala:76,82-86). This is load-bearing for the reference's
whole-job golden tests (SURVEY §3.4, §5.3).

Here: ``JobTest`` wraps a ScioContext with test inputs; jobs written against
``ScioContext`` IO methods (text_file/parquet_file/... with io_id) run
unmodified, reading the fixtures and capturing writes.

    result = (
        JobTest(job_main)
        .input("text:gs://in.txt", ["a b", "b c"])
        .run(spark)
    )
    result.output("text:gs://out.txt")  # captured DataFrame
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from scio_spark.context import ScioContext


class JobTestResult:
    def __init__(self, ctx: ScioContext, returned: Any):
        self.ctx = ctx
        self.returned = returned

    def output(self, io_id: str) -> DataFrame:
        if io_id not in self.ctx.test_outputs:
            raise KeyError(
                f"no output captured for {io_id!r}; captured: {list(self.ctx.test_outputs)}"
            )
        return self.ctx.test_outputs[io_id]

    def outputs(self) -> dict[str, DataFrame]:
        return dict(self.ctx.test_outputs)


class JobTest:
    """JobTest[T].input(...).output(...)(assert) analog."""

    def __init__(self, job: Callable[[ScioContext], Any]):
        self.job = job
        self._inputs: dict[str, Any] = {}

    def input(self, io_id: str, data) -> "JobTest":
        self._inputs[io_id] = data
        return self

    def run(self, spark: SparkSession) -> JobTestResult:
        ctx = ScioContext(spark, test_inputs=self._inputs)
        returned = self.job(ctx)
        return JobTestResult(ctx, returned)
