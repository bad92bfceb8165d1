"""Arrow IPC (Feather v2) file IO — zero-copy interchange for ML tooling.

Beyond-reference IO: the reference exchanges data through Avro/TFRecord;
modern Python training stacks (pandas/polars/datasets/duckdb) speak Arrow
IPC natively, and the format is the exact wire layout Spark already uses
for Arrow transfers — so a scored/curated table written here memory-maps
straight into a trainer with no decode step.

The wire format comes entirely from pyarrow (the reference
implementation); this module owns only the Spark-side distribution, which
follows the repo's container-format convention: one IPC file per task on
write (manifest to the driver, never rows), whole-file-per-task reads via
the binaryFile source. The Arrow schema is fixed from the DataFrame
schema up front (``to_arrow_schema``), so per-batch pandas inference can
never drift between partitions (an all-null column still writes its
declared type).
"""

from __future__ import annotations

import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


def save_as_arrow_ipc(
    df: DataFrame, path: str, suffix: str = ".arrow", compression: str | None = "zstd"
) -> list:
    """One Arrow IPC file per task. Returns manifest rows (file,
    n_records, n_bytes). ``compression``: zstd | lz4 | None (buffer-level
    IPC compression — readable by every Arrow implementation)."""
    import glob
    import os
    import uuid

    import pandas as pd
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, f"*{suffix}")) + glob.glob(
        os.path.join(path, f"*{suffix}.tmp.*")
    ):
        os.remove(old)
    schema = to_arrow_schema(df.schema)

    def gen(batches: Iterator[pd.DataFrame]):
        # IpcWriteOptions is not picklable — build it executor-side from
        # the compression string
        opts = pa.ipc.IpcWriteOptions(compression=compression)
        buf = io.BytesIO()
        writer = None
        n = 0
        for pdf in batches:
            table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
            if writer is None:
                writer = pa.ipc.new_file(buf, schema, options=opts)
            writer.write_table(table)
            n += len(pdf)
        if writer is None:
            return
        writer.close()
        blob = buf.getvalue()
        # Partition-id filename + atomic rename: a retried or speculative
        # task replaces its own shard instead of adding a duplicate one
        # (a uuid name would double the shard's rows on read after any
        # task rerun). Same protocol as save_as_webdataset.
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        fname = os.path.join(path, f"part-{pid:05d}{suffix}")
        tmp = f"{fname}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, fname)
        yield pd.DataFrame(
            {"file": [fname], "n_records": [n], "n_bytes": [len(blob)]}
        )

    manifest = df.mapInPandas(gen, "file string, n_records long, n_bytes long")
    return manifest.collect()


def read_arrow_ipc(spark: SparkSession, path: str, suffix: str = ".arrow") -> DataFrame:
    """Read IPC files back: schema from the first file's header, whole
    file per task."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(glob.glob(os.path.join(path, f"*{suffix}")))
    if not files:
        raise FileNotFoundError(f"no {suffix} files under {path}")
    with pa.ipc.open_file(files[0]) as rdr:
        aschema = rdr.schema
    sschema = from_arrow_schema(aschema)

    def gen(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            for blob in pdf["content"]:
                with pa.ipc.open_file(pa.BufferReader(bytes(blob))) as rdr:
                    table = rdr.read_all()
                if table.num_rows:
                    yield table.to_pandas()

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{suffix}")
        .load(path)
    )
    return src.select("content").mapInPandas(gen, sschema)
