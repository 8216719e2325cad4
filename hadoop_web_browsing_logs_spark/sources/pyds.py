"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) for the
reference's native corpus format: a directory of ``<int>.<ext>`` text files,
one document per file (ProcessData.java:387-401, 417).

``read_corpus_dir`` (sources/readers.py) covers the same format through the
built-in text source; this source demonstrates the engine's *extensibility*
path — the format plugs into ``spark.read.format("browsinglog")`` like any
JVM source, with planning on the driver and one partition per file so reads
parallelize across executors. Python data sources execute in the Python
workers over Arrow, so this is the right tool for formats with no JVM reader
(the multimodal sidecar formats, proprietary log encodings); for plain text
the built-in source remains the faster JVM-side path.

Usage::

    spark.dataSource.register(BrowsingLogDataSource)
    df = spark.read.format("browsinglog").load("/path/to/corpus")
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", IntegerType()),
        StructField("text", StringType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, doc_id: int):
        self.path = path
        self.doc_id = doc_id


class BrowsingLogReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("browsinglog source requires a path")

    def partitions(self):
        # one partition per document file: file-level parallelism, planned on
        # the driver (same listing cost as any file source's split planning).
        # Non-numeric filenames are skipped here — the reference threw
        # NumberFormatException on them (SURVEY Q4).
        parts = []
        for name in sorted(os.listdir(self.dir)):
            stem = name.rsplit(".", 1)[0]
            if stem.isdigit():
                parts.append(_FilePartition(os.path.join(self.dir, name), int(stem)))
        return parts

    def read(self, partition: _FilePartition):
        # executed on the Python workers; one row per file, trailing-newline
        # trimmed for parity with read_corpus_dir / the reference's per-line
        # reader
        with open(partition.path, encoding="utf-8") as fh:
            text = fh.read()
        yield (partition.doc_id, text[:-1] if text.endswith("\n") else text)


class BrowsingLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "browsinglog"

    def schema(self):
        return CORPUS_SCHEMA

    def reader(self, schema) -> BrowsingLogReader:
        return BrowsingLogReader(self.options)
