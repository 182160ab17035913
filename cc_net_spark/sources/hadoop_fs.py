"""Hadoop FileSystem metadata helpers — shared by the streaming state
layers and the stage-DAG fingerprints.

Everything here is a METADATA operation through the JVM's Hadoop FS API:
no Spark jobs, no exception probing (a 1-row Spark write costs a whole
job; `spark.read.parquet(missing)` costs ~0.9 s of AnalysisException
machinery on first use, `FileSystem.exists` ~20 ms), and it works on any
supported scheme (file/s3a/hdfs/abfs) where a pathlib walk would mangle
the URI or misreport existence.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-supported scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def read_small_text(spark: SparkSession, path: str) -> str | None:
    """Contents of a small text/JSON marker file, or None if absent."""
    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_small_text(spark: SparkSession, path: str, content: str) -> None:
    """Write (overwrite) a small text/JSON marker file."""
    fs, jpath = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode()))
    finally:
        out.close()
