"""Shared Hadoop FS marker helpers: metadata ops, no Spark jobs."""


def test_hadoop_fs_marker_roundtrip(spark, tmp_path):
    from cc_net_spark.sources.hadoop_fs import (
        hadoop_fs,
        read_small_text,
        write_small_text,
    )

    p = str(tmp_path / "sub" / "marker.json")
    assert read_small_text(spark, p) is None  # absent -> None, no raise
    write_small_text(spark, p, '{"k": 1}')
    assert read_small_text(spark, p) == '{"k": 1}'
    write_small_text(spark, p, '{"k": 2}')  # overwrite
    assert read_small_text(spark, p) == '{"k": 2}'
    fs, jpath = hadoop_fs(spark, p)
    assert fs.exists(jpath)
