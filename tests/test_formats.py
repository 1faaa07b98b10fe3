"""Multi-format source/sink layer: explicit-schema text reads, parquet
round-trips, ingest-edge conversion, and file-stream sources."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources import formats
from hugegraph_on_tikv_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
NATION_SCHEMA = "n_nationkey bigint, n_name string, n_regionkey bigint"


def _nations(spark):
    return load_table(spark, SF, "nation")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_round_trip_each_format(spark, tmp_path, fmt):
    src = _nations(spark)
    path = str(tmp_path / f"nation.{fmt}")
    formats.write_any(src, path, fmt)
    back = formats.read_any(spark, path, schema=NATION_SCHEMA)
    assert sorted(back.collect()) == sorted(src.collect())


def test_text_formats_require_schema(spark, tmp_path):
    path = str(tmp_path / "nation.csv")
    formats.write_any(_nations(spark), path)
    with pytest.raises(ValueError, match="explicit schema"):
        formats.read_any(spark, path)


def test_infer_format_and_unknown(tmp_path):
    assert formats.infer_format("/data/x.jsonl") == "json"
    assert formats.infer_format("/data/x.PARQUET/") == "parquet"
    with pytest.raises(ValueError, match="cannot infer"):
        formats.infer_format("/data/x.avro")


def test_convert_csv_to_partitioned_parquet(spark, tmp_path):
    csv_path = str(tmp_path / "nation.csv")
    pq_path = str(tmp_path / "nation_pq")
    formats.write_any(_nations(spark), csv_path)
    formats.convert(spark, csv_path, pq_path, schema=NATION_SCHEMA,
                    partition_by=["n_regionkey"])
    back = spark.read.parquet(pq_path)
    assert back.count() == _nations(spark).count()
    # partition pruning: an equality filter on the partition column must
    # show up as a PartitionFilter in the physical plan (directory-level
    # skip, not a post-scan filter)
    import contextlib
    import io

    pruned = back.filter(F.col("n_regionkey") == 0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "n_regionkey" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.count() == _nations(spark).filter(F.col("n_regionkey") == 0).count()


def test_read_stream_csv_upserts_into_catalog(spark, tmp_path):
    from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog
    from hugegraph_on_tikv_spark.streaming.ingest import stream_upsert

    src = _nations(spark)
    stream_dir = str(tmp_path / "incoming.csv")
    formats.write_any(src, stream_dir)

    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    catalog.create_table("nation", src.limit(0), key="n_nationkey")
    stream = formats.read_stream(spark, stream_dir, schema=NATION_SCHEMA)
    q = stream_upsert(stream, catalog, "nation", "n_nationkey",
                      str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert catalog.table("nation").df.count() == src.count()
