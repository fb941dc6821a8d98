"""PySpark recipe for the graft DSv2 sources (SURVEY.md S11 Python-surface
parity with the reference's PythonOdpsAPI bridge).

The kv / log / cdc / queue sources are DataSource V2 implementations, so
the Python surface is plain ``spark.read`` / ``spark.readStream`` with the
graft classes on the classpath — no Python-side bridge module is needed
(the reference needs one only because its Python path wraps a custom RDD;
a DSv2 table is language-agnostic by construction).

Smoke run (from the repo root, after ``sbt compile``):

    spark-submit --driver-class-path target/scala-2.13/classes \
        scripts/pyspark_kv_recipe.py /root/testdata/sf0.001

or set ``spark.driver.extraClassPath`` to the packaged graft jar in any
pyspark session. Every option documented on the Scala surface (``catalog``,
``primary.keys``, ``split.size.mb``, ``starting.offsets``, ``schema.mode``,
``maxOffsetsPerTrigger``, ``writer.mode``, ``writer.batch.size``, ...)
works identically here.
"""
import sys
import tempfile

from pyspark.sql import SparkSession


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pyspark-recipe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    # Batch kv scan — filter pushdown and column pruning land in the scan
    # exactly as from Scala (same DSv2 plan).
    kv = spark.read.format("kv").option("path", f"{sf_dir}/orders.parquet").load()
    sliced = kv.filter("o_orderkey % 1000 = 0").select("o_orderkey", "o_totalprice")
    n_kv = sliced.count()
    print(f"[recipe] kv scan: {n_kv} filtered orders rows")

    # Log source in raw mode: __shard__/__offset__/__value__ JSON records.
    raw = (
        spark.read.format("log")
        .option("path", f"{sf_dir}/events.parquet")
        .option("schema.mode", "raw")
        .load()
    )
    n_raw = raw.count()
    print(f"[recipe] log raw scan: {n_raw} records")

    # kv write round-trip with the batch-mode bounded writer.
    out = tempfile.mkdtemp(prefix="graft_py_kv_")
    (
        sliced.write.format("kv")
        .option("path", out)
        .option("writer.mode", "batch")
        .option("writer.batch.size", "500")
        .mode("overwrite")
        .save()
    )
    back = spark.read.format("kv").option("path", out).load().count()
    assert back == n_kv, f"round-trip mismatch: wrote {n_kv}, read {back}"
    print(f"[recipe] kv write round-trip OK ({back} rows)")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
