"""Pipeline observability via DataFrame.observe: free metrics on a
running job (no second scan), the hook a production 100 TB run uses to
publish row counts / null rates / value totals per stage without
re-reading data. Verified against a direct aggregation of the same
input."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from duckdb_gsheets_spark.plans.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_observe_metrics_match_direct_aggregation(spark):
    docs = load_table(spark, SF, "documents")
    obs = Observation("ingest")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum("n_chars").alias("total_chars"),
    )
    # Downstream work proceeds normally; metrics ride the same pass.
    kept = observed.where(F.col("n_chars") > 100).count()
    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum("n_chars").alias("total_chars"),
    ).collect()[0]
    assert got["n_rows"] == direct.n_rows
    assert (got["n_null_text"] or 0) == (direct.n_null_text or 0)
    assert got["total_chars"] == direct.total_chars
    # The observation saw PRE-filter rows (it hangs on the scan side).
    assert kept <= got["n_rows"]
