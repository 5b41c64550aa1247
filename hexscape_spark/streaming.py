"""Structured Streaming surface: streaming hex-cell rollups.

The reference is entirely batch (SURVEY §2.8 — verified across all 24 R
files), but the graft input carries warc_ts, so the engine exposes the
natural streaming form of its flagship rollup: a file/rate stream of pages
-> deterministic geocode -> hex assign (the same pure-column expressions as
batch — one code path) -> watermarked windowed per-cell aggregation.

Late data is handled by the watermark; state is bounded by
(cells x windows); exactly-once sinks come from checkpointing.  Tested with
the availableNow trigger over a parquet directory, which exercises the real
micro-batch engine deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import hexgrid


def stream_pages(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    schema = schema or ("page_id LONG, url STRING, warc_ts TIMESTAMP, "
                        "html BINARY, text STRING, lang STRING")
    return spark.readStream.schema(schema).parquet(path)


def streaming_cell_rollup(pages: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          key: str = "page_id",
                          ts: str = "warc_ts") -> DataFrame:
    """Per-(window, cell) page counts + char sums with late-data watermark.

    The geocode/assign expressions are identical to the batch path
    (hexgrid.with_geocode / with_hex_cell) — Structured Streaming reuses
    the same Catalyst plans incrementally.
    """
    g = hexgrid.with_hex_cell(hexgrid.with_geocode(pages, key))
    return (g.withWatermark(ts, watermark)
            .groupBy(F.window(F.col(ts), window).alias("w"),
                     F.col("cell_id"), F.col("q"), F.col("r"))
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum(F.length("text")).alias("sum_chars"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "cell_id", "q", "r", "n_pages", "sum_chars"))


def run_available_now(result: DataFrame, checkpoint_dir: str,
                      out_dir: str) -> None:
    """Drain everything currently available and stop (deterministic test/
    backfill mode); append-mode parquet sink with exactly-once checkpoint."""
    q = (result.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
