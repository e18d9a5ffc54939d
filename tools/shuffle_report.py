"""Shuffle-volume report: execute queries and read the ACTUAL per-exchange
shuffle bytes/records out of the executed plan's SQLMetrics — measured
evidence for the shuffle claims in SCALING.md, not estimates.

For each query: run to completion, walk the final adaptive plan (through
QueryStage wrappers), and sum ``shuffleBytesWritten`` /
``shuffleRecordsWritten`` over every ShuffleExchange. Also reports scan
output rows so shuffle volume can be compared against input size.

A/B pairs pin specific design claims with numbers:

- ``ohlc_agg`` vs ``ohlc_window``: min_by/max_by partial aggregation vs
  the double-ordered-window spelling — the window must shuffle EVERY event
  row; the aggregate ships only per-group partials.
- ``heavy_hitters_two_pass`` vs ``heavy_hitters_full``: bounded candidate
  buckets vs the full-vocabulary groupBy (fixture caveat: the synthetic
  vocabulary is ~31 terms, so the gap here is structural, not dramatic —
  see SCALING.md §9).
- ``incremental_dedup`` vs ``full_corpus_dedup``: batch-only anti-join vs
  re-deduping the whole corpus.

Caveat: operators that MATERIALIZE persisted intermediates while the
DataFrame is being constructed (the ad-hoc BM25/index path, MinHash
signatures) run those shuffles in earlier jobs; the profiled plan then
reads InMemoryTableScan and reports only the final consumer's exchanges.
Rows like ``dedup_minhash_lsh: 0 exchanges`` mean "no exchange in the
consumer plan", not "no shuffle ever" — the build cost is visible in
bench.py timings instead.

Usage: python tools/shuffle_report.py [sf_dir] [--json=PATH]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.session import get_spark
from big_data_assignment2_2025_spark.sources.readers import load_table

#: registry queries whose shuffle profile the report records
QUERIES_TO_PROFILE = [
    "bm25_search",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_exact",
    "dedup_incremental_batch",
    "heavy_hitter_terms",
    "table_checksum_xor",
    "events_ohlc_bars",
    "sample_weighted_priority",
    "corpus_divergence_kl",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "index_term_freq",
    "events_rolling_dau",
    "embedding_gram_matrix",
]


def _walk(node, depth=0):
    name = node.getClass().getSimpleName()
    yield depth, name, node
    if "QueryStage" in name:
        yield from _walk(node.plan(), depth + 1)
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i), depth + 1)


def _metrics(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def profile(df: DataFrame) -> dict:
    """Run ``df`` and return its measured shuffle profile.

    Must ``collect()`` (not ``count()``): count() wraps the frame in a NEW
    QueryExecution, so the metrics of ``df``'s own executed plan would
    stay zero."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # AdaptiveSparkPlanExec exposes the final plan only after execution
    if "AdaptiveSparkPlan" in plan.getClass().getSimpleName():
        plan = plan.executedPlan()
    exchanges, scans = [], []
    for _, name, node in _walk(plan):
        m = _metrics(node)
        if "ShuffleExchange" in name:
            exchanges.append(
                {
                    "records": m.get("shuffleRecordsWritten", 0),
                    "bytes": m.get("shuffleBytesWritten", 0),
                }
            )
        elif "Scan" in name and "numOutputRows" in m:
            scans.append(m["numOutputRows"])
    return {
        "n_exchanges": len(exchanges),
        "shuffle_records": sum(e["records"] for e in exchanges),
        "shuffle_bytes": sum(e["bytes"] for e in exchanges),
        "scan_rows": sum(scans),
        "exchanges": exchanges,
    }


# ---------------------------------------------------------------------------
# A/B comparison variants (the naive spellings the engine deliberately avoids)
# ---------------------------------------------------------------------------


def _ohlc_window_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The double-window OHLC spelling: every row shuffles into its
    (event_type, day) partition and sorts twice."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn_a", F.row_number().over(w))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


def _heavy_hitters_full_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-vocabulary groupBy + HAVING — every distinct key shuffles."""
    from big_data_assignment2_2025_spark.functions.text import tokens_of

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = tokens_of(docs.select("text"))
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    totals = counts.agg(F.sum("cnt").alias("n_total"))
    return (
        counts.join(F.broadcast(totals))
        .where(F.col("cnt") > 0.01 * F.col("n_total"))
        .select("term", "cnt", "n_total")
    )


def _full_corpus_dedup_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-dedup the WHOLE corpus (history + batch together) — what the
    incremental form avoids re-doing every day."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return (
        docs.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper_doc_id"), (F.count("*") - 1).alias("n_dups"))
    )


AB_PAIRS = {
    "ohlc": ("events_ohlc_bars", _ohlc_window_variant),
    "heavy_hitters": ("heavy_hitter_terms", _heavy_hitters_full_variant),
    "incremental_dedup": ("dedup_incremental_batch", _full_corpus_dedup_variant),
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    json_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )

    from big_data_assignment2_2025_spark.plans import QUERIES

    spark = get_spark(app_name="shuffle_report")
    report: dict = {"sf_dir": sf_dir, "queries": {}, "ab": {}}

    for name in QUERIES_TO_PROFILE:
        prof = profile(QUERIES[name](spark, sf_dir))
        del prof["exchanges"]
        report["queries"][name] = prof
        print(
            f"{name}: {prof['n_exchanges']} exchanges, "
            f"{prof['shuffle_records']} rec / {prof['shuffle_bytes']} B shuffled, "
            f"{prof['scan_rows']} scan rows"
        )

    for key, (engine_name, naive_fn) in AB_PAIRS.items():
        a = profile(QUERIES[engine_name](spark, sf_dir))
        b = profile(naive_fn(spark, sf_dir))
        report["ab"][key] = {
            "engine": {k: a[k] for k in ("n_exchanges", "shuffle_records", "shuffle_bytes")},
            "naive": {k: b[k] for k in ("n_exchanges", "shuffle_records", "shuffle_bytes")},
        }
        print(
            f"A/B {key}: engine {a['shuffle_records']} rec/{a['shuffle_bytes']} B "
            f"vs naive {b['shuffle_records']} rec/{b['shuffle_bytes']} B"
        )

    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
