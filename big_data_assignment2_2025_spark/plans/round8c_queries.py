"""Round-8c queries: snapshot versioning — time travel and incremental
consumption over the manifest-committed store (``sources/snapshots.py``).

No reference counterpart (the reference's Cassandra store holds exactly
one mutable state, ``app/index.sh:23-38``); storage-family extension per
SURVEY.md §7. The gate proves the three contracts a reproducible training
pipeline needs:

- **time travel**: after an append AND a compaction rewrite, version 1
  still reads as exactly the original subset (``storage_time_travel``
  row 1 vs the oracle's filtered scan);
- **compaction is logically free**: version 3 (compacted) hashes equal to
  version 2 (rows 2 and 3 agree with the oracle's full scan);
- **incremental consumption is O(new data)**: ``storage_snapshot_diff``
  reads ONLY the commit directory added in v1→v2 yet reproduces the
  oracle's "the appended third" — the backfill path that never rescans
  the corpus.

Both oracles run on the raw ``documents`` view: the staged store is an
implementation detail; its reads must be indistinguishable from filtering
the source, which is precisely what hash-gating checks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_of
from ..sources.readers import (
    derived_cache_ok,
    fixture_fingerprint,
    load_table,
    mark_derived_cache,
)
from ..sources.snapshots import SnapshotStore

#: the append split: v1 = doc_id % 3 != 0 (overwrite), v2 += doc_id % 3 == 0
_SPLIT_MOD = 3


def _staged_store(spark: SparkSession, sf_dir: str) -> SnapshotStore:
    """Per-fixture snapshot store with exactly three committed versions:
    v1 overwrite (two thirds of documents), v2 append (the remaining
    third), v3 compact. Fingerprint-gated like every derived copy
    (``bucketed_table`` discipline) so a regenerated fixture rebuilds."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"snapstore_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        docs = load_table(spark, sf_dir, "documents")
        store.commit(
            docs.where(F.col("doc_id") % _SPLIT_MOD != 0), mode="overwrite"
        )
        store.commit(
            docs.where(F.col("doc_id") % _SPLIT_MOD == 0), mode="append"
        )
        store.compact(spark)
        # commit point for the CACHE (the store's own commits are already
        # atomic): _SUCCESS + fingerprint marker, after all three versions
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def _version_stats(df: DataFrame, version: int) -> DataFrame:
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    ).select(F.lit(version).alias("version"), "n_rows", "n_docs", "sum_chars")


def storage_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-version corpus stats read through the manifest store: v1 must
    still be the pre-append subset (time travel), v3 must equal v2
    (compaction rewrote files, not rows). Each read opens exactly the
    files its manifest names — no directory listing, so the answer is
    stable even while later commits land."""
    store = _staged_store(spark, sf_dir)
    out = None
    for v in (1, 2, 3):
        part = _version_stats(store.read(spark, v), v)
        out = part if out is None else out.unionAll(part)
    return out.orderBy("version")


TIME_TRAVEL_SQL = f"""
SELECT 1 AS version, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % {_SPLIT_MOD} <> 0
UNION ALL
SELECT 2, COUNT(*), COUNT(DISTINCT doc_id), CAST(SUM(n_chars) AS BIGINT)
FROM documents
UNION ALL
SELECT 3, COUNT(*), COUNT(DISTINCT doc_id), CAST(SUM(n_chars) AS BIGINT)
FROM documents
ORDER BY version
"""


def storage_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the v1→v2 delta, read INCREMENTALLY: only the
    commit directory the v2 manifest added is opened (``SnapshotStore.
    diff``), never the v1 members. At 100 TB this is the nightly-backfill
    contract — new-data cost, not table cost; the oracle reproduces the
    same rows from the raw source, proving the added-files read IS the
    appended row set."""
    store = _staged_store(spark, sf_dir)
    return (
        store.diff(spark, 1, 2)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


SNAPSHOT_DIFF_SQL = f"""
SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id % {_SPLIT_MOD} = 0
GROUP BY lang
ORDER BY lang
"""


def _merge_changes(docs: DataFrame) -> DataFrame:
    """Deterministic changes batch over the documents corpus, one row per
    op, ops disjoint by construction:

    - DELETE  every ``doc_id % 7 == 0`` row;
    - UPSERT (update) ``doc_id % 5 == 0`` rows not deleted: ``n_chars``
      becomes ``n_chars + 1000``; every other column NULL, exercising
      partial-update inheritance;
    - UPSERT (insert) one new row per ``doc_id % 11 == 0`` source row at
      key ``doc_id + 10_000_000`` (collision-free), ``lang='xx'``,
      ``source='merge'``, ``n_chars = doc_id % 97``.
    """
    did = F.col("doc_id")
    snull = F.lit(None).cast("string")
    deletes = docs.where(did % 7 == 0).select(
        "doc_id",
        snull.alias("text"),
        snull.alias("lang"),
        snull.alias("source"),
        F.lit(None).cast("bigint").alias("n_chars"),
        F.lit("delete").alias("_op"),
    )
    updates = docs.where((did % 7 != 0) & (did % 5 == 0)).select(
        "doc_id",
        snull.alias("text"),
        snull.alias("lang"),
        snull.alias("source"),
        (F.col("n_chars") + 1000).alias("n_chars"),
        F.lit("upsert").alias("_op"),
    )
    inserts = docs.where(did % 11 == 0).select(
        (did + 10_000_000).alias("doc_id"),
        snull.alias("text"),
        F.lit("xx").alias("lang"),
        F.lit("merge").alias("source"),
        (did % 97).alias("n_chars"),
        F.lit("upsert").alias("_op"),
    )
    return deletes.unionAll(updates).unionAll(inserts)


def _staged_merge_store(spark: SparkSession, sf_dir: str) -> SnapshotStore:
    """Per-fixture merge demo store: v1 = full corpus, v2 = MERGE of the
    deterministic changes batch. Fingerprint-gated like ``_staged_store``."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"mergestore_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        docs = load_table(spark, sf_dir, "documents")
        store.commit(docs, mode="overwrite")
        store.merge(spark, _merge_changes(docs), keys=["doc_id"])
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def storage_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the post-MERGE table: deletes gone, updated
    rows carry ``+1000`` chars with their ORIGINAL language (the NULL
    change column inherited it), inserted rows appear under ``lang='xx'``.
    The oracle rebuilds the same end state from the raw source with pure
    relational algebra — the merge path must be indistinguishable from
    it. Pre-merge v1 stays readable (time travel over a mutable table);
    ``tests/test_snapshots.py`` pins that and the row-level semantics."""
    store = _staged_merge_store(spark, sf_dir)
    return (
        store.read(spark, 2)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


MERGE_UPSERT_SQL = """
WITH merged AS (
  SELECT doc_id, lang,
         n_chars + CASE WHEN doc_id % 5 = 0 THEN 1000 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 10000000, 'xx', doc_id % 97
  FROM documents WHERE doc_id % 11 = 0
)
SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM merged GROUP BY lang ORDER BY lang
"""


#: range-clustered appends for the pruned-read demo store
_N_RANGE_COMMITS = 4


def _commit_range_clustered(
    spark: SparkSession, store: SnapshotStore, docs: DataFrame
) -> int:
    """Commit ``docs`` as ``_N_RANGE_COMMITS`` doc_id-quartile appends
    with doc_id stats — the shared staging of both pruning demos (one
    helper so the clustering scheme cannot silently diverge between
    them). Returns the quartile step."""
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]  # bounded scalar
    step = (max_id + 1 + _N_RANGE_COMMITS - 1) // _N_RANGE_COMMITS
    for k in range(_N_RANGE_COMMITS):
        store.commit(
            docs.where(
                (F.col("doc_id") >= k * step)
                & (F.col("doc_id") < (k + 1) * step)
            ),
            mode="append" if k else "overwrite",
            stats_cols=["doc_id"],
        )
    return step


def _staged_range_store(
    spark: SparkSession, sf_dir: str
) -> tuple[SnapshotStore, int]:
    """Per-fixture store whose table arrived as ``_N_RANGE_COMMITS``
    range-clustered appends (doc_id quartiles) committed WITH doc_id
    stats — the shape a daily ingest naturally produces (each commit
    covers a key span), which is exactly when manifest-stats pruning
    pays. Returns the store and the fixture's max doc_id."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"rangestore_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        _commit_range_clustered(
            spark, store, load_table(spark, sf_dir, "documents")
        )
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    store = SnapshotStore(base)
    # cache hit costs zero table scans: the fixture's max doc_id is already
    # in the manifest as the members' doc_id [min,max] stats
    stats = store.manifest(store.latest_version()).get("stats", {})
    max_id = max(
        s["doc_id"][1]
        for s in stats.values()
        if s.get("doc_id") and s["doc_id"][1] is not None
    )
    return store, max_id


def storage_snapshot_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language stats of the SECOND doc_id quartile, read through
    manifest-stats pruning: of the four range-clustered commit members,
    only the one whose [min, max] overlaps the slice is opened
    (``tests/test_snapshots.py`` asserts the other three never appear in
    the plan). The oracle filters the raw source with the same bounds —
    pruning must be invisible to the result. At 100 TB with daily
    appends this is the \"last week only\" read costing 7 commits, not
    the table."""
    store, max_id = _staged_range_store(spark, sf_dir)
    step = (max_id + 1 + _N_RANGE_COMMITS - 1) // _N_RANGE_COMMITS
    return (
        store.read_where(spark, "doc_id", step, 2 * step)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


PRUNED_READ_SQL = f"""
WITH b AS (
  SELECT CAST((MAX(doc_id) + 1 + {_N_RANGE_COMMITS} - 1)
              // {_N_RANGE_COMMITS} AS BIGINT) AS step
  FROM documents
)
SELECT d.lang, COUNT(*) AS n_rows, CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM documents d, b
WHERE d.doc_id >= b.step AND d.doc_id < 2 * b.step
GROUP BY d.lang ORDER BY d.lang
"""


def _staged_pruned_merge_store(
    spark: SparkSession, sf_dir: str
) -> SnapshotStore:
    """Per-fixture PRUNED-merge demo: the documents corpus committed as
    ``_N_RANGE_COMMITS`` range-clustered appends with doc_id stats (same
    layout as ``_staged_range_store``, separate directory so the two
    demos cannot disturb each other's versions), then one
    ``merge(prune=True)`` whose change keys all live in the SECOND
    quartile — so exactly one of the four members is rewritten; the
    other three are carried into the merged manifest verbatim, never
    read. Changes: delete ``doc_id % 3 == 0`` in the quartile, add 500
    chars to the rest of the quartile (lang inherited through the NULL
    column), insert one ``lang='yy'`` row per ``doc_id % 13 == 0``
    source row at ``doc_id + 20_000_000``."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"prunemerge_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        docs = load_table(spark, sf_dir, "documents")
        step = _commit_range_clustered(spark, store, docs)
        did = F.col("doc_id")
        in_q2 = (did >= step) & (did < 2 * step)
        snull = F.lit(None).cast("string")
        deletes = docs.where(in_q2 & (did % 3 == 0)).select(
            "doc_id", snull.alias("text"), snull.alias("lang"),
            snull.alias("source"),
            F.lit(None).cast("bigint").alias("n_chars"),
            F.lit("delete").alias("_op"),
        )
        updates = docs.where(in_q2 & (did % 3 != 0)).select(
            "doc_id", snull.alias("text"), snull.alias("lang"),
            snull.alias("source"),
            (F.col("n_chars") + 500).alias("n_chars"),
            F.lit("upsert").alias("_op"),
        )
        inserts = docs.where(did % 13 == 0).select(
            (did + 20_000_000).alias("doc_id"), snull.alias("text"),
            F.lit("yy").alias("lang"), F.lit("merge2").alias("source"),
            (did % 89).alias("n_chars"),
            F.lit("upsert").alias("_op"),
        )
        store.merge(
            spark,
            deletes.unionAll(updates).unionAll(inserts),
            keys=["doc_id"],
            prune=True,
        )
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def storage_merge_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the table after a FILE-PRUNED merge: three
    of the four range-clustered members were carried into the merged
    manifest without being read or rewritten (``tests/test_snapshots.py``
    pins that member accounting; the staged manifest's ``rewrote`` field
    records it), yet the end state must be indistinguishable from the
    oracle's full relational rebuild — pruning is an access-path
    optimization, never a semantic one. This is the O(affected files +
    changes) merge a 100 TB key-clustered table needs: the overlap
    probe is one bounded aggregate over the change keys, the join reads
    one member, and time travel still serves every pre-merge version."""
    store = _staged_pruned_merge_store(spark, sf_dir)
    return (
        store.read(spark)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


MERGE_PRUNED_SQL = f"""
WITH b AS (
  SELECT CAST((MAX(doc_id) + 1 + {_N_RANGE_COMMITS} - 1)
              // {_N_RANGE_COMMITS} AS BIGINT) AS step
  FROM documents
),
merged AS (
  SELECT d.doc_id, d.lang,
         d.n_chars + CASE WHEN d.doc_id >= b.step AND d.doc_id < 2 * b.step
                               AND d.doc_id % 3 <> 0
                          THEN 500 ELSE 0 END AS n_chars
  FROM documents d, b
  WHERE NOT (d.doc_id >= b.step AND d.doc_id < 2 * b.step
             AND d.doc_id % 3 = 0)
  UNION ALL
  SELECT doc_id + 20000000, 'yy', doc_id % 89
  FROM documents WHERE doc_id % 13 = 0
)
SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM merged GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# "Did you mean" — SymSpell-style deletion-neighborhood spell suggestion
# --------------------------------------------------------------------------

#: out-of-vocabulary query terms, each edit-distance 1 from corpus vocab
_TYPO_QUERIES = ["tabl", "strem", "qury", "filtr", "windw"]

#: term plus every single-character deletion of it (SymSpell's index
#: unit); array_union already deduplicates ("aab" -> one "ab")
_DELETES_SQL = (
    "array_union(array({c}), "
    "transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i - 1), "
    "substring({c}, i + 1, length({c})))))"
)


def _staged_spell_vocab(spark: SparkSession, sf_dir: str) -> str:
    """(variant, term, df) SymSpell index parquet per fixture: the
    vocabulary with its deletion neighborhood PRE-EXPLODED — this is an
    INDEX TABLE, built once with the corpus exactly like the BM25
    materialized index (``operators/index.py:materialize_index``) and
    amortized across every suggestion query, which then costs only the
    L+1 variant probes of its own query terms; fingerprint-gated like
    all derived copies."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spellvocab_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(path, fprint):
        docs = load_table(spark, sf_dir, "documents")
        (
            tokens_of(docs)
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .select(
                "term", "df",
                F.explode(
                    F.expr(_DELETES_SQL.format(c="term"))
                ).alias("variant"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        mark_derived_cache(path, fprint)
    return path


def search_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 "did you mean" suggestions per out-of-vocabulary query term:
    vocabulary terms at Levenshtein distance 1, ranked by document
    frequency — the retrieval-UX feature the reference's exact-match
    Cassandra lookup cannot express (an OOV term there just returns
    nothing, ``app/query.py:38``).

    Candidate generation is the SymSpell deletion trick (Garbe, public
    symspell algorithm): block on the set {term} ∪ deletes1(term) built
    for BOTH sides. Completeness for ED ≤ 1 is exact, not heuristic —
    a substitution shares the both-sides-deleted variant, an
    insert/delete shares the shorter string itself — so the equi-join
    probes only deletion-neighborhood collisions (~(L+1) variants per
    term, linear in vocab) instead of the |vocab| × |queries|
    levenshtein cross the DuckDB oracle runs; the gate proves the
    blocked form loses nothing, same discipline as
    ``events_band_join_grid``. At 100 TB the variant index is built once
    with the vocabulary and served like any posting list; per-query cost
    is L+1 point lookups."""
    from pyspark.sql import Window

    vexp = spark.read.parquet(_staged_spell_vocab(spark, sf_dir))
    qdf = spark.createDataFrame(
        [(q,) for q in _TYPO_QUERIES], "query_term string"
    )
    qexp = qdf.select(
        "query_term",
        F.explode(
            F.expr(_DELETES_SQL.format(c="query_term"))
        ).alias("variant"),
    )
    cands = (
        qexp.join(vexp, "variant").select("query_term", "term", "df")
        .distinct()
    )
    scored = cands.where(
        (F.levenshtein("query_term", "term") <= 1)
        & (F.col("term") != F.col("query_term"))
    )
    w = Window.partitionBy("query_term").orderBy(
        F.desc("df"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "query_term", "rank", F.col("term").alias("suggestion"), "df"
        )
        .orderBy("query_term", "rank")
    )


SPELL_SUGGEST_SQL = """
WITH q(query_term) AS (
  VALUES ('tabl'), ('strem'), ('qury'), ('filtr'), ('windw')),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_'']+'))
           AS term
  FROM documents),
vocab AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scored AS (
  SELECT q.query_term, v.term AS suggestion, v.df,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.query_term
                                 ORDER BY v.df DESC, v.term ASC)
              AS INTEGER) AS rank
  FROM q JOIN vocab v
    ON levenshtein(q.query_term, v.term) <= 1 AND v.term <> q.query_term)
SELECT query_term, rank, suggestion, df
FROM scored WHERE rank <= 3 ORDER BY query_term, rank
"""


QUERIES = {
    "storage_time_travel": storage_time_travel,
    "storage_snapshot_diff": storage_snapshot_diff,
    "storage_merge_upsert": storage_merge_upsert,
    "storage_snapshot_pruned_read": storage_snapshot_pruned_read,
    "storage_merge_pruned": storage_merge_pruned,
    "search_spell_suggest": search_spell_suggest,
}

ORACLES = {
    "storage_time_travel": TIME_TRAVEL_SQL,
    "storage_snapshot_diff": SNAPSHOT_DIFF_SQL,
    "storage_merge_upsert": MERGE_UPSERT_SQL,
    "storage_snapshot_pruned_read": PRUNED_READ_SQL,
    "storage_merge_pruned": MERGE_PRUNED_SQL,
    "search_spell_suggest": SPELL_SUGGEST_SQL,
}
