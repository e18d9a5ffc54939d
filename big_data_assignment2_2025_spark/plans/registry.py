"""The declared query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and by the differential tests.

Every operator from SURVEY.md §2 that is implemented has a named entry in
``QUERIES`` (callable ``(spark, sf_dir) -> DataFrame``) and, when the
semantics are SQL-expressible, a matching DuckDB oracle in ``ORACLES``.
Column names are aliased identically on both sides (the driver's comparison
sorts columns by name before hashing).
"""

from __future__ import annotations

from . import (
    dedup_queries,
    events_queries,
    graph_queries,
    multimodal_queries,
    parity_queries,
    pipeline2_queries,
    pipeline_queries,
    relational,
    relational2,
    relational3,
    round3_queries,
    round3b_queries,
    round4_queries,
    round5_queries,
    round7_queries,
    round7b_queries,
    round7c_queries,
    round7d_queries,
    round7e_queries,
    round7f_queries,
    round7g_queries,
    round7h_queries,
    round7i_queries,
    round7j_queries,
    round7k_queries,
    round8_queries,
    round8c_queries,
    round9_queries,
    round10_queries,
    round11_queries,
    round12_queries,
    round13_queries,
    round13b_queries,
    search_queries,
    similarity_queries,
    sql_queries,
    storage_queries,
    streaming_queries,
    temporal_queries,
    text_queries,
)

_MODULES = [
    search_queries,
    relational,
    relational2,
    relational3,
    dedup_queries,
    graph_queries,
    similarity_queries,
    text_queries,
    events_queries,
    streaming_queries,
    multimodal_queries,
    pipeline_queries,
    pipeline2_queries,
    temporal_queries,
    parity_queries,
    sql_queries,
    round3_queries,
    round3b_queries,
    round4_queries,
    round5_queries,
    round7_queries,
    round7b_queries,
    round7c_queries,
    round7d_queries,
    round7e_queries,
    round7f_queries,
    round7g_queries,
    round7h_queries,
    round7i_queries,
    round7j_queries,
    round7k_queries,
    round8_queries,
    round8c_queries,
    round9_queries,
    round10_queries,
    round11_queries,
    round12_queries,
    round13_queries,
    round13b_queries,
    storage_queries,
]

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))

#: FIXTURE-SCALE BASELINE queries -> their measured-linear scale-path twin.
#: A baseline entry is exact and oracle-stable at the shipped fixtures but
#: has a MEASURED superlinear candidate/pair shape at the 10x scale probe;
#: a 100 TB deployment must run the twin instead. Kept in the registry (not
#: removed) because the pair is what makes the scale claim testable: the
#: probe measures both and SCALING.md cites the numbers.
#: - dedup_simhash: plain-signature chunk keyspace 2.27x superlinear at 10x
#:   (template concentration) -> dedup_simhash_idf measured 1.00.
#: - embedding_semdedup: fixed n_cells=8 makes within-cell pairs quadratic
#:   (10.01x at 10x) -> embedding_semdedup_scaled derives k = ceil(n/50)
#:   (measured ~linear; the operator's own default since round 10).
BASELINE_TIER = {
    "dedup_simhash": "dedup_simhash_idf",
    "embedding_semdedup": "embedding_semdedup_scaled",
}
