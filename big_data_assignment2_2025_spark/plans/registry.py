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
    storage_queries,
]

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))
