"""The driver-contract query inventory: one named query per implemented
operator from SURVEY.md §2, each returning a DataFrame over the driver's
parquet test tables, with a matching DuckDB oracle SQL string.

Conventions (driver compare = row-count + schema + order-insensitive
value-hash): every computed column is aliased IDENTICALLY in the Spark plan
and the oracle SQL; float aggregates are rounded to a fixed scale so both
engines hash the same values; result sets are kept deterministic (explicit
ORDER BY only matters for LIMIT queries — the compare is order-insensitive).

Scale notes are attached per query: what the plan does at 100 TB (broadcast
vs shuffle, pushdown, partial aggregation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from louis_crawler_legacy_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# Registry filled by the @query decorator.
QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# J1 — the canonical left-anti work queue: rows without a matching embedding
# (reference db.py:686-703 fetch_chunk_id_without_embedding).
# Scale: anti-join shuffles on the key; at 100 TB the embeddings side is the
# smaller one → AQE converts to broadcast when it fits, else SMJ with both
# sides hash-partitioned on the key. Column pruning keeps the scan at 2 cols.
@query(
    "j1_anti_join_missing_embeddings",
    """
    SELECT d.doc_id, d.lang
    FROM documents d
    LEFT JOIN (SELECT * FROM embeddings WHERE label = 0) e ON d.doc_id = e.vec_id
    WHERE e.vec_id IS NULL
    """,
)
def j1_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings").filter(F.col("label") == 0)
    return d.join(e, d.doc_id == e.vec_id, "left_anti").select("doc_id", "lang")


# J2-style seen-set dedup as a relational query: keys on the left absent from
# the right (customers that never ordered).
@query(
    "j2_left_anti_seen",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    WHERE o.o_custkey IS NULL
    """,
)
def j2_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# J3 — point/batch lookup join (reference db.py:620-631): broadcast the small
# dimension explicitly — at 100 TB the orders fact never moves.
@query(
    "j3_broadcast_dim_join",
    """
    SELECT n.n_name, count(*) AS order_cnt,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j3_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# A1/A4 — predicate-count aggregate (reference count_pdf_links_in_texts.py):
# single pass, partial agg map-side, no shuffle beyond 1-row exchange.
@query(
    "a4_pred_count",
    """
    SELECT count(*) AS total,
           CAST(sum(CASE WHEN regexp_matches(text, 'data') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match
    FROM documents
    """,
)
def a4_pred_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("text").rlike("data"), 1).otherwise(0)).alias("n_match"),
    )


# A2 — duplicate counter (count_duplicate_lines.py:4-9): hash aggregate,
# map-side partial combine collapses duplicates before the shuffle.
@query(
    "a2_duplicate_texts",
    """
    SELECT substr(text, 1, 20) AS prefix, count(*) AS cnt FROM documents
    GROUP BY substr(text, 1, 20) HAVING count(*) > 1
    """,
)
def a2_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.substring("text", 1, 20).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


# A3 — histogram (count_extensions.py): groupBy + count.
@query(
    "a3_type_histogram",
    "SELECT p_type, count(*) AS cnt FROM part GROUP BY p_type",
)
def a3_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_type").agg(F.count("*").alias("cnt"))


# A5 — per-task log aggregation (log_analyzer.py:46-100): min/max/count per
# group. Partial aggregation makes this shuffle O(groups), not O(rows).
@query(
    "a5_per_user_session",
    """
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def a5_log_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# A6 — global run stats (log_analyzer.py:161-182).
@query(
    "a6_global_stats",
    """
    SELECT count(*) AS n, round(avg(value), 4) AS avg_value,
           round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
    FROM events
    """,
)
def a6_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


# A7-style round metrics: status-bucket counts (goldie_playwright_parallel
# 826-857) — expressed over events.event_type.
@query(
    "a7_round_metrics",
    "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def a7_round_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count("*").alias("cnt"))


# TPC-H Q1 shape — the heavy scan+agg the bench leans on. Pushdown check:
# the parquet scan must read only the 7 referenced columns.
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# O3 — recency top-k (db.py:224, storage_manager.py:57-62): TakeOrdered —
# no global sort at scale, each partition keeps k, driver merges.
@query(
    "o3_topk_recent",
    "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id LIMIT 10",
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.orderBy(F.desc("ts"), F.asc("event_id")).select("event_id", "ts").limit(10)


# O4 — queue ordering by created_at (db.py:701).
@query(
    "o4_queue_order",
    "SELECT doc_id, n_chars FROM documents ORDER BY n_chars, doc_id LIMIT 50",
)
def o4_queue_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.orderBy("n_chars", "doc_id").select("doc_id", "n_chars").limit(50)


# O5 — per-host politeness budget as a relational op: rank within host
# (window) and cap. Scale: single shuffle on the partition key; the window
# never materializes more than one host's rows per task.
@query(
    "o5_per_key_budget",
    """
    SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def o5_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


# A9 — order-preserving first-occurrence dedup (goldie.py:29-35) as a
# relational op: row_number over discovery order == 1.
@query(
    "a9_first_occurrence_dedup",
    """
    SELECT user_id, event_type, event_id AS first_event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def a9_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


# F4/F5 — substring/ilike filters (pruner.py:24-47, storage_manager.py:107-112).
@query(
    "f5_ilike_search",
    """
    SELECT p_partkey, p_name FROM part
    WHERE lower(p_name) LIKE '%red%' OR lower(p_brand) LIKE '%red%'
    """,
)
def f5_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    q = "red"
    return p.filter(
        F.lower(F.col("p_name")).contains(q) | F.lower(F.col("p_brand")).contains(q)
    ).select("p_partkey", "p_name")


@query(
    "f4_substring_prune",
    "SELECT doc_id, lang FROM documents WHERE lang = 'en' AND text LIKE '%scan%'",
)
def f4_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.filter((F.col("lang") == "en") & F.col("text").contains("scan")).select(
        "doc_id", "lang"
    )


# U2/U3 — set ops: union-distinct of two selections (README_depth_control
# cat|sort|uniq) and except.
@query(
    "u3_union_distinct",
    """
    SELECT DISTINCT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id FROM events WHERE value > 50
    )
    """,
)
def u3_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("value") > 50).select("user_id")
    return a.union(b).distinct()


@query(
    "u2_except",
    """
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 90
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 90
    """,
)
def u2_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    a = e.filter((F.col("event_type") == "view") & (F.col("value") > 90)).select("user_id")
    b = e.filter((F.col("event_type") == "click") & (F.col("value") > 90)).select("user_id")
    return a.subtract(b)  # EXCEPT (distinct) semantics


# ---------------------------------------------------------------------------
# §2.10 chunking + spans — rows-only (the chunker is not SQL-expressible;
# the driver records the weaker rows/schema check; exact semantics are
# pinned by tests/test_chunking.py and tests/test_spans.py).
# ---------------------------------------------------------------------------


def _docs_as_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically wrap the plain-text documents table as HTML pages
    so the HTML operators have an in-contract input."""
    d = _t(spark, sf_dir, "documents")
    # small single-file input → 1 partition; the downstream chunking UDF is
    # CPU-bound, so spread it across cores (at 100 TB the scan already
    # yields many partitions and this repartition is a no-op knob)
    d = d.repartition(spark.sparkContext.defaultParallelism)
    return d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title></head><body>\n<h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1>\n<p>"),
            F.col("text"),
            F.lit("</p>\n</body></html>"),
        ).alias("html"),
        F.concat(
            F.lit("http://corpus.local/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
    )


def _docs_as_html_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_docs_as_html plus two deterministic child links per page (a plain
    link and a .pdf) so the span pipeline exercises all three span kinds
    (text/link/media) under an exact oracle."""
    d = _t(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    sid = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>doc "), sid,
            F.lit("</title></head><body>\n<h1>Doc "), sid,
            F.lit("</h1>\n<p>"), F.col("text"), F.lit("</p>\n"),
            F.lit('<a href="/next/'), sid, F.lit('">next</a>\n'),
            F.lit('<a href="/files/'), sid, F.lit('.pdf">pdf</a>\n'),
            F.lit("</body></html>"),
        ).alias("html"),
        F.concat(F.lit("http://corpus.local/doc/"), sid).alias("url"),
    )


# EXACT oracle (was rows-only through r4): the driver corpus's docs are
# all < 256 tokens (max 101 at sf0.01/0.1), so every page is in the
# chunker's single-chunk parent-climb regime — chunk_idx 0, title = the
# <title> text, token_count = the StableHashEncoder mass of the cleaned
# content 'Doc {id} {text}' (the p1b formula; ceil(len/8) per regex
# piece). A ≥256-token doc would mismatch LOUDLY (different title or
# multiple rows), so the regime assumption is itself gated. Multi-chunk
# (>512) semantics stay pinned by tests/test_chunking.py's 20 tests +
# ported reference goldens, and their per-doc conserved mass by p1b.
@query(
    "x_chunk_documents",
    """
    SELECT doc_id, CAST(0 AS INTEGER) AS chunk_idx,
           concat('doc ', CAST(doc_id AS VARCHAR)) AS title,
           CAST(list_sum(list_transform(
             regexp_extract_all(
               concat('Doc ', CAST(doc_id AS VARCHAR), ' ', text),
               '[A-Za-z0-9]+|[^\\sA-Za-z0-9]'),
             p -> CAST(ceil(len(p) / 8.0) AS BIGINT))) AS INTEGER)
             AS token_count
    FROM documents
    """,
)
def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.chunking import chunk_documents

    return chunk_documents(_docs_as_html(spark, sf_dir)).select(
        "doc_id", "chunk_idx", "title", "token_count"
    )


# EXACT oracle (was rows-only through r4): with the linked input every
# page yields exactly (text, link, media) spans in order — the text span
# is the cleaned content 'Doc {id} {text} next pdf' (inline anchor text
# joins the content, the single-chunk regime applies as in
# x_chunk_documents), the link/media spans carry the base-resolved hrefs.
# Pins parse → clean → chunk → span assembly → explode end-to-end.
@query(
    "x_doc_spans",
    """
    SELECT doc_id, 'text' AS kind,
           concat('Doc ', CAST(doc_id AS VARCHAR), ' ', text, ' next pdf')
             AS text,
           CAST(NULL AS VARCHAR) AS media_ref, CAST(0 AS INTEGER) AS "offset"
    FROM documents
    UNION ALL
    SELECT doc_id, 'link', CAST(NULL AS VARCHAR),
           concat('http://corpus.local/next/', CAST(doc_id AS VARCHAR)),
           CAST(1 AS INTEGER)
    FROM documents
    UNION ALL
    SELECT doc_id, 'media', CAST(NULL AS VARCHAR),
           concat('http://corpus.local/files/', CAST(doc_id AS VARCHAR),
                  '.pdf'),
           CAST(2 AS INTEGER)
    FROM documents
    """,
)
def x_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.spans import docs_to_spans, explode_spans

    return explode_spans(docs_to_spans(_docs_as_html_linked(spark, sf_dir)))


def _frontier_oracle() -> str:
    """EXACT oracle for the full iterative engine (VERDICT r02 next-round
    #5): the per-round metrics are deterministic integers whose spec is the
    pure-Python reference simulator (simulator.py — the same oracle the
    9-config pytest equality suite pins states against). Running it at
    query-registration time and emitting the rounds as a typed VALUES table
    lets the DRIVER GATE independently pin the engine against the
    simulator — engine and oracle share no Spark code, only the corpus
    generator and the extraction functions (whose equality has its own
    unit tests)."""
    from louis_crawler_legacy_spark.simulator import simulate_crawl
    from louis_crawler_legacy_spark.sources import corpus as corpus_mod

    corpus = corpus_mod.generate_corpus(
        seed=42, n_hosts=3, pages_per_host=6, hub_factor=2, links_per_page=4
    )
    sim = simulate_crawl(
        corpus_mod.corpus_dict(corpus), corpus_mod.seed_urls(corpus, n=2),
        max_depth=2, batch_size=16, host_budget=8,
    )
    rows = ", ".join(
        f"({r.round}, {len(r.batch)}, {len(r.scraped)}, {len(r.errored)}, "
        f"{len(r.new_pending)})"
        for r in sim.rounds
    )
    return f"""
    SELECT CAST(c0 AS INTEGER) AS round, CAST(c1 AS BIGINT) AS n_batch,
           CAST(c2 AS BIGINT) AS n_scraped, CAST(c3 AS BIGINT) AS n_errored,
           CAST(c4 AS BIGINT) AS n_new_frontier
    FROM (VALUES {rows}) AS t(c0, c1, c2, c3, c4)
    """


@query("x_frontier_crawl", _frontier_oracle())
def x_frontier_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end frontier engine: deterministic corpus → BFS rounds with
    host budget → per-round metrics table, EXACT-matched against the
    reference simulator's rounds via the VALUES oracle above."""
    import tempfile

    from louis_crawler_legacy_spark.plans.crawl import CrawlConfig, CrawlEngine
    from louis_crawler_legacy_spark.sources import corpus as corpus_mod

    corpus = corpus_mod.generate_corpus(
        seed=42, n_hosts=3, pages_per_host=6, hub_factor=2, links_per_page=4
    )
    eng = CrawlEngine(
        spark,
        corpus_mod.corpus_df(spark, corpus),
        tempfile.mkdtemp(prefix="frontier_q_"),
        CrawlConfig(max_depth=2, batch_size=16, host_budget=8,
                    num_partitions=4, bloom_capacity=10_000),
    )
    eng.run(seeds=corpus_mod.seed_urls(corpus, n=2))
    return eng.metrics.read().select(
        "round", "n_batch", "n_scraped", "n_errored", "n_new_frontier"
    ).orderBy("round")


@query("x_frontier_crawl_cuckoo", _frontier_oracle())  # exact: same oracle
def x_frontier_crawl_cuckoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identical crawl with the cuckoo-filter seen layer
    (CrawlConfig(seen_filter="cuckoo"), operators/cuckoo.py). Both filter
    kinds are exact-verified prefilters, so the per-round metrics are
    bit-identical to x_frontier_crawl's — the driver records both, and the
    engine-vs-simulator equality suite pins the full state equality
    (tests/test_frontier.py cuckoo-seen config)."""
    import tempfile

    from louis_crawler_legacy_spark.plans.crawl import CrawlConfig, CrawlEngine
    from louis_crawler_legacy_spark.sources import corpus as corpus_mod

    corpus = corpus_mod.generate_corpus(
        seed=42, n_hosts=3, pages_per_host=6, hub_factor=2, links_per_page=4
    )
    eng = CrawlEngine(
        spark,
        corpus_mod.corpus_df(spark, corpus),
        tempfile.mkdtemp(prefix="frontier_qc_"),
        CrawlConfig(max_depth=2, batch_size=16, host_budget=8,
                    num_partitions=4, bloom_capacity=10_000,
                    seen_filter="cuckoo"),
    )
    eng.run(seeds=corpus_mod.seed_urls(corpus, n=2))
    return eng.metrics.read().select(
        "round", "n_batch", "n_scraped", "n_errored", "n_new_frontier"
    ).orderBy("round")


# ---------------------------------------------------------------------------
# Robots RFC 9309 evaluator — EXACT driver-gate pin for the compliance
# feature the r03 verdict ranked the top user-facing gap (implemented in
# round 4). The Spark side is the engine's NATIVE evaluator — regexp_like +
# an aggregate fold over the per-host ordered rules array
# (operators/politeness.py robots_disallowed_expr), the exact expression
# robots_filter applies inside the crawl round — so the gate pins Java
# regex / parse_url semantics against the pure-Python twin
# (robots_blocked_py: re + urlparse) that the simulator-equality suite
# trusts. Cases cover the RFC corner set: Allow overriding a broader
# Disallow, '*' wildcards, '$' end anchors (including a query string
# defeating the anchor), longest-match-wins, equal-length tie → Allow
# wins, agent-group selection (non-matching specific group skipped for the
# '*' fallback), path?query match targets, an empty robots.txt, and a host
# with no robots entry at all.
_ROBOTS_BODIES = {
    "a.example": "User-agent: *\nDisallow: /\nAllow: /public/\n",
    "b.example": (
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /private*\n"
        "Allow: /private/ok$\nDisallow: /search?q=\n"
        "Allow: /tie/\nDisallow: /tie/\n"
    ),
    "c.example": (
        "User-agent: louis\nDisallow: /only-louis/\n\n"
        "User-agent: *\nDisallow: /everyone/\n"
    ),
    "d.example": "",
}
_ROBOTS_URLS = [
    "http://a.example/", "http://a.example/public/page.html",
    "http://a.example/public/", "http://a.example/publicx",
    "http://a.example/private/page.html",
    "http://b.example/doc.pdf", "http://b.example/doc.pdf?x=1",
    "http://b.example/private/ok", "http://b.example/private/ok2",
    "http://b.example/search?q=foo", "http://b.example/search",
    "http://b.example/a/b/file.pdf", "http://b.example/tie/x",
    "http://c.example/everyone/x", "http://c.example/only-louis/x",
    "http://d.example/anything", "http://e.example/whatever",
]


# expected verdict per _ROBOTS_URLS entry, HAND-DERIVED from RFC 9309
# (not generated by the Python twin: a shared bug in the
# normalize_rules/pattern_regex fold both evaluators use would slip
# through a twin-generated oracle — r4 ADVICE). Order matches
# _ROBOTS_URLS. Derivations: a.example '/'→blocked (only 'Disallow:/'
# matches), '/public/…'→Allow out-lengths it, '/publicx' does NOT start
# with '/public/'→blocked; b.example anchors ('$' defeated by a query
# string), '*' wildcards, longest-match, equal-length tie→Allow wins,
# '/search' without the query matches nothing; c.example: the 'louis'
# group does not match this crawler's product token so the '*' group
# applies (/everyone/ blocked, /only-louis/ not); d (empty robots.txt)
# and e (no robots entry) allow everything.
_ROBOTS_EXPECTED = [
    True, False, False, True, True,          # a.example
    True, False, False, True, True, False,   # b.example (pdf/private/search)
    True, False,                              # b.example (wildcard pdf, tie)
    True, False,                              # c.example
    False, False,                             # d.example, e.example
]


def _robots_oracle() -> str:
    rows = ", ".join(
        f"('{u}', {'TRUE' if blocked else 'FALSE'})"
        for u, blocked in zip(_ROBOTS_URLS, _ROBOTS_EXPECTED, strict=True)
    )
    return f"""
    SELECT c0 AS url, CAST(c1 AS BOOLEAN) AS blocked
    FROM (VALUES {rows}) AS t(c0, c1)
    """


@query("r1_robots_rfc", _robots_oracle())
def r1_robots_rfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.politeness import (
        robots_disallowed_expr, url_match_target,
    )
    from louis_crawler_legacy_spark.operators.robots import robots_table

    robots = robots_table(spark, _ROBOTS_BODIES)
    cand = spark.createDataFrame(
        [(u,) for u in _ROBOTS_URLS], ["url"]
    ).withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
    # the same broadcast-join + native-fold shape robots_filter uses in the
    # round pipeline, kept as (url, blocked) so BOTH outcomes are hashed
    return cand.join(F.broadcast(robots), "host", "left").select(
        "url",
        robots_disallowed_expr(
            url_match_target(F.col("url")), F.col("rules")
        ).alias("blocked"),
    )


# ===========================================================================
# Training-data pipeline operators (dedup / similarity / text analysis /
# multimodal) — first-class components per the build brief.
# ===========================================================================

# --- text analysis (native columns; exact DuckDB oracles) -------------------

@query(
    "t1_token_counts",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\\sA-Za-z0-9]')) AS bpe_tokens
    FROM documents
    """,
)
def t1_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ts.token_count_ws(F.col("text")).alias("ws_tokens"),
        ts.token_count_bpe(F.col("text")).alias("bpe_tokens"),
    )


def _lang_oracle() -> str:
    from louis_crawler_legacy_spark.operators import textstats as ts

    return f"SELECT doc_id, {ts.oracle_lang_id()} AS pred_lang FROM documents"


@query("t2_lang_id")
def t2_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.lang_id(F.col("text")).alias("pred_lang"))


@query("t3_quality_score")
def t3_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.quality_score(F.col("text")).alias("quality"))


# T5 — corpus vocabulary top-k (term frequency): the workhorse behind
# stopword lists, quality heuristics, and contamination checks. Scale:
# explode feeds a map-side-combinable count (partial agg collapses each
# task's terms before the exchange — the shuffle carries (term, partial_n),
# not one row per token), then TakeOrderedAndProject for the top-k (per-
# partition k, no global sort). Deterministic: ties broken by term.
@query(
    "t5_vocab_topk",
    r"""
    SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ) WHERE len(term) >= 2
    GROUP BY term ORDER BY n DESC, term ASC LIMIT 50
    """,
)
def t5_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(ts.words_col(F.lower(F.col("text")))).alias("term")
    )
    return (
        words.where(F.length("term") >= 2)
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(50)
    )


@query("t4_fingerprint")
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.fingerprint(F.col("text")).alias("fp"))


# --- dedup -------------------------------------------------------------------

@query(
    "d1_exact_dedup",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id", "lang")


@query(
    "d2_dup_groups",
    """
    SELECT substr(text, 1, 30) AS dup_key, count(*) AS n_docs,
           min(doc_id) AS keeper_id
    FROM documents GROUP BY substr(text, 1, 30) HAVING count(*) > 1
    """,
)
def d2_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import duplicate_groups

    d = _t(spark, sf_dir, "documents")
    return duplicate_groups(d, F.substring("text", 1, 30))


def _d3_pairs_sql(threshold: float = 0.2) -> str:
    """The blocked n-gram-Jaccard pair statement — d3's oracle, and the
    edge generator d6's cluster oracle embeds (one definition, no drift)."""
    return f"""
    WITH sh AS (
      SELECT doc_id, trim(text) AS t,
             string_split_regex(trim(text), '\\s+') AS w,
             concat_ws(' ', string_split_regex(trim(text), '\\s+')[1],
                            string_split_regex(trim(text), '\\s+')[2]) AS block
      FROM documents
    ), shingled AS (
      SELECT doc_id, block,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))
             ELSE [t] END AS sh
      FROM sh
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                 greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1),
                 4) AS jaccard
    FROM shingled a JOIN shingled b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
          greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1)
          >= {threshold}
    """


@query("d3_ngram_jaccard", _d3_pairs_sql(threshold=0.2))
def d3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.2)


def _d4_oracle(
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
    cols: tuple[str, str] = ("id_a", "id_b"),
    pair_pred: str = "a.doc_id < b.doc_id",
) -> str:
    """Exact DuckDB twin of minhash_lsh_pairs(hash_fn=poly_hash,
    band_hash_fn=poly_hash): same shingles (d3's CTE), same permutation
    constants (imported from the implementation so they stay in lockstep),
    same band hashes. The oracle states the SEMANTICS (distinct any-band
    candidates + signature similarity); the Spark plan's min-band ownership
    is a physical strategy producing the same set."""
    from louis_crawler_legacy_spark.operators.dedup import (
        MERSENNE_P,
        _perm_constants,
    )

    a_const, b_const = _perm_constants(num_perm)
    rows = num_perm // bands
    mins = ", ".join(
        f"min(({a_const[i]} * h + {b_const[i]}) % {MERSENNE_P}) AS m{i}"
        for i in range(num_perm)
    )
    sig_list = "[" + ", ".join(f"m{i}" for i in range(num_perm)) + "]"
    band_strs = ", ".join(
        "concat_ws(','," + ",".join(
            f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
        ) + f") AS bs{b}"
        for b in range(bands)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, len(bs{b})), "
        f"i -> CAST(ascii(substr(bs{b}, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % 1000000007) AS bh FROM bandstr"
        for b in range(bands)
    )
    return f"""
    WITH sh0 AS (
      SELECT doc_id, trim(text) AS t,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))
             ELSE [t] END AS sh
      FROM sh0
    ), hashed AS (
      SELECT doc_id,
             abs(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(s)),
                              i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007)) % {MERSENNE_P} AS h
      FROM (SELECT doc_id, unnest(sh) AS s FROM shingled)
    ), mins AS (
      SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, {sig_list} AS sig FROM mins
    ), bandstr AS (
      SELECT doc_id, {band_strs} FROM mins
    ), bandkeys AS (
      {band_rows}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS {cols[0]}, b.doc_id AS {cols[1]}
      FROM bandkeys a JOIN bandkeys b
        ON a.band = b.band AND a.bh = b.bh AND {pair_pred}
    )
    SELECT c.{cols[0]}, c.{cols[1]},
           round(len(list_filter(generate_series(1, {num_perm}),
                                 i -> sa.sig[i] = sb.sig[i])) / {num_perm}.0,
                 4) AS sim
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.{cols[0]}
    JOIN sigs sb ON sb.doc_id = c.{cols[1]}
    WHERE len(list_filter(generate_series(1, {num_perm}),
                          i -> sa.sig[i] = sb.sig[i])) / {num_perm}.0
          >= {threshold}
    """


@query("d4_minhash_lsh", _d4_oracle())
def d4_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import (
        minhash_lsh_pairs,
        poly_hash,
    )

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # oracle mode: SQL-portable poly hash for shingles AND band keys (exact
    # DuckDB twin above); the engine default stays xxhash64, pinned by the
    # planted-dup tests
    return minhash_lsh_pairs(
        d, threshold=0.3, hash_fn=poly_hash, band_hash_fn=poly_hash
    )


# D7 — incremental dedup: a NEW batch (the doc_id % 19 = 7 slice, reusing
# c4's deterministic split) against the EXISTING corpus (the rest), whose
# side enters as materialized minhash signatures — the continual-crawl
# production shape (corpus never re-pairs against itself, contributes
# ~0.5 KB of signature per doc, never text). Oracle: the d4 statement with
# the pair predicate swapped to the cross-set split — one shared fold.
@query(
    "d7_incremental_dedup",
    _d4_oracle(
        cols=("new_id", "corpus_id"),
        pair_pred="a.doc_id % 19 = 7 AND b.doc_id % 19 <> 7",
    ),
)
def d7_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_signatures,
        poly_hash,
    )

    d = _t(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 19 == 7)
    corpus = d.where(F.col("doc_id") % 19 != 7)
    corpus_sig = minhash_signatures(corpus, hash_fn=poly_hash)
    return minhash_lsh_incremental(
        new, corpus_sig, threshold=0.3,
        hash_fn=poly_hash, band_hash_fn=poly_hash,
    )


# D8 — exact duplicate-substring fraction (the Lee et al. suffix-array
# dedup metric, relational form): per doc, the share of 10-word window
# positions whose window string occurs ≥2× corpus-wide.
@query(
    "d8_dup_substring",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), wins AS (
      SELECT doc_id, win FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(w) - 9, 0)),
                 i -> array_to_string(w[i:i+9], ' '))) AS win
        FROM w
      )
    ), freq AS (
      SELECT win, count(*) AS cnt FROM wins GROUP BY win
    ), per AS (
      SELECT wins.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN f.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup
      FROM wins JOIN freq f USING (win)
      GROUP BY wins.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_windows, 0) AS n_windows,
           coalesce(p.n_dup, 0) AS n_dup,
           coalesce(round(p.n_dup::DOUBLE / p.n_windows, 4), 0.0)
             AS dup_frac
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
)
def d8_dup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import dup_window_stats

    d = _t(spark, sf_dir, "documents")
    return dup_window_stats(d).withColumnRenamed("id", "doc_id")


def _d5_oracle(nbits: int = 32, max_hamming: int = 3) -> str:
    """Exact DuckDB twin of simhash_pairs(hash_fn=poly_hash, nbits=32):
    the banded LSH blocking is exhaustive for max_hamming ≤ bands−1
    (pigeonhole), so the oracle is simply ALL pairs with hamming ≤ k over
    the same 32-bit signatures — generated programmatically so the bit
    aggregates stay in lockstep with the Spark implementation."""
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(nbits)
    )
    sig = " + ".join(f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(nbits))
    return f"""
    WITH words AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(w)),
                              i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
               (acc, b) -> (acc * 31 + b) % 1000000007) AS h
      FROM words
    ), sums AS (
      SELECT doc_id, {sums} FROM hashed GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, CAST({sig} AS BIGINT) AS sh FROM sums
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


@query("d4x_minhash_lsh_engine")  # rows-only: the ENGINE-default hashes
def d4x_minhash_lsh_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production MinHash-LSH path (xxhash64 shingle + band hashes —
    ~9x faster than the char-folding oracle-mode hash; this is what runs at
    100 TB and what bench.py measures). Values pinned by the d4 exact
    oracle on the identical plan with portable hashes, plus the planted-dup
    tests."""
    from louis_crawler_legacy_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return minhash_lsh_pairs(d, threshold=0.3)


@query("d5_simhash", _d5_oracle())
def d5_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import poly_hash, simhash_pairs

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # oracle mode: SQL-portable poly hash + 32-bit signatures (exact DuckDB
    # twin above); the engine default stays xxhash64/64-bit, pinned by
    # tests/test_dedup.py planted-dup cases
    pairs = simhash_pairs(d, max_hamming=3, nbits=32, hash_fn=poly_hash)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def _d6_comp_ctes() -> str:
    """The cluster-oracle CTE chain (shared by d6 and c3): edges = d3's
    near-dup pairs (the SAME statement, embedded) ∪ exact-duplicate text
    pairs; components by recursive transitive closure (reach), component
    id = min reachable node. The oracle states the SEMANTICS declaratively
    — the Spark plan's iterative min-label propagation with pointer
    jumping is the physical strategy (closure materialization is O(k²)
    per component; the engine never builds it)."""
    return f"""pairs AS (
      SELECT id_a, id_b FROM ({_d3_pairs_sql(threshold=0.2)})
    ), dup_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM documents a JOIN documents b
        ON a.text = b.text AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
      UNION SELECT id_a, id_b FROM dup_pairs
      UNION SELECT id_b, id_a FROM dup_pairs
    ), reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )"""


def _d6_oracle() -> str:
    """Total doc_id → cluster_id map; docs outside every pair are
    singleton clusters."""
    return f"""
    WITH RECURSIVE {_d6_comp_ctes()}
    SELECT d.doc_id,
           CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


# D6 — duplicate-CLUSTER resolution: transitive closure of the near/exact-dup
# pair graph (near-dup is not transitive — keeping one doc per PAIR
# over-retains; a pipeline keeps one doc per COMPONENT). Engine analog: none
# in the reference; part of the training-data suite.
# Scale: operators/cluster.py — iterative hash-min + pointer jumping,
# O(log diameter) rounds, only (id,label) longs shuffle, min() is map-side
# combinable (hub-safe), lineage cut per round with localCheckpoint.
@query("d6_dedup_clusters", _d6_oracle())
def d6_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.cluster import dedup_clusters
    from louis_crawler_legacy_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    near = ngram_jaccard_pairs(d, threshold=0.2).select("id_a", "id_b")
    # exact-dup edges as a STAR to the min doc of each text group (same
    # components as the oracle's clique form, linear not quadratic edges)
    roots = d.groupBy("text").agg(F.min("doc_id").alias("id_b"))
    exact = (
        d.join(roots, "text")
        .where(F.col("doc_id") != F.col("id_b"))
        .select(F.col("doc_id").alias("id_a"), "id_b")
    )
    return dedup_clusters(d, near.unionByName(exact))


# --- similarity search --------------------------------------------------------

def _queries_df(spark: SparkSession, sf_dir: str):
    e = _t(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@query(
    "s1_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                   greatest(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                            sqrt(list_dot_product(q.qv, q.qv)), 1e-12), 4) AS cos_sim
      FROM embeddings e, q WHERE e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(e, _queries_df(spark, sf_dir), k=5)


# LSH ANN with an EXACT oracle: the random hyperplanes are deterministic
# constants (similarity._hyperplane), so the oracle inlines them as DOUBLE[]
# literals and recomputes the sign-pattern buckets in SQL — the candidate
# set (pairs sharing a bucket in ANY table) and the re-rank are then fully
# derivable. Approximate vs brute force, but bit-reproducible across engines
# (sign flips would need |dot| within float-fold error of 0 — never observed;
# cos itself is rounded to 4 like s1). Spark's min-table pair ownership ≡
# the oracle's SELECT DISTINCT.
def _plane_lit(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _bucket_sql(vec: str, dim: int, n_planes: int, table: int = 0) -> str:
    from louis_crawler_legacy_spark.operators.similarity import _hyperplane

    terms = [
        f"(CASE WHEN list_dot_product({vec}, "
        f"{_plane_lit(_hyperplane(dim, table * 1_000 + i))}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    ]
    return "(" + " + ".join(terms) + ")"


def _s2_oracle(dim: int = 64, n_planes: int = 8, n_tables: int = 4) -> str:
    per_table = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, v, {t} AS tbl, "
        f"{_bucket_sql('v', dim, n_planes, t)} AS bucket FROM c"
        for t in range(n_tables)
    )
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
{per_table}
    ),
    qb AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket FROM cb
           WHERE vec_id < 5),
    cand AS (
      SELECT DISTINCT q.query_id, q.qv, c.vec_id AS neighbor_id, c.v
      FROM cb c JOIN qb q USING (tbl, bucket)
      WHERE c.vec_id <> q.query_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(v, qv) /
                   greatest(sqrt(list_dot_product(v, v)) *
                            sqrt(list_dot_product(qv, qv)), 1e-12), 4) AS cos_sim
      FROM cand
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("s2_lsh_ann_topk", _s2_oracle())
def s2_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.similarity import lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    # the registered oracle inlined dim=64 hyperplane literals; a different
    # embedding dim must fail loudly here, not silently hash-mismatch (or
    # worse, diverge inside DuckDB's list_dot_product on ragged lists)
    assert dim == 64, f"s2 oracle was built for dim=64, data has dim={dim}"
    return lsh_topk(e, _queries_df(spark, sf_dir), dim=dim, k=5, n_planes=8)


# IVF-flat ANN with an EXACT oracle: centroids are the first 8 corpus
# vectors (deterministic, derivable in SQL), cell assignment rounds scores
# to 6 decimals before the argmax so both engines agree, re-rank rounds to
# 4 like s1. A (query, neighbor) pair can't repeat (one cell per vector),
# so both sides are distinct-free.
@query(
    "s4_ivf_topk",
    """
    WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS j, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT corp.vec_id, cent.j,
             round(list_dot_product(v, cv) /
                   greatest(sqrt(list_dot_product(v, v)) *
                            sqrt(list_dot_product(cv, cv)), 1e-12), 6) AS s
      FROM corp, cent
    ),
    cells AS (
      SELECT vec_id, j AS cell FROM (
        SELECT vec_id, j,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, j AS cell FROM (
        SELECT vec_id, j,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j) AS rn
        FROM scored WHERE vec_id < 5
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT q.query_id, cl.vec_id AS neighbor_id
      FROM qprobe q JOIN cells cl ON cl.cell = q.cell
      WHERE cl.vec_id != q.query_id
    ),
    rescored AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(nv.v, qv.v) /
                   greatest(sqrt(list_dot_product(nv.v, nv.v)) *
                            sqrt(list_dot_product(qv.v, qv.v)), 1e-12), 4)
               AS cos_sim
      FROM cand c
      JOIN corp nv ON nv.vec_id = c.neighbor_id
      JOIN corp qv ON qv.vec_id = c.query_id
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM rescored
    ) WHERE rank <= 5
    """,
)
def s4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, _queries_df(spark, sf_dir), n_centroids=8, nprobe=2, k=5)


# Near-dup twin of the s2 oracle: single-table 10-plane buckets, self-join,
# exact cosine verify at the same 4-decimal rounding. One bucket per vector
# → a pair matches at most once, so no DISTINCT is needed on either side.
def _s3_oracle(dim: int = 64, n_planes: int = 10, threshold: float = 0.35) -> str:
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT vec_id, v, {_bucket_sql('v', dim, n_planes)} AS bucket FROM c),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v) /
                   greatest(sqrt(list_dot_product(a.v, a.v)) *
                            sqrt(list_dot_product(b.v, b.v)), 1e-12), 4) AS cos_sim
      FROM cb a JOIN cb b USING (bucket)
      WHERE a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
    """


@query("s3_embedding_near_dup", _s3_oracle())
def s3_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    assert dim == 64, f"s3 oracle was built for dim=64, data has dim={dim}"
    # testdata embeddings are near-orthogonal (max pairwise cos ≈ 0.46 at
    # sf0.01) — 0.35 exercises the operator with a non-empty result
    return embedding_near_dup_pairs(e, dim=dim, threshold=0.35)


# --- multimodal plumbing --------------------------------------------------------

@query(
    "m1_media_metadata",
    """
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n,
                      substr(text, 1, 64) AS prefix FROM documents)
    SELECT doc_id,
           n AS n_bytes,
           CASE WHEN n % 3 != 0 THEN 'image' ELSE 'audio' END AS media_kind,
           (n * 7) % 640 + 16 AS width,
           (n * 13) % 480 + 16 AS height,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, len(prefix)),
                            i -> CAST(ascii(substr(prefix, i, 1)) AS BIGINT))),
             (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
    FROM m
    """,
)
def m1_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.media import decode_media

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return decode_media(d)


# M2 — resize plumbing: fit the fake-decoded dims into a 128×128 box,
# aspect-preserving, never upscaling. The oracle mirrors the Python
# arithmetic operation-for-operation (same IEEE-double division/multiply/
# floor order), so dims and thumbnail size match exactly; the binary
# thumbnail column itself is projected out here (pytest checks it) to
# keep the oracle pure arithmetic.
@query(
    "m2_media_resize",
    """
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    d AS (
      SELECT doc_id, n,
             (n * 7) % 640 + 16 AS w,
             (n * 13) % 480 + 16 AS h
      FROM m
    ), s AS (
      SELECT doc_id, n, w, h,
             least(128 / w, 128 / h, 1.0) AS scale
      FROM d
    ), o AS (
      SELECT doc_id, n, w, h,
             greatest(1, CAST(floor(w * scale) AS INT)) AS out_w,
             greatest(1, CAST(floor(h * scale) AS INT)) AS out_h
      FROM s
    )
    SELECT doc_id, w AS width, h AS height, out_w, out_h,
           CAST(least(n, greatest(1, (out_w * out_h) // 64)) AS INT)
             AS out_n_bytes
    FROM o
    """,
)
def m2_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.media import resize_media

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return resize_media(d, 128, 128).drop("thumbnail")


# M3 — feature-extract plumbing: 8-dim normalized byte histogram over the
# bounded 64-byte prefix (the model-encoder seam's deterministic fake);
# the output array feeds the similarity/ANN operators directly.
@query(
    "m3_media_features",
    """
    WITH m AS (SELECT doc_id, substr(text, 1, 64) AS prefix FROM documents)
    SELECT doc_id,
           list_transform(generate_series(0, 7), k ->
             len(list_filter(generate_series(1, len(prefix)),
                             i -> ascii(substr(prefix, i, 1)) % 8 = k))
             / greatest(len(prefix), 1)) AS feature
    FROM m
    """,
)
def m3_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.media import extract_features

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return extract_features(d)


# --- corpus curation: the training-data operators COMPOSED -----------------

@query("c1_curation_pipeline")
def c1_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style curation in one declarative plan: quality gate + length
    gate (textstats) → exact dedup keeping the min-id copy per text
    (dedup.exact_dedup) → content fingerprint for downstream incremental
    recrawl. Everything is native columns + ONE window shuffle on the
    dedup key — at 100 TB the gates run inside the scan (predicate
    evaluation, no UDF) and the dedup is the only exchange."""
    from louis_crawler_legacy_spark.operators import textstats as ts
    from louis_crawler_legacy_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id", "text",
        ts.quality_score(F.col("text")).alias("quality"),
        ts.token_count_ws(F.col("text")).alias("ws_tokens"),
    ).filter((F.col("quality") >= 0.6) & (F.col("ws_tokens") >= 20))
    kept = exact_dedup(gated, text_col="text", id_col="doc_id")
    return kept.select(
        "doc_id", "quality", "ws_tokens",
        ts.fingerprint(F.col("text")).alias("fp"),
    )


def _register_curation_oracle() -> None:
    from louis_crawler_legacy_spark.operators import textstats as ts

    ORACLES["c1_curation_pipeline"] = f"""
    WITH gated AS (
      SELECT doc_id, text,
             {ts.ORACLE_QUALITY} AS quality,
             {ts.ORACLE_TOKEN_WS} AS ws_tokens
      FROM documents
    ),
    kept AS (
      SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM gated WHERE quality >= 0.6 AND ws_tokens >= 20
    )
    SELECT doc_id, quality, ws_tokens, {ts.ORACLE_FINGERPRINT} AS fp
    FROM kept WHERE rn = 1
    """


_register_curation_oracle()


# C2 — deterministic stratified sampling (operators/sampling.py): keep-decision
# is a hash of the ROW key, so the sample is retry/rerun/partitioning-stable
# and nested across rates — df.sample()'s per-task RNG is none of those.
# Scale: a narrow filter in the scan stage; per-stratum rates are one CASE
# threshold, no join, no shuffle, no RNG state.
@query("c2_stratified_sample")
def c2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.sampling import (
        stratified_hash_sample,
    )

    d = _t(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        d,
        key=F.col("doc_id"),
        strata_col="lang",
        rates={"en": 0.5, "fr": 0.25},
        default_rate=0.1,
        salt="s1",
    )
    return out.select("doc_id", "lang")


def _register_sampling_oracle() -> None:
    from louis_crawler_legacy_spark.operators.sampling import (
        oracle_hash_bucket,
    )

    bucket = oracle_hash_bucket("doc_id", salt="s1")
    ORACLES["c2_stratified_sample"] = f"""
    SELECT doc_id, lang FROM documents
    WHERE {bucket} < CASE WHEN lang = 'en' THEN 5000
                          WHEN lang = 'fr' THEN 2500
                          ELSE 1000 END
    """


_register_sampling_oracle()


# C3 — canonical selection per duplicate cluster: dedup (d6 components) is
# only half the curation decision — WHICH copy survives matters; keep the
# best-quality doc (min doc_id on ties). Composes cluster + textstats in one
# plan: the components loop shuffles (id,label) longs, then ONE max_by
# aggregate (partial-agg combinable) picks keepers — documents never shuffle
# (quality is computed in the scan, only (cluster_id, doc_id, quality) moves).
@query("c3_cluster_canonical")
def c3_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    clusters = d6_dedup_clusters(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ts.quality_score(F.col("text")).alias("quality")
    )
    scored = d.join(clusters, "doc_id")
    return scored.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"),
        F.expr("max_by(doc_id, struct(quality, -doc_id))").alias("keeper_id"),
        F.max("quality").alias("keeper_quality"),
    )


def _register_cluster_canonical_oracle() -> None:
    from louis_crawler_legacy_spark.operators import textstats as ts

    ORACLES["c3_cluster_canonical"] = f"""
    WITH RECURSIVE {_d6_comp_ctes()}, total AS (
      SELECT d.doc_id,
             CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
             {ts.ORACLE_QUALITY} AS quality
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    ), agg AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
             max(quality) AS keeper_quality
      FROM total GROUP BY cluster_id
    )
    SELECT a.cluster_id, a.n_docs, min(t.doc_id) AS keeper_id,
           a.keeper_quality
    FROM agg a JOIN total t
      ON t.cluster_id = a.cluster_id AND t.quality = a.keeper_quality
    GROUP BY a.cluster_id, a.n_docs, a.keeper_quality
    """


_register_cluster_canonical_oracle()


# C4 — benchmark decontamination: flag corpus docs sharing word 3-grams
# with a held-out eval set (here a deterministic doc_id % 19 = 7 slice of
# the same table — the driver corpus has no separate benchmark file; the
# operator takes any eval DataFrame). Eval shingles broadcast; corpus
# probes in place; the only exchange is the per-doc count aggregate.
@query(
    "c4_decontaminate",
    r"""
    WITH sh AS (
      SELECT doc_id, trim(text) AS t,
             string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))
             ELSE [t] END AS sh
      FROM sh
    ), ev AS (
      SELECT DISTINCT unnest(sh) AS s FROM shingled WHERE doc_id % 19 = 7
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM (SELECT doc_id, unnest(sh) AS s FROM shingled
          WHERE doc_id % 19 <> 7) c
    JOIN ev USING (s)
    GROUP BY c.doc_id
    """,
)
def c4_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators.dedup import contamination

    d = _t(spark, sf_dir, "documents")
    ev = d.where(F.col("doc_id") % 19 == 7)
    corpus = d.where(F.col("doc_id") % 19 != 7)
    return contamination(corpus, ev)


# oracles for t2/t3/t4 are built from the SAME fragments the Spark
# implementations document (operators/textstats.py) so they evolve together
def _register_textstat_oracles() -> None:
    from louis_crawler_legacy_spark.operators import textstats as ts

    ORACLES["t2_lang_id"] = (
        f"SELECT doc_id, {ts.oracle_lang_id()} AS pred_lang FROM documents"
    )
    ORACLES["t3_quality_score"] = (
        f"SELECT doc_id, {ts.ORACLE_QUALITY} AS quality FROM documents"
    )
    ORACLES["t4_fingerprint"] = (
        f"SELECT doc_id, {ts.ORACLE_FINGERPRINT} AS fp FROM documents"
    )


_register_textstat_oracles()


# T6 — repetition/boilerplate report (Gopher §A1.1-style quality signals):
# duplicate-word fraction + most-frequent-bigram fraction per doc.
@query(
    "t6_repetition",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), g AS (
      SELECT doc_id,
             round(1.0 - len(list_distinct(w))::DOUBLE
                   / greatest(len(w), 1), 4) AS dup_word_frac,
             CASE WHEN len(w) >= 2 THEN
               list_transform(generate_series(1, len(w) - 1),
                 i -> concat(w[i], ' ', w[i+1]))
             ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM w
    ), c AS (
      SELECT doc_id, gram, count(*) AS c
      FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
      GROUP BY doc_id, gram
    ), p AS (
      SELECT doc_id, max(c) AS top, sum(c) AS tot FROM c GROUP BY doc_id
    )
    SELECT g.doc_id, g.dup_word_frac,
           coalesce(round(p.top::DOUBLE / p.tot, 4), 0.0) AS top_bigram_frac
    FROM g LEFT JOIN p USING (doc_id)
    """,
)
def t6_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return ts.repetition_stats(d).withColumnRenamed("id", "doc_id")


# --- derived pipelines (SURVEY §3.3): hawn chunks + kurt embedding queue ----

@query("p1_hawn_chunks")  # rows-only (chunker is not SQL-expressible)
def p1_hawn_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.plans.pipelines import hawn_pipeline

    pages = _docs_as_html(spark, sf_dir).withColumnRenamed("html", "html_content")
    return hawn_pipeline(pages, id_col="url", html_col="html_content").select(
        "id", "url", "chunk_idx", "title", "token_count"
    )


# Exact oracle for the hawn chunker's conserved quantities. Per doc the
# synthetic page is one h1-block ("Doc {id} {text}"); the chunker emits
#  n<256   → 1 chunk via parent-climb, title = the <title> text 'doc {id}'
#  256-512 → 1 chunk as-is,        title = the <h1> text   'Doc {id}'
#  >512    → sentence-split + 409-bucket first-fit, every chunk titled
#            'Doc {id}'; bucketing isn't SQL, but token MASS is conserved:
#            sentences drop exactly the '.' pieces, so sum(token_count)
#            = full_count − n_periods.
# Token counts are StableHashEncoder semantics (functions/tokenizer.py):
# per regex piece [A-Za-z0-9]+|[^\sA-Za-z0-9], ceil(len/8) tokens.
@query(
    "p1b_hawn_token_mass",
    """
    WITH t AS (
      SELECT doc_id,
             concat('Doc ', CAST(doc_id AS VARCHAR), ' ', text) AS ftxt
      FROM documents
    ), c AS (
      SELECT doc_id,
             list_sum(list_transform(
               regexp_extract_all(ftxt, '[A-Za-z0-9]+|[^\\sA-Za-z0-9]'),
               p -> CAST(ceil(len(p) / 8.0) AS BIGINT))) AS n,
             len(ftxt) - len(replace(ftxt, '.', '')) AS dots
      FROM t
    )
    SELECT concat('http://corpus.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
           CASE WHEN n > 512 THEN concat('Doc ', CAST(doc_id AS VARCHAR))
                WHEN n >= 256 THEN concat('Doc ', CAST(doc_id AS VARCHAR))
                ELSE concat('doc ', CAST(doc_id AS VARCHAR)) END AS title,
           CAST(CASE WHEN n > 512 THEN n - dots ELSE n END AS BIGINT)
             AS total_tokens
    FROM c
    """,
)
def p1b_hawn_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.plans.pipelines import hawn_pipeline

    pages = _docs_as_html(spark, sf_dir).withColumnRenamed("html", "html_content")
    chunks = hawn_pipeline(pages, id_col="url", html_col="html_content")
    return chunks.groupBy("url").agg(
        F.min("title").alias("title"),
        F.sum("token_count").alias("total_tokens"),
    )


@query("p2_kurt_embeddings")  # rows-only
def p2_kurt_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from louis_crawler_legacy_spark.plans.pipelines import (
        hawn_pipeline,
        kurt_pipeline,
    )

    pages = _docs_as_html(spark, sf_dir).withColumnRenamed("html", "html_content")
    chunks = hawn_pipeline(pages, id_col="url", html_col="html_content")
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("token_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("embedding_model", T.StringType()),
            ]
        ),
    )
    emb = kurt_pipeline(chunks, empty)
    return emb.select(
        "token_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            3,
        ).alias("norm_sq"),
        "embedding_model",
    )


# --- streaming op (batch twin): watermarked tumbling-window aggregate ------
# The same plan runs under writeStream (tests/test_streaming.py proves
# batch/stream equivalence); the oracle mirrors it with date_trunc.

@query(
    "st1_windowed_events",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS cnt,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def st1_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from louis_crawler_legacy_spark.streaming.events import windowed_event_counts

    return windowed_event_counts(_t(spark, sf_dir, "events"), window="1 hour")
