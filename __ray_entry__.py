"""Driver contract for the graft builder (Ray Data target).

entry(): flagship KG-construction pipeline on sf0.001 (returns the triples
Dataset). queries(): one entry per implemented operator/pipeline from
SURVEY.md §2 + the training-data ops; each callable takes sf_dir. oracle_sql():
the DuckDB-equivalent SQL per query (omitted for ops whose outputs contain
engine-side hashes — skolem labels, minhash/simhash values — which SQL cannot
reproduce; those get the weaker rows-only check).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from jena_ray import vocab as V

# ---------------------------------------------------------------------------
# shared oracle-SQL fragments
# ---------------------------------------------------------------------------

_XSD = "http://www.w3.org/2001/XMLSchema#"

# the KG extraction rules as SQL (mirrors jena_ray.stages.annotate.page_triples
# minus the skolemized blank-node provenance, which SQL cannot reproduce)
_TRIPLES_CTE = f"""
docs AS (
  SELECT doc_id, source, lang, n_chars,
         'http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS durl,
         string_split(text, ' ') AS ts
  FROM documents
),
alias(word, eid) AS {V.alias_sql_values()},
tok AS (
  SELECT doc_id, durl, generate_subscripts(ts, 1) - 1 AS pos, unnest(ts) AS w
  FROM docs
),
ment AS (
  SELECT t.doc_id, t.durl, t.pos, a.eid
  FROM tok t JOIN alias a ON t.w = a.word
),
meta AS (
  SELECT '<' || durl || '>' AS subj,
         '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>' AS pred,
         '<{V.C_DOCUMENT}>' AS obj FROM docs
  UNION ALL
  SELECT '<' || durl || '>', '<{V.P_LANG}>', '"' || lang || '"' FROM docs
  UNION ALL
  SELECT '<' || durl || '>', '<{V.P_SOURCE}>', '<{V.SRC}' || source || '>' FROM docs
  UNION ALL
  SELECT '<' || durl || '>', '<{V.P_CHARS}>',
         '"' || CAST(n_chars AS VARCHAR) || '"^^<{_XSD}integer>' FROM docs
  UNION ALL
  SELECT '<' || durl || '>', '<{V.P_CRAWLTS}>',
         '"' || strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                         '%Y-%m-%dT%H:%M:%S') || 'Z"^^<{_XSD}dateTime>' FROM docs
),
mention_t AS (
  SELECT DISTINCT '<' || durl || '>' AS subj, '<{V.P_MENTIONS}>' AS pred,
         '<{V.ENT}' || eid || '>' AS obj FROM ment
),
rel_t AS (
  SELECT DISTINCT '<{V.ENT}' || m1.eid || '>' AS subj,
         '<{V.P_COOCCURS}>' AS pred,
         '<{V.ENT}' || m2.eid || '>' AS obj
  FROM ment m1 JOIN ment m2 ON m1.doc_id = m2.doc_id AND m2.pos = m1.pos + 1
),
triples AS (
  SELECT DISTINCT subj, pred, obj FROM (
    SELECT * FROM meta
    UNION ALL SELECT * FROM mention_t
    UNION ALL SELECT * FROM rel_t
  )
)
"""

_NS_SQL = """
CASE WHEN length(regexp_extract(iri, '^(.*#)', 1)) > 7 THEN regexp_extract(iri, '^(.*#)', 1)
     WHEN length(regexp_extract(iri, '^(.*/)', 1)) > 7 THEN regexp_extract(iri, '^(.*/)', 1)
     ELSE iri END
"""


# ---------------------------------------------------------------------------
# driver API
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages → extract → annotate → canonicalize
    → dedup; returns the triples Dataset (incl. skolemized bnodes)."""
    from jena_ray.pipelines.kg import kg_triples_dataset

    return kg_triples_dataset("/root/testdata/sf0.001", include_bnodes=True)


def _kg_triples(sf_dir: str):
    from jena_ray.pipelines.kg import kg_triples_dataset

    return kg_triples_dataset(sf_dir, include_bnodes=False)


def queries() -> dict[str, Callable[[str], Any]]:
    from jena_ray.functions import ann, dedup_ops, textops
    from jena_ray.pipelines import relational as R
    from jena_ray.pipelines import stats as S
    from jena_ray.pipelines.kg import kg_triples_dataset

    def kg_triples(sf_dir):
        return _kg_triples(sf_dir)

    def kg_triples_all(sf_dir):  # rows-only: includes skolemized bnodes
        return kg_triples_dataset(sf_dir, include_bnodes=True)

    def kg_predicate_counts(sf_dir):
        return S.predicate_counts(_kg_triples(sf_dir)).sort("pred")

    def kg_node_counts(sf_dir):
        return S.node_counts(_kg_triples(sf_dir)).sort(["node", "position"])

    def kg_namespace_counts(sf_dir):
        return S.namespace_counts(_kg_triples(sf_dir)).sort("namespace")

    def kg_type_counts(sf_dir):
        return S.type_counts(_kg_triples(sf_dir)).sort("obj")

    def kg_char_sets(sf_dir):
        return S.characteristic_sets(_kg_triples(sf_dir)).sort("pred_set")

    return {
        # --- KG construction + elephas-style stats (SURVEY §2.1-2.7, §3.3) ---
        "kg_triples": kg_triples,
        "kg_triples_all": kg_triples_all,
        "kg_predicate_counts": kg_predicate_counts,
        "kg_node_counts": kg_node_counts,
        "kg_namespace_counts": kg_namespace_counts,
        "kg_type_counts": kg_type_counts,
        "kg_char_sets": kg_char_sets,
        # --- relational operator parity (SURVEY §2.4-2.6) ---
        "q1_pricing_summary": R.q1_pricing_summary,
        "agg_minmax_orders": R.agg_minmax_orders,
        "revenue_by_nation": R.revenue_by_nation,
        "lineitem_order_join": R.lineitem_order_join,
        "customers_without_orders": R.customers_without_orders,
        "customers_with_orders_semi": R.customers_with_orders_semi,
        "top10_orders": R.top10_orders,
        "distinct_segments": R.distinct_segments,
        "union_parties": R.union_parties,
        "filter_project_lineitem": R.filter_project_lineitem,
        "events_tumbling_window": R.events_tumbling_window,
        "events_sessionize": R.events_sessionize,
        # --- training-data ops ---
        "exact_dedup_docs": dedup_ops.exact_dedup_docs,
        "minhash_candidate_pairs": dedup_ops.minhash_candidate_pairs,
        "verified_near_dups": dedup_ops.verified_near_dups,
        "simhash_docs": dedup_ops.simhash_docs,
        "quality_scores": textops.quality_scores,
        "language_id": textops.language_id,
        "token_counts": textops.token_counts,
        "doc_fingerprints": textops.doc_fingerprints,
        "ann_topk": lambda sf: ann.brute_force_topk(sf)[["query_id", "rank", "vec_id"]],
        "ann_lsh_buckets": ann.lsh_buckets,
        "embedding_near_dups": ann.embedding_near_dups,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_triples": f"WITH {_TRIPLES_CTE} SELECT subj, pred, obj FROM triples",
        "kg_predicate_counts": f"""
            WITH {_TRIPLES_CTE}
            SELECT pred, count(*) AS "count" FROM triples GROUP BY pred ORDER BY pred
        """,
        "kg_node_counts": f"""
            WITH {_TRIPLES_CTE}
            SELECT node, position, count(*) AS "count" FROM (
              SELECT subj AS node, 's' AS position FROM triples
              UNION ALL SELECT pred, 'p' FROM triples
              UNION ALL SELECT obj, 'o' FROM triples
            ) GROUP BY node, position ORDER BY node, position
        """,
        "kg_namespace_counts": f"""
            WITH {_TRIPLES_CTE},
            iris AS (
              SELECT substr(node, 2, length(node) - 2) AS iri FROM (
                SELECT subj AS node FROM triples
                UNION ALL SELECT pred FROM triples
                UNION ALL SELECT obj FROM triples
              ) WHERE node LIKE '<%'
            )
            SELECT {_NS_SQL} AS namespace, count(*) AS "count"
            FROM iris GROUP BY namespace ORDER BY namespace
        """,
        "kg_type_counts": f"""
            WITH {_TRIPLES_CTE}
            SELECT obj, count(*) AS "count" FROM triples
            WHERE pred = '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'
            GROUP BY obj ORDER BY obj
        """,
        "kg_char_sets": f"""
            WITH {_TRIPLES_CTE},
            sets AS (
              SELECT subj, string_agg(DISTINCT pred, '|' ORDER BY pred) AS pred_set
              FROM triples GROUP BY subj
            )
            SELECT pred_set, count(*) AS "count" FROM sets GROUP BY pred_set ORDER BY pred_set
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_cents,
                   CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS sum_revenue_cents,
                   round(avg(l_discount), 6) AS avg_discount,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "agg_minmax_orders": """
            SELECT o_orderpriority, min(o_totalprice) AS min_price,
                   max(o_totalprice) AS max_price, round(avg(o_totalprice), 6) AS avg_price,
                   count(*) AS n
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "revenue_by_nation": """
            SELECT n.n_name, CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS revenue_cents, count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "lineitem_order_join": """
            SELECT o.o_orderstatus,
                   CAST(round(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100) AS BIGINT) AS revenue_cents,
                   count(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
            ORDER BY c_custkey
        """,
        "customers_with_orders_semi": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "top10_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC LIMIT 10
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
            ORDER BY c_mktsegment, c_nationkey
        """,
        "union_parties": """
            SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
            UNION ALL
            SELECT s_name, s_acctbal, 'supplier' FROM supplier
            ORDER BY kind, name
        """,
        "filter_project_lineitem": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity > 45.0 AND l_discount < 0.05
            ORDER BY l_orderkey, l_linenumber
        """,
        "events_tumbling_window": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_micros, count(*) AS n_events
            FROM events GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "events_sessionize": """
            SELECT event_id, user_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_idx
            FROM events ORDER BY user_id, run_idx
        """,
        "exact_dedup_docs": """
            SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY text_md5 ORDER BY text_md5
        """,
        "quality_scores": """
            WITH t AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
            ),
            s AS (
              SELECT doc_id, count(*) AS n_tokens,
                     sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) AS stops,
                     count(DISTINCT w) AS dist
              FROM t GROUP BY doc_id
            )
            SELECT d.doc_id, s.n_tokens,
                   (length(d.text) - (s.n_tokens - 1)) * 1.0 / s.n_tokens AS mean_tok_len,
                   s.stops * 1.0 / s.n_tokens AS stopword_ratio,
                   s.dist * 1.0 / s.n_tokens AS distinct_ratio
            FROM documents d JOIN s USING (doc_id) ORDER BY d.doc_id
        """,
        "language_id": """
            SELECT doc_id, lang,
                   CASE WHEN list_contains(string_split(text, ' '), 'the')
                          OR list_contains(string_split(text, ' '), 'a')
                        THEN 'en' ELSE 'other' END AS pred_lang,
                   CASE WHEN (CASE WHEN list_contains(string_split(text, ' '), 'the')
                                     OR list_contains(string_split(text, ' '), 'a')
                                   THEN 'en' ELSE 'other' END) = lang
                        THEN 1 ELSE 0 END AS agree
            FROM documents ORDER BY doc_id
        """,
        "token_counts": """
            SELECT w AS token, count(*) AS "count"
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY w ORDER BY w
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
            s AS (
              SELECT q.qid AS query_id, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS cos
              FROM q, embeddings e WHERE e.vec_id <> q.qid
            ),
            r AS (
              SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id ASC) AS rank
              FROM s
            )
            SELECT query_id, rank, vec_id FROM r WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        # rows-only (engine-side hashes not reproducible in SQL):
        # kg_triples_all, minhash_candidate_pairs, verified_near_dups,
        # simhash_docs, doc_fingerprints, ann_lsh_buckets, embedding_near_dups
    }
