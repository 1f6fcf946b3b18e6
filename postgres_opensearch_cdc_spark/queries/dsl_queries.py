"""Request-body DSL JSON executed through the dsl.py compiler, each
value-checked against handwritten DuckDB SQL — verifying the THIRD
query interface (raw OpenSearch request bodies) end to end. The JSON
below is exactly what a reference dashboard panel posts
(DASHBOARD_GUIDE.md:30-135)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postgres_opensearch_cdc_spark.dsl import search

DSL_BOOL_AGG = {
    "query": {
        "bool": {
            "must": [{"term": {"event_type": "purchase"}}],
            "filter": [
                {"range": {"value": {"gte": 100}}},
                {"range": {"ts": {"gte": "2024-01-05", "lt": "2024-01-25"}}},
            ],
        }
    },
    "aggs": {
        "by_user": {
            "terms": {"field": "user_id", "size": 5},
            "aggs": {
                "avg_value": {"avg": {"field": "value"}},
                "users_seen": {"value_count": {"field": "event_id"}},
            },
        }
    },
}

DSL_SHOULD_HITS = {
    "query": {
        "bool": {
            "should": [
                {"match": {"text": "spark streaming"}},
                {"prefix": {"source": "src1"}},
            ],
            "minimum_should_match": 2,
            "must_not": [{"term": {"lang": "zh"}}],
        }
    },
    "_source": ["doc_id", "source", "n_chars"],
    "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
    "size": 20,
}

DSL_DATE_HISTOGRAM = {
    "query": {"terms": {"event_type": ["purchase", "signup"]}},
    "aggs": {
        "per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"total": {"sum": {"field": "value"}}},
        }
    },
}


def dsl_bool_filtered_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool must+filter (term, numeric range, date range that prunes
    the scan) feeding a terms bucket with avg + value_count metrics —
    the canonical dashboard panel body."""
    return search(spark, sf_dir, "events", DSL_BOOL_AGG, id_col="event_id")


def dsl_should_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool should with minimum_should_match=2 plus must_not, hits mode
    with _source projection, explicit sort, and size."""
    return search(spark, sf_dir, "documents", DSL_SHOULD_HITS)


def dsl_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms query + date_histogram bucket with a sum metric."""
    return search(spark, sf_dir, "events", DSL_DATE_HISTOGRAM, id_col="event_id")


DSL_HISTOGRAM = {
    "aggs": {
        "val_bucket": {
            "histogram": {"field": "value", "interval": 100},
            "aggs": {"max_v": {"max": {"field": "value"}}},
        }
    }
}

DSL_FILTERS_RANGE = {
    "query": {"exists": {"field": "value"}},
    "aggs": {
        "bands": {
            "range": {
                "field": "value",
                "ranges": [
                    {"to": 100},
                    {"from": 50, "to": 300},
                    {"from": 300},
                ],
            }
        }
    },
}


def dsl_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numeric histogram bucket (fixed interval) with a max metric."""
    return search(spark, sf_dir, "events", DSL_HISTOGRAM, id_col="event_id")


def dsl_range_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range aggregation with OVERLAPPING independent buckets — each
    range counts every matching doc (ES semantics), one conditional-
    sum pass, no second scan."""
    return search(spark, sf_dir, "events", DSL_FILTERS_RANGE, id_col="event_id")


DSL_FILTERS_NAMED = {
    "aggs": {
        "segments": {
            "filters": {
                "filters": {
                    "errors": {"term": {"event_type": "error"}},
                    "big_purchases": {
                        "bool": {
                            "must": [
                                {"term": {"event_type": "purchase"}},
                                {"range": {"value": {"gte": 300}}},
                            ]
                        }
                    },
                    "early_january": {
                        "range": {"ts": {"lt": "2024-01-08"}}
                    },
                }
            }
        }
    }
}


def dsl_filters_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named ``filters`` buckets — each an arbitrary sub-query
    (term, bool+range, date range), all counted in ONE conditional
    aggregate pass."""
    return search(spark, sf_dir, "events", DSL_FILTERS_NAMED, id_col="event_id")


DSL_NESTED_DAY_TYPE = {
    "aggs": {
        "per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "etype": {
                    "terms": {"field": "event_type", "size": 3},
                    "aggs": {"sum_v": {"sum": {"field": "value"}}},
                }
            },
        }
    }
}

DSL_TOP_HITS_BY_TYPE = {
    "query": {"range": {"value": {"gte": 200}}},
    "aggs": {
        "by_type": {
            "terms": {"field": "event_type"},
            "aggs": {
                "top": {
                    "top_hits": {
                        "size": 2,
                        "sort": [
                            {"value": {"order": "desc"}},
                            {"event_id": {"order": "asc"}},
                        ],
                        "_source": ["event_id", "user_id", "value"],
                    }
                }
            },
        }
    },
}

DSL_COMPOSITE_AFTER = {
    "aggs": {
        "pages": {
            "composite": {
                "size": 50,
                "sources": [
                    {"etype": {"terms": {"field": "event_type"}}},
                    {"uid": {"terms": {"field": "user_id"}}},
                ],
                "after": {"etype": "purchase", "uid": 40},
            }
        }
    }
}


def dsl_nested_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_histogram with a NESTED terms sub-bucket (top-3 event
    types per day + per-pair avg) — the stacked-bar panel body. One
    flat row per (day, type); ranking runs on the post-aggregate
    frame only."""
    return search(spark, sf_dir, "events", DSL_NESTED_DAY_TYPE,
                  id_col="event_id")


def dsl_top_hits_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms bucket with a ``top_hits`` sub-agg — the top-2 documents
    per event type by value, via a per-bucket ranked window (partition-
    parallel, no global sort)."""
    return search(spark, sf_dir, "events", DSL_TOP_HITS_BY_TYPE,
                  id_col="event_id")


def dsl_composite_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``composite`` agg with an ``after`` cursor — keyset pagination
    over the (event_type, user_id) space. The cursor compiles to a
    lexicographic predicate BEFORE the aggregate, so each page only
    shuffles keys past the cursor."""
    return search(spark, sf_dir, "events", DSL_COMPOSITE_AFTER,
                  id_col="event_id")


def dsl_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``knn`` request-body clause with a boolean pre-filter — vector
    search through the THIRD interface: the body carries the raw query
    vector (as a client would paste it), the filter prunes before
    scoring, and the plan is the exact-cosine scan projection +
    TakeOrderedAndProject."""
    from postgres_opensearch_cdc_spark.registry import load_table
    from pyspark.sql import functions as F

    vecs = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in vecs.filter(F.col("vec_id") == 0).head()["embedding"]]
    body = {
        "query": {
            "bool": {
                "must": [{"range": {"label": {"gte": 1}}}],
                "must_not": [{"ids": {"values": [0]}}],
            }
        },
        "knn": {"embedding": {"query_vector": q, "k": 10}},
    }
    return search(spark, sf_dir, "embeddings", body, id_col="vec_id")


DSL_RANGE_METRICS = {
    "query": {"exists": {"field": "value"}},
    "aggs": {
        "bands": {
            "range": {
                "field": "value",
                "ranges": [
                    {"to": 100},
                    {"from": 100, "to": 300},
                    {"from": 300},
                ],
            },
            "aggs": {"sum_v": {"sum": {"field": "value"}}},
        }
    },
}


def dsl_range_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range buckets WITH metric sub-aggs: per-range doc_count and a
    conditional sum, all in one aggregate pass (no per-range rescan)."""
    return search(spark, sf_dir, "events", DSL_RANGE_METRICS,
                  id_col="event_id")


DSL_WEEK_HISTOGRAM = {
    "aggs": {
        "per_week": {
            "date_histogram": {"field": "ts", "calendar_interval": "week"},
            "aggs": {"total": {"sum": {"field": "value"}}},
        }
    }
}


def dsl_week_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calendar_interval: week (Monday-start in both engines) with a
    sum metric — the widened calendar set."""
    return search(spark, sf_dir, "events", DSL_WEEK_HISTOGRAM,
                  id_col="event_id")


DSL_TERMS_ORDERED = {
    "aggs": {
        "by_type": {
            "terms": {
                "field": "event_type",
                "size": 4,
                "order": {"total_v": "desc"},
            },
            "aggs": {"total_v": {"sum": {"field": "value"}}},
        }
    }
}


def dsl_terms_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms bucket ordered by a metric sub-agg (ES ``order``) instead
    of doc_count — top types by total value."""
    return search(spark, sf_dir, "events", DSL_TERMS_ORDERED,
                  id_col="event_id")


DSL_SEARCH_AFTER = {
    "query": {"term": {"event_type": "view"}},
    "_source": ["event_id", "user_id", "value"],
    "sort": [{"value": {"order": "desc"}}, {"event_id": {"order": "asc"}}],
    "search_after": [250.0, 100],
    "size": 20,
}


def dsl_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``search_after`` hits pagination: strictly-after the cursor
    tuple under a mixed-direction sort, compiled to a scan-pushable
    lexicographic predicate — constant driver state per page (the hits
    counterpart of the composite cursor)."""
    return search(spark, sf_dir, "events", DSL_SEARCH_AFTER,
                  id_col="event_id")


DSL_COMPOSITE_DESC = {
    "aggs": {"page": {"composite": {
        "sources": [
            {"et": {"terms": {"field": "event_type", "order": "desc"}}},
            {"u": {"terms": {"field": "user_id"}}},
        ],
        "size": 40,
        "after": {"et": "signup", "u": 3},
    }}}
}


def dsl_composite_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """composite pagination with a DESC source: the after-cursor walks
    strictly downward on the desc key while the asc source continues
    forward inside ties — both directions honored in one
    lexicographic, scan-pushed predicate."""
    return search(spark, sf_dir, "events", DSL_COMPOSITE_DESC,
                  id_col="event_id")


DSL_NESTED_ORDERED = {
    "aggs": {"day_type": {
        "terms": {"field": "event_type", "order": {"_key": "asc"},
                  "size": 3, "min_doc_count": 2},
        "aggs": {"top_user": {"terms": {"field": "user_id", "size": 2},
                              "aggs": {"avg_v": {"avg": {"field": "value"}}}}},
    }}
}


def dsl_nested_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nested terms with outer order by _key asc + min_doc_count —
    the outer options the flat path honors, now honored with a
    sub-bucket too (per-(outer,inner) flat rows)."""
    return search(spark, sf_dir, "events", DSL_NESTED_ORDERED,
                  id_col="event_id")


DSL_FILTERS_METRICS = {
    "aggs": {
        "segments": {
            "filters": {"filters": {
                "clicks": {"term": {"event_type": "click"}},
                "big_values": {"range": {"value": {"gte": 300}}},
                "week1": {"range": {"ts": {"lt": "2024-01-08"}}},
            }},
            "aggs": {
                "avg_value": {"avg": {"field": "value"}},
                "users": {"cardinality": {"field": "user_id"}},
            },
        }
    }
}


def dsl_filters_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters agg WITH metric sub-aggs: one pass of per-bucket
    conditional aggregates (avg + cardinality guarded by each named
    filter), then unpivot — overlapping buckets each count their own
    matches, single scan."""
    return search(spark, sf_dir, "events", DSL_FILTERS_METRICS,
                  id_col="event_id")


DSL_FROM_SIZE = {
    "query": {"range": {"n_chars": {"gte": 100}}},
    "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
    "from": 20,
    "size": 10,
    "_source": ["doc_id", "source", "n_chars"],
    "track_total_hits": True,
}


def dsl_from_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset pagination — the ``from``/``size`` window every pasted
    dashboard body uses (page 3 of a ranked table, with a tiebreaking
    sort so pages are a deterministic partition of the result).
    track_total_hits rides along as the lossless no-op. Compiles to
    Limit(Offset(Sort)): one ranked pass, no driver-side paging
    state."""
    return search(spark, sf_dir, "documents", DSL_FROM_SIZE)


DSL_HIGHLIGHT = {
    "query": {"bool": {
        "must": [{"match": {"text": "stream processing"}}],
        "filter": [{"term": {"lang": "en"}}],
    }},
    "highlight": {"fields": {"text": {}}},
    "sort": [{"doc_id": "asc"}],
    "_source": ["doc_id", "n_chars"],
}


def dsl_body_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``highlight`` as a request-body key: the ±3-token fragment
    around the query's positive terms on the highlighted field,
    returned NEXT TO the projected _source columns — the reference
    Dashboards body shape (DASHBOARD_GUIDE.md:84-110), previously only
    reachable as a standalone query entry."""
    return search(spark, sf_dir, "documents", DSL_HIGHLIGHT)


DSL_SUGGEST = {
    "suggest": {
        "fix_typo": {
            "text": "smat",
            "term": {"field": "text", "size": 8},
        }
    }
}


def dsl_body_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``suggest`` as a request-body key: the term (did-you-mean)
    suggester over the corpus vocabulary — edit distance <= 2, ES
    default min_word_length/prefix_length, ranked by similarity then
    document frequency. The levenshtein runs on the aggregated
    vocabulary, never per corpus row."""
    return search(spark, sf_dir, "documents", DSL_SUGGEST)


QUERIES = {
    "dsl_from_size": dsl_from_size,
    "dsl_body_highlight": dsl_body_highlight,
    "dsl_body_suggest": dsl_body_suggest,
    "dsl_bool_filtered_terms": dsl_bool_filtered_terms,
    "dsl_should_hits": dsl_should_hits,
    "dsl_date_histogram": dsl_date_histogram,
    "dsl_value_histogram": dsl_value_histogram,
    "dsl_range_buckets": dsl_range_buckets,
    "dsl_filters_named": dsl_filters_named,
    "dsl_nested_day_type": dsl_nested_day_type,
    "dsl_top_hits_by_type": dsl_top_hits_by_type,
    "dsl_composite_after": dsl_composite_after,
    "dsl_knn_query": dsl_knn_query,
    "dsl_search_after": dsl_search_after,
    "dsl_range_metrics": dsl_range_metrics,
    "dsl_week_histogram": dsl_week_histogram,
    "dsl_terms_ordered": dsl_terms_ordered,
    "dsl_composite_desc": dsl_composite_desc,
    "dsl_nested_ordered": dsl_nested_ordered,
    "dsl_filters_metrics": dsl_filters_metrics,
}

ORACLE = {
    "dsl_from_size": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE n_chars >= 100
        ORDER BY n_chars DESC, doc_id ASC
        LIMIT 10 OFFSET 20
    """,
    "dsl_body_highlight": r"""
        SELECT doc_id, n_chars,
               regexp_extract(text,
                 '(?i)(?:^| )((?:\S+ ){0,3}(?:stream|processing)(?: \S+){0,3})(?: |$)',
                 1)
                 AS highlight_text
        FROM documents
        WHERE lang = 'en'
          AND (regexp_matches(lower(text), '\bstream\b')
               OR regexp_matches(lower(text), '\bprocessing\b'))
        ORDER BY doc_id
    """,
    "dsl_body_suggest": r"""
        WITH vocab AS (
            SELECT tok AS term, COUNT(*) AS doc_freq
            FROM (
                SELECT unnest(list_distinct(
                    regexp_split_to_array(lower(text), '\s+'))) AS tok
                FROM documents
            )
            GROUP BY tok
        )
        SELECT term, doc_freq,
               CAST(levenshtein(term, 'smat') AS INT) AS distance
        FROM vocab
        WHERE levenshtein(term, 'smat') BETWEEN 1 AND 2
          AND length(term) >= 4
          AND substring(term, 1, 1) = 's'
        ORDER BY distance, doc_freq DESC, term
        LIMIT 8
    """,
    "dsl_filters_metrics": """
        WITH w AS (
          SELECT
            CAST(SUM((event_type = 'click')::LONG) AS BIGINT) AS f0,
            ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 4) AS m00,
            COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS m01,
            CAST(SUM((value >= 300)::LONG) AS BIGINT) AS f1,
            ROUND(AVG(CASE WHEN value >= 300 THEN value END), 4) AS m10,
            COUNT(DISTINCT CASE WHEN value >= 300 THEN user_id END) AS m11,
            CAST(SUM((ts < TIMESTAMP '2024-01-08')::LONG) AS BIGINT) AS f2,
            ROUND(AVG(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN value END), 4) AS m20,
            COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-08' THEN user_id END) AS m21
          FROM events
        )
        SELECT 'clicks' AS segments, f0 AS doc_count,
               m00 AS avg_value, m01 AS users FROM w
        UNION ALL
        SELECT 'big_values', f1, m10, m11 FROM w
        UNION ALL
        SELECT 'week1', f2, m20, m21 FROM w
        ORDER BY segments
    """,
    "dsl_composite_desc": """
        SELECT event_type AS et, user_id AS u, COUNT(*) AS doc_count
        FROM events
        WHERE event_type < 'signup'
           OR (event_type = 'signup' AND user_id > 3)
        GROUP BY event_type, user_id
        ORDER BY et DESC, u ASC LIMIT 40
    """,
    "dsl_nested_ordered": """
        WITH g AS (
          SELECT event_type AS day_type, user_id AS top_user,
                 COUNT(*) AS doc_count, ROUND(AVG(value), 4) AS avg_v
          FROM events GROUP BY 1, 2
        ), t AS (
          SELECT *, SUM(doc_count) OVER (PARTITION BY day_type) AS total,
                 ROW_NUMBER() OVER (PARTITION BY day_type
                     ORDER BY doc_count DESC, top_user) AS ir
          FROM g
        ), o AS (
          SELECT *, DENSE_RANK() OVER (ORDER BY day_type ASC) AS orank
          FROM t WHERE total >= 2 AND ir <= 2
        )
        SELECT day_type, top_user, doc_count, avg_v FROM o
        WHERE orank <= 3
        ORDER BY day_type, doc_count DESC, top_user
    """,
    "dsl_bool_filtered_terms": """
        SELECT user_id AS by_user, COUNT(*) AS doc_count,
               ROUND(AVG(value), 4) AS avg_value,
               COUNT(event_id) AS users_seen
        FROM events
        WHERE event_type = 'purchase' AND value >= 100
          AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
        GROUP BY user_id
        ORDER BY doc_count DESC, by_user LIMIT 5
    """,
    "dsl_should_hits": r"""
        SELECT doc_id, source, n_chars FROM documents
        WHERE (regexp_matches(lower(text), '\bspark\b')
               OR regexp_matches(lower(text), '\bstreaming\b'))::INT
              + (source LIKE 'src1%')::INT >= 2
          AND NOT lang = 'zh'
        ORDER BY n_chars DESC, doc_id LIMIT 20
    """,
    "dsl_date_histogram": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS per_day,
               COUNT(*) AS doc_count,
               ROUND(SUM(value), 4) AS total
        FROM events
        WHERE event_type IN ('purchase', 'signup')
        GROUP BY per_day ORDER BY per_day
    """,
    "dsl_value_histogram": """
        SELECT FLOOR(value / 100.0) * 100.0 AS val_bucket,
               COUNT(*) AS doc_count,
               ROUND(MAX(value), 4) AS max_v
        FROM events
        GROUP BY val_bucket ORDER BY val_bucket
    """,
    "dsl_range_buckets": """
        SELECT '*-100' AS bands,
               CAST(SUM(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT)
                   AS doc_count
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT '50-300',
               CAST(SUM(CASE WHEN value >= 50 AND value < 300
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT '300-*',
               CAST(SUM(CASE WHEN value >= 300 THEN 1 ELSE 0 END) AS BIGINT)
        FROM events WHERE value IS NOT NULL
    """,
    "dsl_filters_named": """
        SELECT 'errors' AS segments,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS doc_count
        FROM events
        UNION ALL
        SELECT 'big_purchases',
               CAST(SUM(CASE WHEN event_type = 'purchase' AND value >= 300
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'early_january',
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-08'
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
    """,
    "dsl_nested_day_type": """
        WITH g AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS per_day,
                   event_type AS etype, COUNT(*) AS doc_count,
                   ROUND(SUM(value), 4) AS sum_v
            FROM events GROUP BY 1, 2
        ), r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY per_day
                ORDER BY doc_count DESC, etype) AS ir
            FROM g
        )
        SELECT per_day, etype, doc_count, sum_v FROM r WHERE ir <= 3
        ORDER BY per_day, doc_count DESC, etype
    """,
    "dsl_top_hits_by_type": """
        WITH r AS (
            SELECT event_type AS by_type, event_id, user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS _rank
            FROM events WHERE value >= 200
        )
        SELECT by_type, _rank, event_id, user_id, value
        FROM r WHERE _rank <= 2
        ORDER BY by_type, _rank
    """,
    "dsl_composite_after": """
        SELECT event_type AS etype, user_id AS uid, COUNT(*) AS doc_count
        FROM events
        WHERE event_type > 'purchase'
           OR (event_type = 'purchase' AND user_id > 40)
        GROUP BY 1, 2 ORDER BY etype, uid LIMIT 50
    """,
    "dsl_knn_query": """
        WITH q AS (
            SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT vec_id,
               ROUND(list_dot_product(e.ev, q.qv) /
                     (sqrt(list_dot_product(e.ev, e.ev)) *
                      sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
              WHERE label >= 1 AND vec_id <> 0) e, q
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "dsl_search_after": """
        SELECT event_id, user_id, value FROM events
        WHERE event_type = 'view'
          AND (value < 250.0 OR (value = 250.0 AND event_id > 100))
        ORDER BY value DESC, event_id LIMIT 20
    """,
    "dsl_range_metrics": """
        SELECT '*-100' AS bands,
               CAST(SUM(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT)
                   AS doc_count,
               ROUND(SUM(CASE WHEN value < 100 THEN value END), 4) AS sum_v
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT '100-300',
               CAST(SUM(CASE WHEN value >= 100 AND value < 300
                             THEN 1 ELSE 0 END) AS BIGINT),
               ROUND(SUM(CASE WHEN value >= 100 AND value < 300
                             THEN value END), 4)
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT '300-*',
               CAST(SUM(CASE WHEN value >= 300 THEN 1 ELSE 0 END) AS BIGINT),
               ROUND(SUM(CASE WHEN value >= 300 THEN value END), 4)
        FROM events WHERE value IS NOT NULL
    """,
    "dsl_week_histogram": """
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS per_week,
               COUNT(*) AS doc_count,
               ROUND(SUM(value), 4) AS total
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "dsl_terms_ordered": """
        SELECT event_type AS by_type, COUNT(*) AS doc_count,
               ROUND(SUM(value), 4) AS total_v
        FROM events GROUP BY 1
        ORDER BY total_v DESC, by_type LIMIT 4
    """,
}
