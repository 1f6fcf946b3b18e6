"""Query-DSL JSON compiler: accept the OpenSearch request-body shape a
reference user already writes — ``{"query": {...}, "aggs": {...},
"size": N, "sort": [...]}`` — and compile it into one DataFrame plan.

This is the third query interface next to the Python builders and the
PPL compiler (ppl.py): the DSL JSON itself. Supported node types cover
the request bodies the reference's dashboards issue
(DASHBOARD_GUIDE.md:30-135; TDD :1624-1653):

query context:
    term, terms, range (gt/gte/lt/lte; ISO date strings cast to
    timestamp), exists, ids, prefix, wildcard (* → %), match
    (analyzed OR over whitespace tokens), match_phrase,
    bool (must / filter / must_not / should + minimum_should_match),
    match_all, fuzzy (edit-distance term), wrapper (base64-wrapped
    DSL), query_string (the Dashboards search-bar syntax, parsed by
    querystring.py into these same nodes)

aggregations (the dashboard panel shapes):
    terms (field, size, order by _key/_count/any metric sub-agg),
    date_histogram (calendar_interval: hour|day|week|month|quarter|
    year), histogram (field, interval), range (field, ranges with
    from/to + metric sub-aggs as per-range conditional aggregates),
    filters (named sub-queries → doc_count buckets + optional metric
    sub-aggs as per-bucket conditional aggregates),
    composite (sources + size + after-key pagination — the
    scale-friendly cursor over an unbounded key space),
    metrics: avg, sum, min, max, value_count, cardinality

Sub-aggregations: a keyed bucket (terms/date_histogram/histogram) may
nest ONE inner terms bucket (the stacked-bar / grouped-panel shape —
result is one flat row per (outer, inner) pair, inner buckets ranked
per outer bucket), or a ``top_hits`` (size, sort, _source) returning
the top documents per bucket via a ranked window.

top level: size, from (offset paging — Limit(Offset(Sort)); rejects
search_after, which is the keyset form for deep walks), sort
([{field: {"order": asc|desc}}...]), _source (projection list,
applied LAST so sort/cursor fields need not be projected),
search_after (one cursor value per sort field → a scan-pushed
lexicographic predicate; cursor fields must be non-null), knn
({field: {"query_vector": [...], "k": N}} — the vector-search
clause: exact cosine top-k as a scan projection +
TakeOrderedAndProject, optionally pre-filtered by ``query``; raises
on aggs/sort/_source/highlight/search_after), highlight
({"fields": {field: {}}} → one ±3-token fragment column per field,
built from the query's positive terms on that field), suggest (the
``term`` did-you-mean suggester → a suggestion frame), and
track_total_hits (accepted as a lossless no-op — this API returns
the hits frame itself; totals are engine.count).

Everything compiles to built-in expressions — filters push to the
scan, buckets become partial+final aggregates, size+sort becomes
TakeOrderedAndProject. Unknown query nodes raise DSLError, and so do
unknown TOP-LEVEL body keys — a pasted reference body with a clause
this API doesn't serve degrades loudly, never silently (returning
page 1 for a body with "from" would be a wrong answer, not a
fallback).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table


class DSLError(ValueError):
    pass


_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2})?$")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _sql_ident(name: str) -> str:
    """User-supplied agg/metric names become output COLUMN names inside
    a generated stack() expression — validate instead of interpolating
    raw text into SQL (a name with a quote/space/comma would break or
    inject into the expression)."""
    if not _IDENT_RE.fullmatch(name):
        raise DSLError(f"agg name {name!r} is not a valid identifier")
    return name


def _sql_str(label) -> str:
    """Single-quoted SQL string literal with quotes escaped — bucket
    labels are user data, never raw SQL."""
    return "'" + str(label).replace("'", "''") + "'"


def _lit(v):
    if isinstance(v, str) and _DATE_RE.match(v):
        return F.lit(v).cast("timestamp")
    return F.lit(v)


def _match_tokens(field: str, text: str) -> Column:
    """Analyzed OR: any whitespace token present as a whole word."""
    cond = None
    for tok in text.lower().split():
        c = F.lower(F.col(field)).rlike(rf"\b{re.escape(tok)}\b")
        cond = c if cond is None else (cond | c)
    if cond is None:
        raise DSLError("match with empty query text")
    return cond


def compile_query(node: dict, id_col: str = "doc_id") -> Column:
    if not isinstance(node, dict) or len(node) != 1:
        raise DSLError(f"query node must have exactly one key: {node!r}")
    kind, body = next(iter(node.items()))
    if kind == "match_all":
        return F.lit(True)
    if kind == "query_string":
        # the Dashboards search-bar syntax (status:ACTIVE AND amount > 0)
        # — parsed into these same node dicts, then compiled through
        # this very function, so both interfaces share one plan path
        from postgres_opensearch_cdc_spark.querystring import (
            parse_query_string,
        )

        if isinstance(body, str):
            body = {"query": body}
        parsed = parse_query_string(
            body["query"],
            default_field=body.get("default_field"),
            default_operator=body.get("default_operator", "OR"),
        )
        return compile_query(parsed, id_col)
    if kind == "simple_query_string":
        # the LENIENT search-bar variant: + | - "phrase" prefix* ( ) —
        # never errors on user input; parses into these same nodes
        from postgres_opensearch_cdc_spark.querystring import (
            parse_simple_query_string,
        )

        if isinstance(body, str):
            body = {"query": body}
        parsed = parse_simple_query_string(
            body["query"],
            fields=body.get("fields", ["text"]),
            default_operator=body.get("default_operator", "OR"),
        )
        return compile_query(parsed, id_col)
    if kind == "term":
        ((f, v),) = body.items()
        if isinstance(v, dict):
            v = v["value"]
        return F.col(f) == _lit(v)
    if kind == "terms":
        ((f, vs),) = body.items()
        return F.col(f).isin(list(vs))
    if kind == "range":
        ((f, bounds),) = body.items()
        cond = None
        ops = {
            "gte": lambda c, v: c >= v,
            "gt": lambda c, v: c > v,
            "lte": lambda c, v: c <= v,
            "lt": lambda c, v: c < v,
        }
        for op, v in bounds.items():
            if op not in ops:
                raise DSLError(f"bad range op: {op}")
            c = ops[op](F.col(f), _lit(v))
            cond = c if cond is None else (cond & c)
        if cond is None:
            raise DSLError("empty range")
        return cond
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "ids":
        return F.col(id_col).isin(list(body["values"]))
    if kind == "prefix":
        ((f, v),) = body.items()
        if isinstance(v, dict):
            v = v["value"]
        return F.col(f).startswith(v)
    if kind == "wildcard":
        ((f, v),) = body.items()
        if isinstance(v, dict):
            v = v["value"]
        return F.col(f).like(v.replace("*", "%").replace("?", "_"))
    if kind == "match":
        ((f, v),) = body.items()
        if isinstance(v, dict):
            v = v["query"]
        return _match_tokens(f, v)
    if kind == "match_phrase":
        ((f, v),) = body.items()
        if isinstance(v, dict):
            v = v["query"]
        return F.col(f).rlike(rf"\b{re.escape(v)}\b")
    if kind == "fuzzy":
        # edit-distance term match (ES fuzzy query): levenshtein runs
        # as a codegen expression over the scan — no index, so at
        # 100 TB pair it with a pushable prefix/length pre-filter
        # (ES's own prefix_length knob exists for the same reason)
        ((f, v),) = body.items()
        fuzziness: "int | str" = "AUTO"
        if isinstance(v, dict):
            fuzziness = v.get("fuzziness", "AUTO")
            v = v["value"]
        term = str(v)
        if isinstance(fuzziness, str):
            fz = fuzziness.strip()
            if fz.isdigit():
                # ES accepts string-encoded integers ("1") as well as
                # bare ints — clients port request bodies verbatim
                fuzziness = int(fz)
            else:
                m = re.fullmatch(r"AUTO(?::(\d+),(\d+))?", fz.upper())
                if m is None:
                    raise DSLError(f"bad fuzziness {fuzziness!r}")
                # ES AUTO[:low,high] (default 3,6): 0 edits for terms
                # shorter than low, 1 below high, 2 otherwise — short
                # terms no longer over-match
                low, high = (
                    (int(m.group(1)), int(m.group(2))) if m.group(1) else (3, 6)
                )
                fuzziness = 0 if len(term) < low else (1 if len(term) < high else 2)
        # term-level query: case-SENSITIVE, unanalyzed (ES semantics —
        # no lower() on either side)
        return F.levenshtein(F.col(f), F.lit(term)) <= int(fuzziness)
    if kind == "wrapper":
        # base64-wrapped DSL (the ES wrapper query — clients that must
        # smuggle JSON through non-JSON config): decode and recurse
        import base64
        import json

        try:
            inner = json.loads(base64.b64decode(body["query"]))
        except Exception as exc:
            raise DSLError(f"wrapper query does not decode: {exc}") from exc
        return compile_query(inner, id_col)
    if kind == "bool":
        cond = None

        def _and(c):
            nonlocal cond
            cond = c if cond is None else (cond & c)

        for sub in body.get("must", []):
            _and(compile_query(sub, id_col))
        for sub in body.get("filter", []):
            _and(compile_query(sub, id_col))
        for sub in body.get("must_not", []):
            _and(~compile_query(sub, id_col))
        shoulds = body.get("should", [])
        if shoulds:
            msm = int(body.get("minimum_should_match", 1))
            hits = None
            for sub in shoulds:
                # NULL clause counts as 0 (ES semantics) — an un-coalesced
                # NULL would poison the whole sum and drop the doc
                h = F.coalesce(compile_query(sub, id_col).cast("int"), F.lit(0))
                hits = h if hits is None else (hits + h)
            _and(hits >= msm)
        if cond is None:
            raise DSLError("empty bool")
        return cond
    raise DSLError(f"unknown query node: {kind}")


_METRICS = {"avg", "sum", "min", "max", "value_count", "cardinality"}


def _metric(name: str, spec: dict) -> Column:
    ((kind, body),) = spec.items()
    if kind not in _METRICS:
        raise DSLError(f"unknown metric agg: {kind}")
    f = body["field"]
    if kind == "value_count":
        return F.count(f).alias(name)
    if kind == "cardinality":
        return F.countDistinct(f).alias(name)
    return F.round(getattr(F, kind)(f), 4).alias(name)


def _lexicographic_after(pairs) -> Column:
    """Strictly-after-the-cursor predicate for keyset pagination:
    OR-of-AND chain over (expr, cursor_value, ascending) tuples —
    shared by the composite ``after`` and hits ``search_after``."""
    cond, eq_prefix = None, None
    for expr, value, ascending in pairs:
        past = expr > _lit(value) if ascending else expr < _lit(value)
        c = past if eq_prefix is None else (eq_prefix & past)
        cond = c if cond is None else (cond | c)
        eq = expr == _lit(value)
        eq_prefix = eq if eq_prefix is None else (eq_prefix & eq)
    return cond


def _key_expr(spec: dict, name: str) -> Column:
    """Grouping key for the keyed bucket kinds (terms / date_histogram /
    histogram)."""
    if "terms" in spec:
        return F.col(spec["terms"]["field"]).alias(name)
    if "date_histogram" in spec:
        body = spec["date_histogram"]
        interval = body.get("calendar_interval", "day")
        if interval not in ("hour", "day", "week", "month", "quarter",
                            "year"):
            raise DSLError(f"unsupported calendar_interval: {interval}")
        return F.date_trunc(interval, F.col(body["field"])).alias(name)
    if "histogram" in spec:
        body = spec["histogram"]
        interval = float(body["interval"])
        return (F.floor(F.col(body["field"]) / interval) * interval).alias(name)
    raise DSLError(f"not a keyed bucket: {list(spec)}")


def _outer_terms_ranking(spec: dict, name: str):
    """Outer-terms bucket ranking for the nested-bucket / top_hits
    paths: honor ``order`` on _count (default, desc) or _key and
    ``min_doc_count``, exactly like the flat terms path. Ordering by a
    metric sub-agg is undefined here (the metrics live on the INNER
    buckets) — raise rather than silently reverting to doc_count.
    Returns (order_cols, min_doc_count) where order_cols rank the
    post-aggregate frame using the `_total` per-bucket doc count."""
    if "terms" not in spec:
        return None, 1
    body = spec["terms"]
    order = body.get("order", {"_count": "desc"})
    ((ofield, odir),) = order.items()
    if odir not in ("asc", "desc"):
        raise DSLError(f"bad terms order direction: {odir!r}")
    if ofield == "_count":
        ocol = F.col("_total")
    elif ofield == "_key":
        ocol = F.col(name)
    else:
        raise DSLError(
            f"terms order by {ofield!r} is not supported with a nested "
            "bucket or top_hits sub-agg (metrics are per inner bucket); "
            "order by _count or _key"
        )
    ocol = ocol.desc() if odir == "desc" else ocol.asc()
    return [ocol, F.col(name)], int(body.get("min_doc_count", 1))


def _compile_nested(df: DataFrame, name: str, spec: dict,
                    inner_name: str, inner_spec: dict) -> DataFrame:
    """Outer keyed bucket with one inner terms bucket: one flat row per
    (outer, inner) pair. Inner buckets are ranked per outer bucket by
    doc_count desc (ES ordering); outer terms size keeps the top-N
    outer buckets by total doc_count. All ranking happens on the
    post-aggregate frame (bounded by distinct key pairs), never on the
    input rows."""
    from pyspark.sql import Window

    outer_order, outer_min_dc = _outer_terms_ranking(spec, name)
    outer_key = _key_expr(spec, name)
    inner_body = inner_spec["terms"]
    inner_key = F.col(inner_body["field"]).alias(inner_name)
    inner_size = int(inner_body.get("size", 10))
    metrics = [_metric(n, s) for n, s in inner_spec.get("aggs", {}).items()]
    grouped = df.groupBy(outer_key, inner_key).agg(
        F.count(F.lit(1)).alias("doc_count"), *metrics
    )
    # outer totals FIRST (ES outer-bucket ordering counts every doc in
    # the bucket, not just the kept inner buckets), then rank inner
    w_total = Window.partitionBy(name)
    ranked = grouped.withColumn("_total", F.sum("doc_count").over(w_total))
    if outer_min_dc > 1:
        # min_doc_count applies to the FULL bucket count, like the
        # flat terms path
        ranked = ranked.filter(F.col("_total") >= outer_min_dc)
    w_inner = Window.partitionBy(name).orderBy(
        F.col("doc_count").desc(), F.col(inner_name)
    )
    ranked = ranked.withColumn("_ir", F.row_number().over(w_inner)).filter(
        F.col("_ir") <= inner_size
    )
    if "terms" in spec:
        # ES default size is 10 — same default as the un-nested terms
        # path, so adding a sub-bucket never silently unbounds output
        outer_size = int(spec["terms"].get("size", 10))
        w_outer = Window.orderBy(*outer_order)
        ranked = ranked.withColumn("_or", F.dense_rank().over(w_outer)).filter(
            F.col("_or") <= outer_size
        ).drop("_or")
    return ranked.drop("_ir", "_total").orderBy(
        name, F.col("doc_count").desc(), F.col(inner_name)
    )


def _compile_top_hits(df: DataFrame, name: str, spec: dict,
                      th: dict) -> DataFrame:
    """Per-bucket top documents: rank rows inside each bucket by the
    top_hits sort and keep the first ``size``. The window runs per
    bucket key — partition-parallel, no global sort."""
    from pyspark.sql import Window

    outer_order, outer_min_dc = _outer_terms_ranking(spec, name)
    key = _key_expr(spec, name)
    size = int(th.get("size", 3))
    orders = []
    for s in th.get("sort", []):
        ((f, o),) = s.items()
        order = o.get("order", "asc") if isinstance(o, dict) else o
        orders.append(F.col(f).desc() if order == "desc" else F.col(f).asc())
    if not orders:
        raise DSLError("top_hits needs a sort for deterministic results")
    out = df.withColumn(name, key)
    # full per-bucket doc_count BEFORE the hit filter — the outer terms
    # size (ES default 10) ranks buckets by their complete count, not
    # by the kept hits
    out = out.withColumn(
        "_total", F.count(F.lit(1)).over(Window.partitionBy(name))
    )
    if outer_min_dc > 1:
        out = out.filter(F.col("_total") >= outer_min_dc)
    w = Window.partitionBy(name).orderBy(*orders)
    out = out.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= size
    )
    if "terms" in spec:
        outer_size = int(spec["terms"].get("size", 10))
        w_outer = Window.orderBy(*outer_order)
        out = out.withColumn("_or", F.dense_rank().over(w_outer)).filter(
            F.col("_or") <= outer_size
        ).drop("_or")
    out = out.drop("_total")
    cols = [name, "_rank"] + list(th.get("_source", []))
    if len(cols) == 2:
        raise DSLError("top_hits needs _source columns for a flat result")
    return out.select(*cols).orderBy(name, "_rank")


def _compile_composite(df: DataFrame, name: str, body: dict,
                       metrics: list) -> DataFrame:
    """Composite agg: distinct source-key tuples in key order with
    doc_count, ``after``-cursor pagination. The cursor compiles to a
    lexicographic predicate evaluated BEFORE the aggregate, so each
    page shuffles only the keys past the cursor — pagination over an
    unbounded key space without global state."""
    # per-source `order` (asc default / desc) is honored in BOTH the
    # page ordering and the after-cursor direction; other options
    # (missing_bucket, ...) are NOT implemented — the cursor predicate
    # assumes non-null keys, so silently accepting missing_bucket
    # would paginate wrongly with no error. Same convention as the knn
    # clause: raise on anything unsupported instead of dropping it.
    _SOURCE_KEYS = {
        "terms": {"field", "order"},
        "date_histogram": {"field", "calendar_interval", "order"},
        "histogram": {"field", "interval", "order"},
    }
    keys, key_names, ascending = [], [], []
    for src in body["sources"]:
        ((n, s),) = src.items()
        ((kind, kbody),) = s.items()
        allowed = _SOURCE_KEYS.get(kind)
        if allowed is not None:
            extra = set(kbody) - allowed
            if extra:
                raise DSLError(
                    f"unsupported composite source option(s) on {n!r}: "
                    f"{sorted(extra)} (sources paginate non-missing only)"
                )
        order = kbody.get("order", "asc")
        if order not in ("asc", "desc"):
            raise DSLError(f"bad composite source order on {n!r}: {order!r}")
        ascending.append(order == "asc")
        keys.append(_key_expr(s, n))
        key_names.append(n)
    after = body.get("after")
    if after:
        missing = [n for n in key_names if n not in after]
        if missing:
            raise DSLError(f"composite after is missing source key(s) {missing}")
        # cursor over the key EXPRESSIONS themselves — never withColumn-
        # materialized names, which would corrupt a later source whose
        # underlying field shadows an earlier source's name
        df = df.filter(_lexicographic_after(
            [(k, after[n], asc)
             for k, n, asc in zip(keys, key_names, ascending)]
        ))
    grouped = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("doc_count"), *metrics
    )
    size = int(body.get("size", 10))
    return grouped.orderBy(*[
        F.col(n).asc() if asc else F.col(n).desc()
        for n, asc in zip(key_names, ascending)
    ]).limit(size)


_BUCKET_KINDS = ("terms", "date_histogram", "histogram", "range",
                 "filters", "composite")


def _compile_aggs(df: DataFrame, aggs: dict) -> DataFrame:
    if len(aggs) != 1:
        raise DSLError("exactly one top-level bucket agg is supported")
    ((name, spec),) = aggs.items()
    sub = spec.get("aggs", {})
    # split sub-aggs into metrics vs one nested bucket / top_hits
    nested = {
        n: s for n, s in sub.items()
        if isinstance(s, dict) and ("terms" in s or "top_hits" in s)
        and not set(s) & _METRICS
    }
    if nested:
        if len(nested) != 1 or len(sub) != len(nested):
            raise DSLError(
                "exactly one nested bucket (optionally with its own "
                "metric aggs) is supported"
            )
        ((inner_name, inner_spec),) = nested.items()
        if "top_hits" in inner_spec:
            return _compile_top_hits(df, name, spec, inner_spec["top_hits"])
        return _compile_nested(df, name, spec, inner_name, inner_spec)
    metrics = [_metric(n, s) for n, s in sub.items()]
    if "composite" in spec:
        return _compile_composite(df, name, spec["composite"], metrics)
    if "terms" in spec:
        body = spec["terms"]
        f, size = body["field"], int(body.get("size", 10))
        grouped = df.groupBy(F.col(f).alias(name)).agg(
            F.count(F.lit(1)).alias("doc_count"), *metrics
        )
        min_dc = int(body.get("min_doc_count", 1))
        if min_dc > 1:
            grouped = grouped.filter(F.col("doc_count") >= min_dc)
        order = body.get("order", {"_count": "desc"})
        ((ofield, odir),) = order.items()
        if ofield == "_count":
            ofield = "doc_count"
        elif ofield == "_key":
            ofield = name
        elif ofield not in grouped.columns:
            raise DSLError(f"terms order references unknown agg: {ofield}")
        ocol = F.col(ofield).desc() if odir == "desc" else F.col(ofield).asc()
        return grouped.orderBy(ocol, F.col(name)).limit(size)
    if "date_histogram" in spec:
        body = spec["date_histogram"]
        f = body["field"]
        interval = body.get("calendar_interval", "day")
        if interval not in ("hour", "day", "week", "month", "quarter",
                            "year"):
            raise DSLError(f"unsupported calendar_interval: {interval}")
        key = F.date_trunc(interval, F.col(f)).alias(name)
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
            .orderBy(name)
        )
    if "histogram" in spec:
        body = spec["histogram"]
        f, interval = body["field"], float(body["interval"])
        key = (F.floor(F.col(f) / interval) * interval).alias(name)
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
            .orderBy(name)
        )
    if "range" in spec:
        # ES semantics: ranges are INDEPENDENT buckets (overlaps count
        # in every matching one) — one conditional aggregate per range
        # (doc_count + any metric sub-aggs) in a SINGLE pass, then
        # unpivot
        body = spec["range"]
        f = body["field"]
        agg_cols, labels = [], []
        metric_names = list(sub)
        for i, r in enumerate(body["ranges"]):
            lo, hi = r.get("from"), r.get("to")
            label = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col(f) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(f) < F.lit(hi))
            agg_cols.append(F.sum(cond.cast("long")).alias(f"_r{i}"))
            for j, mspec in enumerate(sub.values()):
                ((kind, mb),) = mspec.items()
                if kind not in _METRICS:
                    raise DSLError(f"unknown metric agg: {kind}")
                guarded = F.when(cond, F.col(mb["field"]))
                if kind == "value_count":
                    mcol = F.count(guarded)
                elif kind == "cardinality":
                    mcol = F.countDistinct(guarded)
                else:
                    mcol = F.round(getattr(F, kind)(guarded), 4)
                agg_cols.append(mcol.alias(f"_m{i}_{j}"))
            labels.append(label)
        wide = df.agg(*agg_cols)
        stack_args = ", ".join(
            f"{_sql_str(label)}, _r{i}"
            + "".join(f", _m{i}_{j}" for j in range(len(metric_names)))
            for i, label in enumerate(labels)
        )
        out_cols = ", ".join(
            [_sql_ident(name), "doc_count"]
            + [_sql_ident(m) for m in metric_names]
        )
        return wide.select(
            F.expr(
                f"stack({len(labels)}, {stack_args}) AS ({out_cols})"
            )
        ).orderBy(name)
    if "filters" in spec:
        # named buckets with optional metric sub-aggs: ONE pass of
        # conditional aggregates per (bucket, metric), then unpivot —
        # the same single-scan shape as the range agg (buckets are
        # independent; overlapping filters count in every match)
        named = spec["filters"]["filters"]
        metric_names = list(sub)
        agg_cols = []
        for i, (n, q) in enumerate(named.items()):
            cond = compile_query(q)
            agg_cols.append(F.sum(cond.cast("long")).alias(f"_f{i}"))
            for j, mspec in enumerate(sub.values()):
                ((kind, mb),) = mspec.items()
                if kind not in _METRICS:
                    raise DSLError(f"unknown metric agg: {kind}")
                guarded = F.when(cond, F.col(mb["field"]))
                if kind == "value_count":
                    mcol = F.count(guarded)
                elif kind == "cardinality":
                    mcol = F.countDistinct(guarded)
                else:
                    mcol = F.round(getattr(F, kind)(guarded), 4)
                agg_cols.append(mcol.alias(f"_m{i}_{j}"))
        wide = df.agg(*agg_cols)
        stack_args = ", ".join(
            f"{_sql_str(n)}, _f{i}"
            + "".join(f", _m{i}_{j}" for j in range(len(metric_names)))
            for i, n in enumerate(named)
        )
        out_cols = ", ".join(
            [_sql_ident(name), "doc_count"]
            + [_sql_ident(m) for m in metric_names]
        )
        return wide.select(
            F.expr(
                f"stack({len(named)}, {stack_args}) AS ({out_cols})"
            )
        ).orderBy(name)
    raise DSLError(f"unknown bucket agg in {name!r}")


def search(
    spark: SparkSession, sf_dir: str, table: str, body: dict,
    id_col: str = "doc_id",
) -> DataFrame:
    """Execute a request body against a registry table; returns the
    aggregation frame when ``aggs`` is present, else the (sorted,
    sized, projected) hits."""
    return search_frame(load_table(spark, sf_dir, table), body, id_col)


#: every top-level request-body key this API understands. Anything
#: else RAISES — a pasted reference body with a key we don't serve
#: (yet) must degrade loudly, never return page 1 / unhighlighted hits
#: as if the key had been honored (the silent-ignore hazard, r9
#: verdict). track_total_hits is accepted as a lossless no-op: this
#: API returns the hits frame itself, so total-count accounting
#: (served by engine.count) cannot change the result rows.
_BODY_KEYS = frozenset({
    "query", "knn", "aggs", "aggregations", "sort", "search_after",
    "size", "from", "_source", "highlight", "suggest",
    "track_total_hits",
})


def _highlight_terms(node, field: str) -> list[str]:
    """Collect the literal query terms targeting ``field`` — what the
    highlighter marks up. Walks match / match_phrase / term /
    query-context bool branches (must/filter/should; never must_not —
    excluded terms aren't highlighted, same as Lucene's highlighter
    which only sees positive clauses)."""
    out: list[str] = []
    if not isinstance(node, dict):
        return out
    for kind, spec in node.items():
        if kind in ("match", "match_phrase", "term"):
            ((fld, val),) = spec.items()
            if isinstance(val, dict):
                val = val.get("query", val.get("value"))
            if fld == field and isinstance(val, str) and val.strip():
                if kind == "match":  # analyzed: each token highlights
                    out.extend(val.split())
                else:
                    out.append(val)
        elif kind == "bool":
            for clause in ("must", "filter", "should"):
                sub = spec.get(clause, [])
                for q in (sub if isinstance(sub, list) else [sub]):
                    out.extend(_highlight_terms(q, field))
    return out


def _highlight_col(field: str, terms: list[str]) -> Column:
    """The first ±3-token window around any query term — the snippet
    the reference highlighter returns. The term must be a WHOLE
    whitespace token (lookarounds), matching the token-level
    highlighter: 'stream' may not anchor a fragment inside
    'downstream'. RE2 (DuckDB oracles) lacks lookarounds — the
    equivalent oracle shape anchors the window start with (?:^| ) and
    the term end with a trailing (?: |$), capturing group 1; both
    forms denote the same leftmost-greedy fragment, so values check."""
    alt = "|".join(re.escape(t) for t in terms)
    pat = rf"(?i)(\S+ ){{0,3}}(?<!\S)({alt})(?!\S)( \S+){{0,3}}"
    return F.regexp_extract(F.col(field), pat, 0)


def _compile_suggest(df: DataFrame, spec: dict) -> DataFrame:
    """The ``term`` suggester (did-you-mean): corpus-vocabulary terms
    within ``max_edits`` of the input text, the candidate sharing the
    input's first ``prefix_length`` chars and at least
    ``min_word_length`` long (the ES defaults), ranked by similarity
    (edit distance), then document frequency, then term. The
    levenshtein runs on the AGGREGATED vocabulary — one explode +
    term-keyed agg, then a vocab-sized scan, never per corpus row."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise DSLError("suggest needs exactly one named suggester")
    ((name, s),) = spec.items()
    if "term" not in s:
        raise DSLError(f"suggester {name!r}: only 'term' is supported")
    text = s.get("text")
    if not isinstance(text, str) or not text.strip():
        raise DSLError(f"suggester {name!r} needs non-empty 'text'")
    text = text.strip().lower()
    tspec = s["term"]
    field = tspec["field"]
    max_edits = int(tspec.get("max_edits", 2))
    size = int(tspec.get("size", 5))
    min_len = int(tspec.get("min_word_length", 4))
    prefix_len = int(tspec.get("prefix_length", 1))
    vocab = (
        df.select(F.explode(
            F.array_distinct(F.split(F.lower(F.col(field)), r"\s+"))
        ).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    dist = F.levenshtein(F.col("term"), F.lit(text))
    out = vocab.withColumn("distance", dist).filter(
        (F.col("distance") <= max_edits) & (F.col("distance") > 0)
        & (F.length("term") >= min_len)
    )
    if prefix_len > 0:
        out = out.filter(
            F.substring("term", 1, prefix_len) == text[:prefix_len]
        )
    return out.orderBy(
        F.col("distance"), F.col("doc_freq").desc(), F.col("term")
    ).limit(size)


def search_frame(df: DataFrame, body: dict, id_col: str = "doc_id") -> DataFrame:
    """Execute a request body against ANY DataFrame — the engine
    façade points this at a live CDC mirror view, making every DSL /
    query-string shape runnable on the always-current mirror exactly
    as a reference user queries their index."""
    unknown = sorted(set(body) - _BODY_KEYS)
    if unknown:
        raise DSLError(
            f"unknown top-level body keys: {unknown} "
            f"(supported: {sorted(_BODY_KEYS)})"
        )
    if "aggs" in body and "aggregations" in body:
        raise DSLError("body has both 'aggs' and 'aggregations'")
    aggs = body.get("aggs", body.get("aggregations"))
    frm = int(body.get("from", 0))
    if frm < 0:
        raise DSLError(f"'from' must be >= 0, got {frm}")
    if "suggest" in body:
        # suggesters return a suggestion frame, not hits — a combined
        # hits+suggest response can't be ONE DataFrame, so reject the
        # mix loudly instead of dropping one half. That includes
        # top-level 'size': it sizes HITS (which a suggest-only body
        # doesn't return) — honoring it silently as the suggestion
        # limit would shadow term.size, so it raises; use term.size.
        clash = sorted(set(body) & (_BODY_KEYS - {
            "suggest", "track_total_hits"}))
        if clash:
            raise DSLError(
                f"suggest cannot be combined with {clash}"
                + (" — use term.size for the suggestion limit"
                   if "size" in clash else "")
            )
        return _compile_suggest(df, body["suggest"])
    if "query" in body:
        df = df.filter(compile_query(body["query"], id_col))
    if "knn" in body:
        # vector-search clause: exact cosine top-k over the (already
        # query-filtered) scan — the pre-filter strategy, same plan as
        # functions.similarity.brute_force_topk. Unsupported clause
        # combinations raise instead of being silently dropped.
        for clause in ("aggs", "aggregations", "sort", "_source",
                       "highlight", "search_after"):
            if clause in body:
                raise DSLError(f"knn cannot be combined with {clause!r}")
        from postgres_opensearch_cdc_spark.functions.similarity import (
            brute_force_topk,
        )

        ((field, spec),) = body["knn"].items()
        k = int(spec.get("k", 10))
        hits = brute_force_topk(
            df,
            [float(x) for x in spec["query_vector"]],
            k=k,
            id_col=id_col,
            vec_col=field,
        )
        if frm:  # page within the k ranked hits: window [from, from+size)
            hits = hits.offset(frm)
        if "size" in body:  # ES: size caps the returned hits below k
            hits = hits.limit(min(k, int(body["size"])))
        return hits
    if aggs is not None:
        for clause in ("highlight", "from"):
            if clause in body:
                raise DSLError(
                    f"{clause!r} applies to hits, not aggregations"
                )
        return _compile_aggs(df, aggs)
    hl_cols: list[str] = []
    if "highlight" in body:
        # highlight: one fragment column per requested field, built
        # from the query's positive terms on that field. Computed on
        # the filtered scan (before sort/projection) and carried
        # through _source, which in ES also returns highlight
        # alongside the projected source.
        fields = body["highlight"].get("fields")
        if not isinstance(fields, dict) or not fields:
            raise DSLError("highlight needs a 'fields' object")
        for fld in fields:
            terms = _highlight_terms(body.get("query"), fld)
            if not terms:
                raise DSLError(
                    f"highlight field {fld!r} has no positive "
                    "match/match_phrase/term query terms to highlight"
                )
            name = f"highlight_{fld}"
            df = df.withColumn(name, _highlight_col(fld, terms))
            hl_cols.append(name)
    sort_spec: list[tuple[str, str]] = []
    if "sort" in body:
        for s in body["sort"]:
            ((f, spec),) = s.items()
            order = spec.get("order", "asc") if isinstance(spec, dict) else spec
            sort_spec.append((f, order))
    if "search_after" in body:
        if frm:
            # same contract as ES: keyset and offset paging don't mix
            raise DSLError("'from' must be 0 when 'search_after' is used")
        # hits keyset pagination: strictly-after the cursor tuple in
        # the sort order (each field honoring its direction). Compiles
        # to a scan-pushable lexicographic predicate — constant driver
        # state per page, the counterpart of the composite cursor.
        # Contract: cursor sort fields must be non-null (ES handles
        # nulls via an explicit "missing" sentinel; rows whose sort
        # field is NULL would otherwise vanish from every later page).
        if len(body["search_after"]) != len(sort_spec) or not sort_spec:
            raise DSLError("search_after needs one value per sort field")
        df = df.filter(_lexicographic_after(
            [(F.col(f), v, order != "desc")
             for (f, order), v in zip(sort_spec, body["search_after"])]
        ))
    if sort_spec:
        df = df.orderBy(*[
            F.col(f).desc() if order == "desc" else F.col(f).asc()
            for f, order in sort_spec
        ])
    if frm:
        # offset paging (the `from`/`size` window users paste first).
        # Scan-friendly — Limit(Offset(Sort)) is still a single
        # TakeOrdered-style pass — but each deeper page re-ranks
        # from+size rows; engine.scan's search_after keyset walk is the
        # constant-cost form for deep exports.
        df = df.offset(frm)
    if "size" in body:
        df = df.limit(int(body["size"]))
    if "_source" in body:
        # projection LAST: ES allows sort/cursor fields outside _source
        # (highlight columns ride along, as ES returns them next to
        # the projected source)
        df = df.select(*body["_source"], *hl_cols)
    return df
