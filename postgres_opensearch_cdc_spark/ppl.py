"""PPL (Piped Processing Language) compiler: the OpenSearch Dashboards
query language a user of the reference stack writes alongside the DSL
(`source=index | where ... | stats ... by ... | sort ... | head N`),
compiled into a single declarative DataFrame plan.

Spark-first: every stage is a narrow transformation or a standard
aggregate, so the composed pipeline is ONE Catalyst plan — filters
push to the scan, stats become partial+final aggregates, sort+head
becomes TakeOrderedAndProject. Nothing is interpreted per-row.

Supported stages (the core of the public PPL command set):

    source=<table>
    where  <cond> [and|or <cond>]...       =, !=, >, >=, <, <=
    fields [+|-] f1, f2, ...               keep (+, default) or drop (-)
    eval   name = <arith expr>             + - * / %, round/abs/ceil/
                                           floor/lower/upper/length,
                                           parentheses
    stats  <agg> [as alias], ... [by k...] count/sum/avg/min/max/
                                           dc (distinct count)/
                                           stddev/var (sample forms)/
                                           percentile(field, N)
                                           (exact, linear
                                           interpolation); a by-key
                                           may be span(ts_field, N<unit>)
                                           [as alias] for time bucketing
                                           (units m=minute, h, d, w,
                                           M=month [1M only] —
                                           case-sensitive; N-unit spans
                                           floor the epoch to the span
                                           width, weeks anchored to the
                                           epoch's first Monday so Nw
                                           shares 1w boundaries)
    sort   [+|-]f1, [+|-]f2, ...
    head   N
    dedup  f1 [, f2 ...]                   distinct over the listed
                                           fields (projects to them)
    rename a as b [, c as d]
    parse  field '<regex>'                 extract every named group
                                           ((?<name>...)) as a column
    grok   field '<pattern>'               parse with %{SYNTAX:name}
                                           grok patterns (NUMBER, INT,
                                           WORD, NOTSPACE, IP,
                                           TIMESTAMP_ISO8601,
                                           GREEDYDATA, QUOTEDSTRING)
    patterns field [as alias]              mask letters/digits to
                                           reveal the log template
                                           (punctuation skeleton)
    top    N field                         most frequent values
    rare   N field                         least frequent values
    eventstats <agg> [as alias], ... [by k...]
                                           window aggregates appended
                                           as columns (rows kept)
    fillnull with <lit> in f1 [, f2 ...]   coalesce nulls to a literal
    trendline sma(N, field) [as alias]     simple moving average over
                                           the current sort order
                                           (null until N points seen)
    ad <field> [threshold=N] [by k]        z-score anomaly detection
                                           (deterministic analog of
                                           the hosted RCF `ad`):
                                           appends score + anomaly
    join [type=inner|left] on <field> <table>
                                           equi-join on a shared column
    lookup <table> <lookup_field> as <local_field>
                                           broadcast enrichment join
                                           (appends the lookup table's
                                           other columns)

Where conditions support =, !=, >, >=, <, <=, ``f in (v1, v2, ...)``,
``like(f, 'pat%')`` (SQL-LIKE wildcards), ``isnull(f)`` /
``isnotnull(f)``, ``not <cond>``, and parenthesized grouping
(``(a = 1 or b = 2) and c > 3``).

Errors are raised as PPLSyntaxError with the offending stage text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table


class PPLSyntaxError(ValueError):
    pass


# The core grok pattern library (the subset the public grok sets share);
# each expands to a plain regex fragment the parse machinery compiles.
GROK_PATTERNS = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"[^\"]*\"",
}


def _grok_to_regex(pattern: str) -> str:
    """Expand %{SYNTAX:name} (and bare %{SYNTAX}) into named-group
    regex; everything outside %{...} is matched literally."""
    out, pos = [], 0
    for m in re.finditer(r"%\{(\w+)(?::(\w+))?\}", pattern):
        out.append(re.escape(pattern[pos:m.start()]))
        syntax, name = m.group(1), m.group(2)
        if syntax not in GROK_PATTERNS:
            raise PPLSyntaxError(f"unknown grok pattern: %{{{syntax}}}")
        frag = GROK_PATTERNS[syntax]
        out.append(f"(?<{name}>{frag})" if name else f"(?:{frag})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return "".join(out)


_CMP = {"=": "=", "!=": "!=", ">": ">", ">=": ">=", "<": "<", "<=": "<="}
_AGGS = {"count", "sum", "avg", "min", "max", "dc", "stddev", "var",
         "percentile"}
# names whose pyspark function differs from the PPL keyword (F.var
# does not exist; stddev must be the SAMPLE form explicitly)
_EVENTSTATS_FN = {"stddev": F.stddev_samp, "var": F.var_samp}
# eval expressions pass through F.expr after a whitelist scan
_EVAL_FUNCS = {
    "round", "abs", "ceil", "floor", "lower", "upper", "length",
    # string/conditional set (PPL eval built-ins): all 1-based,
    # engine-portable between Spark SQL and DuckDB
    "concat", "substring", "trim", "replace", "coalesce", "if",
    # array producer for the expand command (multivalue fields)
    "split",
}
_EVAL_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)|(?P<ident>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>[-+*/%(),]|>=|<=|!=|[<>=])|(?P<str>'[^']*'))"
)


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1]
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?\d+\.\d+", tok):
        return float(tok)
    raise PPLSyntaxError(f"unsupported literal: {tok!r}")


def _split_bool(text: str, kw: str) -> list[str]:
    """Split on a boolean keyword at paren depth 0, outside quotes —
    so ``(a = 1 or b = 2) and c = 3`` and ``f in (1, 2)`` group
    correctly."""
    pat = re.compile(rf"\s+{kw}\s+", flags=re.I)
    parts, depth, in_str, start, i = [], 0, False, 0, 0
    while i < len(text):
        ch = text[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                m = pat.match(text, i)
                if m:
                    parts.append(text[start:i])
                    start = i = m.end()
                    continue
        i += 1
    parts.append(text[start:])
    return parts


def _compile_condition(text: str):
    """AND/OR chain of comparisons with parenthesized grouping,
    left-associative, AND binds tighter (standard PPL/SQL
    precedence)."""
    or_col = None
    for or_part in _split_bool(text, "or"):
        and_col = None
        for cmp_text in _split_bool(or_part, "and"):
            c = _compile_comparison(cmp_text)
            and_col = c if and_col is None else (and_col & c)
        or_col = and_col if or_col is None else (or_col | and_col)
    return or_col


def _compile_comparison(cmp_text: str):
    cmp_text = cmp_text.strip()
    nm = re.match(r"not\s+(.+)$", cmp_text, flags=re.I)
    if nm:
        return ~_compile_comparison(nm.group(1))
    if cmp_text.startswith("(") and cmp_text.endswith(")"):
        # parenthesized group — but only when the parens actually wrap
        # the WHOLE text ("(a) and (b)" reaches here already split)
        depth, in_str = 0, False
        for i, ch in enumerate(cmp_text):
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                depth += ch == "("
                depth -= ch == ")"
            if depth == 0 and i < len(cmp_text) - 1:
                break
        else:
            return _compile_condition(cmp_text[1:-1])
    nlm = re.fullmatch(
        r"(isnull|isnotnull)\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)",
        cmp_text,
        flags=re.I,
    )
    if nlm:
        col = F.col(nlm.group(2))
        return col.isNull() if nlm.group(1).lower() == "isnull" \
            else col.isNotNull()
    im = re.fullmatch(
        r"([A-Za-z_][A-Za-z_0-9]*)\s+in\s*\(\s*(.+?)\s*\)", cmp_text, flags=re.I
    )
    if im:
        field, items = im.groups()
        vals = [_parse_literal(v) for v in _split_top_level(items)]
        return F.col(field).isin(vals)
    lm = re.fullmatch(
        r"like\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*,\s*'([^']*)'\s*\)",
        cmp_text,
        flags=re.I,
    )
    if lm:
        return F.col(lm.group(1)).like(lm.group(2))
    m = re.fullmatch(
        r"\s*([A-Za-z_][A-Za-z_0-9]*)\s*(>=|<=|!=|=|>|<)\s*(.+?)\s*",
        cmp_text,
    )
    if not m:
        raise PPLSyntaxError(f"bad condition: {cmp_text!r}")
    field, op, lit = m.groups()
    col, val = F.col(field), F.lit(_parse_literal(lit))
    return {
        "=": col == val,
        "!=": col != val,
        ">": col > val,
        ">=": col >= val,
        "<": col < val,
        "<=": col <= val,
    }[op]


def _split_top_level(text: str) -> list[str]:
    """Comma-split that respects parentheses and quoted strings."""
    parts, depth, cur, in_str = [], 0, [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
        if ch == "," and depth == 0 and not in_str:
            parts.append("".join(cur).strip())
            cur = []
            continue
        if not in_str:
            depth += ch == "("
            depth -= ch == ")"
        cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _check_eval_expr(expr: str) -> None:
    pos = 0
    while pos < len(expr):
        m = _EVAL_TOKEN.match(expr, pos)
        if not m:
            if expr[pos:].strip() == "":
                break
            raise PPLSyntaxError(f"bad eval token at: {expr[pos:]!r}")
        if m.group("ident"):
            ident = m.group("ident")
            nxt = expr[m.end():].lstrip()
            if nxt.startswith("(") and ident.lower() not in _EVAL_FUNCS:
                raise PPLSyntaxError(f"function not allowed in eval: {ident}")
        pos = m.end()


def _agg_expr(text: str):
    m = re.fullmatch(
        r"\s*([a-z]+)\s*\(\s*([A-Za-z_0-9]*)\s*"
        r"(?:,\s*(\d+)\s*)?\)\s*(?:as\s+([A-Za-z_0-9]+))?\s*",
        text,
        flags=re.I,
    )
    if not m:
        raise PPLSyntaxError(f"bad stats aggregate: {text!r}")
    fn, arg, extra, alias = (m.group(1).lower(), m.group(2), m.group(3),
                             m.group(4))
    if fn not in _AGGS:
        raise PPLSyntaxError(f"unknown aggregate: {fn}")
    if extra is not None and fn != "percentile":
        raise PPLSyntaxError(f"{fn}() takes one argument: {text!r}")
    if fn == "count":
        col, default = F.count(F.lit(1)), "count"
    elif fn == "dc":
        col, default = F.countDistinct(arg), f"dc_{arg}"
    elif fn == "stddev":
        # sample stddev (PPL STDDEV_SAMP); round at the call site via
        # an eval stage when engine-exact parity matters
        col, default = F.stddev_samp(arg), f"stddev_{arg}"
    elif fn == "var":
        col, default = F.var_samp(arg), f"var_{arg}"
    elif fn == "percentile":
        if extra is None:
            raise PPLSyntaxError(
                f"percentile needs percentile(field, N): {text!r}"
            )
        pct = int(extra)
        if not 0 <= pct <= 100:
            raise PPLSyntaxError(f"percentile out of [0,100]: {pct}")
        # exact linear-interpolation percentile — same definition as
        # DuckDB's quantile_cont, so oracles replay it
        col = F.expr(f"percentile({arg}, {pct / 100})")
        default = f"p{pct}_{arg}"
    else:
        col, default = getattr(F, fn)(arg), f"{fn}_{arg}"
    return col.alias(alias or default)


def ppl(spark: SparkSession, sf_dir: str, query: str,
        resolver=None) -> DataFrame:
    """Compile a PPL pipeline into one DataFrame plan.

    ``resolver(name) -> DataFrame`` overrides table lookup for the
    ``source=`` stage and join/lookup right sides — the engine façade
    passes one that reads live CDC mirror views, so the same pipeline
    text runs against the always-current mirror instead of registry
    parquet."""
    if resolver is None:
        def resolver(name: str) -> DataFrame:
            return load_table(spark, sf_dir, name)
    stages = [s.strip() for s in query.strip().split("|")]
    m = re.fullmatch(r"source\s*=\s*([A-Za-z_0-9]+)", stages[0])
    if not m:
        raise PPLSyntaxError(f"pipeline must start with source=<table>: {stages[0]!r}")
    df = resolver(m.group(1))
    last_sort: list = []  # remembered for trendline's window order

    for stage in stages[1:]:
        cmd, _, rest = stage.partition(" ")
        cmd, rest = cmd.lower(), rest.strip()
        if cmd == "where":
            df = df.filter(_compile_condition(rest))
        elif cmd == "fields":
            drop = rest.startswith("-")
            cols = [c.strip() for c in rest.lstrip("+-").split(",") if c.strip()]
            df = df.drop(*cols) if drop else df.select(*cols)
        elif cmd == "eval":
            name, eq, expr = rest.partition("=")
            if not eq:
                raise PPLSyntaxError(f"eval needs name = expr: {rest!r}")
            _check_eval_expr(expr)
            df = df.withColumn(name.strip(), F.expr(expr.strip()))
        elif cmd == "stats":
            by_match = re.search(r"\s+by\s+(.+)$", rest, flags=re.I)
            agg_text = rest[: by_match.start()] if by_match else rest
            # paren-aware split: percentile(value, 90) carries a comma
            aggs = [_agg_expr(a) for a in _split_top_level(agg_text)]
            if by_match:
                keys = []
                # comma-split that respects parens/quotes (span(ts, 1d))
                by_parts = _split_top_level(by_match.group(1))
                for k in by_parts:
                    k = k.strip()
                    # the UNIT is case-sensitive (PPL convention:
                    # m=minute, M=month); only the keyword/field parts
                    # are case-insensitive
                    sm = re.fullmatch(
                        r"(?i:span)\(\s*([A-Za-z_0-9]+)\s*,"
                        r"\s*(\d+)(m|h|d|w|M)\s*\)"
                        r"(?:\s+(?i:as)\s+([A-Za-z_0-9]+))?",
                        k,
                    )
                    if sm:
                        f, n, unit, alias = sm.groups()
                        n = int(n)
                        if n < 1:
                            raise PPLSyntaxError(f"span width must be >= 1: {k!r}")
                        if unit == "M":
                            # months are irregular — calendar truncation
                            # only, and only 1M is well-defined
                            if n != 1:
                                raise PPLSyntaxError(
                                    "only span(field, 1M) is supported for months"
                                )
                            key = F.date_trunc("month", F.col(f))
                        elif n == 1 and unit in ("h", "d"):
                            trunc = {"d": "day", "h": "hour"}[unit]
                            key = F.date_trunc(trunc, F.col(f))
                        else:
                            # N-unit buckets: floor the epoch to the span
                            # width. Weeks anchor to the epoch's first
                            # Monday (1970-01-05) so every Nw span shares
                            # the 1w/date_trunc('week') boundaries;
                            # m/h/d anchor to the Unix origin.
                            secs = n * {"m": 60, "h": 3600, "d": 86400,
                                        "w": 604800}[unit]
                            anchor = 345600 if unit == "w" else 0
                            # floor, not cast("long"): cast truncates
                            # toward zero, so pre-anchor timestamps
                            # (pre-1970; 1970-01-01..04 for weeks)
                            # would land one bucket too high and
                            # diverge from floor-division oracles
                            key = F.timestamp_seconds(
                                F.floor(
                                    (F.unix_timestamp(F.col(f)) - anchor)
                                    / secs
                                ).cast("long") * secs + anchor
                            )
                        keys.append(key.alias(alias or f))
                    else:
                        keys.append(F.col(k))
                df = df.groupBy(*keys).agg(*aggs)
            else:
                df = df.agg(*aggs)
        elif cmd == "sort":
            orders = []
            for part in rest.split(","):
                part = part.strip()
                if part.startswith("-"):
                    orders.append(F.col(part[1:]).desc())
                else:
                    orders.append(F.col(part.lstrip("+")).asc())
            last_sort = orders
            df = df.orderBy(*orders)
        elif cmd == "head":
            df = df.limit(int(rest))
        elif cmd == "dedup":
            cols = [c.strip() for c in rest.split(",")]
            df = df.select(*cols).distinct()
        elif cmd == "rename":
            for pair in rest.split(","):
                pm = re.fullmatch(
                    r"\s*([A-Za-z_0-9]+)\s+as\s+([A-Za-z_0-9]+)\s*", pair, re.I
                )
                if not pm:
                    raise PPLSyntaxError(f"bad rename: {pair!r}")
                df = df.withColumnRenamed(pm.group(1), pm.group(2))
        elif cmd in ("parse", "grok"):
            pm = re.fullmatch(r"([A-Za-z_0-9]+)\s+'(.+)'", rest, re.S)
            if not pm:
                raise PPLSyntaxError(f"{cmd} needs: field '<pattern>': {rest!r}")
            field, pattern = pm.group(1), pm.group(2)
            if cmd == "grok":
                pattern = _grok_to_regex(pattern)
            # introspect named groups with Python re (accepts both
            # (?P<n>...) and Java's (?<n>...)). Names may contain
            # underscores (standard grok style: %{IP:client_ip}) —
            # Java named groups can't, so Spark gets the pattern with
            # names STRIPPED to plain groups (extraction is by index,
            # and stripping preserves group numbering).
            py_pattern = re.sub(
                r"\(\?<([A-Za-z][A-Za-z0-9_]*)>", r"(?P<\1>", pattern
            )
            try:
                compiled = re.compile(py_pattern)
            except re.error as exc:
                raise PPLSyntaxError(f"bad parse regex: {exc}") from exc
            if not compiled.groupindex:
                raise PPLSyntaxError(f"{cmd} regex needs >=1 named group")
            java_pattern = re.sub(
                r"\(\?P<[A-Za-z][A-Za-z0-9_]*>", "(", py_pattern
            )
            for name, idx in compiled.groupindex.items():
                df = df.withColumn(
                    name, F.regexp_extract(F.col(field), java_pattern, idx)
                )
        elif cmd == "patterns":
            tm = re.fullmatch(
                r"([A-Za-z_0-9]+)(?:\s+as\s+([A-Za-z_0-9]+))?", rest, flags=re.I
            )
            if not tm:
                raise PPLSyntaxError(f"patterns needs: field [as alias]: {rest!r}")
            field, alias = tm.group(1), tm.group(2) or "patterns_field"
            df = df.withColumn(
                alias, F.regexp_replace(F.col(field), "[a-zA-Z0-9]", "")
            )
        elif cmd == "eventstats":
            from pyspark.sql import Window

            by_match = re.search(r"\s+by\s+(.+)$", rest, flags=re.I)
            agg_text = rest[: by_match.start()] if by_match else rest
            keys = (
                [k.strip() for k in by_match.group(1).split(",")]
                if by_match
                else []
            )
            parsed = []
            for a in _split_top_level(agg_text):
                m2 = re.fullmatch(
                    r"\s*([a-z]+)\s*\(\s*([A-Za-z_0-9]*)\s*\)"
                    r"\s*(?:as\s+([A-Za-z_0-9]+))?\s*",
                    a,
                    flags=re.I,
                )
                if not m2 or m2.group(1).lower() not in _AGGS:
                    raise PPLSyntaxError(f"bad eventstats aggregate: {a!r}")
                fn, arg, alias = m2.group(1).lower(), m2.group(2), m2.group(3)
                if fn == "percentile":
                    raise PPLSyntaxError(
                        "percentile is a stats aggregate, not eventstats"
                    )
                default = "count" if fn == "count" else f"{fn}_{arg}"
                if fn == "dc":
                    default = f"dc_{arg}"
                parsed.append((fn, arg, alias or default))
            if keys:
                w = Window.partitionBy(*keys)
                for fn, arg, out_name in parsed:
                    if fn == "count":
                        wcol = F.count(F.lit(1)).over(w)
                    elif fn == "dc":
                        # exact distinct over the partition via
                        # collect_set size (no approx: parity is exact)
                        wcol = F.size(F.collect_set(arg).over(w)).cast("long")
                    else:
                        wcol = _EVENTSTATS_FN.get(fn, getattr(F, fn, None))(
                            arg
                        ).over(w)
                    df = df.withColumn(out_name, wcol)
            else:
                # global eventstats: a keyless window would move the
                # whole table into ONE partition — use a broadcast
                # 1-row aggregate crossJoin instead (same columns).
                # Aggregate BEFORE dropping, then drop colliding names
                # so an alias shadowing an input column REPLACES it —
                # identical semantics to the keyed withColumn path.
                aggs = []
                for fn, arg, out_name in parsed:
                    if fn == "count":
                        aggs.append(F.count(F.lit(1)).alias(out_name))
                    elif fn == "dc":
                        aggs.append(F.countDistinct(arg).alias(out_name))
                    else:
                        aggs.append(
                            _EVENTSTATS_FN.get(fn, getattr(F, fn, None))(
                                arg
                            ).alias(out_name)
                        )
                totals = df.agg(*aggs)
                collide = [n for _, _, n in parsed if n in df.columns]
                df = df.drop(*collide).crossJoin(F.broadcast(totals))
        elif cmd == "fillnull":
            fm = re.fullmatch(
                r"with\s+(.+?)\s+in\s+(.+)$", rest, flags=re.I | re.S
            )
            if not fm:
                raise PPLSyntaxError(f"fillnull needs: with <lit> in f1[,f2]: {rest!r}")
            val = _parse_literal(fm.group(1))
            for f in fm.group(2).split(","):
                f = f.strip()
                df = df.withColumn(f, F.coalesce(F.col(f), F.lit(val)))
        elif cmd == "trendline":
            tm = re.fullmatch(
                r"sma\(\s*(\d+)\s*,\s*([A-Za-z_0-9]+)\s*\)"
                r"(?:\s+as\s+([A-Za-z_0-9]+))?",
                rest,
                flags=re.I,
            )
            if not tm:
                raise PPLSyntaxError(f"trendline needs sma(N, field): {rest!r}")
            if not last_sort:
                raise PPLSyntaxError("trendline requires a preceding sort")
            from pyspark.sql import Window

            n, field, alias = int(tm.group(1)), tm.group(2), tm.group(3)
            w = Window.orderBy(*last_sort).rowsBetween(-(n - 1), 0)
            sma = F.when(
                F.count(F.lit(1)).over(w) >= n, F.avg(field).over(w)
            )
            df = df.withColumn(alias or f"{field}_trendline", sma)
        elif cmd == "join":
            jm = re.fullmatch(
                r"(?:type\s*=\s*(inner|left)\s+)?on\s+([A-Za-z_0-9]+)"
                r"\s+([A-Za-z_0-9]+)",
                rest,
                flags=re.I,
            )
            if not jm:
                raise PPLSyntaxError(
                    f"join needs: [type=inner|left] on <field> <table>: {rest!r}"
                )
            how = (jm.group(1) or "inner").lower()
            on_field = jm.group(2)
            right = resolver(jm.group(3))
            # only the join key may be shared: right payload columns
            # that collide with existing left names would yield
            # duplicate columns and ambiguous-reference errors in any
            # later stage — drop them (left side wins)
            dup = [c for c in right.columns
                   if c != on_field and c in df.columns]
            df = df.join(right.drop(*dup), on=on_field, how=how)
        elif cmd == "lookup":
            lm = re.fullmatch(
                r"([A-Za-z_0-9]+)\s+([A-Za-z_0-9]+)"
                r"(?:\s+as\s+([A-Za-z_0-9]+))?",
                rest,
                flags=re.I,
            )
            if not lm:
                raise PPLSyntaxError(
                    f"lookup needs: <table> <lookup_field> [as <local_field>]: {rest!r}"
                )
            table, lk_field, local = lm.group(1), lm.group(2), lm.group(3)
            right = resolver(table)
            # enrichment dimension: broadcast, left-preserving. The
            # documented contract appends only the ENRICHMENT columns,
            # so right columns whose names already exist on the left
            # are dropped first — keeping them would create duplicate
            # names that break any later stage referencing them.
            dup = [c for c in right.columns
                   if c != lk_field and c in df.columns]
            right = right.drop(*dup)
            if local:
                df = df.join(
                    F.broadcast(right), df[local] == right[lk_field], "left"
                ).drop(right[lk_field])
            else:
                df = df.join(F.broadcast(right), on=lk_field, how="left")
        elif cmd == "ad":
            # anomaly detection command. The hosted PPL `ad` runs an
            # RCF model; this engine's deterministic analog is the
            # z-score detector (same interface: rows back with score +
            # anomaly flag appended). |z| uses the population stddev
            # over the whole frame (or per `by` group), computed as a
            # broadcast 1-row (or per-key window) aggregate — the same
            # shapes as eventstats, no single-partition pass over data
            # rows.
            am = re.fullmatch(
                r"([A-Za-z_0-9]+)(?:\s+threshold\s*=\s*"
                r"(\d+(?:\.\d+)?))?(?:\s+by\s+([A-Za-z_0-9]+))?",
                rest,
                flags=re.I,
            )
            if not am:
                raise PPLSyntaxError(
                    f"ad needs: <field> [threshold=N] [by <key>]: {rest!r}"
                )
            fld, thr, key = am.group(1), float(am.group(2) or 3.0), am.group(3)
            if key:
                from pyspark.sql import Window

                w = Window.partitionBy(key)
                mu = F.avg(fld).over(w)
                sd = F.stddev_pop(fld).over(w)
                z = F.when(sd > 0, (F.col(fld) - mu) / sd).otherwise(F.lit(0.0))
                # NULL field values score 0 / anomaly 0 (not NULL): the
                # column contract is 0/1, and an un-coalesced NULL makes
                # `where anomaly = 1` silently skip those rows
                df = df.withColumn(
                    "score", F.coalesce(F.round(z, 4), F.lit(0.0))
                ).withColumn(
                    "anomaly", (F.abs(F.col("score")) > thr).cast("int")
                )
            else:
                stats_row = df.agg(
                    F.avg(fld).alias("_mu"),
                    F.stddev_pop(fld).alias("_sd"),
                )
                df = df.crossJoin(F.broadcast(stats_row))
                z = F.when(
                    F.col("_sd") > 0,
                    (F.col(fld) - F.col("_mu")) / F.col("_sd"),
                ).otherwise(F.lit(0.0))
                # NULL field → score 0 / anomaly 0 (see `by` branch)
                df = df.withColumn(
                    "score", F.coalesce(F.round(z, 4), F.lit(0.0))
                ).withColumn(
                    "anomaly", (F.abs(F.col("score")) > thr).cast("int")
                ).drop("_mu", "_sd")
        elif cmd == "expand":
            # multivalue fan-out: one output row per array element,
            # other fields preserved (the OpenSearch `expand` command).
            # explode is a generator in the scan stage — no shuffle;
            # at 100 TB the fan-out multiplies rows map-side only
            em = re.fullmatch(
                r"([A-Za-z_0-9]+)(?:\s+as\s+([A-Za-z_0-9]+))?",
                rest, flags=re.I,
            )
            if not em:
                raise PPLSyntaxError(f"expand needs: <field> [as <alias>]: {rest!r}")
            fld, alias = em.group(1), em.group(2)
            df = df.withColumn(alias or fld, F.explode(F.col(fld)))
            if alias and alias != fld:
                df = df.drop(fld)
        elif cmd == "fieldsummary":
            # per-field profile (the OpenSearch fieldsummary command):
            # count / distinct / min / max / nulls for each requested
            # field, ONE aggregation pass (all per-field aggregates are
            # partial+final over the scan), then a constant-width stack
            # unpivot of the 1-row wide result. min/max surface as
            # strings so mixed-type fields share one output column.
            fm = re.fullmatch(
                r"includefields\s*=\s*([A-Za-z_0-9,\s]+)", rest, flags=re.I
            )
            if not fm:
                raise PPLSyntaxError(
                    f"fieldsummary needs: includefields=f1[,f2...]: {rest!r}"
                )
            flds = [f.strip() for f in fm.group(1).split(",") if f.strip()]
            aggs = []
            for i, f in enumerate(flds):
                aggs += [
                    F.count(F.col(f)).alias(f"_c{i}"),
                    F.countDistinct(F.col(f)).alias(f"_d{i}"),
                    F.min(F.col(f)).cast("string").alias(f"_mn{i}"),
                    F.max(F.col(f)).cast("string").alias(f"_mx{i}"),
                    F.sum(F.col(f).isNull().cast("long")).alias(f"_n{i}"),
                ]
            wide = df.agg(*aggs)
            stack_args = ", ".join(
                f"'{f}', _c{i}, _d{i}, _mn{i}, _mx{i}, _n{i}"
                for i, f in enumerate(flds)
            )
            df = wide.select(F.expr(
                f"stack({len(flds)}, {stack_args}) AS "
                "(field, count, distinct_count, min, max, nulls)"
            ))
        elif cmd in ("top", "rare"):
            tm = re.fullmatch(r"(\d+)\s+([A-Za-z_0-9]+)", rest)
            if not tm:
                raise PPLSyntaxError(f"bad {cmd}: {rest!r}")
            n, field = int(tm.group(1)), tm.group(2)
            counted = df.groupBy(field).agg(F.count(F.lit(1)).alias("count"))
            order = (
                [F.col("count").desc(), F.col(field).asc()]
                if cmd == "top"
                else [F.col("count").asc(), F.col(field).asc()]
            )
            df = counted.orderBy(*order).limit(n)
        else:
            raise PPLSyntaxError(f"unknown PPL stage: {stage!r}")
    return df
