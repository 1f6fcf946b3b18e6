"""Byte-pair-encoding merge training and application — the tokenizer-
training step of a large-scale text pipeline (Sennrich et al. 2016;
the GPT-2 training recipe), Spark-first.

The classic algorithm never touches the corpus per iteration: it
operates on the DISTINCT-WORD frequency table. Each word is a
sentinel-padded, space-joined symbol string (`' a b c '`), and one
merge step is (a) count adjacent symbol pairs weighted by word
frequency, (b) pick the most frequent pair (ties broken
lexicographically — deterministic across engines), (c) apply the
merge as a LITERAL string replace of ``' l r '`` with ``' lr '``
(left-to-right non-overlapping — what both Spark's ``replace`` and
DuckDB's ``replace`` do, so the whole training loop is
value-checkable in SQL by unrolling the iterations).

SEMANTICS NOTE — runs of a self-adjacent pair: consecutive
occurrences of the same pair share their delimiter space, and a
single replace pass consumes it, so a run like ``a a a a`` merges to
``aa a a`` in one (l=r) merge application, where canonical BPE's
tokenwise greedy scan yields ``aa aa``. This single-pass-replace
semantics is DEFINED behavior here (deterministic, identical in both
engines, hence oracle-checkable; RE2 has no lookahead, so the
canonical scan is not portably expressible as a regex). It deviates
from Sennrich/GPT-2 only within runs of 3+ identical adjacent
symbols — absent from natural-language vocabularies at any
frequency that would win a merge; on run-free corpora (the canonical
low/lower/newest example, pinned in tests) the two coincide exactly.

Scale shape: the corpus is scanned ONCE to build the word-frequency
table (map-side combine on the word hash); each of the N merge
iterations is a small job over the ~|vocab|-row symbol table — pair
explosion via zip-of-slices (no index lambda, no O(n²) HOF
re-derivation), a (l, r)-keyed partial agg, and a 1-row driver argmax
(the merge decision IS a driver-side scalar by nature). The symbol
table is localCheckpointed per iteration so the plan stays flat
across iterations instead of stacking N replaces × N scans.

Production merge counts (round 12): ``bpe_train`` pays one Spark job
per merge and ``bpe_token_counts`` one plan-side replace per merge —
right at 8, wrong at a real tokenizer's 30k. ``bpe_train_local``
keeps the one distributed corpus pass and runs the merge loop on the
driver over the vocabulary-bounded table (decision-identical,
equivalence-pinned); ``bpe_token_counts_arrow`` ships the merge list
into a mapInPandas encoder with a distinct-word cache
(row-identical, constant plan size). Measured curves: SCALE.md §21.

Reference behavior: the tokenizer-training stage feeding the
reference stack's ingest analyzers (README.md:18-22 pipeline framing);
token budgets (`text.bpe_token_count`) consume the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def word_frequency(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): the analyzer-normalized distinct-word table — ONE
    corpus scan with map-side combine; everything BPE does afterwards
    is over this table, never the corpus."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _symbolized(wf: DataFrame) -> DataFrame:
    """Each word as a sentinel-padded space-joined char string:
    'abc' -> ' a b c '. The padding makes every merge a whole-symbol
    literal replace with no boundary ambiguity."""
    return wf.select(
        "cnt",
        F.concat(
            F.lit(" "), F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(" ")
        ).alias("s"),
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency. Pairs come
    from a zip of two array SLICES (never an index lambda over a
    derived array — the O(n²) interpreted-HOF hazard)."""
    toks = F.split(F.trim(F.col("s")), " ")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("l"),
        F.slice(toks, 2, F.size(toks) - 1).alias("r"),
    )
    return (
        sym.filter(F.size(toks) >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("total"))
    )


def _symbol_counts(sym: DataFrame) -> DataFrame:
    """Weighted per-symbol occurrence counts over the symbolized
    table — the denominator of the WordPiece likelihood score. One
    explode + (symbol)-keyed partial agg, map-side combined."""
    return (
        sym.select(
            "cnt", F.explode(F.split(F.trim(F.col("s")), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.sum("cnt").alias("tc"))
    )


def wordpiece_train(docs: DataFrame, text_col: str, num_merges: int = 8,
                    min_freq: int = 1
                    ) -> list[tuple[int, str, str, float]]:
    """WordPiece-objective merge training (Schuster & Nakajima 2012;
    the BERT tokenizer recipe): identical loop shape to ``bpe_train``
    but each iteration picks the pair maximizing the LIKELIHOOD score
    count(l,r) / (count(l) * count(r)) instead of the raw pair count —
    the greedy step that maximizes the corpus LM likelihood gain of
    the merged unit. Returns [(rank, left, right, score)].

    Determinism contract: the score is one IEEE double division of
    two exact int64s (count(l,r) cast to double, divided by the int64
    product count(l)*count(r)) — both engines compute the identical
    double from identical integers, so the argmax (score desc, l, r)
    is value-checkable in DuckDB by unrolling the iterations exactly
    like the BPE oracle. Merge application is the same sentinel-padded
    single-pass literal replace as BPE (see module docstring for the
    defined run semantics).

    Scale shape: same as ``bpe_train`` — one corpus scan up front,
    then per-iteration jobs over the ~|vocab|-row symbol table (pair
    counts + symbol counts + a 2-way broadcastable join + a 1-row
    argmax). The driver-loop production variant of bpe_train_local
    applies unchanged if merge counts grow."""
    sym = _symbolized(word_frequency(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, float]] = []
    for rank in range(num_merges):
        counts = _symbol_counts(sym)
        top = (
            _pair_counts(sym)
            .join(counts.withColumnRenamed("tok", "l")
                        .withColumnRenamed("tc", "lc"), "l")
            .join(counts.withColumnRenamed("tok", "r")
                        .withColumnRenamed("tc", "rc"), "r")
            .withColumn(
                "score",
                F.col("total").cast("double") / (F.col("lc") * F.col("rc")),
            )
            .orderBy(F.col("score").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_freq:
            break
        l, r, score = top[0]["l"], top[0]["r"], top[0]["score"]
        merges.append((rank, l, r, score))
        sym = sym.select(
            "cnt",
            F.replace(
                F.col("s"), F.lit(f" {l} {r} "), F.lit(f" {l}{r} ")
            ).alias("s"),
        ).localCheckpoint(eager=True)
    return merges


def wordpiece_token_counts_arrow(
    docs: DataFrame, text_col: str, id_col: str,
    merges: list[tuple[int, str, str, float]]
) -> DataFrame:
    """WordPiece INFERENCE — greedy longest-match-first (max-munch)
    tokenization against the learned vocabulary, the BERT tokenizer's
    encode step (Schuster & Nakajima 2012; continuation-prefix ``##``
    marking is out of scope — this vocab carries no positional
    variants). The vocabulary is the merge products (all >= 2 chars);
    any single character is implicitly a token (the [UNK]-free
    fallback — every corpus char is a base symbol by construction).
    Returns (id, n_words, n_tokens_wp).

    Same Arrow shape as ``bpe_token_counts_arrow``: stateless
    mapInPandas over batches, per-partition distinct-word cache, plan
    size constant in vocab size. The max-munch loop is O(maxlen) per
    position with a set probe per length — vocabulary-bounded, never
    corpus-bounded. The DuckDB oracle replays max-munch as a
    recursive CTE over the DISTINCT-word table (one row per (word,
    position) step), so the greedy decisions are value-checked."""
    import re

    import pandas as pd

    from pyspark.sql import types as T

    vocab = {l + r for _, l, r, _ in merges}
    maxlen = max((len(t) for t in vocab), default=1)
    ws_re = re.compile(r"\s+", re.ASCII)

    out_schema = T.StructType([
        T.StructField("id", docs.schema[id_col].dataType),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_tokens_wp", T.LongType()),
    ])

    def encode(batches):
        cache: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = cache.get(w)
            if n is None:
                pos, n = 0, 0
                wl = len(w)
                while pos < wl:
                    step = 1
                    for ln in range(min(maxlen, wl - pos), 1, -1):
                        if w[pos:pos + ln] in vocab:
                            step = ln
                            break
                    pos += step
                    n += 1
                cache[w] = n
            return n

        for pdf in batches:
            ids, n_words, n_tokens = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in ws_re.split((t or "").lower()) if w]
                ids.append(i)
                n_words.append(len(ws))
                n_tokens.append(sum(word_tokens(w) for w in ws))
            yield pd.DataFrame(
                {"id": ids, "n_words": n_words, "n_tokens_wp": n_tokens}
            )

    return docs.select(id_col, text_col).mapInPandas(encode, out_schema)


def bpe_train(docs: DataFrame, text_col: str, num_merges: int = 8,
              min_freq: int = 1) -> list[tuple[int, str, str]]:
    """Learn ``num_merges`` BPE merges over the corpus; returns
    [(rank, left, right)] in learning order. Stops early if the best
    remaining pair's weighted count drops below ``min_freq`` (or no
    pairs remain). The merge list is the driver-side scalar output of
    the algorithm (one row per iteration by construction — this is
    not a distributed-result collect)."""
    spark = docs.sparkSession
    sym = _symbolized(word_frequency(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(sym)
            .orderBy(F.col("total").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_freq:
            break
        l, r = top[0]["l"], top[0]["r"]
        merges.append((rank, l, r))
        sym = sym.select(
            "cnt",
            F.replace(
                F.col("s"), F.lit(f" {l} {r} "), F.lit(f" {l}{r} ")
            ).alias("s"),
        ).localCheckpoint(eager=True)  # keep the plan flat per iteration
    return merges


def bpe_train_local(docs: DataFrame, text_col: str, num_merges: int = 8,
                    min_freq: int = 1) -> list[tuple[int, str, str]]:
    """``bpe_train`` at production merge counts: ONE distributed
    word-frequency pass (the only corpus-sized work the algorithm
    has), then the merge loop runs on the DRIVER over the collected
    vocabulary-bounded table — zero Spark jobs per iteration, so
    training 30k merges is 30k dict updates instead of 30k cluster
    jobs. The collect is O(|vocab|), the classical justification for
    every BPE trainer being single-node after the count.

    Decision semantics are byte-identical to ``bpe_train`` (same
    weighted pair counts, same (total desc, l, r) tie-break, same
    single-pass left-to-right literal replace — Python ``str.replace``
    matches Spark/DuckDB ``replace``), pinned by an equivalence test;
    the distributed loop stays as the cross-check for small n. Pair
    counts are maintained INCREMENTALLY: a merge re-derives only the
    words that contain its pair (a pair -> word-ids index, stale
    entries re-checked on use), so per-merge cost tracks the touched
    vocabulary slice, not |vocab|."""
    from collections import defaultdict

    rows = word_frequency(docs, text_col).collect()  # one corpus pass
    words: list[list] = [
        [" " + " ".join(r["w"]) + " ", r["cnt"]] for r in rows
    ]

    def pairs_of(s: str):
        toks = s.strip().split(" ")
        return zip(toks, toks[1:])

    totals: dict = defaultdict(int)
    index: dict = defaultdict(set)  # pair -> word ids (may go stale)
    for i, (s, cnt) in enumerate(words):
        for p in pairs_of(s):
            totals[p] += cnt
            index[p].add(i)

    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        best, best_t = None, 0
        for p, t in totals.items():
            if t > best_t or (t == best_t and best is not None
                              and p < best):
                best, best_t = p, t
        if best is None or best_t < min_freq:
            break
        l, r = best
        merges.append((rank, l, r))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        for i in index.pop(best, ()):
            s, cnt = words[i]
            if pat not in s:
                continue  # stale index entry
            new_s = s.replace(pat, rep)
            for p in pairs_of(s):
                totals[p] -= cnt
                if totals[p] == 0:
                    del totals[p]
            for p in pairs_of(new_s):
                totals[p] += cnt
                index[p].add(i)
            words[i][0] = new_s
    return merges


def merges_frame(spark, merges: list[tuple[int, str, str]]) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right,
    merged) — the artifact a tokenizer ships."""
    return spark.createDataFrame(
        [(rank, l, r, l + r) for rank, l, r in merges],
        "rank int, left string, right string, merged string",
    )


def _encode_word(word: Column, merges: list[tuple[int, str, str]]) -> Column:
    """Symbolize one word and apply the merges in rank order — each a
    literal replace, all inside the scan projection."""
    s = F.concat(F.lit(" "), F.concat_ws(" ", F.split(word, "")), F.lit(" "))
    for _, l, r in merges:
        s = F.replace(s, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
    return s


def bpe_token_counts(docs: DataFrame, text_col: str, id_col: str,
                     merges: list[tuple[int, str, str]]) -> DataFrame:
    """Apply a learned merge list to every document: per-word
    encoding (merges never cross word boundaries, exactly like the
    reference algorithm) via a transform whose lambda works on its
    OWN element, then the per-doc BPE token count. Returns
    (id, n_words, n_tokens_bpe). Everything is scan-stage expressions
    — no shuffle beyond the source read."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    per_word = F.transform(
        words, lambda w: F.size(F.split(F.trim(_encode_word(w, merges)), " "))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(words).alias("n_words"),
        F.aggregate(
            per_word, F.lit(0), lambda acc, n: acc + n
        ).alias("n_tokens_bpe"),
    )


def bpe_token_counts_arrow(docs: DataFrame, text_col: str, id_col: str,
                           merges: list[tuple[int, str, str]]) -> DataFrame:
    """``bpe_token_counts`` at production merge counts: the expression
    form inlines one ``replace`` per merge into the scan projection —
    right at 8 merges, but Catalyst plan-time cost grows with
    expression-tree size, so 32k chained replaces won't codegen. This
    form ships the merge list into an Arrow-batched ``mapInPandas``
    encoder instead: plan size is CONSTANT in the merge count, each
    partition encodes every DISTINCT word once (a word -> token-count
    cache — Zipf makes the cache hit rate the dominant term), and a
    merge is applied only after an ``in`` containment probe, so
    per-word cost tracks the merges that actually fire. Output and
    semantics are identical to the expression form (equivalence-tested
    at n=8): same ASCII ``\\s+`` split, same sentinel-padded
    single-pass left-to-right replaces.

    Scale: stateless per-partition streaming over Arrow batches — no
    shuffle, no driver involvement, caches bounded by per-partition
    distinct words. The deliberate Python hop is the documented
    trade: constant plan vs JVM codegen of an expression tree that
    stops compiling orders of magnitude below real tokenizer sizes."""
    import re

    import pandas as pd

    from pyspark.sql import types as T

    pats = [(f" {l} {r} ", f" {l}{r} ") for _, l, r in merges]
    ws_re = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only

    out_schema = T.StructType([
        T.StructField("id", docs.schema[id_col].dataType),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_tokens_bpe", T.LongType()),
    ])

    def encode(batches):
        cache: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = cache.get(w)
            if n is None:
                s = " " + " ".join(w) + " "
                for pat, rep in pats:
                    if pat in s:
                        s = s.replace(pat, rep)
                n = s.count(" ") - 1  # k tokens <=> k+1 delimiters
                cache[w] = n
            return n

        for pdf in batches:
            ids, n_words, n_tokens = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in ws_re.split((t or "").lower()) if w]
                ids.append(i)
                n_words.append(len(ws))
                n_tokens.append(sum(word_tokens(w) for w in ws))
            yield pd.DataFrame(
                {"id": ids, "n_words": n_words, "n_tokens_bpe": n_tokens}
            )

    return docs.select(id_col, text_col).mapInPandas(encode, out_schema)
