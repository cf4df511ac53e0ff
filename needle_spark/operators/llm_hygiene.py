"""Training-data hygiene operators for LLM pipelines: benchmark
decontamination, Gopher-style quality rules, and deterministic
stratified sampling (domain mixing).

All three are pure Catalyst expressions (no Python UDFs) with exact
DuckDB SQL twins, so each is oracle-checkable and runs inside the scan
projection at corpus scale.

Scale posture (100 TB):
- decontaminate: benchmark n-grams are a small, distinct set — the
  membership join broadcasts; the corpus side explodes n-grams map-side
  and aggregates with map-side combine.  No corpus-side shuffle beyond
  the per-doc count aggregation.
- gopher_quality: map-only column expressions in the scan.
- stratified_sample: map-only md5 threshold test; no shuffle at all.
  md5 (not xxhash64) because both engines implement it identically,
  which makes the sample reproducible across systems.

Method references (public): GPT-3 paper (Brown et al. 2020) 13-gram
decontamination; Gopher paper (Rae et al. 2021) quality heuristics.
The reference engine has no equivalents — these extend SURVEY §2's
LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"


def _words(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)


def word_ngrams_expr(text_col: Column | str, n: int) -> Column:
    """Space-joined word n-grams (empty array when the doc has < n
    words).  Matches the DuckDB twin token-for-token.  The token array
    is let-bound so the tokenizing regexp evaluates once per row, not
    once per gram start (see functions.text.let_expr); the hot
    decontaminate path uses _gram_frame (materialized tokens + ml
    NGram) instead."""
    from needle_spark.functions.text import let_expr

    def body(toks):
        starts = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
        grams = F.transform(
            starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
        return F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>"))

    return let_expr(_words(text_col), body)


def _gram_frame(df: DataFrame, keep_cols: list, text_col: str, n: int) -> DataFrame:
    """(keep_cols..., __grams array<string>) with the token array
    materialized in its own projection first.  word_ngrams_expr embeds
    the tokenizing regexp inside the transform() lambda, and Catalyst
    does not hoist loop-invariant subexpressions out of interpreted
    higher-order functions — the regexp re-ran per n-gram START index
    (measured 4.29 s for one pass over sf0.1 documents).  Materializing
    the tokens (one regexp per row) and assembling the sliding windows
    in pyspark.ml.feature.NGram (a JVM sliding-iterator UDF) computes
    the identical gram arrays in 0.34 s — value-equality checked both
    ways with exceptAll on the same corpus."""
    from pyspark.ml.feature import NGram

    toked = df.select(
        *keep_cols,
        F.coalesce(_words(text_col),
                   F.array().cast("array<string>")).alias("__toks"))
    return (NGram(n=n, inputCol="__toks", outputCol="__grams")
            .transform(toked).drop("__toks"))


def duckdb_word_ngrams_sql(text_expr: str, n: int) -> str:
    """DuckDB twin of word_ngrams_expr (1-based inclusive slices)."""
    toks = f"regexp_extract_all(lower({text_expr}), '{WORD_RE}')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string({toks}[i : i + {n} - 1], ' ')) "
        f"ELSE [] END"
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Flag corpus documents sharing any word n-gram with a benchmark
    (evaluation) set — the GPT-3-style decontamination test.

    Returns (id_col, matched_ngrams, contaminated) for EVERY corpus doc;
    filter on `contaminated` to drop leaks.  The benchmark n-gram set is
    distinct'd then broadcast — it is small by construction (eval sets),
    so the corpus side never shuffles its exploded n-grams.
    """
    btc = benchmark_text_col or text_col
    bench_grams = (
        _gram_frame(benchmark, [], btc, n)
        .select(F.explode("__grams").alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # explode_outer keeps gram-less docs as a null-gram row, so ONE
    # corpus scan yields every doc's count (no separate id scan + join
    # back); nulls never match the broadcast set -> count 0
    corpus_grams = _gram_frame(corpus, [F.col(id_col)], text_col, n).select(
        F.col(id_col), F.explode_outer("__grams").alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias(
            "matched_ngrams"))
        .select(
            id_col,
            "matched_ngrams",
            (F.col("matched_ngrams") > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    n: int = 13,
    corpus_table: str = "documents",
    benchmark_filter: str = "doc_id % 10 = 0",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of decontaminate() where the benchmark is a filtered
    subset of the corpus table (the driver-query configuration)."""
    grams = duckdb_word_ngrams_sql(text_col, n)
    return f"""
WITH bench AS (
  SELECT DISTINCT g.gram
  FROM {corpus_table}, UNNEST({grams}) AS g(gram)
  WHERE {benchmark_filter}
),
corpus AS (
  SELECT {id_col}, {grams} AS grams FROM {corpus_table}
  WHERE NOT ({benchmark_filter})
),
hits AS (
  SELECT c.{id_col}, count(*) AS matched_ngrams
  FROM corpus c, UNNEST(c.grams) AS g(gram)
  WHERE g.gram IN (SELECT gram FROM bench)
  GROUP BY c.{id_col}
)
SELECT c.{id_col},
       CAST(coalesce(h.matched_ngrams, 0) AS BIGINT) AS matched_ngrams,
       coalesce(h.matched_ngrams, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits h USING ({id_col})
"""


# ------------------------------------------------- Gopher quality rules --

# Public thresholds from the Gopher paper's quality filter.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRACTION = 0.9
GOPHER_MAX_DUP_LINE_FRACTION = 0.3
GOPHER_MIN_ALPHA_FRACTION = 0.8

_BULLET_RE = "^\\s*[-*•]"


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Gopher-style quality signals + pass flag, all as
    scan-projection expressions (map-only, shuffle-free)."""
    words = _words(text_col)
    n_words = F.size(words).cast("long")
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    text = F.col(text_col)
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0, (hash_count + ellipsis_count).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE))).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))

    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        dup_line_frac.alias("dup_line_frac"),
        alpha_frac.alias("alpha_frac"),
    )
    passes = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_frac") <= GOPHER_MAX_BULLET_FRACTION)
        & (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRACTION)
        & (F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRACTION)
    )
    return out.withColumn("passes", passes)


def gopher_quality_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin of gopher_quality (same op order, same guards)."""
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}')"
    lines = (f"list_filter(string_split({text_col}, chr(10)), "
             f"l -> length(trim(l)) > 0)")
    return f"""
WITH m AS (
  SELECT {id_col},
         CAST(len({words}) AS BIGINT) AS n_words,
         CASE WHEN len({words}) > 0 THEN
           CAST(list_sum(list_transform({words}, w -> length(w))) AS DOUBLE)
             / len({words})
         ELSE 0.0 END AS mean_word_len,
         CASE WHEN len({words}) > 0 THEN
           CAST(length({text_col}) - length(replace({text_col}, '#', ''))
             + (length({text_col}) - length(replace({text_col}, '...', ''))) / 3
             AS DOUBLE) / len({words})
         ELSE 0.0 END AS symbol_ratio,
         CASE WHEN len({lines}) > 0 THEN
           CAST(len(list_filter({lines},
                l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
             / len({lines})
         ELSE 0.0 END AS bullet_frac,
         CASE WHEN len({lines}) > 0 THEN
           1.0 - CAST(len(list_distinct({lines})) AS DOUBLE) / len({lines})
         ELSE 0.0 END AS dup_line_frac,
         CASE WHEN len({words}) > 0 THEN
           CAST(len(list_filter({words},
                w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len({words})
         ELSE 0.0 END AS alpha_frac
  FROM {table}
)
SELECT *,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
       AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN!r}
            AND {GOPHER_MAX_MEAN_WORD_LEN!r})
       AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO!r}
       AND bullet_frac <= {GOPHER_MAX_BULLET_FRACTION!r}
       AND dup_line_frac <= {GOPHER_MAX_DUP_LINE_FRACTION!r}
       AND alpha_frac >= {GOPHER_MIN_ALPHA_FRACTION!r} AS passes
FROM m
"""


# ------------------------------------- deterministic stratified sampling --

def _md5_u32_frac(key: Column) -> Column:
    """First 8 hex chars of md5(key) as a fraction of 2^32 — a
    deterministic uniform(0,1) both engines compute identically."""
    h = F.substring(F.md5(key), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(float(1 << 32))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "mix0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Domain-mixing sampler: keep each row with its stratum's target
    probability, decided by md5(seed:stratum:key) — deterministic,
    engine-portable, map-only (no shuffle, no RNG state).

    Rows whose stratum has no entry in `fractions` keep with
    `default_fraction`."""
    pairs = []
    for k, v in fractions.items():
        pairs += [F.lit(k), F.lit(float(v))]
    frac_map = F.create_map(*pairs) if pairs else F.create_map()
    frac = F.coalesce(
        frac_map.getItem(F.col(strata_col)), F.lit(float(default_fraction))
    )
    key = F.concat_ws(":", F.lit(seed), F.col(strata_col),
                      F.col(key_col).cast("string"))
    return df.filter(_md5_u32_frac(key) < frac)


def stratified_sample_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "mix0",
    default_fraction: float = 0.0,
    select: str = "*",
) -> str:
    """DuckDB twin of stratified_sample (same md5-threshold rule).
    Strata keys are DATA: quote-escape them or a key like "o'reilly"
    breaks (or alters) the generated SQL."""
    def q(x: str) -> str:
        return str(x).replace("'", "''")

    cases = " ".join(
        f"WHEN {strata_col} = '{q(k)}' THEN {float(v)!r}"
        for k, v in fractions.items()
    )
    frac = f"CASE {cases} ELSE {float(default_fraction)!r} END"
    key = f"concat_ws(':', '{q(seed)}', {strata_col}, CAST({key_col} AS VARCHAR))"
    u = (f"CAST(('0x' || substr(md5({key}), 1, 8))::UBIGINT AS DOUBLE)"
         f" / {float(1 << 32)!r}")
    return f"SELECT {select} FROM {table} WHERE {u} < {frac}"


# ------------------------------------------------------- PII redaction --

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround.  Order matters: longer /
# more specific first so e.g. SSNs don't half-match as phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "[PHONE]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
)


def redact_pii_expr(text_col: Column | str,
                    kinds: tuple[str, ...] | None = None) -> Column:
    """Replace PII matches with typed placeholder tokens (map-only)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat, token in PII_PATTERNS:
        if kinds is None or name in kinds:
            c = F.regexp_replace(c, pat, token)
    return c


def pii_counts_exprs(text_col: Column | str,
                     kinds: tuple[str, ...] | None = None) -> dict[str, Column]:
    """Per-kind match counts (size of regexp_extract_all — identical
    semantics in both engines)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = {}
    for name, pat, _tok in PII_PATTERNS:
        if kinds is None or name in kinds:
            out[f"n_{name}"] = F.size(
                F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
    return out


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """(id, per-kind counts, redacted text) — counts measured BEFORE
    redaction so earlier patterns can't eat later ones' matches."""
    counts = pii_counts_exprs(text_col, kinds)
    cols = [F.col(id_col)]
    cols += [expr.alias(name) for name, expr in counts.items()]
    cols.append(redact_pii_expr(text_col, kinds).alias("redacted"))
    return df.select(*cols)


def redact_pii_sql(table: str = "documents", id_col: str = "doc_id",
                   text_expr: str = "text",
                   kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of redact_pii (RE2 'g' flag for replace-all)."""
    counts, red = [], text_expr
    for name, pat, token in PII_PATTERNS:
        if kinds is not None and name not in kinds:
            continue
        counts.append(
            f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
            f" AS n_{name}")
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    cols = ", ".join([id_col] + counts + [f"{red} AS redacted"])
    return f"SELECT {cols} FROM {table}"


# ------------------------------------- intra-document repetition removal --

def dedup_lines_expr(text_col: Column | str) -> Column:
    """Drop repeated lines within a document, keeping first occurrences
    in order (the intra-doc half of line-level corpus dedup)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(c, "\n")
    keep = F.filter(
        lines, lambda l, i: F.array_position(lines, l) == i + F.lit(1)
    )
    return F.array_join(keep, "\n")


def duckdb_dedup_lines_sql(text_expr: str) -> str:
    """DuckDB twin of dedup_lines_expr (list_position = first index)."""
    lines = f"string_split({text_expr}, chr(10))"
    return (
        f"array_to_string(list_filter({lines}, "
        f"(l, i) -> list_position({lines}, l) = i), chr(10))"
    )


def mixture_report(
    df: DataFrame, sampled: DataFrame, strata_col: str
) -> DataFrame:
    """Per-stratum before/after counts and achieved rate — the audit
    table a mixing job logs next to its output."""
    before = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_before"))
    after = sampled.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_after"))
    return (
        before.join(after, strata_col, "left")
        .select(
            strata_col,
            "n_before",
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
            (F.coalesce(F.col("n_after"), F.lit(0)).cast("double")
             / F.col("n_before")).alias("rate"),
        )
        .orderBy(strata_col)
    )
