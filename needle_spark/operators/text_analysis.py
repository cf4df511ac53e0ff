"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All four are pure Catalyst column expressions (no UDFs): at corpus scale
they evaluate inside the Parquet scan projection, shuffle nothing, and
each has a DuckDB SQL twin so results are oracle-checkable.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves type hints here

from pyspark.sql import Column
from pyspark.sql import functions as F

from needle_spark.functions.text import TOKEN_SPLIT_RE, tokenize_expr

# Small per-language function-word lists (public, common knowledge).
# Order of _LANGS is the deterministic tie-break (earlier wins).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "auf", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "des", "dans", "pour", "que", "une"),
    "es": ("el", "los", "las", "es", "en", "para", "con", "por", "una", "del"),
}
_LANGS = tuple(LANG_STOPWORDS)

# word-or-symbol pattern for BPE-ish token counting: alnum runs or single
# non-space symbols (a cheap proxy for byte-pair vocab boundaries)
BPE_TOKEN_RE = "[a-z0-9]+|[^a-z0-9\\s]"

# one shared, growable modular-powers array: powers(n) is its length-n
# SUFFIX (the array is descending, ending at b^0), so all document
# lengths share ONE allocation — a per-length dict cached a full int64
# array per distinct length and grew without bound in long-lived
# executor workers
_POW_ARR = None


def _modular_powers(n: int):
    import numpy as np

    global _POW_ARR
    cur = _POW_ARR
    if cur is None or len(cur) < n:
        m = max(n, 2 * (len(cur) if cur is not None else 2048))
        out = np.empty(m, dtype=np.int64)
        acc = 1
        for i in range(m - 1, -1, -1):
            out[i] = acc
            acc = (acc * FINGERPRINT_BASE) % FINGERPRINT_MOD
        _POW_ARR = out
        cur = out
    return cur[len(cur) - n:]


def word_count_expr(text_col: Column | str) -> Column:
    """Whitespace word count."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(F.split(c, "\\s+"), lambda w: F.length(w) > 0)
    return F.size(words).cast("long")


def bpe_token_count_expr(text_col: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual symbols."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), 0)).cast("long")


def lang_hits_expr(text_col: Column | str, lang: str) -> Column:
    """Count of tokens (occurrences) matching `lang`'s function words."""
    toks = tokenize_expr(text_col, stop_words=None, min_len=1)
    wl = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t))).cast("long")


def lang_id_expr(text_col: Column | str) -> Column:
    """Predicted language code by function-word hit count; 'und' when no
    list scores > 0.  Deterministic tie-break: _LANGS order."""
    hits = {lang: lang_hits_expr(text_col, lang) for lang in _LANGS}
    best = F.lit("und")
    best_n = F.lit(0).cast("long")
    # fold in reverse so earlier languages win ties (> replaces only when
    # strictly greater)
    for lang in reversed(_LANGS):
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return best


def duckdb_lang_id_sql(text_expr: str) -> str:
    """DuckDB twin of lang_id_expr (same fold, same tie-break)."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '{TOKEN_SPLIT_RE}'), "
        "t -> length(t) >= 1)"
    )
    hit = {
        lang: (
            f"len(list_filter({toks}, t -> t IN ("
            + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
            + ")))"
        )
        for lang in _LANGS
    }
    expr_lang, expr_n = "'und'", "0"
    for lang in reversed(_LANGS):
        expr_lang = f"CASE WHEN {hit[lang]} > {expr_n} THEN '{lang}' ELSE {expr_lang} END"
        expr_n = f"CASE WHEN {hit[lang]} > {expr_n} THEN {hit[lang]} ELSE {expr_n} END"
    return expr_lang


def quality_score_expr(text_col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: blends alpha ratio, stopword
    presence, mean word length sanity, and a length prior.  Deterministic
    double arithmetic with an exact SQL twin."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))

    toks = tokenize_expr(c, stop_words=None, min_len=1)
    n_tok = F.size(toks).cast("double")
    en_sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_sw, t))).cast("double")
    sw_ratio = F.when(n_tok > 0, sw_hits / n_tok).otherwise(F.lit(0.0))

    mean_wl = F.when(n_tok > 0, alpha / n_tok).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    len_ok = F.when(n_chars >= 100.0, F.lit(1.0)).otherwise(n_chars / 100.0)

    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.2) * F.least(sw_ratio * 5.0, F.lit(1.0))
        + F.lit(0.2) * wl_ok
        + F.lit(0.2) * len_ok
    )
    return F.round(score, 6)


def duckdb_quality_score_sql(text_expr: str) -> str:
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '{TOKEN_SPLIT_RE}'), "
        "t -> length(t) >= 1)"
    )
    sw = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    n_chars = f"CAST(length({text_expr}) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace(lower({text_expr}), '[^a-z0-9]', '', 'g')) AS DOUBLE)"
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    sw_hits = f"CAST(len(list_filter({toks}, t -> t IN ({sw}))) AS DOUBLE)"
    alpha_ratio = f"CASE WHEN {n_chars} > 0 THEN {alpha} / {n_chars} ELSE 0.0 END"
    sw_ratio = f"CASE WHEN {n_tok} > 0 THEN {sw_hits} / {n_tok} ELSE 0.0 END"
    mean_wl = f"CASE WHEN {n_tok} > 0 THEN {alpha} / {n_tok} ELSE 0.0 END"
    wl_ok = f"CASE WHEN {mean_wl} >= 3.0 AND {mean_wl} <= 10.0 THEN 1.0 ELSE 0.5 END"
    len_ok = f"CASE WHEN {n_chars} >= 100.0 THEN 1.0 ELSE {n_chars} / 100.0 END"
    return (
        f"round(0.4 * ({alpha_ratio}) + 0.2 * least(({sw_ratio}) * 5.0, 1.0) "
        f"+ 0.2 * ({wl_ok}) + 0.2 * ({len_ok}), 6)"
    )


FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def fingerprint_expr(text_col: Column | str) -> Column:
    """Deterministic rolling-hash document fingerprint over the
    normalized (lowercase alnum) text: fold (acc*31 + code(ch)) mod 1e9+7.
    Whitespace/punct-insensitive — a cheap canonical content id."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.lower(c), "[^a-z0-9]", "")
    chars = F.filter(F.split(norm, ""), lambda ch: F.length(ch) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )


def duckdb_fingerprint_sql(text_expr: str) -> str:
    norm = f"regexp_replace(lower({text_expr}), '[^a-z0-9]', '', 'g')"
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({norm}, ''), ch -> CAST(ord(ch) AS BIGINT))), "
        f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
    )


def text_profile_arrow(
    docs, id_col: str = "doc_id", text_col: str = "text",
):
    """One-pass Arrow kernel computing the full profile (pred_lang,
    word_cnt, bpe_cnt, quality, fingerprint) — value-identical to the
    expression pipeline but ~4x faster: the expression path pays an
    interpreted higher-order filter per language list per token, while
    this kernel tokenizes each document ONCE.

    Exactness notes: the python tokenizer is the established twin of
    tokenize_expr; quality rounding replicates Spark's HALF_UP
    (floor(x*1e6+0.5), not python/numpy half-even); the fingerprint is
    the same Horner sum as fingerprint_expr."""
    import re
    from typing import Iterator

    import numpy as np
    from pyspark.sql import types as T

    p, b = FINGERPRINT_MOD, FINGERPRINT_BASE
    split_re = re.compile(TOKEN_SPLIT_RE)
    # re.ASCII: the expression pipeline's Java \s (and DuckDB's RE2)
    # are ASCII-only — Python's Unicode \s would count an NBSP as a
    # word boundary and break the documented value-parity with the
    # expression path on web-scraped text
    ws_re = re.compile(r"\s+", re.ASCII)
    bpe_re = re.compile(BPE_TOKEN_RE, re.ASCII)
    strip_re = re.compile("[^a-z0-9]")
    lang_sets = {lang: frozenset(ws) for lang, ws in LANG_STOPWORDS.items()}
    en_set = lang_sets["en"]
    powers = _modular_powers

    id_type = docs.schema[id_col].dataType
    schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("pred_lang", T.StringType()),
        T.StructField("word_cnt", T.LongType()),
        T.StructField("bpe_cnt", T.LongType()),
        T.StructField("quality", T.DoubleType()),
        T.StructField("fingerprint", T.LongType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("pred_lang", "word_cnt", "bpe_cnt", "quality", "fingerprint")}
            for text in pdf[text_col]:
                t = text or ""
                low = t.lower()
                toks = [x for x in split_re.split(low) if x]
                # language id: occurrence hits per list, earlier wins ties
                best, best_n = "und", 0
                for lang in _LANGS:
                    h = sum(1 for x in toks if x in lang_sets[lang])
                    if h > best_n:
                        best, best_n = lang, h
                rows["pred_lang"].append(best)
                rows["word_cnt"].append(
                    sum(1 for w in ws_re.split(t) if w))
                rows["bpe_cnt"].append(len(bpe_re.findall(low)))
                # quality (same formula/op order as quality_score_expr)
                n_chars = float(len(t))
                norm = strip_re.sub("", low)
                alpha = float(len(norm))
                alpha_ratio = alpha / n_chars if n_chars > 0 else 0.0
                n_tok = float(len(toks))
                sw_hits = float(sum(1 for x in toks if x in en_set))
                sw_ratio = sw_hits / n_tok if n_tok > 0 else 0.0
                mean_wl = alpha / n_tok if n_tok > 0 else 0.0
                wl_ok = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
                len_ok = 1.0 if n_chars >= 100.0 else n_chars / 100.0
                score = (0.4 * alpha_ratio + 0.2 * min(sw_ratio * 5.0, 1.0)
                         + 0.2 * wl_ok + 0.2 * len_ok)
                rows["quality"].append(int(score * 1e6 + 0.5) / 1e6)  # HALF_UP
                nb = norm.encode()
                if nb:
                    codes = np.frombuffer(nb, dtype=np.uint8).astype(np.int64)
                    fp = int((codes * powers(len(codes))).sum() % p)
                else:
                    fp = 0
                rows["fingerprint"].append(fp)
            yield pd.DataFrame({id_col: pdf[id_col], **rows})

    return docs.select(id_col, text_col).mapInPandas(kernel, schema)


def fingerprint_udf():
    """Arrow twin of fingerprint_expr: the interpreted per-character
    aggregate() fold is the one hot loop in the profile — vectorized
    here as a Horner sum with precomputed modular powers
    (sum(code_i * 31^(n-1-i)) mod p; partial sums stay < 2^63).
    Bit-identical to the expression and the DuckDB twin."""
    import re

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    p = FINGERPRINT_MOD
    strip = re.compile("[^a-z0-9]")
    powers = _modular_powers

    @pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            norm = strip.sub("", (t or "").lower()).encode()
            if not norm:
                continue
            codes = np.frombuffer(norm, dtype=np.uint8).astype(np.int64)
            # per-term products <= 127*(p-1) ~ 1.3e11; the int64 sum is
            # exact for any document under ~7e7 normalized chars
            out[i] = int((codes * powers(len(codes))).sum() % p)
        return pd.Series(out)

    return _fp
