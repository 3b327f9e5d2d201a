"""Text-analysis expressions for training-data pipelines (all JVM-side Columns).

Every function here is a pure `pyspark.sql` Column expression (whole-stage
codegen, no UDF) with an exactly-equivalent DuckDB SQL fragment generator used by
the driver oracles. Covers: token counting, quality scoring (length / texty-ratio /
stopword ratio), document fingerprinting, and a stopword-hit language heuristic.
"""

from __future__ import annotations

import pandas as pd  # module-scope: pandas_udf resolves stringified hints here

from pyspark.sql import Column, functions as F

from data_quality_check_spark.functions.wordlists import STOPWORDS

HEUR_LANGS = ["de", "en", "es", "fr"]  # langs probed by the stopword heuristic
QS_LEN_NORM = 200.0  # chars at which the length component saturates


def token_count_col(c: Column) -> Column:
    """Whitespace token count; empty/null-trimmed text counts 0."""
    t = F.trim(c)
    return F.when(c.isNull() | (t == ""), F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_sql(c: str) -> str:
    return (
        f"CASE WHEN {c} IS NULL OR trim({c}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END"
    )


# GPT-2-style pre-tokenizer, constrained to the regex subset where Java regex
# (Spark rlike/regexp_extract_all) and RE2 (DuckDB) agree byte-for-byte: no
# lookarounds (RE2 lacks them), explicit ASCII+Latin-1 classes instead of \p
# properties, explicit whitespace set (RE2's \s lacks \x0B). Alternation is
# leftmost-first in both engines. "BPE-ish": contractions, space-prefixed
# letter/digit/punctuation runs, whitespace runs — the shape tokenizer vocab
# sizes track, good enough for per-document token budgeting at corpus scale.
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-zÀ-ÿ]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9À-ÿ \t\n\r\x0B\f]+"
    r"|[ \t\n\r\x0B\f]+"
)


def bpe_token_count_col(c: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches; null text counts 0."""
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0))
    )


def bpe_token_count_sql(c: str) -> str:
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"CASE WHEN {c} IS NULL THEN 0 ELSE len(regexp_extract_all({c}, '{pat}')) END"


def texty_ratio_col(c: Column) -> Column:
    """Fraction of characters that are letters/digits/spaces (doubles as the
    charset heuristic of the filter pipeline)."""
    keep = F.length(F.regexp_replace(c, "[^A-Za-zÀ-ÿ0-9 ]", ""))
    return F.when(
        c.isNull() | (F.length(c) == 0), F.lit(0.0)
    ).otherwise(keep.cast("double") / F.length(c))


def texty_ratio_sql(c: str) -> str:
    return (
        f"CASE WHEN {c} IS NULL OR length({c}) = 0 THEN 0.0 "
        f"ELSE CAST(length(regexp_replace({c}, '[^A-Za-zÀ-ÿ0-9 ]', '', 'g')) AS DOUBLE) "
        f"/ length({c}) END"
    )


def stopword_hits_col(c: Column, lang: str) -> Column:
    # NULL text ≡ '' (0 hits) — without the coalesce the engines diverge on
    # NULL: Spark's size(NULL) is -1 (legacy) or NULL (ANSI) while DuckDB's
    # len(list_intersect(NULL, …)) is NULL, so lang_guess would disagree
    toks = F.split(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+")
    return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def stopword_hits_sql(c: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(coalesce({c}, ''))), '\\s+')), "
        f"[{words}]))"
    )


def quality_score_col(c: Column) -> Column:
    """Composite [0,1] quality score: 0.4·length + 0.4·texty + 0.2·stopword-density.

    Single-division/4-dp-round construction so Spark and DuckDB agree bitwise.
    """
    length_comp = F.least(F.length(F.coalesce(c, F.lit(""))).cast("double") / QS_LEN_NORM, F.lit(1.0))
    texty = texty_ratio_col(c)
    ntok = token_count_col(c)
    sw = stopword_hits_col(c, "en").cast("double")
    sw_comp = F.when(ntok == 0, F.lit(0.0)).otherwise(F.least(sw * 4.0 / ntok, F.lit(1.0)))
    return F.round(length_comp * 0.4 + texty * 0.4 + sw_comp * 0.2, 4)


def quality_score_sql(c: str) -> str:
    length_comp = f"least(CAST(length(coalesce({c}, '')) AS DOUBLE) / {QS_LEN_NORM!r}, 1.0)"
    texty = texty_ratio_sql(c)
    ntok = token_count_sql(c)
    sw = stopword_hits_sql(c, "en")
    sw_comp = f"CASE WHEN ({ntok}) = 0 THEN 0.0 ELSE least(CAST({sw} AS DOUBLE) * 4.0 / ({ntok}), 1.0) END"
    return f"round(({length_comp}) * 0.4 + ({texty}) * 0.4 + ({sw_comp}) * 0.2, 4)"


def fingerprint_col(c: Column) -> Column:
    """Deterministic 128-bit content fingerprint (hex md5 of the trimmed,
    whitespace-collapsed text) — the exact-dedup key."""
    return F.md5(F.regexp_replace(F.trim(c), r"\s+", " "))


def fingerprint_sql(c: str) -> str:
    return f"md5(regexp_replace(trim({c}), '\\s+', ' ', 'g'))"


def lang_guess_col(c: Column) -> Column:
    """Stopword-hit argmax over HEUR_LANGS; ties break to the lexicographically
    first language; zero hits everywhere → 'und'."""
    hits = {l: stopword_hits_col(c, l) for l in HEUR_LANGS}
    best = F.greatest(*[hits[l] for l in HEUR_LANGS])
    expr = F.when(best <= 0, F.lit("und"))
    for l in HEUR_LANGS:  # ordered: first max wins
        expr = expr.when(hits[l] == best, F.lit(l))
    return expr


def lang_guess_sql(c: str) -> str:
    hits = {l: stopword_hits_sql(c, l) for l in HEUR_LANGS}
    best = "greatest(" + ", ".join(f"({hits[l]})" for l in HEUR_LANGS) + ")"
    whens = " ".join(f"WHEN ({hits[l]}) = ({best}) THEN '{l}'" for l in HEUR_LANGS)
    return f"CASE WHEN ({best}) <= 0 THEN 'und' {whens} END"


# ── script detection (language↔script consistency audit) ──
# Char-class counting per Unicode block, exact integers in both engines: the
# count is length(c) − length(regexp_replace(c, class, '')) — code points in
# Java and DuckDB both. Classes are BMP ranges embedded as literal characters
# so the same Python constant feeds both regex engines byte-identically.
SCRIPT_CLASSES: "list[tuple[str, str]]" = [
    # À-Ö/Ø-ö/ø-ÿ: the Latin-1 letter ranges EXCLUDING × (U+00D7) and ÷
    # (U+00F7) — with them, symbol-only text like '××÷' would classify as
    # Latin instead of 'none' and raise false mismatch flags
    ("latin", "[A-Za-zÀ-ÖØ-öø-ÿ]"),
    # Han ideographs PLUS hiragana/katakana (U+3040–U+30FF): ja maps to cjk,
    # so kana-heavy Japanese must count — without the kana blocks a genuine
    # 'これはテスト' doc would score zero and flag as mislabeled
    ("cjk", "[一-鿿぀-ヿ]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("arabic", "[؀-ۿ]"),
]
# declared language → the script its text should dominate in
LANG_EXPECTED_SCRIPT = {
    "en": "latin", "fr": "latin", "de": "latin", "es": "latin",
    "pt": "latin", "it": "latin",
    "zh": "cjk", "ja": "cjk",
    "ru": "cyrillic", "uk": "cyrillic",
    "ar": "arabic", "fa": "arabic",
}


def _script_count_col(c: Column, cls: str) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, cls, ""))


def dominant_script_col(c: Column) -> Column:
    """Script with the most code points; ties break to SCRIPT_CLASSES order
    (first max wins — same chain shape as lang_guess_col); zero letters in
    every class → 'none'. One projection, |SCRIPT_CLASSES| regex passes —
    fine for audits; a production hot path would fold the classes into one
    vectorized pass."""
    cc = F.coalesce(c, F.lit(""))
    counts = {name: _script_count_col(cc, cls) for name, cls in SCRIPT_CLASSES}
    best = F.greatest(*counts.values())
    expr = F.when(best <= 0, F.lit("none"))
    for name, _ in SCRIPT_CLASSES:
        expr = expr.when(counts[name] == best, F.lit(name))
    return expr


def dominant_script_sql(c: str) -> str:
    """DuckDB twin of dominant_script_col."""
    cc = f"COALESCE({c}, '')"
    counts = {
        name: f"(length({cc}) - length(regexp_replace({cc}, '{cls}', '', 'g')))"
        for name, cls in SCRIPT_CLASSES
    }
    best = "greatest(" + ", ".join(counts.values()) + ")"
    whens = "".join(
        f" WHEN {counts[name]} = {best} THEN '{name}'" for name, _ in SCRIPT_CLASSES
    )
    return f"CASE WHEN {best} <= 0 THEN 'none'{whens} END"


def expected_script_col(lang: Column) -> Column:
    """Declared-lang → expected-script lookup as a literal map; unknown or
    NULL langs map to NULL (no expectation, never a mismatch)."""
    m = F.create_map(
        *[x for k, v in sorted(LANG_EXPECTED_SCRIPT.items()) for x in (F.lit(k), F.lit(v))]
    )
    return m[F.lower(F.coalesce(lang, F.lit("")))]


def expected_script_sql(lang: str) -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(LANG_EXPECTED_SCRIPT.items())
    )
    return f"CASE lower(COALESCE({lang}, '')) {whens} END"


# ── compression-ratio redundancy signal ──
# Boilerplate, template spam, and repeated text DEFLATE far better than
# natural prose, so compressed_size/raw_size is a cheap, language-agnostic
# quality feature — the zlib-ratio heuristic open-data curation stacks ship as
# a standard document filter alongside Gopher-style rules. Level pinned so the
# value is a pure function of the text (zlib output is deterministic for a
# fixed input/level/strategy — the oracle twin runs the IDENTICAL kernel in
# the driver process, so the gate's value hash checks the Arrow plumbing).
ZLIB_LEVEL = 6


def compressed_size_kernel(texts) -> "pd.Series":
    """Shared python kernel: DEFLATE size in bytes of each text's UTF-8
    encoding (NULL text → <NA>). The Spark UDF and the DuckDB-side golden
    both call THIS function, so the two engines cannot drift."""
    import zlib

    return pd.Series(
        [
            None if t is None else len(zlib.compress(str(t).encode("utf-8"), ZLIB_LEVEL))
            for t in texts
        ],
        dtype="Int64",
        index=getattr(texts, "index", None),
    )


def compressed_size_udf():
    """Arrow-batched pandas UDF over the shared kernel — ONE python crossing
    per batch, no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _comp(texts: pd.Series) -> pd.Series:
        return compressed_size_kernel(texts)

    return _comp


def compression_stats(df, id_col: str, text_col: str):
    """Per-document compression redundancy: ({id_col}, n_bytes, n_compressed,
    compression_ratio) — ratio = round(compressed/raw, 6), NULL for NULL or
    empty text (nothing to measure). Low ratios (≲0.3 on prose-length docs)
    mean highly repetitive/templated content; ratios near or above 1 mean
    high-entropy text (random strings, base64 blobs).

    Scale: `n_bytes` stays JVM-side (octet_length); only the DEFLATE size
    crosses to Python, as one vectorized Arrow projection — no shuffle, no
    state, rides any existing scan of the text column."""
    raw = F.octet_length(F.col(text_col))
    comp = compressed_size_udf()(F.col(text_col))
    return df.select(
        F.col(id_col),
        raw.alias("n_bytes"),
        comp.alias("n_compressed"),
        F.round(F.try_divide(comp, raw), 6).alias("compression_ratio"),
    )
