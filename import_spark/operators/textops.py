"""Text-analysis operators for training-data pipelines.

All the cheap-per-row analyses stay native column expressions
(JVM/codegen); only language-ID uses a (vectorized) pandas UDF.

- token_stats        whitespace + word-regex token counts, char stats
- quality_score      length / punctuation / stopword / digit ratios
- language_id        n-gram/stopword heuristic scorer (pandas UDF)
- fingerprint        normalized-text content fingerprint (md5 + xxhash64)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = [
    "the", "and", "of", "to", "in", "is", "was", "for", "with", "that",
]
# tiny per-language marker sets for the heuristic scorer
# Per-language stopword markers (top function words; overlaps across
# languages are fine — each occurrence counts toward every language
# listing it, and the per-language totals disambiguate). Dict ORDER is
# the deterministic tie-break (first max wins) and the SQL oracle twin
# in queries.py is GENERATED from this table, so both sides share one
# source of truth.
LANG_MARKERS = {
    "en": ["the", "and", "with", "that", "this", "from", "have", "not",
           "are", "was", "for", "you", "but", "his", "her", "they",
           "what", "there", "which", "been", "their", "would", "about", "when"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ich", "sie",
           "mit", "ein", "eine", "auf", "den", "dem", "des", "zu",
           "von", "für", "werden", "auch", "einer", "sich", "nach", "wird"],
    "fr": ["le", "la", "les", "des", "est", "une", "et", "dans",
           "que", "pour", "pas", "sur", "avec", "son", "par", "plus",
           "mais", "nous", "vous", "ils", "être", "fait", "cette", "aux"],
    "es": ["el", "los", "las", "una", "está", "que", "de", "en",
           "no", "con", "por", "para", "como", "más", "pero", "sus",
           "esta", "entre", "cuando", "muy", "también", "hasta", "donde", "ser"],
    "it": ["il", "di", "che", "per", "con", "non", "una", "sono",
           "della", "nel", "alla", "più", "anche", "come", "dei", "questo",
           "hanno", "essere", "ma", "gli", "delle", "nella", "loro", "questa"],
    "pt": ["não", "uma", "com", "para", "por", "mais", "dos", "das",
           "como", "mas", "foi", "ele", "tem", "são", "seu", "sua",
           "pelo", "pela", "isso", "já", "também", "quando", "muito", "depois"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "met",
           "voor", "zijn", "aan", "ook", "maar", "als", "dan", "bij",
           "naar", "uit", "deze", "wordt", "heeft", "worden", "geen", "nog"],
    "id": ["yang", "dan", "di", "untuk", "dengan", "tidak", "dari", "ini",
           "itu", "pada", "adalah", "akan", "juga", "ke", "bisa", "ada",
           "mereka", "saya", "kami", "atau", "dalam", "telah", "sudah", "karena"],
}

_WORD_RE = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish word-regex tokens + char count."""
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(t), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(_WORD_RE), F.lit(0))).alias("word_tokens"),
        F.length(t).alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    longer docs with normal punctuation/stopword density score higher."""
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    t = F.col(text_col)
    n = F.length(t)
    n_punct = n - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_digit = n - F.length(F.regexp_replace(t, r"[0-9]", ""))
    words = F.split(F.lower(t), r"\s+")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS_EN)))
    punct_ratio = F.round(n_punct / F.greatest(n, F.lit(1)), 6)
    digit_ratio = F.round(n_digit / F.greatest(n, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    # composite emitted as basis points via floor: pure IEEE-double math,
    # reproducible bit-for-bit across engines (decimal round() is not —
    # Spark rounds the shortest-decimal repr, DuckDB the binary double)
    raw = (
        0.4 * len_score
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10 + digit_ratio * 5, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.floor(raw * 10000).cast("long").alias("quality_bp"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic — vectorized pandas UDF.
    No-marker texts → 'und' (undetermined); ties keep the FIRST
    language in LANG_MARKERS order (strict '>' comparison — the
    behavior the oracle twin locks)."""
    from pyspark.sql.pandas.functions import pandas_udf

    markers = {k: set(v) for k, v in LANG_MARKERS.items()}

    def _lang(texts: pd.Series) -> pd.Series:
        def score(t):
            if not isinstance(t, str):
                return "und"
            toks = t.lower().split()
            best, best_n = "und", 0
            for lang, ms in markers.items():
                n = sum(1 for w in toks if w in ms)
                if n > best_n:
                    best, best_n = lang, n
            return best

        return texts.map(score)

    lang_udf = pandas_udf(_lang, "string")
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    return df.select(F.col(id_col), lang_udf(F.col(text_col)).alias("lang_pred"))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the standard pre-training repetition filter): per document,

    - ``dup_line_frac``  — 1 − distinct/total over non-empty lines
    - ``top_bigram_frac`` — occurrences of the most frequent token
      bigram / total bigram occurrences (0.0 when < 2 tokens)

    Zero-shuffle: both signals are pure column projections. The bigram
    mode comes from ``array_sort`` + one ``aggregate`` fold over the
    sorted array (longest equal-run), so the whole operator stays in
    one codegen'd scan — no explode→groupBy per document, which at
    100 TB would shuffle ~doc_len rows per doc for a per-row answer."""
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: x != F.lit(""))
    dup_line = F.when(
        F.size(lines) > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines),
    ).otherwise(F.lit(0.0))
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    base = df.select(
        F.col(id_col), dup_line.alias("dup_line_frac"), toks.alias("_toks")
    )
    n = F.size("_toks")
    bigrams = F.transform(
        F.slice("_toks", 1, F.greatest(n - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at("_toks", i + 2)),
    )
    srt = F.array_sort(bigrams)
    run = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram = F.when(n >= 2, run / (n - 1)).otherwise(F.lit(0.0))
    return base.select(
        id_col, "dup_line_frac", top_bigram.alias("top_bigram_frac")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint over normalized text (lowercase, strip
    punctuation, collapse whitespace): md5 hex + xxhash64."""
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


# ------------------------------------------------------------------ PII

# Pattern table shared with the SQL oracle twin (queries.py builds its
# DuckDB expressions from the same strings). Kept to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): character
# classes, greedy counted quantifiers, \b word boundaries — no
# lookaround, no backrefs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
]


def pii_scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts (emails, SSN-shaped ids, IPv4s,
    phone-shaped digit runs) — pure native ``regexp_count``, zero
    shuffle, zero Python. The pattern ORDER matters for redaction (an
    SSN also matches the phone shape; see :func:`pii_redact`) but scan
    counts are independent."""
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return df.select(F.col(id_col), *cols).withColumn("n_pii", total)


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Replace every PII hit with a typed placeholder, applying the
    patterns in :data:`PII_PATTERNS` order — email before phone (a
    long digit run inside an address must not be phone-redacted first)
    and SSN before phone (an SSN matches the looser phone shape).
    Native ``regexp_replace`` chain, zero shuffle."""
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    red = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return df.select(F.col(id_col), red.alias("text"))


# -------------------------------------------------- decontamination

def _word_ngrams(text_col, n: int):
    """Lowercased whitespace-token n-grams as a native array column
    (split → sequence → slice/array_join); empty when the document has
    fewer than ``n`` tokens."""
    words = F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """DISTINCT word n-grams of a benchmark/eval set — the (small)
    contamination dictionary. Benchmarks are dimension-sized, so this
    frame broadcasts."""
    return (
        benchmark.select(F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one word ``n``-gram with the benchmark set; returns
    (id, n_hits = DISTINCT shared n-grams), contaminated docs only.

    Scale shape: the benchmark n-gram dictionary is broadcast (eval
    sets are tiny next to a training corpus); the corpus side explodes
    to per-doc n-grams (one narrow projection — the explode streams
    straight into the broadcast join, nothing wide is materialized or
    shuffled) and only the RARE matching rows reach the distinct +
    groupBy. Deduping after the join is exact: the dictionary is
    already distinct, so the join multiplies nothing — it only keeps
    repeated in-document occurrences, which the post-join distinct
    collapses."""
    from import_spark.operators.skew import widen_narrow_input

    bench = benchmark_ngrams(benchmark, n, text_col)
    doc_grams = widen_narrow_input(docs).select(
        F.col(id_col), F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(bench), "gram")
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


# ------------------------------------------------ deterministic sampling

def _hex_threshold(fraction: float) -> str:
    """First-8-hex-chars threshold for ``fraction`` of the md5 space
    (lexicographic compare of lowercase hex == numeric compare)."""
    if fraction >= 1.0:
        return "g"  # above every hex digit — keeps everything
    return format(int(fraction * 0x1_0000_0000), "08x")


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    salt: str = "",
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling for domain mixing: keep a row
    iff the first 8 hex chars of ``md5(stratum|id|salt)`` fall under the
    stratum's fraction of the hash space.

    Unlike ``DataFrame.sample``/``sampleBy`` (seeded per-partition RNG:
    the kept SET changes with partitioning and retries), membership here
    is a pure function of (stratum, id, salt) — re-runs, resumes and
    different cluster layouts keep EXACTLY the same rows, and the salt
    gives independent redraws. Native md5/substring comparison, zero
    shuffle, portable to any engine with md5 (the SQL oracle twin runs
    the same expression)."""
    key = F.concat_ws("|", F.col(strata_col), F.col(id_col).cast("string"), F.lit(salt))
    bucket = F.substring(F.md5(key), 1, 8)
    thr = F.lit(_hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(frac))
        ).otherwise(thr)
    return docs.filter(bucket < thr)
