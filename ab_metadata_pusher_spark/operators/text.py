"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.G north
star): tokenization, quality scoring, language ID, fingerprinting.

Everything is built-in pyspark.sql.functions — JVM-side, whole-stage
codegen, no Python in the hot path — so each operator scales linearly with
corpus bytes and shuffles only where a groupBy genuinely requires it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.functions.hashing import md5_long

__all__ = [
    "tokens", "bpe_ish_tokens", "shingle_array", "quality_features",
    "LANG_LEXICONS", "language_id", "fingerprint", "BPE_ISH_PATTERN",
    "STOPWORDS", "repetition_features", "pii_redact",
    "EMAIL_PATTERN", "IPV4_PATTERN", "strip_html",
]

#: Whitespace tokens, empties dropped (fixture texts end with a space).
def tokens(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


def strip_html(col: Column | str) -> Column:
    """Boilerplate removal for crawled corpora: drop <script> blocks and
    HTML comments (whose BODIES must go, not just the tags), then all
    remaining tags (each replaced by a space so adjacent-tag text never glues
    together), decode ``&amp;``, and collapse runs of spaces.

    Pure ``regexp_replace`` chain — JVM-side, codegen, linear in bytes;
    every pattern is written in the RE2-compatible subset (``[\\s\\S]``
    instead of DOTALL flags) so the DuckDB oracle applies the literal
    same patterns.  Order matters: script/comment bodies first (their
    content may contain ``<``), entity decode after tag removal.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<script[\s\S]*?</script>", " ")
    c = F.regexp_replace(c, r"<!--[\s\S]*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    # the common five entities; &amp; LAST so "&amp;lt;" decodes to the
    # literal text "&lt;", not "<"
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r" +", " "))


#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
#: the usual first split before byte-pair merging.
BPE_ISH_PATTERN = r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_ish_tokens(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def shingle_array(toks: Column, n: int = 3) -> Column:
    """All n-token shingles (space-joined) of a token array; documents with
    fewer than n tokens yield one short shingle."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


STOPWORDS = ("the", "a", "of", "and", "to", "in")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: token count, mean token length,
    stopword ratio, alphabetic ratio, and a composite keep/drop flag —
    the standard pre-training corpus filters."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    n_chars = F.length(text_col)
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(F.length(F.regexp_replace(F.col(text_col), " ", ""))
                / F.greatest(n_tokens, F.lit(1)), 4).alias("avg_token_len"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_ratio"),
        ((n_tokens >= 10) & (n_tokens <= 1000)).alias("len_ok"),
    )


#: Tiny per-language lexicons over the fixture vocabulary.  The *mechanics*
#: (token-vote language ID) is the operator under test; real deployments
#: swap in real n-gram profiles.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("table", "scan", "merge", "row"),
    "en": ("the", "a", "fast", "slow"),
    "es": ("query", "data", "key", "value"),
    "fr": ("join", "filter", "group", "sort"),
    "zh": ("spark", "stream", "batch", "window"),
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: per-language occurrence counts over the
    token stream, argmax with deterministic tie-break (lexicon order).

    One narrow pass; the vote is a fixed-size expression, no shuffle.
    """
    toks = tokens(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*lex)))
        for lang, lex in LANG_LEXICONS.items()
    }
    langs = list(LANG_LEXICONS)  # sorted construction order = tie priority
    # argmax chain: first lang (in order) whose score >= all later scores.
    predicted = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = (scores[lang] >= scores[other]) if langs.index(other) > i \
                else (scores[lang] > scores[other])
            cond = c if cond is None else (cond & c)
        branch = F.when(cond, F.lit(lang))
        predicted = branch if predicted is None else predicted.when(cond, F.lit(lang))
    out = df.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        F.coalesce(predicted, F.lit(langs[-1])).alias("predicted_lang"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5, normalized md5 (lower+collapse
    whitespace), and a winnowing-style min-shingle-hash (min of 60-bit
    hashes of all 3-token shingles — robust to local edits)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = tokens(text_col)
    shingles = shingle_array(toks, 3)
    min_shingle = F.array_min(F.transform(shingles, lambda s: md5_long(s)))
    return df.select(
        "doc_id",
        F.md5(F.col(text_col).cast("binary")).alias("md5_full"),
        F.md5(norm.cast("binary")).alias("md5_norm"),
        min_shingle.alias("min_shingle_hash"),
        F.size(toks).alias("n_tokens"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: duplicate-bigram ratio and
    top-token mass — the standard "is this document degenerate
    boilerplate?" filters for pre-training corpora.

    Pure array expressions, one narrow pass, shuffle-free over 100 TB.
    The top-token count is the longest equal run of the SORTED token
    array (one aggregate fold) — O(n log n) per document, replacing the
    r1 formulation's O(tokens * distinct_tokens) nested filter-per-
    distinct-token scan, which was the bench's noisiest sub-second entry
    (quadratic on repetitive documents, the exact inputs this filter
    exists to catch).
    """
    toks = tokens(text_col)
    bigrams = shingle_array(toks, 2)
    n_tokens = F.size(toks)
    step = lambda acc, t: F.struct(  # noqa: E731
        t.alias("prev"),
        F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
         .alias("run"),
        F.greatest(
            acc["best"],
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)))
         .alias("best"))
    top_count = F.aggregate(
        F.sort_array(toks),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).alias("run"), F.lit(0).alias("best")),
        step,
        lambda acc: acc["best"])
    dup_bigram = F.round(
        F.lit(1.0) - F.size(F.array_distinct(bigrams))
        / F.greatest(F.size(bigrams), F.lit(1)), 4)
    top_ratio = F.round(top_count / F.greatest(n_tokens, F.lit(1)), 4)
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        dup_bigram.alias("dup_bigram_ratio"),
        top_ratio.alias("top_token_ratio"),
        ((dup_bigram <= 0.5) & (top_ratio <= 0.2)).alias("rep_ok"),
    )


#: Portable between Java regex (Spark) and RE2 (DuckDB): plain character
#: classes only — no backrefs, no lookaround.
EMAIL_PATTERN = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
IPV4_PATTERN = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: count then mask emails and IPv4 addresses.

    ``regexp_replace``/``regexp_extract_all`` are JVM expressions inside
    whole-stage codegen — a single narrow projection, no shuffle, linear
    in corpus bytes.
    """
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0))
    n_ips = F.size(F.regexp_extract_all(
        F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
        F.lit(IPV4_PATTERN), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
        IPV4_PATTERN, "<IP>")
    return df.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        redacted.alias("redacted"),
    )
