"""Text analysis for training-data pipelines — all JVM-side column
expressions (no Python UDFs): token counting, quality scoring, language ID,
document fingerprinting.

These run over the `documents` table shape (doc_id, text, lang, source,
n_chars) and, at 100 TB, are embarrassingly parallel scans — no shuffle at
all until an aggregation is requested, so they pipeline with the parquet
read inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"
# BPE-ish word/punct segmentation: runs of word chars, or single non-space
# non-word chars (a cheap proxy for byte-pair pretokenization).
BPE_RE = r"\w+|[^\w\s]"

PUNCT_RE = r"[.!?,;:]"

# tiny per-language stopword inventories for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "du", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "con", "para", "está"],
}


def words(text: Column) -> Column:
    return F.split(F.trim(text), WS)


def token_count_ws(df: DataFrame, text: str = "text", out: str = "n_tok_ws") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(out, F.size(words(F.col(text))))


def token_count_bpe(df: DataFrame, text: str = "text", out: str = "n_tok_bpe") -> DataFrame:
    """BPE-ish token count via regexp segmentation (JVM regexp_count)."""
    return df.withColumn(out, F.regexp_count(F.col(text), F.lit(BPE_RE)))


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / punctuation / word-shape quality features + a composite score
    in [0,1] — the usual cheap pre-filters for web-scale corpus cleaning."""
    t = F.col(text)
    n_chars = F.length(t)
    # separator runs + 1 == size(split(trim, \s+)) without allocating the
    # word array (empty/all-space text: both give 1)
    n_words = F.regexp_count(F.trim(t), F.lit(WS)) + F.lit(1)
    # regexp_count of the single-char classes == chars removed by the old
    # regexp_replace-then-length construction (each matching char matches
    # exactly once), without materializing a stripped copy of every
    # document — counts are integer-identical, ~2x less regex work
    punct = F.regexp_count(t, F.lit(PUNCT_RE))
    mean_wlen = (n_chars - F.regexp_count(t, F.lit(r"\s"))) / n_words
    upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct / n_chars < 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(upper / n_chars < 0.3, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct / n_chars)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("upper_ratio", upper / n_chars)
        .withColumn("quality", score)
    )


def stopword_ratio(df: DataFrame, lang: str = "en", text: str = "text",
                   out: str = "stopword_ratio") -> DataFrame:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    lw = words(F.lower(F.col(text)))
    n_sw = F.size(F.filter(lw, lambda x: F.array_contains(sw, x)))
    return df.withColumn(out, n_sw / F.size(lw))


def lang_id(df: DataFrame, text: str = "text", out: str = "pred_lang") -> DataFrame:
    """Stopword-vote language ID (n-gram-heuristic family): the language whose
    stopword inventory matches the most tokens wins; 'zh' when the text is
    mostly CJK codepoints; 'und' when nothing matches."""
    t = F.col(text)
    lw = words(F.lower(t))
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))

    def _n_matches(sw_list):
        arr = F.array(*[F.lit(w) for w in sw_list])
        return F.size(F.filter(lw, lambda x: F.array_contains(arr, x)))

    scores = {lang: _n_matches(sw) for lang, sw in STOPWORDS.items()}
    best = None
    best_score = None
    for lang, sc in scores.items():
        if best is None:
            best, best_score = F.lit(lang), sc
        else:
            cond = sc > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, sc).otherwise(best_score)
    pred = (
        F.when(cjk / F.length(t) > 0.2, F.lit("zh"))
        .when(best_score > 0, best)
        .otherwise(F.lit("und"))
    )
    return df.withColumn(out, pred)


def _mode_covered_chars(arr: Column) -> Column:
    """Characters covered by the most frequent element of ``arr``
    (count × element length); ties break to the lexicographically
    smallest element.  Run-boundary construction over the SORTED array
    (equal elements are adjacent): run starts = positions whose value
    changed, run lengths = diffs of consecutive starts, mode = first
    (== smallest) run of maximal length.  Every intermediate is
    _let-bound and every lambda body is a scalar comparison — the
    previous rendition folded a 4-field STRUCT per element through
    F.aggregate, which Catalyst interprets (no codegen for lambda
    functions) at ~10x the cost (the same trap token_diversity's
    docstring records as 24s → sub-second).  No explode, no shuffle."""
    def _with_sorted(gs):
        n = F.size(gs)
        changes = F.when(
            n >= 2,
            F.filter(
                F.sequence(F.lit(2), n),
                lambda i: F.element_at(gs, i) != F.element_at(gs, i - 1),
            ),
        ).otherwise(F.array().cast("array<int>"))

        def _with_starts(starts):
            nxt = F.concat(
                F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
                F.array(n + 1),
            )

            def _with_lengths(lengths):
                bestn = F.array_max(lengths)
                best = F.element_at(
                    gs,
                    F.element_at(
                        starts, F.array_position(lengths, bestn).cast("int")
                    ),
                )
                # the empty-array case guards HERE (lazily): element_at
                # on an empty gs is an ANSI error, and when() skips the
                # branch without evaluating it
                return F.when(
                    n >= 1,
                    bestn.cast("long") * F.coalesce(F.length(best), F.lit(0)),
                ).otherwise(F.lit(0).cast("long"))

            return _let(F.zip_with(starts, nxt, lambda a, b: b - a),
                        _with_lengths)

        return _let(F.concat(F.array(F.lit(1)), changes), _with_starts)

    return _let(F.array_sort(arr), _with_sorted)


def _let(bound_col: Column, body) -> Column:
    """Bind ``bound_col`` as a lambda variable so ``body`` sees an EVALUATED
    value: Catalyst re-evaluates closed-over subexpressions per element
    inside higher-order-function lambdas (same trick as
    dedup/neardup.py:_let — measured 6.5× on shingling)."""
    return F.element_at(F.transform(F.array(bound_col), body), 1)


def word_ngrams(w: Column, n: int) -> Column:
    """Word n-grams of a words array, space-joined; empty when size < n.
    The words array is let-bound so the gram lambda slices an evaluated
    array instead of re-running the upstream split per position."""
    return _let(
        w,
        lambda wa: F.when(
            F.size(wa) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(wa) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(wa, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def repetition_stats(
    df: DataFrame,
    text: str = "text",
    line_sep: str = "\n",
    top_ngrams: tuple = (2, 3, 4),
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1), all as
    per-row column expressions — at 100 TB this is a pure map that
    pipelines with the parquet scan inside whole-stage codegen; the usual
    explode + groupBy(doc, gram) rendition shuffles every word occurrence
    of the corpus, which this deliberately avoids.

    Adds:
    - ``dup_line_frac``      — fraction of line occurrences that repeat an
      earlier identical line;
    - ``dup_line_char_frac`` — fraction of line characters in those
      repeated occurrences;
    - ``top{n}_char_frac``   — for each n in ``top_ngrams``: characters
      covered by the most frequent word n-gram (count × gram length) over
      total characters, ties to the lexicographically smallest gram.
    """
    t = F.col(text)
    n_chars = F.length(t)
    lines = F.split(t, line_sep)
    n_lines = F.size(lines)
    # Closed forms replace the per-element struct folds (interpreted,
    # ~10x slower than the codegen'd equivalents):
    #   Σ len(line)                       = len(text) − (n_lines − 1)
    #     (split on a single-char separator: every separator char is
    #      removed exactly once; falls back to the fold for a custom
    #      multi-char/regex separator where the identity doesn't hold)
    #   dup occurrences beyond first      = n_lines − n_distinct
    #   dup chars beyond first            = Σ len − Σ len(distinct)
    # with Σ len(distinct) = length(array_join(distinct, "")) — one
    # codegen'd concatenation pass, no lambda.
    simple_sep = len(line_sep) == 1 and line_sep not in r".^$*+?()[]{}|\\"

    def _with_lines(la):
        nl = F.size(la)
        if simple_sep:
            lc = (n_chars - (nl - 1)).cast("long")
        else:
            lc = F.aggregate(
                la, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
            )
        dl = F.array_distinct(la)
        return F.struct(
            nl.alias("n_lines"),
            lc.alias("line_chars"),
            (nl - F.size(dl)).cast("long").alias("dup_n"),
            (lc - F.length(F.array_join(dl, ""))).cast("long")
            .alias("dup_chars"),
        )

    dup = _let(lines, _with_lines)
    out = (
        df.withColumn("__dup", dup)
        .withColumn(
            "dup_line_frac",
            F.when(F.col("__dup.n_lines") > 0,
                   F.col("__dup.dup_n") / F.col("__dup.n_lines"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_line_char_frac",
            F.when(F.col("__dup.line_chars") > 0,
                   F.col("__dup.dup_chars") / F.col("__dup.line_chars"))
            .otherwise(F.lit(0.0)),
        )
        .drop("__dup")
    )
    # ONE struct evaluates all n-gram modes over a SHARED words array —
    # three separate withColumn trees would each re-run the split+lower
    # pass over the document (the gram sort dominates, but the shared
    # split is a free ~15-20% of the map)
    covered_struct = _let(
        words(F.lower(t)),
        lambda wa: F.struct(*[
            _mode_covered_chars(word_ngrams(wa, n)).alias(f"c{n}")
            for n in top_ngrams
        ]),
    )
    out = out.withColumn("__cov", covered_struct)
    for n in top_ngrams:
        out = out.withColumn(
            f"top{n}_char_frac",
            F.when(n_chars > 0, F.col(f"__cov.c{n}") / n_chars)
            .otherwise(F.lit(0.0)),
        )
    return out.drop("__cov")


def fingerprint(df: DataFrame, text: str = "text", shingle: int = 8,
                out: str = "fingerprint", hash_fn: str = "xxhash64") -> DataFrame:
    """Document fingerprint: min hash over character shingles (winnowing-
    style rolling-hash fingerprint, computed JVM-side via sequence+transform).
    hash_fn='md5' yields a hex-string fingerprint reproducible in any engine.
    """
    t = F.col(text)
    n = F.greatest(F.length(t) - shingle + 1, F.lit(1))
    if hash_fn == "md5":
        hashes = F.transform(
            F.sequence(F.lit(1), n), lambda i: F.md5(t.substr(i, F.lit(shingle)))
        )
    else:
        hashes = F.transform(
            F.sequence(F.lit(1), n), lambda i: F.xxhash64(t.substr(i, F.lit(shingle)))
        )
    return df.withColumn(out, F.array_min(hashes))


# PII patterns chosen for cross-engine (Java regex / RE2) portability:
# no lookarounds, no backreferences.  \b and character classes behave
# identically in both.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
LONG_DIGITS_RE = r"\b\d{6,}\b"


def pii_scan(df: DataFrame, text: str = "text") -> DataFrame:
    """Count PII-shaped spans per document — emails, IPv4 addresses and
    long digit runs (account/phone-number shaped) — the cheap scrubbing
    pre-pass every web-corpus pipeline runs before training-data export
    (cf. the C4/Dolma processing descriptions; patterns are public
    folklore, deliberately lookaround-free so Java regex and RE2 agree).
    Pure ``regexp_count`` maps — shuffle-free, whole-stage codegen."""
    t = F.col(text)
    return df.withColumn("n_email", F.regexp_count(t, F.lit(EMAIL_RE))) \
             .withColumn("n_ipv4", F.regexp_count(t, F.lit(IPV4_RE))) \
             .withColumn("n_longnum", F.regexp_count(t, F.lit(LONG_DIGITS_RE)))


def pii_redact(df: DataFrame, text: str = "text",
               out: str = "redacted") -> DataFrame:
    """Replace PII-shaped spans with fixed tags (email → ``<EMAIL>``,
    IPv4 → ``<IP>``, long digit runs → ``<NUM>``).  Order matters:
    emails first so their domain digits aren't pre-mangled, IPs before
    bare digit runs.  Three JVM ``regexp_replace`` passes, shuffle-free."""
    t = F.col(text)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, LONG_DIGITS_RE, "<NUM>")
    return df.withColumn(out, red)
