"""Text analysis for large-scale corpus curation.

All hot-path functions are pure Catalyst expressions (JVM-side,
whole-stage codegen) — no Python executes per row. The language-ID
heuristic uses a small broadcastable profile table, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# a deliberately small stopword set usable cross-engine
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long").alias("n_tokens")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: word-piece-like segments (runs of letters, runs
    of digits, single punctuation) — a deterministic regex split, the
    standard cheap estimator for LLM token budgeting."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
            lambda s: F.trim(s) != "",
        )
    ).cast("long")


def stopword_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_stopwords (exact integers — ratio left to the
    consumer so results stay float-free)."""
    toks = tokens(F.col(text_col))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return df.withColumn("n_tokens", F.size(toks).cast("long")).withColumn(
        "n_stopwords", n_stop.cast("long")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features (Gopher/C4-style): length, mean word
    length x1000 (integer), stopword presence, alpha ratio x1000,
    terminal punctuation. All codegen'd expressions."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(t).cast("long")
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS))).cast("long")
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_word_len_x1000",
            F.when(n_tok > 0, (n_chars * 1000 / n_tok).cast("long")).otherwise(F.lit(0)),
        )
        .withColumn(
            "alpha_ratio_x1000",
            F.when(n_chars > 0, (alpha_chars * 1000 / n_chars).cast("long")).otherwise(F.lit(0)),
        )
        .withColumn("n_stopwords", n_stop)
        .withColumn("ends_with_punct", t.rlike(r"[.!?]\s*$"))
    )


# ---------------------------------------------------------------- lang id
# character/word n-gram profiles per language — tiny broadcast config,
# scored with array_intersect (JVM-side). Deterministic heuristic, NOT a
# model; good enough for bucketing a crawl by probable language.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "it", "in", "that"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es": ("el", "la", "los", "es", "un", "una", "que", "y"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Best-scoring language by marker-word overlap; 'und' if no marker
    hits. One pass, all expressions."""
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms]))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ms in _LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


# ---------------------------------------------------------------- PII
# Patterns stay inside the regex subset Java (Spark codegen) and RE2
# (DuckDB/Go scanners) treat identically: character classes, bounded
# repetition, alternation — no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Scrub emails and phone numbers from a text column, keeping
    per-row match counts (n_emails, n_phones) for curation metrics.
    Pure regexp expressions — runs at scan speed inside whole-stage
    codegen; at 100 TB the redaction adds no shuffle and no Python."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(EMAIL_RE)).cast("long"))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PHONE_RE)).cast("long"))
        .withColumn(
            out_col,
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition: the fraction of
    duplicate word n-grams (x1000, integer). High values flag boiler-
    plate / degenerate generations for corpus filtering. Expression-
    only: the n-gram array never explodes to rows, so cost is O(doc)
    per row with zero shuffle."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    return (
        df.withColumn("n_grams", n_grams)
        .withColumn("n_distinct_grams", n_distinct)
        .withColumn(
            "dup_gram_ratio_x1000",
            F.when(
                n_grams > 0,
                ((n_grams - n_distinct) * 1000 / n_grams).cast("long"),
            ).otherwise(F.lit(0)),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """64-bit document fingerprint: xxhash64 of normalized text
    (lowercased, whitespace collapsed). Stable across runs/sessions —
    usable as a global exact-dup key at 100 TB."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.xxhash64(norm))


def remove_boilerplate(
    df: DataFrame,
    max_repeats: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level PARAGRAPH dedup — the boilerplate-removal pass
    (CCNet / RefinedWeb style): a paragraph appearing in more than
    ``max_repeats`` documents across the corpus (cookie banners,
    nav/footer text, subscribe prompts) is dropped from EVERY
    document; document-unique prose survives with paragraph order
    preserved. This is dedup at sub-document granularity — exact-dup
    and near-dup passes cannot remove a boilerplate line embedded in
    otherwise unique pages.

    Scale shape: split + posexplode (codegen), ONE map-combined count
    shuffle keyed by the paragraph's xxhash64 (64-bit key + the text
    itself never wider than a paragraph), a broadcast-eligible join
    of the hot-paragraph set (paragraphs with count > max_repeats are
    FEW by Zipf — the whole point), and a per-doc reassembly
    aggregate bounded by paragraphs-per-document. Returns
    (id_col, text_clean, n_paras_kept, n_paras_dropped)."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n\n")).alias(
            "_pos", "_para"
        ),
    )
    # distinct docs per paragraph, not raw occurrences: a paragraph
    # repeated WITHIN one quirky document is repetition_stats'
    # business, not corpus boilerplate
    hot = (
        paras.groupBy(F.xxhash64("_para").alias("_ph"))
        .agg(F.count_distinct(F.col(id_col)).alias("_docs"))
        .filter(F.col("_docs") > max_repeats)
        .select("_ph")
    )
    kept = paras.join(
        F.broadcast(hot),
        F.xxhash64(F.col("_para")) == F.col("_ph"),
        "left_anti",
    )
    out = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_para"))
                    ),
                    lambda s: s["_para"],
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_paras_kept"),
        )
    )
    totals = paras.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_total")
    )
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .join(totals, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_paras_kept", F.lit(0))
            .cast("long")
            .alias("n_paras_kept"),
            (
                F.coalesce("_n_total", F.lit(0))
                - F.coalesce("n_paras_kept", F.lit(0))
            )
            .cast("long")
            .alias("n_paras_dropped"),
        )
    )


def corpus_familiarity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-familiarity quality score — the integer-exact cousin of
    CCNet's LM-perplexity filter: a document whose word bigrams are
    common across the corpus reads like the corpus (fluent, on-
    distribution); one full of rare bigrams is boilerplate-mangled,
    gibberish, or wrong-language. Instead of a smoothed log-probability
    (transcendental floats whose sum is engine- and order-dependent),
    each bigram contributes ``bit_length(corpus_count)`` — an exact
    integer ≈ log2(count) — so scores are bit-identical in any engine
    and under any aggregation order, hash-checkable like the engine's
    other scaled-integer metrics.

    Returns one row per input document: ``(id_col, n_bigrams:long,
    fam_sum:long, fam_avg_x1000:long)`` — documents with fewer than two
    tokens score 0. Plan shape: one explode + map-combined count
    shuffle on the bigram, one hash join of doc-bigrams to the count
    table (O(distinct bigrams) — NOT broadcast: Zipf or not, the
    distinct set grows with the corpus), one per-doc aggregate. All
    codegen expressions; no UDF.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # persisted: the exploded frame feeds BOTH the corpus count pass
    # and the per-doc scoring join (left to Spark's LRU eviction, the
    # same lifetime rule as the near-dup signature persist)
    ex = df.select(F.col(id_col), F.explode(bigrams).alias("_bg")).persist()
    counts = ex.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c"))
    fam = (
        ex.join(counts, "_bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.length(F.expr("bin(_c)"))).alias("_fs"),
        )
    )
    return (
        df.select(id_col)
        .join(fam, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("_fs", F.lit(0)).cast("long").alias("fam_sum"),
            F.coalesce(
                F.expr("_fs * 1000 div _n"), F.lit(0)
            ).cast("long").alias("fam_avg_x1000"),
        )
    )


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleanup (Raffel et al. 2020 §2.2, the rules
    behind the C4 corpus, minus the English-specific blocklist): keep
    only lines that (a) end in terminal punctuation (. ! ? ")
    and (b) carry at least ``min_words_per_line`` words and (c) do not
    contain source-code braces; a document survives only if at least
    ``min_lines`` lines remain. The within-doc pass exact/near-dup and
    boilerplate removal do not do: junk LINES inside good documents
    (nav menus, cookie notices, code fragments).

    Returns ``(id_col, text_clean, n_lines_kept:long,
    n_lines_dropped:long, is_kept:boolean)`` for every input doc
    (docs below ``min_lines`` keep their counts, ``is_kept`` false,
    ``text_clean`` empty). Pure codegen array expressions — lines
    never become rows, no shuffle, no UDF: the pass is embarrassingly
    parallel at any corpus size."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda ln: (
            ln.rlike(r'[.!?"]\s*$')
            & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words_per_line)
            & ~ln.contains("{")
            & ~ln.contains("}")
        ),
    )
    n_kept = F.size(kept).cast("long")
    n_total = F.size(lines).cast("long")
    is_kept = n_kept >= min_lines
    return df.select(
        F.col(id_col),
        F.when(is_kept, F.concat_ws("\n", kept))
        .otherwise(F.lit(""))
        .alias("text_clean"),
        n_kept.alias("n_lines_kept"),
        (n_total - n_kept).alias("n_lines_dropped"),
        is_kept.alias("is_kept"),
    )
