"""Corpus-curation family: quality/lang-id/token stats, the dedup
stack (exact, MinHash-LSH, SimHash, span, containment, groups,
boilerplate, decontamination), sampling/packing, KMV sketches, and
the composed curation pipelines."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable

from dexspark.queries._common import (  # noqa: F401
    load,
)


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.text import token_count

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        token_count(F.col("text")).alias("n_tokens"),
    )


ORACLE_TOKENS = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def doc_exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    kept = exact_dedup(docs, text_col="text", id_col="doc_id")
    return kept.select("doc_id", "n_copies")


ORACLE_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def doc_quality_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.text import quality_score

    docs = load(spark, sf_dir, "documents")
    return quality_score(docs).select(
        "doc_id", "n_chars_q", "n_tokens", "mean_word_len_x1000",
        "alpha_ratio_x1000", "n_stopwords", "ends_with_punct",
    )


_STOP_SQL = "'the','a','and','of','to','in','is','it'"


ORACLE_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
         string_split(trim(text), ' ') AS toks,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha
  FROM documents
)
SELECT doc_id,
  n_chars AS n_chars_q,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CASE WHEN len(toks) > 0
       THEN CAST(floor(n_chars * 1000.0 / len(toks)) AS BIGINT)
       ELSE 0 END AS mean_word_len_x1000,
  CASE WHEN n_chars > 0
       THEN CAST(floor(alpha * 1000.0 / n_chars) AS BIGINT)
       ELSE 0 END AS alpha_ratio_x1000,
  CAST(len([x for x in toks if lower(x) IN ({_STOP_SQL})]) AS BIGINT) AS n_stopwords,
  regexp_matches(text, '[.!?]\\s*$') AS ends_with_punct
FROM t
"""


def doc_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.text import lang_id

    docs = load(spark, sf_dir, "documents")
    return lang_id(docs).select("doc_id", "lang_pred")


def doc_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate generation (32 bands x 2 rows → recall
    ~1 at jaccard ≥ 0.8) + exact n-gram-Jaccard verification. Output is
    hash-independent (verified pairs only), so an exact brute-force
    oracle can check it."""
    from dexspark.functions.dedup import minhash_lsh_pairs, ngram_jaccard

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, num_hashes=64, bands=32)
    verified = ngram_jaccard(docs, cand)
    return verified.filter(F.col("n_inter") * 1000 >= F.col("n_union") * 800).select(
        "id_a", "id_b", "n_inter", "n_union", "jaccard_x1000"
    )


_SHINGLES_CTE = """
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i+1:i+3], ' ')
                        for i in range(0, len(words)-2)]) AS s
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
        FROM documents)
)"""


def doc_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-containment pairs (functions/dedup.py::
    containment_pairs) — the quote/superset duplicate class symmetric
    Jaccard misses. Seeded: every doc_id % 10 == 7 document is
    replaced with a PREFIX of its % 10 == 6 neighbor's text, so real
    containment pairs exist at every sf."""
    from dexspark.functions.dedup import containment_pairs

    docs = load(spark, sf_dir, "documents")
    donor = F.concat_ws(
        " ",
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12),
    )
    seeded = docs.join(
        docs.select(
            (F.col("doc_id") + 1).alias("doc_id"), donor.alias("_donor")
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.when(
            (F.pmod(F.col("doc_id"), 10) == 7) & F.col("_donor").isNotNull(),
            F.col("_donor"),
        ).otherwise(F.col("text")).alias("text"),
    )
    return containment_pairs(seeded, threshold_x1000=800, max_doc_freq=16)


ORACLE_CONTAINMENT = """
WITH donors AS (
  SELECT doc_id + 1 AS doc_id,
         array_to_string(
           string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')[1:12],
           ' ') AS donor
  FROM documents
), seeded AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 7 AND o.donor IS NOT NULL
              THEN o.donor ELSE d.text END AS text
  FROM documents d LEFT JOIN donors o USING (doc_id)
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i+1:i+3], ' ')
                        for i in range(0, len(words)-2)]) AS s
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
        FROM seeded)
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), dfreq AS (
  SELECT g, COUNT(*) AS df FROM ex GROUP BY g
), sizes AS (
  SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM ex a
  JOIN dfreq d ON d.g = a.g AND d.df <= 16
  JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT s.id_a AS id_contained, s.id_b AS id_container,
  CAST(s.n_shared AS BIGINT) AS n_shared,
  z.n AS n_shingles,
  CAST(s.n_shared * 1000 // z.n AS BIGINT) AS containment_x1000
FROM shared s JOIN sizes z ON z.doc_id = s.id_a
WHERE s.n_shared * 1000 >= z.n * 800
"""


ORACLE_NEAR_DUP = f"""
WITH {_SHINGLES_CTE}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(a.s, b.s))) AS BIGINT) AS n_union,
       CAST(floor(len(list_intersect(a.s, b.s)) * 1000.0
            / len(list_distinct(list_concat(a.s, b.s)))) AS BIGINT) AS jaccard_x1000
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1000
      >= len(list_distinct(list_concat(a.s, b.s))) * 800
"""


def doc_dedup_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP assembly — the transitive-closure step a real
    dedup pipeline needs after pair generation (pairs say "a dups b";
    curation must keep ONE of each component, so a-b + b-c keeps only
    a). Connected components over the verified pair graph via
    min-label propagation WITH POINTER JUMPING
    (functions/dedup.py::connected_components): each round is two hash
    joins + an aggregate, label chains halve per round, so convergence
    is O(log diameter) rounds — an iterative algorithm whose per-round
    work is plain shuffled joins, the Spark-native shape for graph
    closure. Oracle: DuckDB recursive CTE computing min reachable id
    over the same exactly-verified pairs."""
    from dexspark.functions.dedup import (
        minhash_lsh_pairs,
        near_dup_groups,
        ngram_jaccard,
    )

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, num_hashes=64, bands=32)
    verified = ngram_jaccard(docs, cand)
    pairs = verified.filter(
        F.col("n_inter") * 1000 >= F.col("n_union") * 800
    ).select("id_a", "id_b")
    return near_dup_groups(docs, pairs).select(
        "doc_id", "group_id", "group_size", "is_canonical"
    )


ORACLE_DEDUP_GROUPS = f"""
WITH RECURSIVE {_SHINGLES_CTE},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1000
        >= len(list_distinct(list_concat(a.s, b.s))) * 800
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM edges e JOIN reach ON e.u = reach.id
),
comp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id)
SELECT id AS doc_id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT)
         AS group_size,
       id = group_id AS is_canonical
FROM comp
"""


def doc_span_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (functions/dedup.py::dedup_spans —
    Lee et al. 2021 ExactSubstr): tokens inside any 8-token window
    whose exact sequence occurs more than once in the corpus are
    removed — the verbatim-repeat pass exact/near/paragraph dedup all
    miss. A >=11-token promo sentence is seeded into every fourth
    document (plus a per-doc unique tail so docs stay distinct), and
    the natural corpus contributes its own repeats; the oracle runs
    the identical gram/cover/reassembly algebra in SQL."""
    from dexspark.functions.dedup import dedup_spans

    docs = load(spark, sf_dir, "documents")
    promo = (
        "limited time offer enjoy free shipping on every order placed today"
    )
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod(F.col("doc_id"), 4) == 1, F.lit(" " + promo)
            ).otherwise(F.lit("")),
            F.lit(" uniq"),
            F.col("doc_id").cast("string"),
        ),
    )
    return dedup_spans(seeded, min_len=8).select(
        "doc_id", "text_clean", "n_tokens_kept", "n_tokens_dropped"
    )


ORACLE_SPAN_DEDUP = """
WITH seeded AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 4 = 1
            THEN ' limited time offer enjoy free shipping on every order placed today'
            ELSE '' END
    || ' uniq' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
  FROM seeded
),
grams AS (
  SELECT doc_id, i, array_to_string(ts[i:i+7], chr(31)) AS gram
  FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS t(i)
),
dup AS (
  SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM grams GROUP BY gram)
  WHERE c >= 2
),
cov AS (
  SELECT DISTINCT doc_id, j
  FROM grams, UNNEST(generate_series(i, i + 7)) AS u(j)
  WHERE gram IN (SELECT gram FROM dup)
),
kept AS (
  SELECT x.doc_id,
         string_agg(x.tok, ' ' ORDER BY x.p) AS text_clean,
         COUNT(*) AS kept_n
  FROM (SELECT doc_id, ts[p] AS tok, p
        FROM toks, UNNEST(generate_series(1, len(ts))) AS g(p)) x
  LEFT JOIN cov c ON c.doc_id = x.doc_id AND c.j = x.p
  WHERE c.doc_id IS NULL
  GROUP BY x.doc_id
)
SELECT t.doc_id,
       COALESCE(k.text_clean, '') AS text_clean,
       CAST(COALESCE(k.kept_n, 0) AS BIGINT) AS n_tokens_kept,
       CAST(len(t.ts) - COALESCE(k.kept_n, 0) AS BIGINT) AS n_tokens_dropped
FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
"""


def doc_boilerplate_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PARAGRAPH dedup (functions/text.py::
    remove_boilerplate — the CCNet/RefinedWeb boilerplate pass):
    paragraphs appearing in more than ``max_repeats`` documents
    (seeded cookie banners / subscribe prompts, deterministic from
    doc_id so the oracle reproduces them) are dropped from every
    document; per-doc unique paragraphs survive in order. Dedup at
    sub-document granularity — the case exact/near-dup passes cannot
    touch. One count shuffle on the paragraph hash + a broadcast
    anti-join of the (few, by Zipf) hot paragraphs."""
    from dexspark.functions.text import remove_boilerplate

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    nl2 = "\n\n"
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.when(
                F.pmod(did, 5) == 0,
                F.lit("Cookie notice: we use cookies" + nl2),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.pmod(did, 3) != 0,
                F.lit(nl2 + "Subscribe to our newsletter today"),
            ).otherwise(F.lit("")),
            F.lit(nl2 + "ref "),
            did.cast("string"),
        ),
    )
    return remove_boilerplate(seeded, max_repeats=4).select(
        "doc_id", "text_clean", "n_paras_kept", "n_paras_dropped"
    )


ORACLE_BOILERPLATE = """
WITH seeded AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0
         THEN 'Cookie notice: we use cookies' || chr(10) || chr(10)
         ELSE '' END
    || text
    || CASE WHEN doc_id % 3 <> 0
            THEN chr(10) || chr(10) || 'Subscribe to our newsletter today'
            ELSE '' END
    || chr(10) || chr(10) || 'ref ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
),
paras AS (
  SELECT doc_id, ps[i] AS para, i AS pos
  FROM (SELECT doc_id,
               string_split(text, chr(10) || chr(10)) AS ps
        FROM seeded),
       UNNEST(generate_series(1, len(ps))) AS t(i)
),
hot AS (
  SELECT para FROM (
    SELECT para, COUNT(DISTINCT doc_id) AS d FROM paras GROUP BY para
  ) WHERE d > 4
),
kept AS (
  SELECT * FROM paras WHERE para NOT IN (SELECT para FROM hot)
),
agg AS (
  SELECT doc_id,
         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_clean,
         COUNT(*) AS n_paras_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n FROM paras GROUP BY doc_id)
SELECT s.doc_id,
       COALESCE(agg.text_clean, '') AS text_clean,
       CAST(COALESCE(agg.n_paras_kept, 0) AS BIGINT) AS n_paras_kept,
       CAST(COALESCE(tot.n, 0) - COALESCE(agg.n_paras_kept, 0) AS BIGINT)
         AS n_paras_dropped
FROM seeded s
LEFT JOIN agg ON s.doc_id = agg.doc_id
LEFT JOIN tot ON s.doc_id = tot.doc_id
"""


def corpus_curation_v2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-generation curation COMPOSITION under one oracle, built
    from this round's sub-document + graph operators: seeded corpus →
    boilerplate-paragraph removal (cleaned text feeds everything
    downstream) → exact dedup on the CLEANED text (min-id keeper) →
    near-dup candidate pairs + exact-Jaccard verify on the cleaned
    text → connected-component closure keeping only canonical docs
    (a-b-c chains collapse to one) → deterministic split assignment.
    Each stage is the operator its standalone query checks; this pins
    their composition — the value hash covers the surviving ids,
    cleaned sizes, and split labels end to end."""
    from dexspark.functions.dedup import (
        minhash_lsh_pairs,
        near_dup_groups,
        ngram_jaccard,
    )
    from dexspark.functions.sampling import split_assign
    from dexspark.functions.text import remove_boilerplate

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    nl2 = "\n\n"
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.when(
                F.pmod(did, 5) == 0,
                F.lit("Cookie notice: we use cookies" + nl2),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.pmod(did, 3) != 0,
                F.lit(nl2 + "Subscribe to our newsletter today"),
            ).otherwise(F.lit("")),
        ),
    )
    clean = remove_boilerplate(seeded, max_repeats=4).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    keepers = clean.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    s1 = clean.join(keepers.select("doc_id"), "doc_id")
    cand = minhash_lsh_pairs(s1, num_hashes=64, bands=32)
    pairs = (
        ngram_jaccard(s1, cand)
        .filter(F.col("n_inter") * 1000 >= F.col("n_union") * 800)
        .select("id_a", "id_b")
    )
    noncanon = near_dup_groups(s1, pairs).filter(
        ~F.col("is_canonical")
    ).select("doc_id")
    s2 = s1.join(noncanon, "doc_id", "left_anti")
    return split_assign(s2, "doc_id", _SPLIT_FRACTIONS).select(
        "doc_id",
        F.length("text").cast("long").alias("clean_chars"),
        "split",
    )


def _oracle_curation_v2() -> str:
    from dexspark.functions.sampling import split_thresholds

    t1, t2 = split_thresholds(_SPLIT_FRACTIONS)
    return f"""
WITH RECURSIVE seeded AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0
         THEN 'Cookie notice: we use cookies' || chr(10) || chr(10)
         ELSE '' END
    || text
    || CASE WHEN doc_id % 3 <> 0
            THEN chr(10) || chr(10) || 'Subscribe to our newsletter today'
            ELSE '' END AS text
  FROM documents
),
paras AS (
  SELECT doc_id, ps[i] AS para, i AS pos
  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
        FROM seeded),
       UNNEST(generate_series(1, len(ps))) AS t(i)
),
hotp AS (
  SELECT para FROM (
    SELECT para, COUNT(DISTINCT doc_id) AS d FROM paras GROUP BY para
  ) WHERE d > 4
),
keptp AS (SELECT * FROM paras WHERE para NOT IN (SELECT para FROM hotp)),
cleanagg AS (
  SELECT doc_id, string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
  FROM keptp GROUP BY doc_id
),
clean AS (
  SELECT s.doc_id, COALESCE(cleanagg.text, '') AS text
  FROM seeded s LEFT JOIN cleanagg ON s.doc_id = cleanagg.doc_id
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM clean GROUP BY text),
s1 AS (SELECT c.* FROM clean c JOIN keepers k ON c.doc_id = k.doc_id),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i+1:i+3], ' ')
                        for i in range(0, len(words)-2)]) AS s
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)),
                                           '\\s+', ' ', 'g'), ' ') AS words
        FROM s1)
),
prs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1000
        >= len(list_distinct(list_concat(a.s, b.s))) * 800
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM prs
  UNION SELECT id_b, id_a FROM prs
),
reach(id, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM edges e JOIN reach ON e.u = reach.id
),
comp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id),
noncanon AS (SELECT id FROM comp WHERE id <> group_id)
SELECT doc_id, CAST(len(text) AS BIGINT) AS clean_chars,
       CASE WHEN CAST(('0x' || substr(md5('split-v1'
                 || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) < {t1}
            THEN 'train'
            WHEN CAST(('0x' || substr(md5('split-v1'
                 || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) < {t2}
            THEN 'val'
            ELSE 'test' END AS split
FROM s1 WHERE doc_id NOT IN (SELECT id FROM noncanon)
"""


def corpus_curation_v3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-generation curation: the SAME pipeline semantics as
    ``corpus_curation_v2`` (boilerplate removal → exact dedup →
    near-dup closure → split assignment), but with near-dup candidates
    served from the incrementally-maintained signature index
    (lake/sigindex.py) instead of shingling the corpus from scratch —
    the round-4 verdict's "unify the two near-dup stacks" item. The
    cleaned corpus lands in a lake table across TWO CDC merges, the
    index refreshes after each (second refresh touches only the second
    batch's rows — plan/merge-size asserted by
    tests/test_physical_plans.py), and candidate generation band-
    explodes the STORED signature arrays. Because the index stores
    exactly the signatures the batch path computes, the output is
    value-identical to v2 — pinned by sharing v2's oracle verbatim."""
    from dexspark.functions.dedup import near_dup_groups
    from dexspark.functions.sampling import split_assign
    from dexspark.functions.text import remove_boilerplate
    from dexspark.lake.sigindex import (
        create_signature_index,
        near_dup_pairs_via_index,
        refresh_signature_index,
    )

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    nl2 = "\n\n"
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.when(
                F.pmod(did, 5) == 0,
                F.lit("Cookie notice: we use cookies" + nl2),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.pmod(did, 3) != 0,
                F.lit(nl2 + "Subscribe to our newsletter today"),
            ).otherwise(F.lit("")),
        ),
    )
    clean = remove_boilerplate(seeded, max_repeats=4).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    keepers = clean.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    s1 = clean.join(keepers.select("doc_id"), "doc_id")

    d = tempfile.mkdtemp(prefix="dexspark_q_")
    src = LakeTable.create(
        spark, os.path.join(d, "clean_lake"),
        _parse_datatype_string("doc_id bigint, text string"),
        "doc_id", num_buckets=8,
    )
    idx = create_signature_index(spark, os.path.join(d, "clean_sigidx"), src)
    for i, half in enumerate((s1.filter(F.pmod(did, 2) == 0),
                              s1.filter(F.pmod(did, 2) == 1))):
        src.merge(
            half.withColumn("op", F.lit("I")).withColumn(
                "lsn", F.lit(i + 1).cast("long")
            ),
            key_cols=["doc_id"],
            summary={"batch_id": f"clean-b{i}"},
        )
        refresh_signature_index(src, idx)
    stored = src.read()
    pairs = near_dup_pairs_via_index(
        idx, stored, num_hashes=64, bands=32
    ).select("id_a", "id_b")
    noncanon = near_dup_groups(stored, pairs).filter(
        ~F.col("is_canonical")
    ).select("doc_id")
    s2 = stored.join(noncanon, "doc_id", "left_anti")
    return split_assign(s2, "doc_id", _SPLIT_FRACTIONS).select(
        "doc_id",
        F.length("text").cast("long").alias("clean_chars"),
        "split",
    )


def doc_pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: emails/phones are deterministically
    SEEDED from doc_id (2 of every 3 docs) so the redaction regexes
    have real work, then counted and replaced. The whole query is
    regexp expressions inside codegen — the 100 TB shape of a
    pre-training PII pass."""
    from dexspark.functions.text import redact_pii

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.concat(F.lit("user"), did.cast("string"), F.lit("@example.com"))
    phone = F.concat(
        F.lit("555-"),
        (F.pmod(did, 900) + 100).cast("string"),
        F.lit("-"),
        (F.pmod(did, 9000) + 1000).cast("string"),
    )
    seeded = docs.withColumn(
        "text",
        F.when(F.pmod(did, 3) == 0, F.col("text")).otherwise(
            F.concat(
                F.col("text"), F.lit(" contact "), email,
                F.lit(" or call "), phone,
            )
        ),
    )
    return redact_pii(seeded).select(
        "doc_id", "n_emails", "n_phones", "text_redacted"
    )


def _pii_oracle_sql() -> str:
    from dexspark.functions.text import EMAIL_RE, PHONE_RE

    return f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call 555-'
                   || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
                   || CAST(doc_id % 9000 + 1000 AS VARCHAR)
         END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS text_redacted
FROM seeded
"""


def user_count_kmv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (functions/sketches.py) over the
    event stream's user ids — the reproducible cardinality estimator
    (HLL's registers are engine-private; KMV over md5 is exact integer
    algebra any engine replays). k=256 so the estimator path (not the
    exact small-set path) is exercised at every sf."""
    from dexspark.functions.sketches import kmv_distinct

    ev = load(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", k=256)


ORACLE_KMV = """
WITH h AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL
), mins AS (
  SELECT hv FROM h ORDER BY hv LIMIT 256
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
  CAST(MAX(hv) AS BIGINT) AS kth_min,
  CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)
            ELSE (255 * 281474976710656) // MAX(hv) END AS BIGINT)
    AS distinct_est
FROM mins
"""


def user_overlap_kmv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra (functions/sketches.py::kmv_overlap): estimate
    the overlap between two user populations — the event stream's
    first and second halves by event_id — without an exact distinct
    intersection (the pre-decontamination screening shape). k=256 so
    the estimator path is exercised."""
    from dexspark.functions.sketches import kmv_overlap

    ev = load(spark, sf_dir, "events")
    m = int(ev.agg(F.max("event_id")).first()[0])
    a = ev.filter(F.col("event_id") < m // 2)
    b = ev.filter(F.col("event_id") >= m // 2)
    return kmv_overlap(a, b, "user_id", k=256)


ORACLE_KMV_OVERLAP = """
WITH mx AS (SELECT MAX(event_id) // 2 AS half FROM events),
a AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)::BIGINT AS hv
  FROM events, mx WHERE event_id < half AND user_id IS NOT NULL
), b AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)::BIGINT AS hv
  FROM events, mx WHERE event_id >= half AND user_id IS NOT NULL
), u AS (
  SELECT hv, MAX(ina) AS ina, MAX(inb) AS inb
  FROM (
    SELECT hv, 1 AS ina, 0 AS inb FROM a
    UNION ALL
    SELECT hv, 0 AS ina, 1 AS inb FROM b
  )
  GROUP BY hv ORDER BY hv LIMIT 256
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
    CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_both,
    CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)
              ELSE (255 * 281474976710656) // MAX(hv) END AS BIGINT)
      AS union_est
  FROM u
)
SELECT k_used, n_both, union_est,
  CAST(n_both * union_est // k_used AS BIGINT) AS inter_est,
  CAST(n_both * 1000 // k_used AS BIGINT) AS jaccard_x1000
FROM agg
"""


def doc_familiarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-familiarity scoring (functions/text.py::corpus_
    familiarity) — the integer-exact cousin of CCNet's LM-perplexity
    quality filter: per-doc sum/mean of bit_length(corpus bigram
    count). Cross-doc signal (unlike doc_repetition_stats' within-doc
    one): the corpus count table is built and joined back in the same
    pass."""
    from dexspark.functions.text import corpus_familiarity

    docs = load(spark, sf_dir, "documents")
    return corpus_familiarity(docs, id_col="doc_id", text_col="text")


ORACLE_FAMILIARITY = """
WITH toks AS (
  SELECT doc_id,
    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), bg AS (
  SELECT doc_id,
    unnest([array_to_string(w[i+1:i+2], ' ') for i in range(0, len(w)-1)]) AS bg
  FROM toks WHERE len(w) >= 2 AND w[1] <> ''
), cnt AS (
  SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg
), fam AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(length(bin(c))) AS BIGINT) AS fs
  FROM bg JOIN cnt USING (bg) GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(n, 0) AS n_bigrams,
  COALESCE(fs, 0) AS fam_sum,
  COALESCE(fs * 1000 // n, 0) AS fam_avg_x1000
FROM documents d LEFT JOIN fam USING (doc_id)
"""


def doc_c4_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleanup (functions/text.py::c4_line_clean).
    Documents are deterministically seeded with junk lines (a short
    nav fragment, a code fragment with braces) and good lines (proper
    sentences) so every rule fires; the original text is its own line
    and qualifies or not on its own merits, making is_kept a real mix.
    Shuffle-free: lines never become rows."""
    from dexspark.functions.text import c4_line_clean

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    seeded = docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Nav Home About"),
            F.concat(
                F.lit("This document number "), did,
                F.lit(" has a proper sentence."),
            ),
            F.lit("if (x) { return; }"),
            F.when(
                F.pmod(F.col("doc_id"), 2) == 0,
                F.concat(
                    F.lit("Another good line for doc "), did,
                    F.lit(" right here."),
                ),
            ).otherwise(F.lit("short line.")),
        ),
    )
    return c4_line_clean(seeded)


ORACLE_C4_CLEAN = """
WITH seeded AS (
  SELECT doc_id,
    text || chr(10) || 'Nav Home About' || chr(10)
      || 'This document number ' || CAST(doc_id AS VARCHAR)
      || ' has a proper sentence.' || chr(10)
      || 'if (x) { return; }' || chr(10)
      || CASE WHEN doc_id % 2 = 0
              THEN 'Another good line for doc ' || CAST(doc_id AS VARCHAR)
                   || ' right here.'
              ELSE 'short line.' END AS text
  FROM documents
), split AS (
  SELECT doc_id,
    list_filter(
      string_split(text, chr(10)),
      ln -> regexp_matches(ln, '[.!?"]\\s*$')
            AND len(string_split_regex(trim(ln), '\\s+')) >= 5
            AND NOT contains(ln, '{') AND NOT contains(ln, '}')
    ) AS kept,
    len(string_split(text, chr(10))) AS n_total
  FROM seeded
)
SELECT doc_id,
  CASE WHEN len(kept) >= 3 THEN array_to_string(kept, chr(10))
       ELSE '' END AS text_clean,
  CAST(len(kept) AS BIGINT) AS n_lines_kept,
  CAST(n_total - len(kept) AS BIGINT) AS n_lines_dropped,
  len(kept) >= 3 AS is_kept
FROM split
"""


def doc_repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (duplicate-bigram fraction, Gopher-
    style quality signal). Expression-only — the n-gram array never
    becomes rows, so the pass is shuffle-free at any scale."""
    from dexspark.functions.text import repetition_stats

    docs = load(spark, sf_dir, "documents")
    return repetition_stats(docs, n=2).select(
        "doc_id", "n_grams", "n_distinct_grams", "dup_gram_ratio_x1000"
    )


ORACLE_REPETITION = """
WITH t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
), g AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 2
         THEN list_transform(generate_series(1, len(toks)-1),
                             i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
  CAST(len(grams) AS BIGINT) AS n_grams,
  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
  CASE WHEN len(grams) > 0
       THEN CAST(floor((len(grams) - len(list_distinct(grams))) * 1000.0
                 / len(grams)) AS BIGINT)
       ELSE 0 END AS dup_gram_ratio_x1000
FROM g
"""


def doc_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: docs with doc_id % 97 == 0 play the
    benchmark set; every other doc is flagged if it shares a 3-token
    shingle with any benchmark doc (n=3 because the synthetic vocab is
    tiny; production uses n=8). Benchmark shingles broadcast — the
    corpus side never shuffles."""
    from dexspark.functions.dedup import decontaminate

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.pmod(F.col("doc_id"), 97) == 0)
    train = docs.filter(F.pmod(F.col("doc_id"), 97) != 0)
    return decontaminate(train, bench, shingle_n=3).select(
        "doc_id", "n_contaminated_shingles", "contaminated"
    )


ORACLE_DECONTAMINATE = f"""
WITH {_SHINGLES_CTE},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % 97 = 0),
hits AS (
  SELECT ex.doc_id, count(DISTINCT ex.g) AS n
  FROM ex JOIN bench USING (g)
  WHERE ex.doc_id % 97 <> 0
  GROUP BY ex.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_shingles,
  h.n IS NOT NULL AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 97 <> 0
"""


def doc_near_dup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with candidates served from the incrementally-
    maintained signature index (lake/sigindex.py): documents arrive as
    three CDC batches — the first lands CORRUPTED text (reversed) that
    the second must fix (signature REPLACE), the second also inserts
    junk docs the third DELETES (index eviction) — and the index is
    refreshed off the change feed after each batch, O(changed docs)
    per refresh, never re-shingling the corpus. Because the index
    stores exactly the signatures the batch path would compute, the
    final pairs must equal the from-scratch ``doc_near_dup_pairs``
    result — checked here against the same exact brute-force Jaccard
    oracle over the final document state."""
    from dexspark.lake.sigindex import (
        create_signature_index,
        near_dup_pairs_via_index,
        refresh_signature_index,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    src = LakeTable.create(
        spark, os.path.join(d, "docs_lake"),
        _parse_datatype_string("doc_id bigint, text string"),
        "doc_id", num_buckets=8,
    )
    idx = create_signature_index(spark, os.path.join(d, "docs_sigidx"), src)
    third = F.pmod(F.col("doc_id"), 3)
    junk = docs.filter(third == 1).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" junk")).alias("text"),
    )
    batches = [
        # (rows, op, lsn): corrupt -> fix -> delete the junk
        (docs.filter(third == 0).withColumn("text", F.reverse("text")), "I", 1),
        (
            docs.filter(third <= 1).unionByName(junk), "U", 2,
        ),
        (docs.filter(third == 2), "I", 3),
        (junk, "D", 3),
    ]
    # batch 3 = inserts + deletes in ONE merge (distinct keys)
    b3 = batches[2][0].withColumn("op", F.lit("I")).unionByName(
        batches[3][0].withColumn("op", F.lit("D"))
    ).withColumn("lsn", F.lit(3).cast("long"))
    for i, (rows, op, lsn) in enumerate(batches[:2]):
        src.merge(
            rows.withColumn("op", F.lit(op)).withColumn(
                "lsn", F.lit(lsn).cast("long")
            ),
            key_cols=["doc_id"],
            summary={"batch_id": f"docs-b{i}"},
        )
        refresh_signature_index(src, idx)
    src.merge(b3, key_cols=["doc_id"], summary={"batch_id": "docs-b2"})
    refresh_signature_index(src, idx)
    return near_dup_pairs_via_index(
        idx, src.read(), num_hashes=64, bands=32
    )


def doc_ingest_dedup_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingestion dedup gate (lake/sigindex.py::ingest_dedup_gate):
    docs with doc_id % 3 != 0 are the standing corpus (lake table +
    signature index); docs with doc_id % 3 == 0 arrive as a NEW batch
    that must be screened against the corpus BEFORE it lands. The
    corpus side of the candidate join comes entirely from the stored
    index arrays (no corpus re-shingling — O(batch) signature work);
    the oracle brute-forces the exact corpus x batch Jaccard."""
    from dexspark.lake.sigindex import (
        create_signature_index,
        ingest_dedup_gate,
        refresh_signature_index,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    third = F.pmod(F.col("doc_id"), 3)
    corpus = docs.filter(third != 0)
    incoming = docs.filter(third == 0)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    src = LakeTable.create(
        spark, os.path.join(d, "docs_lake"),
        _parse_datatype_string("doc_id bigint, text string"),
        "doc_id", num_buckets=8,
    )
    idx = create_signature_index(spark, os.path.join(d, "docs_sigidx"), src)
    src.merge(
        corpus.withColumn("op", F.lit("I")).withColumn(
            "lsn", F.lit(1).cast("long")
        ),
        key_cols=["doc_id"],
        summary={"batch_id": "corpus"},
    )
    refresh_signature_index(src, idx)
    return ingest_dedup_gate(
        idx, src.read(), incoming, num_hashes=64, bands=32
    )


ORACLE_INGEST_GATE = f"""
WITH {_SHINGLES_CTE}
SELECT a.doc_id AS id_corpus, b.doc_id AS id_new,
       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(a.s, b.s))) AS BIGINT) AS n_union,
       CAST(floor(len(list_intersect(a.s, b.s)) * 1000.0
            / len(list_distinct(list_concat(a.s, b.s)))) AS BIGINT) AS jaccard_x1000
FROM sh a JOIN sh b ON a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
WHERE len(list_intersect(a.s, b.s)) * 1000
      >= len(list_distinct(list_concat(a.s, b.s))) * 800
"""


def corpus_curation_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline a training-data run applies,
    as ONE composed query under ONE oracle: (1) quality gate (>= 5
    tokens, alpha ratio >= 0.5), (2) exact dedup (min doc_id per
    normalized text), (3) near-dup prune — drop every doc that has a
    verified (exact n-gram Jaccard >= 0.8) near-dup with a SMALLER
    surviving doc_id (a deterministic non-iterative rule: candidates
    from MinHash-LSH, so stage cost is output-bounded, never
    all-pairs), (4) emit the curated manifest (doc_id, n_tokens,
    n_chars). Every stage is the same operator the standalone queries
    check; the composition is what this query pins — filters feed
    dedup feeds prune with no state leaking between stages."""
    from dexspark.functions.dedup import minhash_lsh_pairs, ngram_jaccard
    from dexspark.functions.text import quality_score

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    q = quality_score(docs).select(
        "doc_id", "n_tokens", "alpha_ratio_x1000", "n_chars_q"
    )
    staged = docs.join(q, "doc_id").filter(
        (F.col("n_tokens") >= 5) & (F.col("alpha_ratio_x1000") >= 500)
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    keep_exact = (
        staged.groupBy(norm.alias("_norm"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = staged.join(keep_exact, "doc_id")
    pairs = ngram_jaccard(
        surv, minhash_lsh_pairs(surv, num_hashes=64, bands=32)
    ).filter(F.col("n_inter") * 1000 >= F.col("n_union") * 800)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = surv.join(dropped, "doc_id", "left_anti")
    return final.select("doc_id", "n_tokens", "n_chars_q")


# the curation stages as reusable CTE text: corpus_training_run chains
# split/chunk/pack on top of the exact same `curated` relation
_CURATION_CTES = """t AS (
  SELECT doc_id, text,
         string_split(trim(text), ' ') AS toks,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha
  FROM documents
), staged AS (
  SELECT doc_id, text,
         CAST(len(toks) AS BIGINT) AS n_tokens, n_chars
  FROM t
  WHERE len(toks) >= 5 AND n_chars > 0
    AND CAST(floor(alpha * 1000.0 / n_chars) AS BIGINT) >= 500
), keep_exact AS (
  SELECT min(doc_id) AS doc_id FROM staged
  GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
), surv AS (
  SELECT s.* FROM staged s JOIN keep_exact USING (doc_id)
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i+1:i+3], ' ')
                        for i in range(0, len(words)-2)]) AS s
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
        FROM surv)
), dup AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1000
        >= len(list_distinct(list_concat(a.s, b.s))) * 800
), curated AS (
  SELECT doc_id, n_tokens, n_chars
  FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM dup)
)"""


ORACLE_CURATION = f"""
WITH {_CURATION_CTES}
SELECT doc_id, n_tokens, n_chars AS n_chars_q FROM curated
"""


def doc_simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups (exact for hamming ≤ 3 by 4x16-bit pigeonhole
    banding). The token hash is md5-derived (byte-identical in every
    engine), so the oracle below reproduces the signature bit-for-bit
    and brute-forces all pairs — the engine's banded self-join must
    find exactly the same ≤3-hamming set."""
    from dexspark.functions.dedup import hamming_near_dups, simhash

    docs = load(spark, sf_dir, "documents")
    sigs = simhash(docs)
    return hamming_near_dups(sigs, max_hamming=3)


# --- exact DuckDB mirror of simhash (md5 halves → 64 bit-votes) ---
def _md5_half_sql(start: int) -> str:
    """BIGINT value of 8 hex chars of md5(_t) starting at 1-based
    ``start`` (mirrors Spark's conv(substring(md5, start, 8), 16, 10))."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(_t), {start + j}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )


_SIMHASH_VOTES = ", ".join(
    f"SUM((h_{'lo' if i < 32 else 'hi'} >> {i % 32}) & 1) AS v{i}"
    for i in range(64)
)


_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN 2 * v.v{i} > v.n THEN "
    + (f"CAST({1 << i} AS BIGINT)" if i < 63 else "CAST(-9223372036854775807 AS BIGINT) - 1")
    + " ELSE 0 END)"
    for i in range(64)
)


ORACLE_SIMHASH = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           x -> x <> '')) AS _t
  FROM documents
), h AS (
  SELECT doc_id, {_md5_half_sql(1)} AS h_hi, {_md5_half_sql(9)} AS h_lo FROM tok
), votes AS (
  SELECT doc_id, count(*) AS n, {_SIMHASH_VOTES} FROM h GROUP BY doc_id
), sigs AS (
  SELECT d.doc_id, COALESCE({_SIMHASH_SIG}, 0) AS sig
  FROM documents d LEFT JOIN votes v USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


def doc_fingerprint_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups keyed by the 64-bit normalized-text fingerprint.
    Output is per-group (min doc_id, size) — identical to grouping by
    the normalized text itself (collision-free at this scale), which is
    what the oracle does."""
    from dexspark.functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    return (
        fingerprint(docs)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


ORACLE_FP_GROUPS = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents
GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
"""


def doc_gzip_unpack_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 decompress fan-out with a hard oracle: each document's text
    is gzip-wrapped into a binary payload (Arrow pandas UDF), pushed
    through unpack_archives, and the recovered leaves are fingerprinted
    — sha256 + byte length must equal the original text's, which DuckDB
    computes directly. Proves the decompression path bit-for-bit."""
    import gzip as _gzip

    from pyspark.sql.functions import pandas_udf

    from dexspark.operators.decompress import unpack_archives

    @pandas_udf("binary")
    def gz(texts: pd.Series) -> pd.Series:
        # deterministic archive bytes: mtime=0, no filename header
        return texts.map(
            lambda t: _gzip.compress((t or "").encode("utf-8"), mtime=0)
        )

    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.concat(F.col("doc_id").cast("string"), F.lit(".txt.gz")).alias("name"),
        gz(F.col("text")).alias("payload"),
    )
    leaves = unpack_archives(media, name_col="name", payload_col="payload")
    return leaves.select(
        "doc_id",
        F.col("entry_path"),
        F.octet_length("entry_bytes").cast("long").alias("n_bytes"),
        F.sha2(F.col("entry_bytes"), 256).alias("sha256_hex"),
    )


ORACLE_GZIP_UNPACK = """
SELECT doc_id,
       CAST(doc_id AS VARCHAR) || '.txt' AS entry_path,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256_hex
FROM documents
"""


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def doc_train_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold train/val/test split over the
    corpus — assignment is a pure function of doc_id (md5 prefix), so
    it is stable across runs, engines, cluster sizes, and late-
    arriving appends; no RNG, no shuffle for the assignment itself.
    Result: per-split doc count, char mass, and id range."""
    from dexspark.functions.sampling import split_assign

    docs = load(spark, sf_dir, "documents")
    return (
        split_assign(docs, "doc_id", _SPLIT_FRACTIONS)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


def _oracle_train_split() -> str:
    from dexspark.functions.sampling import split_thresholds

    t1, t2 = split_thresholds(_SPLIT_FRACTIONS)
    return f"""
WITH h AS (
  SELECT *,
         CAST(('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 6))
              AS BIGINT) AS hv
  FROM documents
)
SELECT CASE WHEN hv < {t1} THEN 'train'
            WHEN hv < {t2} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM h GROUP BY 1
"""


_SAMPLE_FRACTIONS = {"en": 0.25, "zh": 0.5}


def doc_stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsample (corpus rebalancing: thin
    the over-represented languages, keep the rest whole). Pure filter
    — the keep decision needs no shuffle and no count pass — and the
    result returns the kept IDS, so the oracle hash pins the exact
    membership, not just counts."""
    from dexspark.functions.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "doc_id", _SAMPLE_FRACTIONS, "lang", default_fraction=1.0
    )
    return kept.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


def _oracle_stratified_sample() -> str:
    from dexspark.functions.sampling import HASH_SPACE

    t_en = int(_SAMPLE_FRACTIONS["en"] * HASH_SPACE)
    t_zh = int(_SAMPLE_FRACTIONS["zh"] * HASH_SPACE)
    t_def = int(1.0 * HASH_SPACE)
    return f"""
WITH h AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5('sample-v1' || CAST(doc_id AS VARCHAR)), 1, 6))
              AS BIGINT) AS hv
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM h
WHERE hv < CASE lang WHEN 'en' THEN {t_en} WHEN 'zh' THEN {t_zh}
                     ELSE {t_def} END
"""


def doc_context_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: every document split into 120-char
    windows with 20-char overlap (stride 100) — the pre-tokenization
    fan-out of a training pipeline, as codegen'd
    explode(sequence)+substring with no UDF and no shuffle. The chunk
    text itself rides the value hash via md5."""
    from dexspark.functions.sampling import context_chunks

    docs = load(spark, sf_dir, "documents")
    ch = context_chunks(docs, "text", ("doc_id",), size=120, overlap=20)
    return ch.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_len",
        F.md5("chunk").alias("chunk_md5"),
    )


ORACLE_CONTEXT_CHUNKS = """
WITH base AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST(ceil(greatest(len(text) - 20, 1) / 100.0) AS BIGINT) - 1
         )) AS i
  FROM documents
  WHERE len(text) > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(substr(text, CAST(i * 100 + 1 AS INT), 120)) AS BIGINT)
         AS chunk_len,
       md5(substr(text, CAST(i * 100 + 1 AS INT), 120)) AS chunk_md5
FROM base
"""


def doc_pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents greedily assigned to fixed-budget
    packs (budget 4000 chars as the token proxy) in stable doc_id
    order within 8 deterministic hash shards — next-fit-with-overflow,
    a pure function of (order, sizes), no RNG and no partition-layout
    dependence. One shuffle on the shard key; running sum over the
    external sort. Result: per-pack membership stats."""
    from dexspark.functions.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_sequences(docs, "n_chars", 4000, ("doc_id",), n_shards=8)
    return packed.groupBy(
        F.col("shard").cast("long").alias("shard"), F.col("pack_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


ORACLE_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5('pack-shard' || CAST(doc_id AS VARCHAR)), 1, 6))
              AS BIGINT) % 8 AS shard
  FROM documents
), c AS (
  SELECT shard, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars AS cum
  FROM t
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(FLOOR(cum / 4000.0) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM c GROUP BY shard, pack_id
"""


def corpus_training_run_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end training-data run as ONE composed query
    under ONE oracle: curate (quality gate → exact dedup → near-dup
    prune, the corpus_curation_pipeline stages unchanged) → keep the
    deterministic TRAIN split → context-chunk every surviving document
    (120 chars, 20 overlap) → pack chunks into 2000-char sequences in
    4 deterministic shards → emit per-pack manifest stats. Every stage
    is the operator its standalone query checks; this query pins their
    COMPOSITION — curation feeds the split feeds the fan-out feeds the
    packer with no state leaking between stages, end to end in one
    lazy plan (the optimizer sees the whole run)."""
    from dexspark.functions.sampling import (
        context_chunks,
        pack_sequences,
        split_assign,
    )

    curated = corpus_curation_pipeline_q(spark, sf_dir).select("doc_id")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    train = (
        split_assign(curated.join(docs, "doc_id"), "doc_id", _SPLIT_FRACTIONS)
        .where(F.col("split") == "train")
    )
    ch = context_chunks(train, "text", ("doc_id",), size=120, overlap=20)
    packed = pack_sequences(
        ch, "chunk_len", 2000, ("doc_id", "chunk_idx"), n_shards=4
    )
    return packed.groupBy(
        F.col("shard").cast("long").alias("shard"), F.col("pack_id")
    ).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").cast("long").alias("sum_chars"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


def _oracle_training_run() -> str:
    from dexspark.functions.sampling import split_thresholds

    t1 = split_thresholds(_SPLIT_FRACTIONS)[0]
    return f"""
WITH {_CURATION_CTES},
trainset AS (
  SELECT c.doc_id, d.text
  FROM curated c JOIN documents d USING (doc_id)
  WHERE CAST(('0x' || substr(md5('split-v1' || CAST(c.doc_id AS VARCHAR)), 1, 6))
             AS BIGINT) < {t1}
),
ch AS (
  SELECT doc_id,
         unnest(generate_series(
           0, CAST(ceil(greatest(len(text) - 20, 1) / 100.0) AS BIGINT) - 1
         )) AS chunk_idx,
         text
  FROM trainset WHERE len(text) > 0
),
sized AS (
  SELECT doc_id, chunk_idx,
         CAST(len(substr(text, CAST(chunk_idx * 100 + 1 AS INT), 120)) AS BIGINT)
           AS chunk_len,
         CAST(('0x' || substr(md5('pack-shard' || CAST(doc_id AS VARCHAR)), 1, 6))
              AS BIGINT) % 4 AS shard
  FROM ch
),
cum AS (
  SELECT shard, doc_id, chunk_idx, chunk_len,
         SUM(chunk_len) OVER (PARTITION BY shard ORDER BY doc_id, chunk_idx
                              ROWS UNBOUNDED PRECEDING) - chunk_len AS c
  FROM sized
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(FLOOR(c / 2000.0) AS BIGINT) AS pack_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM cum GROUP BY shard, pack_id
"""


_CAP = 80


def doc_source_cap_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-cap rebalancing: derive a deliberately skewed domain
    column (70% web / 20% books / 10% code), then cap every domain at
    ~80 expected docs via a count-derived hash threshold
    (``source_cap_sample``) — integer-exact arithmetic keeps the
    data-dependent threshold, and therefore the exact kept-row
    MEMBERSHIP, reproducible in any engine. web and books are thinned
    to the cap, code passes whole."""
    from dexspark.functions.sampling import source_cap_sample

    docs = load(spark, sf_dir, "documents")
    domain = (
        F.when(F.pmod(F.col("doc_id"), 10) < 7, F.lit("web"))
        .when(F.pmod(F.col("doc_id"), 10) < 9, F.lit("books"))
        .otherwise(F.lit("code"))
    )
    kept = source_cap_sample(
        docs.withColumn("domain", domain), "doc_id", "domain", cap=_CAP
    )
    return kept.select(F.col("doc_id").cast("long").alias("doc_id"), "domain")


ORACLE_SOURCE_CAP = f"""
WITH d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 < 7 THEN 'web'
         WHEN doc_id % 10 < 9 THEN 'books'
         ELSE 'code' END AS domain
  FROM documents
),
c AS (SELECT domain, count(*) AS n FROM d GROUP BY 1),
h AS (
  SELECT d.doc_id, d.domain, c.n,
    CAST(('0x' || substr(md5('cap-v1' || CAST(d.doc_id AS VARCHAR)), 1, 6))
         AS BIGINT) AS hv
  FROM d JOIN c USING (domain)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, domain
FROM h
WHERE hv < CASE WHEN n <= {_CAP} THEN 16777216
                ELSE CAST(floor({_CAP} * 16777216.0 / n) AS BIGINT) END
"""
