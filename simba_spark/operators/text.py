"""Text-analysis operators for large-scale training-data pipelines.

Additive to the reference surface (BASELINE.json north_star): language
identification, quality scoring, token counting, document
fingerprinting. Everything here is pure Column arithmetic / built-in
SQL functions — no Python UDFs — so the operators run inside
whole-stage codegen and scale linearly with executors (no shuffle at
all for per-document scoring; fingerprint dedup shuffles once on the
fingerprint).

Design note: each operator has a deterministic, SQL-expressible
definition so the DuckDB oracle harness can hash-match it
(__spark_entry__.oracle_sql).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small public stopword lists (top function words). Kept tiny on purpose:
# the operator is an n-gram/stopword heuristic, not a trained model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "im"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "los", "que", "de", "se", "por", "con", "para", "las", "una"],
}
#: fixed language priority for deterministic argmax tie-breaking
LANG_ORDER = ["en", "de", "fr", "es"]

TOKEN_SPLIT_RE = r"\s+"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
CJK_RE = r"[一-鿿]"


def token_count(col) -> Column:
    """Whitespace token count (empty string counts 1 token — both Spark
    split and DuckDB string_split_regex agree on that edge)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, TOKEN_SPLIT_RE))


def bpe_ish_token_count(col) -> Column:
    """BPE-like subword estimate: word-ish chunks + digits + punctuation
    as separate tokens (regex segmentation, a public approximation of
    byte-pair tokenizer output length)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    )


def term_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary statistics: per lowercase whitespace token, its
    document frequency (`doc_freq`) and total occurrences (`term_freq`)
    — the input to stopword lists, IDF weights, and prefix-filter
    orderings. One explode + one groupBy (partial aggregation map-side);
    skew-free (the groupBy key is the term itself, and hot terms still
    combine before the shuffle)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    return toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )


def stopword_hits(col, lang: str) -> Column:
    """Occurrences of the language's stopwords as whole words."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def punct_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PUNCT_RE))


def cjk_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(CJK_RE))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, ratios — the standard
    pre-training quality filters (length / punctuation / stopword
    ratios)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.round((F.length(t) - (n_tok - F.lit(1))) / n_tok, 6),
        )
        .withColumn(
            "punct_ratio",
            F.round(punct_count(t) / F.greatest(F.length(t), F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(stopword_hits(t, "en") / F.greatest(n_tok, F.lit(1)), 6),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: rewards mid-length documents with
    natural stopword density, penalizes punctuation soup. Deterministic
    closed-form (SQL-mirrorable); weights are engine constants."""
    feats = quality_features(df, text_col)
    len_score = F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * F.lit(4.0)
    )
    return feats.withColumn(
        "quality_score",
        F.round(
            F.lit(0.4) * len_score + F.lit(0.3) * stop_score + F.lit(0.3) * punct_pen,
            6,
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language id: CJK character share first, else argmax of
    per-language stopword hit counts (ties broken by LANG_ORDER, then
    'unknown' when nothing matches). Adds `lang_pred`."""
    t = F.col(text_col)
    out = df.withColumn("__cjk", cjk_count(t))
    for lang in LANG_ORDER:
        out = out.withColumn(f"__sw_{lang}", stopword_hits(t, lang))
    best = F.lit("unknown")
    best_hits = F.lit(0)
    # forward iteration with strict '>' ⇒ the earliest language in
    # LANG_ORDER wins ties (deterministic argmax)
    for lang in LANG_ORDER:
        hits = F.col(f"__sw_{lang}")
        take = hits > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, hits).otherwise(best_hits)
    pred = F.when(
        F.col("__cjk") > F.length(t) * F.lit(0.05), F.lit("zh")
    ).otherwise(best)
    return out.withColumn("lang_pred", pred).drop(
        "__cjk", *[f"__sw_{l}" for l in LANG_ORDER]
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. The exact-dedup key."""
    t = F.col(text_col)
    norm = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    return df.withColumn(out_col, F.md5(norm))


def shingles(col, k: int = 5) -> Column:
    """Array of k-word shingles (token n-grams) — the unit of Jaccard
    similarity for near-dup detection. Built with higher-order array
    functions; empty-ish documents yield an empty array."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), TOKEN_SPLIT_RE)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (Gopher/RefinedWeb-style
    quality rules): the fraction of duplicated tokens, 2-grams and
    3-grams. ``dup_k_ratio = 1 - distinct_kgrams / total_kgrams`` —
    0 for fully novel text, → 1 for highly repetitive boilerplate.

    Pure per-row higher-order-array arithmetic — zero shuffle; the
    downstream filter (e.g. dup_3gram_ratio > 0.3 → drop) composes with
    quality_score. Docs shorter than k tokens report 0.0 for that k."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)

    def dup_ratio(k: int) -> Column:
        if k == 1:
            grams = toks
        else:
            grams = F.transform(
                F.sequence(F.lit(0), F.size(toks) - F.lit(k)),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        n = F.size(grams)
        return F.when(
            n > 0,
            F.round(
                1.0 - F.size(F.array_distinct(grams)).cast("double") / n, 6
            ),
        ).otherwise(F.lit(0.0))

    out = df.select(
        F.col(id_col),
        dup_ratio(1).alias("dup_token_ratio"),
        F.when(F.size(toks) >= 2, dup_ratio(2)).otherwise(F.lit(0.0)).alias(
            "dup_2gram_ratio"
        ),
        F.when(F.size(toks) >= 3, dup_ratio(3)).otherwise(F.lit(0.0)).alias(
            "dup_3gram_ratio"
        ),
    )
    return out


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-`top_n` terms by smoothed TF-IDF
    (tf · (ln((N+1)/(df+1)) + 1), scikit-style smoothing) — keyword
    extraction over the same whitespace tokenizer as :func:`term_stats`.

    Shape: explode → map-side-combined groupBy (id, term) for TF, a
    skinny groupBy (term) for document frequency, the corpus size as a
    1-row broadcast (plan-constant), an equi-join of TF to IDF on the
    term (output bounded by the TF rows — a hot term cannot amplify),
    and one per-document window for the top-n. Ties rank by term asc —
    fully deterministic.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is one row per (doc, term) already — a plain count IS the
    # document frequency; countDistinct would add a redundant
    # partial-distinct pass over the hottest intermediate
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    ndocs = F.broadcast(tf.agg(F.countDistinct(id_col).alias("__nd")))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(ndocs)
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__nd") + 1) / (F.col("__df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(top_n))
        .select(id_col, "term", "tf", "tfidf", "rn")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
    min_tail_tokens: int = 8,
) -> DataFrame:
    """Token-window chunking with overlap — the standard document
    splitter in front of pre-training packing and embedding indexes
    (stride < chunk_tokens gives chunk_tokens - stride tokens of
    overlap between consecutive chunks).

    Deterministic, SQL-expressible semantics: tokens are the
    whitespace split of lower(trim(text)); windows start at 0, stride,
    2·stride, … while start < n_tokens; each chunk takes up to
    `chunk_tokens` tokens; a TAIL chunk shorter than `min_tail_tokens`
    is dropped unless it is the document's only chunk (its content is
    already covered by the preceding overlapping chunk).

    Scale: tokenize + explode + slice per row — pure Column
    arithmetic inside whole-stage codegen, ZERO shuffle; output size
    is the only cost (≈ n/stride rows per doc). Composes with
    exact/near dedup and pack_sequences downstream.
    """
    chunk_tokens, stride = int(chunk_tokens), int(stride)
    if not 0 < stride <= chunk_tokens:
        raise ValueError("require 0 < stride <= chunk_tokens")
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
    d = (
        df.select(id_col, toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
        .withColumn(
            "__start",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))),
        )
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    out = d.select(
        id_col,
        (F.col("__start") / stride).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
    return out.filter(
        (F.col("chunk_id") == 0) | (F.col("n_tokens") >= int(min_tail_tokens))
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    freq: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document mean unigram log-likelihood under the corpus's own
    add-α-smoothed unigram distribution — the classic cheap LM-quality
    filter (gibberish, boilerplate, and off-distribution documents score
    low; used as a first-pass perplexity proxy in pretraining pipelines).

    score(doc) = mean over tokens t of ln P(t),
    P(t) = (tf_corpus(t) + α) / (T + α·V)   with T = total tokens,
    V = vocabulary size. Output: (id, n_tokens, lm_score), lm_score
    rounded to 6 decimals (cross-engine float-sum convention).

    Scale: one explode → groupBy(term) for corpus counts (map-side
    combine — hot terms collapse before the shuffle); (T, V) is a 1-row
    aggregate broadcast into the plan; the per-token probability lookup
    joins the exploded tokens to the vocabulary-sized frequency table
    (AQE broadcasts it); the per-doc mean is one groupBy on the id.
    Pass `freq` (a precomputed :func:`term_stats`) to amortize the
    corpus pass across scoring runs.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    if freq is None:
        freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("term_freq"))
    else:
        freq = freq.select("term", "term_freq")
    tot = F.broadcast(
        freq.agg(
            F.sum("term_freq").alias("__T"),
            F.count(F.lit(1)).alias("__V"),
        )
    )
    logp = F.log(
        (F.col("term_freq") + F.lit(float(alpha)))
        / (F.col("__T") + F.lit(float(alpha)) * F.col("__V"))
    )
    return (
        toks.join(freq, on="term", how="inner")
        .crossJoin(tot)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("lm_score"),
        )
    )


#: PII patterns, applied in this order. Every regex is written in the
#: common subset of Java regex (Spark) and RE2 (DuckDB): no lookarounds,
#: no backreferences — so the SQL oracle can mirror the operator exactly.
#: Order matters: card/SSN-shaped digit runs are redacted before the
#: looser phone pattern can eat their fragments.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"(?:\+?\d{1,2}[ -]?)?\(?\d{3}\)?[ -]\d{3}[ -]\d{4}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    kinds: Optional[list] = None,
    token_fmt: str = "<{kind}>",
) -> DataFrame:
    """Redact PII spans (emails, card/SSN-shaped numbers, phone numbers,
    IPv4 addresses) from `text_col`, appending `text_redacted`, one
    `n_<kind>` count per kind, and `n_pii` (total spans removed).

    Counts are defined SEQUENTIALLY: `n_<kind>` is the number of matches
    remaining after all earlier kinds were already replaced, which makes
    the counts well-defined under overlapping patterns (a card number is
    counted once as `card`, never again as `phone`).

    Scale: pure per-row Column arithmetic (regexp_count/regexp_replace)
    inside whole-stage codegen — zero shuffle, no Python. At 100 TB this
    is scan-bound and embarrassingly parallel; pattern count scales the
    per-row constant only. Additive to the reference surface (training-
    data pipeline family, SURVEY §2.6).
    """
    pats = PII_PATTERNS if kinds is None else [
        (k, p) for k, p in PII_PATTERNS if k in set(kinds)
    ]
    cur = F.col(text_col)
    counts = []
    for kind, pat in pats:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token_fmt.format(kind=kind))
    out = df.select("*", *counts, cur.alias("text_redacted"))
    total = None
    for kind, _ in pats:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


def pii_redact_sql(text_expr: str, token_fmt: str = "<{kind}>") -> str:
    """DuckDB SELECT-expression list mirroring :func:`pii_redact` for
    the oracle harness: one aliased `n_<kind>` count expr per kind plus
    the final `text_redacted` expr, for the caller to splice into a
    SELECT. DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics."""
    cur = text_expr
    parts = []
    for kind, pat in PII_PATTERNS:
        sq = pat.replace("'", "''")
        parts.append(
            f"len(regexp_extract_all({cur}, '{sq}')) AS n_{kind}"
        )
        cur = (
            f"regexp_replace({cur}, '{sq}', "
            f"'{token_fmt.format(kind=kind)}', 'g')"
        )
    parts.append(f"{cur} AS text_redacted")
    return parts


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Inverted index over the whitespace tokenizer: one row per term
    with document frequency, collection frequency, and the SORTED
    distinct posting list (`postings`, array of doc ids) — the search /
    retrieval-side companion of :func:`term_stats`.

    Scale: the naive one-pass groupBy(term).collect_set(id) is a skew
    bomb — a stop-term's posting list is O(corpus). `max_doc_freq`
    installs the standard guard: document frequencies are computed
    FIRST on skinny (term, id) rows (map-side combined), terms above
    the cutoff are dropped, and only surviving terms' tokens enter the
    posting-list aggregation (semi-join) — a hot term never
    materializes a giant array anywhere in the plan. With
    `max_doc_freq=None` (small/medium corpora) the single-pass shape is
    used as-is.
    """
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    per_doc = toks.groupBy("term", "__id").agg(F.count(F.lit(1)).alias("__tf"))
    if max_doc_freq is not None:
        keep = (
            per_doc.groupBy("term")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= int(max_doc_freq))
            .select("term")
        )
        per_doc = per_doc.join(keep, on="term", how="left_semi")
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("__tf").alias("term_freq"),
        F.sort_array(F.collect_list("__id")).alias("postings"),
    )


def token_cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 50,
    min_pair_freq: int = 10,
) -> DataFrame:
    """Frequent token co-occurrence (a-priori-pruned pair mining):
    pairs of tokens appearing together in at least `min_pair_freq`
    documents, each token itself appearing in at least `min_doc_freq`
    documents. Returns (token_a, token_b, n_docs) with token_a <
    token_b. The collocation/market-basket pass behind phrase
    detection and topic seeding over a corpus.

    Scale shape (the a-priori argument): the singleton DF filter runs
    on skinny distinct (doc, token) rows FIRST, so the quadratic pair
    step only ever sees each document's FREQUENT tokens — t_f²/2 pairs
    per doc where t_f is small by construction (raising min_doc_freq
    shrinks it); the pair join is doc-keyed (co-partitioned, AQE
    handles hot docs) and the final count is a combine-friendly skinny
    groupBy. No driver state; exactly reproducible in SQL
    (:func:`token_cooccurrence_sql`).
    """
    toks = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
        .distinct()
    )
    freq = (
        toks.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= int(min_doc_freq))
        .select("__tok")
    )
    ft = toks.join(freq, "__tok").select("__doc", "__tok")
    a = ft.select(F.col("__doc"), F.col("__tok").alias("token_a"))
    b = ft.select(F.col("__doc"), F.col("__tok").alias("token_b"))
    pairs = a.join(b, "__doc").filter(F.col("token_a") < F.col("token_b"))
    return (
        pairs.groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= int(min_pair_freq))
    )


def token_cooccurrence_sql(
    from_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    min_doc_freq: int = 50,
    min_pair_freq: int = 10,
) -> str:
    """DuckDB mirror of :func:`token_cooccurrence`."""
    return f"""
  WITH __toks AS (
    SELECT {id_expr} AS __doc,
           unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+'))
             AS __tok
    FROM {from_sql}
  ), __tok2 AS (
    SELECT DISTINCT __doc, __tok FROM __toks WHERE __tok <> ''
  ), __freq AS (
    SELECT __tok FROM __tok2 GROUP BY __tok
    HAVING count(*) >= {int(min_doc_freq)}
  ), __ft AS (
    SELECT t.__doc, t.__tok FROM __tok2 t JOIN __freq f USING (__tok)
  )
  SELECT a.__tok AS token_a, b.__tok AS token_b,
         count(*)::BIGINT AS n_docs
  FROM __ft a JOIN __ft b
    ON a.__doc = b.__doc AND a.__tok < b.__tok
  GROUP BY 1, 2
  HAVING count(*) >= {int(min_pair_freq)}
"""


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    require_all: bool = False,
) -> DataFrame:
    """BM25 ranked retrieval: the top-``k`` documents for a bag of
    query terms, scored with Okapi BM25 (Lucene's non-negative idf
    variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``). Returns
    ``(doc_id, score)``, score rounded to ``round_to``, ties broken by
    ascending ``doc_id``. The ranking-side companion of
    :func:`inverted_index` / :func:`tfidf_topk`.

    ``require_all=True`` gives conjunctive (AND) retrieval: only
    documents containing EVERY query term rank — one extra skinny
    HAVING on the per-doc term count, applied before the top-k.

    Scale shape: the term filter lands BEFORE the tf aggregation, so
    the per-(term, doc) shuffle only ever carries the query's terms —
    O(postings-of-query), not O(corpus-tokens); document length is a
    separate skinny groupBy(doc) count; N/avgdl and the per-term idf
    table (|query| rows) are 1-row/|q|-row broadcasts; the final top-k
    is one TakeOrderedAndProject (≤ k rows cross to the driver).
    """
    terms = [t.lower() for t in query_terms]
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("query_terms must be non-empty and distinct")
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dl = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("__dl"))
    qt = toks.filter(F.col("term").isin(terms))
    tf = qt.groupBy("term", "__id").agg(F.count(F.lit(1)).alias("__tf"))
    # corpus scalars as a 1-row broadcast (N counts EVERY input row,
    # token-less docs included — they belong in the idf denominator)
    scalars = df.agg(F.count(F.lit(1)).alias("__n")).crossJoin(
        dl.agg(F.avg("__dl").alias("__avgdl"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(scalars))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            ).alias("__idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "__id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "__id",
            (
                F.col("__idf")
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy("__id")
        .agg(
            F.sum("__s").alias("__score"),
            F.count(F.lit(1)).alias("__nterms"),
        )
    )
    if require_all:
        scored = scored.filter(F.col("__nterms") == len(terms))
    scored = scored.drop("__nterms")
    # rank on the ROUNDED score: raw double sums differ in addition
    # order across engines, so ulp-close neighbors at the k boundary
    # could flip; rounding first makes the (score, doc_id) order a
    # deterministic function of the data
    return (
        scored.select(
            F.col("__id").alias(id_col),
            F.round("__score", round_to).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def bm25_sql(
    from_sql: str,
    query_terms: Sequence[str],
    text_expr: str = "text",
    id_expr: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    require_all: bool = False,
    terms_sql: Optional[str] = None,
) -> str:
    """DuckDB SQL mirror of :func:`bm25_topk` (same tokenizer, idf
    variant, float expression shapes, doc_id tiebreak, and AND-mode
    HAVING). ``terms_sql`` (a subquery yielding one ``term`` column)
    replaces the literal term list for DATA-DEPENDENT queries —
    e.g. pseudo-relevance-feedback expansion, where the oracle must
    re-derive the expanded terms rather than receive them as
    literals; ``require_all`` needs the literal form."""
    if terms_sql is not None and require_all:
        raise ValueError("terms_sql does not compose with require_all")
    terms = (
        f"SELECT term FROM ({terms_sql})"
        if terms_sql is not None
        else ", ".join(
            "'" + t.lower().replace("'", "''") + "'" for t in query_terms
        )
    )
    return f"""
WITH __toks AS (
  SELECT {id_expr} AS __id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS term
  FROM {from_sql}
), __tk AS (SELECT __id, term FROM __toks WHERE term <> ''),
__dl AS (SELECT __id, count(*) AS __dl FROM __tk GROUP BY 1),
__tf AS (
  SELECT term, __id, count(*) AS __tf FROM __tk
  WHERE term IN ({terms}) GROUP BY 1, 2
),
__sc AS (
  SELECT (SELECT count(*) FROM {from_sql}) AS __n,
         (SELECT avg(__dl) FROM __dl) AS __avgdl
),
__idf AS (
  SELECT term,
         ln(1.0 + (s.__n - count(*) + 0.5) / (count(*) + 0.5)) AS __idf
  FROM __tf, __sc s GROUP BY term, s.__n
)
SELECT t.__id AS {id_expr},
       round(sum(i.__idf * (t.__tf * ({k1!r} + 1.0))
                 / (t.__tf + {k1!r} * (1.0 - {b!r}
                    + {b!r} * d.__dl / s.__avgdl))), {int(round_to)}) AS score
FROM __tf t
JOIN __idf i USING (term)
JOIN __dl d USING (__id)
CROSS JOIN __sc s
GROUP BY t.__id
{f"HAVING count(*) = {len(list(query_terms))}" if require_all else ""}
ORDER BY score DESC, t.__id ASC
LIMIT {int(k)}
"""


def lm_dirichlet_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    mu: float = 2000.0,
    round_to: int = 6,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranked retrieval (Zhai &
    Lafferty's LM ranking; Lucene's ``LMDirichletSimilarity``
    convention): the top-``k`` documents CONTAINING at least one query
    term, each matched term contributing

        ln(1 + tf / (µ · cf/|C|)) + ln(µ / (dl + µ))

    (cf = the term's collection frequency, |C| = total corpus tokens,
    dl = document length). The language-model companion of
    :func:`bm25_topk` — same tokenizer, same retrieval-set contract
    (only matching documents score, the inverted-index set), a
    different probability story. Returns ``(doc_id, score)``, score
    rounded, ties broken by ascending ``doc_id``.

    Scale shape: identical to bm25_topk — the term filter lands BEFORE
    the tf aggregation (the shuffle carries the query's postings
    only), document length is a skinny groupBy(doc) count, the |C|
    scalar and |q|-row cf table are broadcasts, and the final top-k is
    one TakeOrderedAndProject.
    """
    terms = [t.lower() for t in query_terms]
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("query_terms must be non-empty and distinct")
    if not mu > 0:
        raise ValueError(f"mu must be > 0: {mu}")
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dl = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("__dl"))
    qt = toks.filter(F.col("term").isin(terms))
    tf = qt.groupBy("term", "__id").agg(F.count(F.lit(1)).alias("__tf"))
    ctot = toks.agg(F.count(F.lit(1)).alias("__ctot"))
    cf = qt.groupBy("term").agg(F.count(F.lit(1)).alias("__cf"))
    scored = (
        tf.join(F.broadcast(cf), "term")
        .join(dl, "__id")
        .crossJoin(F.broadcast(ctot))
        .select(
            "__id",
            (
                F.log(
                    F.lit(1.0)
                    + F.col("__tf").cast("double")
                    / (F.lit(float(mu)) * F.col("__cf").cast("double")
                       / F.col("__ctot").cast("double"))
                )
                + F.log(
                    F.lit(float(mu))
                    / (F.col("__dl").cast("double") + F.lit(float(mu)))
                )
            ).alias("__s"),
        )
        .groupBy("__id")
        .agg(F.sum("__s").alias("__score"))
    )
    # rank on the ROUNDED score (the bm25_topk determinism rationale)
    return (
        scored.select(
            F.col("__id").alias(id_col),
            F.round("__score", int(round_to)).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def lm_dirichlet_sql(
    from_sql: str,
    query_terms: Sequence[str],
    text_expr: str = "text",
    id_expr: str = "doc_id",
    k: int = 20,
    mu: float = 2000.0,
    round_to: int = 6,
) -> str:
    """DuckDB SQL mirror of :func:`lm_dirichlet_topk` (same tokenizer,
    per-matched-term formula, rounded-score tiebreak)."""
    terms = ", ".join(
        "'" + t.lower().replace("'", "''") + "'" for t in query_terms
    )
    return f"""
WITH __toks AS (
  SELECT {id_expr} AS __id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS term
  FROM {from_sql}
), __tk AS (SELECT __id, term FROM __toks WHERE term <> ''),
__dl AS (SELECT __id, count(*) AS __dl FROM __tk GROUP BY 1),
__tf AS (
  SELECT term, __id, count(*) AS __tf FROM __tk
  WHERE term IN ({terms}) GROUP BY 1, 2
),
__cf AS (
  SELECT term, count(*) AS __cf FROM __tk
  WHERE term IN ({terms}) GROUP BY 1
),
__ct AS (SELECT count(*) AS __ctot FROM __tk)
SELECT t.__id AS {id_expr},
       round(sum(ln(1.0 + CAST(t.__tf AS DOUBLE)
                    / ({mu!r} * CAST(c.__cf AS DOUBLE)
                       / CAST(s.__ctot AS DOUBLE)))
                 + ln({mu!r} / (CAST(d.__dl AS DOUBLE) + {mu!r}))),
             {int(round_to)}) AS score
FROM __tf t
JOIN __cf c USING (term)
JOIN __dl d USING (__id)
CROSS JOIN __ct s
GROUP BY t.__id
ORDER BY score DESC, t.__id ASC
LIMIT {int(k)}
"""


def bm25_topk_batch(
    df: DataFrame,
    queries: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    query_col: str = "query",
) -> DataFrame:
    """BATCH BM25: the top-``k`` documents for EVERY query in
    ``queries`` ({query_id: [terms, ...]}) from ONE corpus pass — the
    eval-harness / query-log shape where running
    :func:`bm25_topk` per query re-explodes the corpus |Q| times.
    Same scoring (Lucene non-negative idf, per-term df over the whole
    corpus), same rounded-score ``(score DESC, id ASC)`` order; ties
    across queries share one postings table, one doc-length table,
    one idf table over the UNION of query terms.

    Returns ``(query, doc_id, score)``, <= k rows per query.

    Scale shape: the term filter still lands before the tf
    aggregation (the shuffle carries the union-of-queries postings
    only); the (query, term) map is a literal-broadcast frame
    (|Q|·|terms| rows — human-scale); per-query top-k is a window
    over the scored candidates, which total O(|Q| · postings).
    """
    if not queries:
        raise ValueError("queries must be a non-empty {id: [terms]} dict")
    qmap = []
    for qid, terms in sorted(queries.items()):
        tl = [t.lower() for t in terms]
        if not tl or len(set(tl)) != len(tl):
            raise ValueError(
                f"query {qid!r}: terms must be non-empty and distinct")
        qmap.extend((str(qid), t) for t in tl)
    all_terms = sorted({t for _, t in qmap})
    spark = df.sparkSession
    qdf = spark.createDataFrame(qmap, f"{query_col} string, term string")
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # the aggregated frames are SMALL (one row per doc / per query-term
    # posting) but each is consumed twice — EAGER checkpoints (r12):
    # the consumers materialize concurrently, and a lazy checkpoint
    # would recompute the corpus-sized token explode once per
    # concurrent reference (Catalyst inlines shared DataFrames)
    dl = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("__dl")) \
        .localCheckpoint(eager=True)
    tf = (
        toks.filter(F.col("term").isin(all_terms))
        .groupBy("term", "__id")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=True)
    )
    scalars = df.agg(F.count(F.lit(1)).alias("__n")).crossJoin(
        dl.agg(F.avg("__dl").alias("__avgdl"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(scalars))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            ).alias("__idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(qdf), "term")
        .join(dl, "__id")
        .crossJoin(F.broadcast(scalars))
        .select(
            query_col,
            "__id",
            (
                F.col("__idf")
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy(query_col, "__id")
        .agg(F.sum("__s").alias("__score"))
        .select(
            query_col,
            F.col("__id").alias(id_col),
            F.round("__score", round_to).alias("score"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def bm25_batch_sql(
    from_sql: str,
    queries: dict,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    query_col: str = "query",
) -> str:
    """DuckDB SQL mirror of :func:`bm25_topk_batch` (one corpus pass,
    same idf/df over the union of query terms, same per-query
    window top-k)."""
    if not queries:
        raise ValueError("queries must be a non-empty {id: [terms]} dict")
    rows = []
    for qid, terms in sorted(queries.items()):
        for t in terms:
            tq = t.lower().replace("'", "''")
            qq = str(qid).replace("'", "''")
            rows.append(f"('{qq}', '{tq}')")
    values = ", ".join(rows)
    return f"""
WITH __qm({query_col}, term) AS (VALUES {values}),
__toks AS (
  SELECT {id_expr} AS __id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS term
  FROM {from_sql}
), __tk AS (SELECT __id, term FROM __toks WHERE term <> ''),
__dl AS (SELECT __id, count(*) AS __dl FROM __tk GROUP BY 1),
__tf AS (
  SELECT term, __id, count(*) AS __tf FROM __tk
  WHERE term IN (SELECT DISTINCT term FROM __qm) GROUP BY 1, 2
),
__sc AS (
  SELECT (SELECT count(*) FROM {from_sql}) AS __n,
         (SELECT avg(__dl) FROM __dl) AS __avgdl
),
__idf AS (
  SELECT term,
         ln(1.0 + (s.__n - count(*) + 0.5) / (count(*) + 0.5)) AS __idf
  FROM __tf, __sc s GROUP BY term, s.__n
),
__scored AS (
  SELECT q.{query_col}, t.__id,
         round(sum(i.__idf * (t.__tf * ({k1!r} + 1.0))
                   / (t.__tf + {k1!r} * (1.0 - {b!r}
                      + {b!r} * d.__dl / s.__avgdl))),
               {int(round_to)}) AS score
  FROM __tf t
  JOIN __idf i USING (term)
  JOIN __qm q USING (term)
  JOIN __dl d USING (__id)
  CROSS JOIN __sc s
  GROUP BY q.{query_col}, t.__id
)
SELECT {query_col}, __id AS {id_expr}, score FROM (
  SELECT *, row_number() OVER (PARTITION BY {query_col}
                               ORDER BY score DESC, __id ASC) AS __rn
  FROM __scored
) WHERE __rn <= {int(k)}
"""


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over positional postings: documents
    containing the (whitespace-tokenized, lowercased) ``phrase`` as a
    CONSECUTIVE token run, with the match count per document. Returns
    ``(doc_id, n_matches)``, only matching docs.

    Positional-index algorithm (how Lucene answers phrase queries):
    the token stream is posexploded to (doc, pos) postings per phrase
    term — everything else is filtered out BEFORE any shuffle — and
    term i's postings are equi-joined on (doc, pos - i). Each join is
    skinny (doc, pos) rows on co-located keys; a phrase of m words is
    m-1 such joins. No arrays are ever materialized per doc, so a
    boilerplate-heavy doc with thousands of hits costs rows, not
    memory.
    """
    words = [w for w in phrase.lower().strip().split() if w]
    if not words:
        raise ValueError("phrase must contain at least one token")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
        ).alias("__pos", "term"),
    ).filter(F.col("term") != "")
    base = (
        toks.filter(F.col("term") == words[0])
        .select("__id", F.col("__pos").alias("__p"))
    )
    for i, w in enumerate(words[1:], start=1):
        nxt = toks.filter(F.col("term") == w).select(
            "__id", (F.col("__pos") - i).alias("__p")
        )
        base = base.join(nxt, ["__id", "__p"], "inner")
    return base.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_matches")
    )


def phrase_search_sql(
    from_sql: str,
    phrase: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB SQL mirror of :func:`phrase_search` (same tokenizer,
    0-based positions, consecutive-position joins)."""
    words = [w for w in phrase.lower().strip().split() if w]
    q = lambda s: "'" + s.replace("'", "''") + "'"  # noqa: E731
    joins = "\n".join(
        f"JOIN __tk t{i} ON t{i}.__id = t0.__id AND t{i}.term = {q(w)}"
        f" AND t{i}.__pos = t0.__pos + {i}"
        for i, w in enumerate(words[1:], start=1)
    )
    return f"""
WITH __tk AS (
  SELECT {id_expr} AS __id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS term,
         generate_subscripts(
           regexp_split_to_array(lower(trim({text_expr})), '\\s+'), 1) - 1
           AS __pos
  FROM {from_sql}
)
SELECT t0.__id AS {id_expr}, count(*) AS n_matches
FROM __tk t0 {joins}
WHERE t0.term = {q(words[0])}
GROUP BY t0.__id
"""


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_size: Optional[int] = None,
) -> DataFrame:
    """Frequency-ranked vocabulary with STABLE CONTIGUOUS ids:
    term_id 0 is the most frequent term, ties broken by term asc —
    the tokenizer-/embedding-table-building step of a training
    pipeline, deterministic across engines, partitionings, and runs.

    Returns ``(term, term_id, term_freq, doc_freq)``; ``min_count``
    drops the tail before ranking, ``max_size`` truncates to the top
    ids after it.

    Scale: one explode + ONE combine-friendly groupBy(term) (hot
    terms collapse map-side; doc_freq via count_distinct inside the
    same aggregate), then the global dense rank runs TWO-PHASE via
    ``pipeline.running_total`` on the (−freq, term) struct key —
    range repartition + per-partition ranks + broadcast offsets,
    never a single-partition window over the vocabulary.
    """
    from .pipeline import running_total

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
        ).alias("term"),
    ).filter(F.col("term") != "")
    counts = (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("__id").alias("doc_freq"),
        )
        .filter(F.col("term_freq") >= int(min_count))
        .withColumn(
            "__ord",
            F.struct(
                (-F.col("term_freq")).alias("__nf"),
                F.col("term").alias("__t"),
            ),
        )
        .withColumn("__one", F.lit(1))
    )
    ranked = running_total(counts, "__ord", "__one", "__rk")
    out = ranked.select(
        "term",
        (F.col("__rk") - 1).cast("long").alias("term_id"),
        "term_freq",
        "doc_freq",
    )
    if max_size is not None:
        out = out.filter(F.col("term_id") < int(max_size))
    return out


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram log-likelihood under the corpus's own
    add-α-smoothed bigram model — the next step up from
    :func:`unigram_lm_score`'s bag-of-words proxy: word-SALAD text
    (plausible unigrams, shuffled order) scores low here while
    passing the unigram filter.

    score(doc) = mean over adjacent pairs (a, b) of ln P(b | a),
    P(b | a) = (c(a,b) + α) / (c(a,·) + α·V), V = unigram vocabulary
    size. Documents with < 2 tokens have no pairs and are absent
    from the output (left-join against the corpus to surface them as
    NULL). Output:
    ``(id, n_bigrams, lm2_score)`` rounded to 6 (float-sum
    convention).

    Scale: bigram pairs come from slicing the token ARRAY against its
    own shift (zero windows, zero self-joins — pairs explode straight
    out of the row); corpus bigram and context counts are two
    combine-friendly groupBys; the probability lookup joins exploded
    pairs to the bigram table on (a, b) (AQE broadcasts when small)
    and the per-doc mean is one groupBy on the id.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
            lambda t: t != "",
        ).alias("__ts"),
    )
    pairs = toks.select(
        "__id",
        F.explode(
            F.arrays_zip(
                F.slice("__ts", 1, F.greatest(F.size("__ts") - 1, F.lit(0))),
                F.slice(
                    "__ts", 2,
                    F.greatest(F.size("__ts") - 1, F.lit(0)),
                ),
            )
        ).alias("__p"),
    ).select(
        "__id",
        F.col("__p")["0"].alias("__a"),
        F.col("__p")["1"].alias("__b"),
    )
    big = pairs.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).alias("__nab"))
    ctx = big.groupBy("__a").agg(F.sum("__nab").alias("__na"))
    voc = toks.select(F.explode("__ts").alias("t")).agg(
        F.countDistinct("t").alias("__V"))
    a = float(alpha)
    logp = F.log(
        (F.col("__nab") + F.lit(a))
        / (F.col("__na") + F.lit(a) * F.col("__V"))
    )
    scored = (
        pairs.join(big, ["__a", "__b"])
        .join(ctx, "__a")
        .crossJoin(F.broadcast(voc))
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("lm2_score"),
        )
    )
    return scored


def kn_trigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean trigram log-likelihood under the corpus's own
    interpolated Kneser–Ney model (Kneser & Ney 1995 / Chen & Goodman
    1999 — the standard n-gram smoothing) — the step up from
    :func:`bigram_lm_score`: KN's CONTINUATION counts score a word by
    how many contexts it follows, so boilerplate that repeats one
    high-frequency collocation ("click here click here") stops looking
    fluent, the classic add-α failure.

    With D = ``discount`` and all statistics from the corpus itself:

        P(w3|w1w2) = max(c(w1w2w3)−D, 0)/c(w1w2·)
                     + D·N1+(w1w2·)/c(w1w2·) · P(w3|w2)
        P(w3|w2)   = max(N1+(·w2w3)−D, 0)/N1+(·w2·)
                     + D·N1+(w2·•)/N1+(·w2·) · P(w3)
        P(w3)      = N1+(·w3) / N1+(··)

    where c(w1w2·) counts trigram positions opening with (w1,w2),
    N1+(·w2w3) is the distinct-w1 continuation count, N1+(·w2·) the
    distinct (w1,w3) pairs around w2, N1+(w2·•) the distinct w3 with
    any (·,w2,w3) trigram type, and the unigram level uses bigram
    types. Scoring the corpus under its own model means every
    trigram's counts are >= 1 — no zero-backoff branch.

    Output ``(id, n_trigrams, kn3_score)``; docs with < 3 tokens are
    absent. Probabilities are fixed expressions over exact integer
    counts (identical doubles in the SQL mirror); the per-doc mean
    follows the engine's float-sum round-6 convention.

    Scale: one trigram explode (corpus-linear, zero windows/self-joins
    — slices of the token array against its own shifts), five
    combine-friendly type/count aggregates (vocabulary-scaled), and
    skinny key joins back to the trigram stream.
    """
    D = float(discount)
    if not 0.0 < D < 1.0:
        raise ValueError(f"discount must be in (0, 1): {discount}")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
            lambda t: t != "",
        ).alias("__ts"),
    )
    n2 = F.greatest(F.size("__ts") - 2, F.lit(0))
    tri = toks.select(
        "__id",
        F.explode(F.arrays_zip(
            F.slice("__ts", 1, n2),
            F.slice("__ts", 2, n2),
            F.slice("__ts", 3, n2),
        )).alias("__t"),
    ).select(
        "__id",
        F.col("__t")["0"].alias("__w1"),
        F.col("__t")["1"].alias("__w2"),
        F.col("__t")["2"].alias("__w3"),
    )
    # token counts
    c3 = tri.groupBy("__w1", "__w2", "__w3").agg(
        F.count(F.lit(1)).alias("__c3"))
    c2 = c3.groupBy("__w1", "__w2").agg(
        F.sum("__c3").alias("__c2"),
        F.count(F.lit(1)).alias("__fol"),      # N1+(w1w2·)
    )
    # trigram TYPE statistics around the middle word
    prec = c3.groupBy("__w2", "__w3").agg(
        F.count(F.lit(1)).alias("__prec"))     # N1+(·w2w3)
    mid = c3.groupBy("__w2").agg(
        F.count(F.lit(1)).alias("__mid"),      # N1+(·w2·)
        F.countDistinct("__w3").alias("__fol2"))  # N1+(w2·•)
    # unigram continuation from corpus BIGRAM types
    pairs = toks.select(
        F.explode(F.arrays_zip(
            F.slice("__ts", 1, F.greatest(F.size("__ts") - 1, F.lit(0))),
            F.slice("__ts", 2, F.greatest(F.size("__ts") - 1, F.lit(0))),
        )).alias("__p"),
    ).select(F.col("__p")["0"].alias("__a"), F.col("__p")["1"].alias("__b"))
    btypes = pairs.distinct()
    uni = btypes.groupBy(F.col("__b").alias("__w3")).agg(
        F.count(F.lit(1)).alias("__u"))        # N1+(·w3)
    tot = btypes.agg(F.count(F.lit(1)).alias("__T"))  # N1+(··)

    p_uni = F.col("__u") / F.col("__T")
    p_bi = (
        F.greatest(F.col("__prec") - F.lit(D), F.lit(0.0)) / F.col("__mid")
        + F.lit(D) * F.col("__fol2") / F.col("__mid") * p_uni
    )
    p_tri = (
        F.greatest(F.col("__c3") - F.lit(D), F.lit(0.0)) / F.col("__c2")
        + F.lit(D) * F.col("__fol") / F.col("__c2") * p_bi
    )
    scored = (
        tri.join(c3, ["__w1", "__w2", "__w3"])
        .join(c2, ["__w1", "__w2"])
        .join(prec, ["__w2", "__w3"])
        .join(mid, "__w2")
        .join(uni, "__w3")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(F.log(p_tri)), int(round_to)).alias("kn3_score"),
        )
    )
    return scored


def kn_trigram_lm_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`kn_trigram_lm_score` — identical count
    tables, the same fixed probability expression tree, the same
    round-6 mean convention."""
    D = float(discount)
    if not 0.0 < D < 1.0:
        raise ValueError(f"discount must be in (0, 1): {discount}")
    return f"""
WITH __tk AS MATERIALIZED (
  SELECT {id_col} AS __id,
         list_filter(regexp_split_to_array(lower(trim({text_col})),
                                           '\\s+'), t -> t <> '') AS __ts
  FROM {table}
), __tri AS MATERIALIZED (
  SELECT __id, z[1] AS __w1, z[2] AS __w2, z[3] AS __w3 FROM (
    SELECT __id, unnest(list_zip(
      __ts[1:greatest(length(__ts) - 2, 0)],
      __ts[2:greatest(length(__ts) - 1, 1)],
      __ts[3:length(__ts)])) AS z
    FROM __tk WHERE length(__ts) >= 3
  )
), __c3 AS MATERIALIZED (
  SELECT __w1, __w2, __w3, count(*)::BIGINT AS __c3
  FROM __tri GROUP BY 1, 2, 3
), __c2 AS MATERIALIZED (
  SELECT __w1, __w2, sum(__c3)::BIGINT AS __c2,
         count(*)::BIGINT AS __fol
  FROM __c3 GROUP BY 1, 2
), __prec AS MATERIALIZED (
  SELECT __w2, __w3, count(*)::BIGINT AS __prec FROM __c3 GROUP BY 1, 2
), __mid AS MATERIALIZED (
  SELECT __w2, count(*)::BIGINT AS __mid,
         count(DISTINCT __w3)::BIGINT AS __fol2
  FROM __c3 GROUP BY 1
), __bp AS MATERIALIZED (
  SELECT DISTINCT z[1] AS __a, z[2] AS __b FROM (
    SELECT unnest(list_zip(
      __ts[1:greatest(length(__ts) - 1, 0)],
      __ts[2:length(__ts)])) AS z
    FROM __tk WHERE length(__ts) >= 2
  )
), __uni AS MATERIALIZED (
  SELECT __b AS __w3, count(*)::BIGINT AS __u FROM __bp GROUP BY 1
), __tot AS MATERIALIZED (SELECT count(*)::BIGINT AS __T FROM __bp)
SELECT t.__id AS {id_col},
       count(*)::BIGINT AS n_trigrams,
       round(avg(ln(
         greatest(CAST(c3.__c3 AS DOUBLE) - {D!r}, 0.0::DOUBLE)
           / CAST(c2.__c2 AS DOUBLE)
         + {D!r} * CAST(c2.__fol AS DOUBLE) / CAST(c2.__c2 AS DOUBLE)
           * (greatest(CAST(p.__prec AS DOUBLE) - {D!r}, 0.0::DOUBLE)
                / CAST(m.__mid AS DOUBLE)
              + {D!r} * CAST(m.__fol2 AS DOUBLE) / CAST(m.__mid AS DOUBLE)
                * (CAST(u.__u AS DOUBLE) / CAST(s.__T AS DOUBLE)))
       )), {int(round_to)}) AS kn3_score
FROM __tri t
JOIN __c3 c3 USING (__w1, __w2, __w3)
JOIN __c2 c2 USING (__w1, __w2)
JOIN __prec p USING (__w2, __w3)
JOIN __mid m USING (__w2)
JOIN __uni u USING (__w3)
CROSS JOIN __tot s
GROUP BY t.__id
"""


# --- BPE tokenizer training -------------------------------------------------
#: symbol-boundary sentinel for BPE sequences: every symbol is wrapped
#: as ``\x01sym\x01`` so a pair replace can never match inside a longer
#: symbol and never consumes a neighbouring pair's boundary (adjacent
#: symbols contribute the DOUBLE sentinel ``\x01\x01`` separator, and
#: replacing ``\x01l\x01\x01r\x01 -> \x01lr\x01`` leaves both outer
#: sentinels in place). \x01 never occurs in [a-z]+ words.
BPE_SYM = "\x01"
BPE_SEP = BPE_SYM + BPE_SYM


def _bpe_word_seqs(df: DataFrame, text_col: str, min_word_freq: int) -> DataFrame:
    """(__seq, __f): each distinct lowercase [a-z]+ word as its wrapped
    initial character sequence, with its corpus frequency. THE scale
    trick of BPE training (Sennrich et al. 2016, public algorithm):
    after this one corpus-sized explode + groupBy, every merge
    iteration runs over the vocabulary-sized table only."""
    words = df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
        ).alias("__w")
    ).filter(F.col("__w").rlike("^[a-z]+$"))
    wf = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__f"))
    if int(min_word_freq) > 1:
        wf = wf.filter(F.col("__f") >= int(min_word_freq))
    return wf.select(
        F.regexp_replace("__w", "(.)", BPE_SYM + "$1" + BPE_SYM).alias("__seq"),
        "__f",
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_word_freq: int = 1,
    sample_fraction: Optional[float] = None,
    sample_seed: int = 42,
) -> DataFrame:
    """Byte-pair-encoding merge training over a document corpus — the
    tokenizer-learning step of an LLM data pipeline, distributed.

    Classic BPE (Sennrich et al. 2016): start from characters, then
    repeatedly merge the most frequent adjacent symbol pair. Words are
    lowercase ``[a-z]+`` tokens; pair counts are weighted by word
    frequency and count overlapping occurrences ("aaa" has two (a,a)
    pairs), merges apply left-to-right non-overlapping ("aaa" ->
    "aa"+"a") — exactly the published reference implementation's
    semantics. Ties break deterministically: count DESC, then
    (lhs, rhs) ASC (ASCII-only symbols, collation-safe across engines).

    Returns the learned merge table ``(merge_rank, lhs, rhs,
    pair_count)`` with ``merge_rank`` starting at 1; fewer than
    ``num_merges`` rows when the vocabulary runs out of pairs.

    Scale: ONE corpus-sized explode + combine-friendly groupBy builds
    the word-frequency table; every one of the ``num_merges``
    iterations then touches only that vocabulary-sized skinny frame
    (pair explode + groupBy + a 1-ROW top-1 collect — the merge
    decision is parameter-bounded driver state, never data-sized).
    The sequence update is a literal ``replace`` projection
    (whole-stage codegen); lineage is flattened per round with a lazy
    localCheckpoint so round k never replays rounds 1..k-1.

    ``sample_fraction`` (default None = exact) trains merges on a
    deterministic md5-hash sample of the DISTINCT-WORD table — the
    100 TB mode: nobody trains a tokenizer's merge ranking on the full
    corpus vocabulary; frequency-dominant pairs are robust under word
    subsampling, and membership depends only on the word (the engine's
    :func:`.pipeline.hash_sample` uniform, seeded), so the sampled
    merge table is bit-reproducible across runs, partitionings, and
    engines (``bpe_train_sql`` mirrors the same filter).
    """
    if int(num_merges) < 0:
        raise ValueError("num_merges must be >= 0")
    spark = df.sparkSession
    schema = "merge_rank int, lhs string, rhs string, pair_count long"
    cur = _bpe_word_seqs(df, text_col, min_word_freq)
    if sample_fraction is not None:
        frac = float(sample_fraction)
        if not 0.0 < frac <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1]: {sample_fraction}")
        from .pipeline import _unit_hash

        cur = cur.filter(_unit_hash("__seq", int(sample_seed)) < F.lit(frac))
    cur = cur.localCheckpoint(eager=False)
    merges: list = []
    for rank in range(1, int(num_merges) + 1):
        syms = F.split(
            F.expr("substring(__seq, 2, length(__seq) - 2)"), BPE_SEP
        )
        pairs = (
            cur.select("__f", syms.alias("__s"))
            .select(
                "__f",
                "__s",
                F.posexplode(
                    F.slice("__s", 1, F.greatest(F.size("__s") - 1, F.lit(0)))
                ).alias("__i", "__l"),
            )
            .select(
                "__f",
                "__l",
                F.element_at("__s", F.col("__i") + 2).alias("__r"),
            )
        )
        best = (
            pairs.groupBy("__l", "__r")
            .agg(F.sum("__f").alias("__cnt"))
            .orderBy(F.desc("__cnt"), F.asc("__l"), F.asc("__r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["__l"], best[0]["__r"], int(best[0]["__cnt"])
        merges.append((rank, l, r, cnt))
        cur = cur.select(
            F.replace(
                F.col("__seq"),
                F.lit(BPE_SYM + l + BPE_SEP + r + BPE_SYM),
                F.lit(BPE_SYM + l + r + BPE_SYM),
            ).alias("__seq"),
            "__f",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(merges, schema)


def bpe_apply(
    df: DataFrame,
    text_col: str = "text",
    merges: Optional[Sequence] = None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode text with a learned BPE merge list: each ``[a-z]+`` word
    becomes its merged subword symbols, concatenated in document
    order into one ``array<string>`` column (non-word tokens are
    dropped, mirroring :func:`bpe_train`'s vocabulary).

    ``merges`` is the ordered merge list — ``[(lhs, rhs), ...]`` or
    the Rows of :func:`bpe_train`'s result (ordered by merge_rank).
    Merges apply in rank order with the training semantics
    (left-to-right non-overlapping), so encoding the training corpus
    reproduces the final training segmentation exactly.

    Scale: pure Column program — per-word wrap + K chained literal
    replaces inside a ``transform`` lambda + flatten; zero shuffles,
    zero UDFs, whole-stage codegen. K = len(merges) is a parameter,
    so the expression tree is parameter-sized (keep K in the
    hundreds; a production encoder for K in the tens of thousands
    would batch by symbol length — out of scope here).
    """
    # the encode is compute-dense per row (K chained replaces over
    # every word's symbol string) and the bench corpus arrives as a
    # one-split small-file scan — spread it or the pass runs on one
    # core; the plan-time guards skip the exchange at scale (r12)
    from ..functions import parallelize_small

    df = parallelize_small(df)
    pairs = []
    for m in merges or []:
        if hasattr(m, "lhs"):
            pairs.append((m.lhs, m.rhs))
        else:
            pairs.append((m[0], m[1]) if len(m) == 2 else (m[1], m[2]))

    def _encode(w):
        s = F.regexp_replace(w, "(.)", BPE_SYM + "$1" + BPE_SYM)
        for l, r in pairs:
            s = F.replace(
                s,
                F.lit(BPE_SYM + l + BPE_SEP + r + BPE_SYM),
                F.lit(BPE_SYM + l + r + BPE_SYM),
            )
        return F.split(F.btrim(s, F.lit(BPE_SYM)), BPE_SEP)

    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: t.rlike("^[a-z]+$"),
    )
    return df.withColumn(out_col, F.flatten(F.transform(words, _encode)))


def bpe_train_sql(
    table: str = "documents",
    text_col: str = "text",
    num_merges: int = 8,
    min_word_freq: int = 1,
    sample_fraction: Optional[float] = None,
    sample_seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`bpe_train` — the merge loop unrolled as
    MATERIALIZED CTE chains (each round's sequence table is referenced
    by both the next pair count and the next replace; inlining would
    grow exponentially, the k_core lesson). Same wrap/replace
    sentinels, same HUGEINT->BIGINT cast on the pair count, same
    (count DESC, lhs, rhs) tie order, same md5 word-sample filter when
    ``sample_fraction`` is set."""
    having = (
        f"HAVING count(*) >= {int(min_word_freq)}"
        if int(min_word_freq) > 1
        else ""
    )
    sample = ""
    if sample_fraction is not None:
        frac = float(sample_fraction)
        if not 0.0 < frac <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1]: {sample_fraction}")
        from .pipeline import unit_hash_sql

        sample = (
            f" WHERE {unit_hash_sql('__seq', int(sample_seed))}"
            f" < {frac!r}"
        )
    sep = "chr(1)||chr(1)"
    ctes = [
        f"""__s0 AS MATERIALIZED (
  SELECT __seq, __f FROM (
  SELECT regexp_replace(__w, '(.)', chr(1)||'\\1'||chr(1), 'g') AS __seq, __f
  FROM (
    SELECT __w, count(*) AS __f FROM (
      SELECT unnest(string_split_regex(lower(trim({text_col})), '\\s+')) AS __w
      FROM {table}
    ) WHERE regexp_matches(__w, '^[a-z]+$') GROUP BY 1 {having}
  )){sample}
)"""
    ]
    for k in range(1, int(num_merges) + 1):
        prev = k - 1
        ctes.append(f"""__p{k} AS MATERIALIZED (
  SELECT z[1] AS __l, z[2] AS __r, CAST(sum(__f) AS BIGINT) AS __cnt FROM (
    SELECT __f,
           unnest(list_zip(__s[1:length(__s)-1], __s[2:length(__s)])) AS z
    FROM (
      SELECT __f, string_split(__seq[2:length(__seq)-1], {sep}) AS __s
      FROM __s{prev}
    )
  ) GROUP BY 1, 2
)""")
        ctes.append(
            f"__b{k} AS MATERIALIZED (SELECT __l, __r, __cnt FROM __p{k} "
            f"ORDER BY __cnt DESC, __l, __r LIMIT 1)"
        )
        ctes.append(f"""__s{k} AS MATERIALIZED (
  SELECT replace(__seq,
    chr(1)||(SELECT __l FROM __b{k})||{sep}||(SELECT __r FROM __b{k})||chr(1),
    chr(1)||(SELECT __l FROM __b{k})||(SELECT __r FROM __b{k})||chr(1)
  ) AS __seq, __f FROM __s{prev}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, __l AS lhs, __r AS rhs, __cnt AS pair_count FROM __b{k}"
        for k in range(1, int(num_merges) + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM (\n{unions}\n) "
        "ORDER BY merge_rank"
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 50,
    min_pair_freq: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Pointwise-mutual-information collocation scoring over document
    co-occurrence — the association strength behind phrase detection
    and topic seeding, where raw pair counts (:func:`token_cooccurrence`)
    just rank common-word pairs:

        pmi  = ln( p(a,b) / (p(a)·p(b)) ) = ln( n_ab·N / (df_a·df_b) )
        npmi = pmi / ln( N / n_ab )            (Bouma 2009, in [-1, 1])

    with doc-level probabilities (N = corpus document count). A pair
    that ALWAYS co-occurs scores npmi 1 regardless of frequency; a
    pair at chance scores 0. npmi is NULL for the degenerate
    every-document pair (0/0). Returns ``(token_a, token_b, n_docs,
    df_a, df_b, pmi, npmi)`` with token_a < token_b.

    Scale: the same a-priori-pruned shape as token_cooccurrence (the
    quadratic pair step sees only frequent tokens), two skinny
    doc-frequency join-backs, N as a 1-row broadcast. The log argument
    is a single double division of EXACT integer products (bit-identical
    across engines); the one libm ``ln`` is rounded to ``round_to``
    per the engine's float convention.
    """
    toks = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
        .distinct()
    )
    total = df.select(
        F.countDistinct(F.col(id_col)).alias("__N"))
    freq = (
        toks.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= int(min_doc_freq))
    )
    ft = toks.join(freq, "__tok")
    a = ft.select(F.col("__doc"), F.col("__tok").alias("token_a"),
                  F.col("__df").alias("df_a"))
    b = ft.select(F.col("__doc"), F.col("__tok").alias("token_b"),
                  F.col("__df").alias("df_b"))
    pairs = (
        a.join(b, "__doc")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= int(min_pair_freq))
        .crossJoin(F.broadcast(total))
    )
    # exact-integer log arguments: (n_ab * N) and (df_a * df_b) are
    # long products, the single division is the only float op before ln
    pmi = F.log(
        (F.col("n_docs") * F.col("__N")).cast("double")
        / (F.col("df_a") * F.col("df_b")).cast("double")
    )
    denom = F.log(F.col("__N").cast("double") / F.col("n_docs").cast("double"))
    npmi = F.when(F.col("n_docs") < F.col("__N"), pmi / denom)
    return pairs.select(
        "token_a",
        "token_b",
        "n_docs",
        "df_a",
        "df_b",
        F.round(pmi, round_to).alias("pmi"),
        F.round(npmi, round_to).alias("npmi"),
    )


def pmi_collocations_sql(
    from_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    min_doc_freq: int = 50,
    min_pair_freq: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`pmi_collocations` (same exact-integer
    log arguments, same rounding)."""
    return f"""
  WITH __toks AS (
    SELECT DISTINCT {id_expr} AS __doc,
           __tok
    FROM (
      SELECT {id_expr},
             unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+'))
               AS __tok
      FROM {from_sql}
    ) WHERE __tok <> ''
  ), __N AS (
    SELECT count(DISTINCT {id_expr}) AS __n FROM {from_sql}
  ), __freq AS (
    SELECT __tok, count(*)::BIGINT AS __df FROM __toks GROUP BY __tok
    HAVING count(*) >= {int(min_doc_freq)}
  ), __ft AS (
    SELECT t.__doc, t.__tok, f.__df FROM __toks t JOIN __freq f USING (__tok)
  ), __pairs AS (
    SELECT a.__tok AS token_a, b.__tok AS token_b,
           a.__df AS df_a, b.__df AS df_b,
           count(*)::BIGINT AS n_docs
    FROM __ft a JOIN __ft b
      ON a.__doc = b.__doc AND a.__tok < b.__tok
    GROUP BY 1, 2, 3, 4
    HAVING count(*) >= {int(min_pair_freq)}
  )
  SELECT token_a, token_b, n_docs, df_a, df_b,
         round(ln(CAST(n_docs * __n AS DOUBLE)
                  / CAST(df_a * df_b AS DOUBLE)), {int(round_to)}) AS pmi,
         round(CASE WHEN n_docs < __n THEN
                 ln(CAST(n_docs * __n AS DOUBLE)
                    / CAST(df_a * df_b AS DOUBLE))
                 / ln(CAST(__n AS DOUBLE) / CAST(n_docs AS DOUBLE))
               END, {int(round_to)}) AS npmi
  FROM __pairs, __N
"""


def bpe_apply_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 8,
    min_word_freq: int = 1,
    head: int = 5,
) -> str:
    """DuckDB mirror of training-then-encoding: :func:`bpe_train`'s
    merge CTEs (regenerated verbatim via :func:`bpe_train_sql`'s CTE
    program) followed by :func:`bpe_apply` over every document —
    per doc the subword count and the first ``head`` subwords joined
    with spaces. Each round's (lhs, rhs) lands as columns of a 1-row
    frame cross-joined into the encode scan, so the per-word replace
    chain references them as plain outer columns (scalar subqueries
    inside DuckDB lambdas are unreliable). CONTRACT: the corpus must
    actually yield ``num_merges`` merges (an exhausted __b CTE would
    inject NULL patterns)."""
    train = bpe_train_sql(table, text_col, num_merges, min_word_freq)
    # reuse the training WITH-body: strip the final SELECT
    body = train[len("WITH "):train.rindex("\nSELECT * FROM (")]
    sep = "chr(1)||chr(1)"
    mcols = ", ".join(
        f"(SELECT __l FROM __b{k}) AS l{k}, (SELECT __r FROM __b{k}) AS r{k}"
        for k in range(1, int(num_merges) + 1)
    )
    enc = "regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'g')"
    for k in range(1, int(num_merges) + 1):
        enc = (f"replace({enc}, chr(1)||l{k}||{sep}||r{k}||chr(1), "
               f"chr(1)||l{k}||r{k}||chr(1))")
    return f"""WITH {body},
__m AS MATERIALIZED (SELECT {mcols}),
__dw AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower(trim({text_col})), '\\s+'),
                     w -> regexp_matches(w, '^[a-z]+$')) AS __ws
  FROM {table}
),
__enc AS (
  SELECT doc_id,
         flatten(list_transform(__ws,
           w -> string_split(trim({enc}, chr(1)), {sep}))) AS __tk
  FROM __dw, __m
)
SELECT doc_id, length(__tk) AS n_subwords,
       array_to_string(__tk[1:{int(head)}], ' ') AS head_subwords
FROM __enc
"""


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_rank: Optional[int] = None,
    round_to: int = 6,
) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS of
    ln(term_freq) against ln(rank) over the frequency-ranked
    vocabulary — natural corpora slope ≈ −1; a synthetic / templated /
    heavily-duplicated corpus bends the curve, making (slope, r2) a
    one-row corpus-health diagnostic next to the per-doc quality
    scores. Returns ``(n_terms, slope, intercept, r2)``.

    Ranking is :func:`build_vocab`'s deterministic (freq DESC, term
    ASC) contiguous id (two-phase rank, never a single-partition
    window); ``max_rank`` fits only the head of the spectrum. The
    five OLS moment sums are double sums of ln values (order noise
    ~1e-9 relative — three decades under the 1e-6 output rounding;
    the gini-lesson magnitude check holds at any vocabulary size
    because ln stays < 30).
    """
    vocab = build_vocab(df, text_col, id_col, min_count=min_count,
                        max_size=max_rank)
    x = F.log(F.col("term_id").cast("double") + 1.0)
    y = F.log(F.col("term_freq").cast("double"))
    agg = vocab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = F.when(vary > 0, (cov * cov) / (varx * vary))
    return agg.select(
        F.col("n").alias("n_terms"),
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def zipf_fit_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_rank: Optional[int] = None,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`zipf_fit` (same rank convention and
    fixed OLS expression tree)."""
    having = (f"HAVING count(*) >= {int(min_count)}"
              if int(min_count) > 1 else "")
    cap = (f"WHERE __rk - 1 < {int(max_rank)}"
           if max_rank is not None else "")
    return f"""
WITH __tf AS (
  SELECT term, count(*)::BIGINT AS f FROM (
    SELECT unnest(string_split_regex(lower(trim({text_col})), '\\s+')) AS term
    FROM {table}
  ) WHERE term <> '' GROUP BY 1 {having}
),
__rk AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS __rk FROM __tf
),
__m AS (
  SELECT count(*)::BIGINT AS n,
         sum(ln(CAST(__rk - 1 AS DOUBLE) + 1.0::DOUBLE)) AS sx,
         sum(ln(CAST(f AS DOUBLE))) AS sy,
         sum(ln(CAST(__rk - 1 AS DOUBLE) + 1.0::DOUBLE)
             * ln(CAST(__rk - 1 AS DOUBLE) + 1.0::DOUBLE)) AS sxx,
         sum(ln(CAST(__rk - 1 AS DOUBLE) + 1.0::DOUBLE)
             * ln(CAST(f AS DOUBLE))) AS sxy,
         sum(ln(CAST(f AS DOUBLE)) * ln(CAST(f AS DOUBLE))) AS syy
  FROM __rk {cap}
)
SELECT n AS n_terms,
       round((sxy - sx * sy / CAST(n AS DOUBLE))
             / (sxx - sx * sx / CAST(n AS DOUBLE)), {int(round_to)}) AS slope,
       round((sy - ((sxy - sx * sy / CAST(n AS DOUBLE))
                    / (sxx - sx * sx / CAST(n AS DOUBLE))) * sx)
             / CAST(n AS DOUBLE), {int(round_to)}) AS intercept,
       round(CASE WHEN (syy - sy * sy / CAST(n AS DOUBLE)) > 0 THEN
         ((sxy - sx * sy / CAST(n AS DOUBLE))
          * (sxy - sx * sy / CAST(n AS DOUBLE)))
         / ((sxx - sx * sx / CAST(n AS DOUBLE))
            * (syy - sy * sy / CAST(n AS DOUBLE)))
       END, {int(round_to)}) AS r2
FROM __m
"""


def bpe_fertility(
    df: DataFrame,
    merges: Sequence,
    text_col: str = "text",
    group_col: str = "lang",
    round_to: int = 6,
) -> DataFrame:
    """Tokenizer FERTILITY evaluation: subwords emitted per word under
    a learned BPE merge list, aggregated per ``group_col`` — THE
    cross-lingual tokenizer-quality metric (a merge table trained on
    one language fragments the others; fertility quantifies exactly
    how much, which prices both context-window waste and per-language
    compute). Uses :func:`bpe_apply`'s encoder, so fertility reflects
    the exact training segmentation.

    Returns ``(group, n_docs, n_words, n_subwords, fertility)`` with
    fertility = Σ subwords / Σ words (corpus-level, exact-long
    division, rounded; NULL for groups with zero words).

    Scale: one zero-shuffle encode projection + one skinny group
    aggregate; the merge list is parameter-bounded (the bpe_train
    contract).
    """
    enc = bpe_apply(df, text_col=text_col, merges=merges,
                    out_col="__bpe")
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: t.rlike("^[a-z]+$"),
    )
    per = enc.select(
        F.col(group_col).alias("__g"),
        F.size(words).alias("__nw"),
        F.size("__bpe").alias("__ns"),
    )
    return per.groupBy(F.col("__g").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nw").alias("n_words"),
        F.sum("__ns").alias("n_subwords"),
        F.round(
            F.when(
                F.sum("__nw") > 0,
                F.sum("__ns").cast("double")
                / F.sum("__nw").cast("double"),
            ),
            int(round_to),
        ).alias("fertility"),
    )


def bpe_fertility_sql(
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "lang",
    num_merges: int = 8,
    min_word_freq: int = 1,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of training-then-:func:`bpe_fertility` (the
    :func:`bpe_apply_sql` encode program with a per-group fertility
    tail)."""
    train = bpe_train_sql(table, text_col, num_merges, min_word_freq)
    body = train[len("WITH "):train.rindex("\nSELECT * FROM (")]
    sep = "chr(1)||chr(1)"
    mcols = ", ".join(
        f"(SELECT __l FROM __b{k}) AS l{k}, (SELECT __r FROM __b{k}) AS r{k}"
        for k in range(1, int(num_merges) + 1)
    )
    enc = "regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'g')"
    for k in range(1, int(num_merges) + 1):
        enc = (f"replace({enc}, chr(1)||l{k}||{sep}||r{k}||chr(1), "
               f"chr(1)||l{k}||r{k}||chr(1))")
    return f"""WITH {body},
__m AS MATERIALIZED (SELECT {mcols}),
__dw AS (
  SELECT {group_col} AS __g,
         list_filter(string_split_regex(lower(trim({text_col})), '\\s+'),
                     w -> regexp_matches(w, '^[a-z]+$')) AS __ws
  FROM {table}
),
__enc AS (
  SELECT __g, length(__ws)::BIGINT AS __nw,
         length(flatten(list_transform(__ws,
           w -> string_split(trim({enc}, chr(1)), {sep}))))::BIGINT AS __ns
  FROM __dw, __m
)
SELECT __g AS {group_col}, count(*)::BIGINT AS n_docs,
       sum(__nw)::BIGINT AS n_words, sum(__ns)::BIGINT AS n_subwords,
       round(CASE WHEN sum(__nw) > 0
             THEN CAST(sum(__ns) AS DOUBLE) / CAST(sum(__nw) AS DOUBLE)
             END, {int(round_to)}) AS fertility
FROM __enc GROUP BY 1
"""


def lexical_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document lexical-diversity profile — the vocabulary-richness
    leg of the text-quality battery (:func:`quality_features` measures
    surface shape; this measures repetition of the word stock, the
    signal behind boilerplate/keyword-stuffing filters in pretraining
    pipelines): type-token ratio ``ttr = types/tokens``, hapax share
    ``hapax_ratio = |once-words|/types``, and Guiraud's corrected
    index ``types/√tokens`` (stable where raw TTR shrinks with
    length). Returns ``(doc_id, n_tokens, n_types, ttr, hapax_ratio,
    guiraud)``; token-less documents keep NULL ratios.

    Determinism: exact integer counts + fixed per-row arithmetic,
    rounded to ``round_to`` — bit-identical anywhere.

    Scale: one tokenize-explode → per-(doc, term) count (map-side
    combine) → one per-doc aggregate; input tokens are shuffled once,
    already reduced to (doc, term) pairs.
    """
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("__t"),
        )
        .filter(F.col("__t") != "")
    )
    per_term = toks.groupBy("__id", "__t").agg(
        F.count(F.lit(1)).alias("__c"))
    stats = per_term.groupBy("__id").agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).alias("__hapax"),
    )
    base = df.select(F.col(id_col).alias("__id")).distinct()
    out = base.join(stats, "__id", "left")
    nt = F.col("n_tokens").cast("double")
    ty = F.col("n_types").cast("double")
    return out.select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
        .alias("n_tokens"),
        F.coalesce(F.col("n_types"), F.lit(0).cast("long"))
        .alias("n_types"),
        F.round(F.when(nt > 0, ty / nt), int(round_to)).alias("ttr"),
        F.round(F.when(ty > 0, F.col("__hapax").cast("double") / ty),
                int(round_to)).alias("hapax_ratio"),
        F.round(F.when(nt > 0, ty / F.sqrt(nt)), int(round_to))
        .alias("guiraud"),
    )


def lexical_diversity_sql(
    from_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`lexical_diversity` (same tokenizer,
    counts, and ratio arithmetic)."""
    r = int(round_to)
    return f"""
WITH __toks AS (
  SELECT {id_expr} AS __id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS __t
  FROM {from_sql}
), __tk AS (SELECT __id, __t FROM __toks WHERE __t <> ''),
__pt AS (
  SELECT __id, __t, count(*)::BIGINT AS __c FROM __tk GROUP BY 1, 2
), __st AS (
  SELECT __id, sum(__c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(CASE WHEN __c = 1 THEN 1 ELSE 0 END)::BIGINT AS __hapax
  FROM __pt GROUP BY 1
)
SELECT b.__id AS {id_expr},
       coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(s.n_types, 0)::BIGINT AS n_types,
       round(CASE WHEN s.n_tokens > 0
             THEN CAST(s.n_types AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
             END, {r}) AS ttr,
       round(CASE WHEN s.n_types > 0
             THEN CAST(s.__hapax AS DOUBLE) / CAST(s.n_types AS DOUBLE)
             END, {r}) AS hapax_ratio,
       round(CASE WHEN s.n_tokens > 0
             THEN CAST(s.n_types AS DOUBLE) / sqrt(CAST(s.n_tokens AS DOUBLE))
             END, {r}) AS guiraud
FROM (SELECT DISTINCT {id_expr} AS __id FROM {from_sql}) b
LEFT JOIN __st s USING (__id)
"""


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    k: int = 20,
    iters: int = 6,
    damping: float = 0.85,
    min_len: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — the graph
    companion of :func:`tfidf_topk`: corpus keywords are the highest-
    PageRank terms of the word co-occurrence graph (two terms link
    when they appear within ``window`` raw-token positions in a
    document; parallel co-occurrences SUM into integer edge weights),
    ranked by the engine's weighted :func:`.graph.pagerank`. Terms
    shorter than ``min_len`` characters drop (the cheap stopword
    surrogate — positions stay those of the ORIGINAL token stream, so
    the window never collapses across removed tokens). Returns the
    top ``k`` rows ``(term, score)`` by (rounded score desc, term
    asc) — the bm25 rounded-boundary tiebreak convention.

    Scale: tokenize-posexplode once (localCheckpoint'd, reused per
    window offset); each offset is ONE co-located (doc, pos) equi-join
    — never a range join; the pair frame reduces map-side into the
    canonical-pair weight groupBy; pagerank runs on the vocabulary-
    sized term graph, orders of magnitude smaller than the corpus;
    top-k is TakeOrderedAndProject.
    """
    if int(window) < 1:
        raise ValueError("window must be >= 1")
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    from .graph import pagerank
    from ..functions import parallelize_small

    # parallelize_small: a one-file corpus scan tokenizes on ONE core
    # otherwise (plan-time guards skip the exchange when the scan is
    # already parallel, so nothing extra shuffles at scale). EAGER
    # checkpoint: the window-offset joins consume this frame on both
    # sides, and with a lazy checkpoint their concurrent AQE exchange
    # futures raced to materialize the tokenize pass twice (profiled:
    # a duplicate 2.3 s single-task stage pair — the blocking_eval
    # lesson, session-7).
    toks = (
        parallelize_small(df.select(F.col(id_col).alias("__id"),
                                    F.col(text_col).alias("__tx")))
        .select(
            "__id",
            F.posexplode(
                F.split(F.lower(F.trim(F.col("__tx"))), TOKEN_SPLIT_RE)
            ).alias("__pos", "term"),
        )
        .filter(F.length("term") >= int(min_len))
        .localCheckpoint(eager=True)
    )
    pairs = None
    for d in range(1, int(window) + 1):
        right = toks.select(
            "__id", (F.col("__pos") - d).alias("__pos"),
            F.col("term").alias("__t2"))
        p = (toks.join(right, ["__id", "__pos"])
             .filter(F.col("term") != F.col("__t2"))
             .select("term", "__t2"))
        pairs = p if pairs is None else pairs.unionByName(p)
    edges = pairs.groupBy(
        F.least("term", "__t2").alias("a"),
        F.greatest("term", "__t2").alias("b"),
    ).agg(F.count(F.lit(1)).alias("w"))
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
    pr = pagerank(sym, src="a", dst="b", damping=damping,
                  iters=int(iters), weight="w", round_to=round_to)
    return (
        pr.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(int(k))
        .select(F.col("node").alias("term"), F.col("rank").alias("score"))
    )


def textrank_keywords_sql(
    from_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    window: int = 2,
    k: int = 20,
    iters: int = 6,
    damping: float = 0.85,
    min_len: int = 4,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`textrank_keywords` — same tokenizer /
    0-based positions (the phrase_search convention), same canonical
    pair weights, the weighted :func:`.graph.pagerank_sql` unrolled,
    same rounded-score tiebreak."""
    from .graph import pagerank_sql

    offs = "\n    UNION ALL\n    ".join(
        f"SELECT t1.term AS term, t2.term AS __t2 FROM __txk t1 "
        f"JOIN __txk t2 ON t2.__id = t1.__id "
        f"AND t2.__pos = t1.__pos + {d} AND t2.term <> t1.term"
        for d in range(1, int(window) + 1))
    edges_sql = f"""(
  WITH __txk AS (
    SELECT * FROM (
      SELECT {id_expr} AS __id,
             unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+'))
               AS term,
             generate_subscripts(
               regexp_split_to_array(lower(trim({text_expr})), '\\s+'), 1) - 1
               AS __pos
      FROM {from_sql}
    ) WHERE length(term) >= {int(min_len)}
  ), __txp AS (
    {offs}
  ), __txe AS (
    SELECT least(term, __t2) AS a, greatest(term, __t2) AS b,
           count(*)::BIGINT AS w
    FROM __txp GROUP BY 1, 2
  )
  SELECT a, b, w FROM __txe
  UNION ALL
  SELECT b AS a, a AS b, w FROM __txe
)"""
    inner = pagerank_sql(edges_sql, src="a", dst="b", damping=damping,
                         iters=int(iters), round_to=round_to, weight="w")
    return (f"SELECT node AS term, rank AS score FROM ({inner}) "
            f"ORDER BY score DESC, term ASC LIMIT {int(k)}")
