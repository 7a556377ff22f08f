"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

All pure built-in expressions (split / regexp / higher-order folds) — zero
shuffle, whole-stage codegen, trivially linear at 100 TB. Every operator
is cross-engine reproducible (integer arithmetic or fixed-precision
rounding) so a SQL oracle can verify it byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, single digits, single non-space
# symbols — the GPT-2-style shape without the library dependency.
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

PUNCT_REGEX = r"[.,!?;:]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "nicht", "ein", "ist", "zu", "mit"],
    "es": ["el", "la", "los", "las", "que", "y", "de", "un", "una", "en"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "que", "pour"],
}

# single-char CJK probe (language-id charset heuristic)
_CJK_REGEX = "[\\x{4e00}-\\x{9fff}]"

FINGERPRINT_MOD = 1_000_000_007  # prime; acc*31 + cp stays < 2^35


def _count_in(words, vocab: list[str]):
    lit = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(lit, w)))


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """``(id, n_chars, ws_tokens, bpe_tokens)`` — code-point length,
    whitespace token count, BPE-ish regex token count."""
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_REGEX)).alias("bpe_tokens"),
    )


def quality_exprs(text_col: str) -> dict:
    """The quality-score expression family over ``text_col`` — shared by
    :func:`quality_score` and the fused prep pipeline (one source of
    truth so every consumer matches the same oracle formula). Keys:
    ``mean_word_len``, ``punct_ratio``, ``stopword_ratio``, ``quality``
    (all unrounded Columns, pure codegen)."""
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(text_col).cast("double")
    n_words = F.size(words).cast("double")
    punct = F.regexp_count(F.col(text_col), F.lit(PUNCT_REGEX)).cast("double")
    stop = _count_in(words, STOPWORDS["en"]).cast("double")
    # n_words = size(split(text, ' ')) is always >= 1 (empty text splits to
    # [""]), but n_chars is 0 for empty docs and ANSI mode turns the plain
    # division into a job-aborting DIVIDE_BY_ZERO — define the empty-doc
    # punct ratio as 0.0 (oracle twin: coalesce(np / nullif(nc, 0), 0.0))
    mean_wl = (n_chars - (n_words - 1)) / n_words
    punct_ratio = F.coalesce(F.try_divide(punct, n_chars), F.lit(0.0))
    stop_ratio = stop / n_words
    len_band = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (F.lit(0.4) * len_band
             + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
             + F.lit(0.2) * F.least(mean_wl / 8, F.lit(1.0))
             + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))))
    return {"mean_word_len": mean_wl, "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio, "quality": score}


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  round_digits: int = 6) -> DataFrame:
    """Heuristic document quality: length band, punctuation ratio,
    stopword ratio, mean word length. ``score`` in [0, 1]; the formula is
    a deterministic linear blend (replace with a trained scorer at will —
    the plumbing is the point)."""
    q = quality_exprs(text_col)
    return df.select(
        F.col(id_col),
        F.round(q["mean_word_len"], round_digits).alias("mean_word_len"),
        F.round(q["punct_ratio"], round_digits).alias("punct_ratio"),
        F.round(q["stopword_ratio"], round_digits).alias("stopword_ratio"),
        F.round(q["quality"], round_digits).alias("quality"),
    )


def corpus_report(
    df: DataFrame,
    group_cols: "Sequence[str]" = ("source",),
    text_col: str = "text",
    *,
    quality_gate: float = 0.5,
    short_chars: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """The per-source corpus report card — the daily-driver summary a
    curation pipeline prints per ingest source (or any grouping):
    volume, token mass, quality distribution, and gate/short-doc counts
    in ONE pass. Columns: ``group_cols..., n_docs, total_chars,
    total_tokens, avg_quality, n_below_gate, n_short``.

    Scale shape: every metric is a plain codegen'd aggregate over the
    shared :func:`quality_exprs` projection — one hash aggregate with
    map-side partial combine, one skinny exchange keyed on the group
    columns (source cardinality is tiny, the combine collapses 10^11
    rows to |sources| x |partitions| partials before the wire). Counts
    are exact integers; the only float is ``avg_quality`` over per-row
    6-digit-rounded scores, which both engines sum identically at this
    magnitude."""
    q = F.round(quality_exprs(text_col)["quality"], round_digits)
    staged = df.select(
        *[F.col(c) for c in group_cols],
        F.coalesce(F.length(text_col), F.lit(0)).alias("_nc"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
         .alias("_nw"),
        q.alias("_q"),
    )
    return (staged.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_nc").alias("total_chars"),
                 F.sum("_nw").cast("bigint").alias("total_tokens"),
                 F.round(F.avg("_q"), round_digits).alias("avg_quality"),
                 F.sum(F.when(F.col("_q") < quality_gate, 1).otherwise(0))
                  .alias("n_below_gate"),
                 F.sum(F.when(F.col("_nc") < short_chars, 1).otherwise(0))
                  .alias("n_short")))


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Charset + stopword-list language heuristic → ``(id, lang_pred)``.
    Precedence: CJK charset → zh; else the stopword list with the highest
    hit count among de/es/en (ties broken in that order); no hits → und."""
    words = F.split(F.col(text_col), " ")
    de = _count_in(words, STOPWORDS["de"])
    es = _count_in(words, STOPWORDS["es"])
    en = _count_in(words, STOPWORDS["en"])
    pred = (
        F.when(F.regexp_count(F.col(text_col), F.lit(_CJK_REGEX)) > 0, "zh")
        .when((de > es) & (de > en), "de")
        .when(es > en, "es")
        .when(en > 0, "en")
        .otherwise("und")
    )
    return df.select(F.col(id_col), pred.alias("lang_pred"))


def language_mismatch_violations(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Declared-vs-detected language check, in the engine's violation-row
    contract: ``(id, instance_path, code, message)`` with code
    ``LanguageMismatch`` for every document whose :func:`language_id`
    prediction is confident (not ``und``) and disagrees with its
    ``lang_col`` metadata.

    Metadata language tags are the single most-wrong column in web
    corpora (the crawler inherits them from HTTP headers/HTML attrs);
    every language-stratified decision downstream — `stratified_sample`
    quotas, `mix_sources` recipes, per-lang vocabulary heads — silently
    inherits the error, so this check runs where referential checks run.
    NULL declared language is NOT flagged (presence is the required
    check's job); an unconfident detector (``und``) abstains rather
    than guessing.

    Scale shape: the detector is row-local codegen (charset regex +
    stopword counts), so the whole check is a zero-shuffle scan
    projection — no joins, no Python (plan-asserted in tests)."""
    words = F.split(F.col(text_col), " ")
    de = _count_in(words, STOPWORDS["de"])
    es = _count_in(words, STOPWORDS["es"])
    en = _count_in(words, STOPWORDS["en"])
    pred = (
        F.when(F.regexp_count(F.col(text_col), F.lit(_CJK_REGEX)) > 0, "zh")
        .when((de > es) & (de > en), "de")
        .when(es > en, "es")
        .when(en > 0, "en")
        .otherwise("und")
    )
    bad = (F.col(lang_col).isNotNull() & (pred != "und")
           & (pred != F.col(lang_col)))
    return (df.withColumn("_pred", pred).filter(bad)
              .select(
                  F.col(id_col),
                  F.lit("/" + lang_col).alias("instance_path"),
                  F.lit("LanguageMismatch").alias("code"),
                  F.concat(
                      F.lit(f"/{lang_col}: declared language \""),
                      F.col(lang_col),
                      F.lit("\" but text reads as \""),
                      F.col("_pred"), F.lit("\"")).alias("message")))


def top_tokens(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *, k: int = 100) -> DataFrame:
    """Corpus-level vocabulary head: the ``k`` most frequent whitespace
    tokens with occurrence and document counts —
    ``(token, n_occurrences, n_docs)``.

    The one corpus-wide aggregate in this module. Scale shape: explode is
    map-side; the groupBy hash-aggregates with map-side partial combine,
    so only (token, partial-count) pairs shuffle — vocabulary-sized, not
    corpus-sized; the final top-k is a TakeOrdered over the aggregated
    vocabulary. Ordering is total (count desc, then token asc) so the
    head is unique and cross-engine reproducible."""
    from ..functions.exprs import explode_rows
    from .dedup import _spread
    toks = explode_rows(
        _spread(df, id_col).withColumn("__tt_words",
                                       F.split(F.col(text_col), " ")),
        [id_col], F.col("__tt_words"), "token")
    return (toks.groupBy("token")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct(id_col).alias("n_docs"))
            .orderBy(F.desc("n_occurrences"), F.asc("token"))
            .limit(k))


def top_tokens_by(df: DataFrame, group_col: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  *, k: int = 20) -> DataFrame:
    """Per-GROUP vocabulary heads: the ``k`` most frequent whitespace
    tokens within each group —
    ``(group, token, n_occurrences, rank)`` — the stratified sibling of
    :func:`top_tokens` (a global head is dominated by the majority
    source/language; mixing and language-balance decisions need each
    stratum's own head).

    Scale shape: the same vocabulary-sized (group, token) hash aggregate
    with map-side combine (corpus text never shuffles), then an exact
    top-``k`` per group WITHOUT funneling hot groups through one
    reducer: a zero-shuffle per-partition local top-``k`` over the
    aggregated rows (a superset of the global winners — the
    ``quota_sample`` / ``review_queue`` two-phase shape) and one final
    window over the ≤ k x groups x partitions survivors. Ordering is
    total (count desc, token asc) so every head is unique and
    cross-engine reproducible."""
    from ..functions.exprs import explode_rows
    from .dedup import _spread
    toks = explode_rows(
        _spread(df, id_col).withColumn("__tb_words",
                                       F.split(F.col(text_col), " ")),
        [group_col], F.col("__tb_words"), "token")
    counts = (toks.groupBy(group_col, "token")
              .agg(F.count("*").alias("n_occurrences")))
    schema = counts.schema
    gname = group_col

    def local_topk(batches):
        import pandas as pd
        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf],
                                                    ignore_index=True)
            acc = (acc.sort_values(["n_occurrences", "token"],
                                   ascending=[False, True],
                                   kind="mergesort")
                      .groupby(gname, sort=False, dropna=False).head(k))
        if acc is not None:
            yield acc

    local = counts.mapInPandas(local_topk, schema=schema)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("n_occurrences"), F.asc("token"))
    return (local.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= k)
                 .orderBy(group_col, "rank"))


def top_ngram_fraction(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, n: int = 2,
                       seed: int = 7,
                       round_digits: int = 6) -> DataFrame:
    """Within-document repetition filter (the Gopher/MassiveText
    "fraction of the document in the most frequent n-gram" rule):
    ``(id, total_ngrams, top_ngram_count, top_ngram_frac)``.

    Counts NON-distinct word n-gram occurrences per doc (as 64-bit
    xxhash64 longs, same hashing contract as dedup's shingle operators —
    8-byte shuffles, collision probability |grams|²/2⁶⁴ per doc), takes
    ``max(count)/sum(count)``, and left-joins back so short docs
    (< n words) report fraction 0.0 instead of vanishing. The two
    aggregates shuffle only skinny (id, gram-hash, count) rows with
    map-side combine; the join back is on the id — drop it (use the
    ``frac`` aggregate directly as a semi/anti filter) when only the
    keep/drop verdict is needed at scale."""
    per_gram = _per_doc_gram_counts(df, text_col, id_col, n=n, seed=seed)
    frac = per_gram.groupBy(id_col).agg(
        F.sum("__c").alias("total_ngrams"),
        F.max("__c").alias("top_ngram_count"))
    return _join_back_frac(df, id_col, frac, "top_ngram_count",
                           "top_ngram_frac", round_digits)


def _per_doc_gram_counts(df: DataFrame, text_col: str, id_col: str, *,
                         n: int, seed: int) -> DataFrame:
    """Skinny ``(id, gram-hash, count)`` table — the ONE definition of a
    word n-gram (xxhash64 over space-joined word windows, the dedup
    hashing contract) shared by the within-doc (:func:`top_ngram_fraction`)
    and cross-doc (:func:`duplicated_ngram_coverage`) repetition metrics,
    so the two can never silently disagree on what an n-gram is.

    NULL text coalesces to "" (one empty word — zero grams for n >= 2;
    for n=1 its single empty-string gram counts, same as "" text).
    _spread: the gram explode runs at scan parallelism — guard against
    single-row-group local tables serializing the map side on one core.
    explode_rows: InferFiltersFromGenerate would otherwise duplicate the
    gram-transform expression into an interpreted Filter; gram arrays
    have no NULL elements. The count aggregate gets map-side combine."""
    from ..functions.exprs import explode_rows
    from .dedup import _spread
    tmp = "__gram_words"
    grams = F.expr(
        f"if(size({tmp}) >= {n},"
        f" transform(sequence(1, size({tmp}) - {n - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice({tmp}, i, {n})), {seed})),"
        f" array())"
    )
    exploded = explode_rows(
        _spread(df, id_col).withColumn(
            tmp, F.split(F.coalesce(F.col(text_col), F.lit("")), " ")),
        [id_col], grams, "__g")
    return exploded.groupBy(id_col, "__g").agg(F.count("*").alias("__c"))


def _join_back_frac(df: DataFrame, id_col: str, rolled: DataFrame,
                    num_col: str, frac_col: str,
                    round_digits: int) -> DataFrame:
    """Left-join a ``(id, total_ngrams, <num_col>)`` rollup back onto the
    full id set so short docs (< n words) report 0 counts and 0.0
    fraction instead of vanishing; shared tail of the repetition
    metrics."""
    return (df.select(id_col).join(rolled, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("total_ngrams"),
                           F.lit(0).cast("bigint")).alias("total_ngrams"),
                F.coalesce(F.col(num_col),
                           F.lit(0).cast("bigint")).alias(num_col),
                F.round(F.coalesce(
                    F.try_divide(F.col(num_col).cast("double"),
                                 F.col("total_ngrams").cast("double")),
                    F.lit(0.0)), round_digits).alias(frac_col),
            ))


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Rolling polynomial hash over code points:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + codepoint(c)) mod p)`` —
    the classic Rabin-Karp content fingerprint, exactly reproducible in any
    engine with the same fold."""
    fp = F.aggregate(
        F.split(F.col(text_col), ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FINGERPRINT_MOD,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# scheme + optional userinfo + host — the common Java-regex / RE2 subset
# (no lookaround); group 1 is the host, lowercased downstream for domain
# identity. The host must start AND end alphanumeric, so trailing
# sentence punctuation ("see https://x.com.") never leaks into the
# domain, and 'user@evil.com' URLs resolve to evil.com, not 'user' —
# either slip would let a blocklisted domain evade the verdict.
URL_REGEX = (r"https?://(?:[A-Za-z0-9._%+-]+@)?"
             r"([A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?)")


def url_domain_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", *,
                     blocklist: "Sequence[str]" = ()) -> DataFrame:
    """Source-domain extraction + blocklist verdict per document —
    ``(id, n_urls, domains, is_blocked)``.

    The provenance-filtering stage of a web-corpus pipeline: every
    ``http(s)`` URL's host is extracted (`regexp_extract_all` group 1),
    lowercased, deduped, and sorted (so the array is a canonical value);
    ``is_blocked`` is a literal `arrays_overlap` against the compiled
    blocklist — filter on it to drop documents citing banned sources.
    All JVM expressions in whole-stage codegen: row-local, zero shuffle,
    no join (the blocklist is a plan literal — for million-domain lists
    switch to a broadcast semi-join on an exploded domain column)."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_REGEX), 1)
    domains = F.array_sort(F.array_distinct(
        F.transform(urls, lambda u: F.lower(u))))
    if blocklist:
        blocked = F.arrays_overlap(
            domains, F.array(*[F.lit(b.lower()) for b in blocklist]))
    else:
        blocked = F.when(domains.isNotNull(), F.lit(False))
    return df.select(
        F.col(id_col),
        F.size(urls).alias("n_urls"),
        domains.alias("domains"),
        blocked.alias("is_blocked"),
    )


def drop_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n",
    max_docs: int = 10,
    min_line_chars: int = 1,
    max_blocklist: int = 1_000_000,
    out_col: str = "text_clean",
) -> DataFrame:
    """Corpus-frequency line dedup (the CCNet/RefinedWeb boilerplate
    pass): drop every line that appears in more than ``max_docs``
    distinct documents (navbars, cookie banners, canned footers) —
    ``(id, n_dropped, out_col)``.

    Two phases, neither of which shuffles document text:

    1. Doc-frequency aggregate: per-doc DISTINCT lines (``array_distinct``
       on the split — so a doc repeating its own line counts once)
       explode map-side and hash-aggregate with partial combine — only
       (line, partial-count) pairs shuffle, vocabulary-of-lines-sized.
       Lines shorter than ``min_line_chars`` are never blocklisted
       (keeps empty lines / paragraph structure intact).
    2. The blocklist (lines with frequency > ``max_docs``) is by
       construction small — boilerplate is the point — and is collected
       with a ``max_blocklist`` fail-fast, broadcast once, and applied
       as a ROW-LOCAL rewrite in an Arrow-batched pandas UDF (set
       membership per line, original order preserved). The corpus never
       shuffles and is scanned exactly twice. An empty blocklist
       short-circuits to a zero-Python identity projection.

    ``sep`` is split literally on both phases (and must be reassembled
    literally, so the clean text round-trips byte-exactly). NULL text
    propagates."""
    import re as _re

    from ..functions.exprs import explode_rows
    from .dedup import _spread

    split_expr = F.split(F.col(text_col), _re.escape(sep), -1)
    lines = explode_rows(
        _spread(df, id_col).withColumn("__bl_ls", F.array_distinct(split_expr)),
        [id_col], F.col("__bl_ls"), "__line")
    freq = (lines.filter(F.length("__line") >= min_line_chars)
            .groupBy("__line").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_docs))
    head = freq.select("__line").limit(max_blocklist + 1).collect()
    if len(head) > max_blocklist:
        raise ValueError(
            f"boilerplate blocklist exceeds max_blocklist={max_blocklist}; "
            f"raise the cap or tighten max_docs/min_line_chars")
    blocklist = frozenset(r["__line"] for r in head)

    if not blocklist:
        # NULL text must report NULL n_dropped on BOTH paths (the rewrite
        # UDF propagates NULL) — the verdict for a row cannot depend on
        # whether other documents happened to share lines
        return df.select(
            F.col(id_col),
            F.when(F.col(text_col).isNotNull(), F.lit(0))
             .cast("int").alias("n_dropped"),
            F.col(text_col).alias(out_col))

    from pyspark.sql.functions import pandas_udf
    bcast = df.sparkSession.sparkContext.broadcast(blocklist)

    @pandas_udf(f"struct<n_dropped:int, {out_col}:string>")
    def _rewrite(s):
        import pandas as pd
        bs = bcast.value
        nd, out = [], []
        for t in s:
            if t is None:
                nd.append(None)
                out.append(None)
                continue
            parts = t.split(sep)
            kept = [p for p in parts if p not in bs]
            nd.append(len(parts) - len(kept))
            out.append(sep.join(kept))
        return pd.DataFrame({"n_dropped": nd, out_col: out})

    packed = df.select(F.col(id_col), _rewrite(F.col(text_col)).alias("__r"))
    return packed.select(F.col(id_col), F.col("__r.n_dropped").alias("n_dropped"),
                         F.col(f"__r.{out_col}").alias(out_col))


# PII redaction patterns, applied in THIS order (the order is part of
# the contract — an email's host can look like an IP, so emails go
# first; an IPv4 has three dots where a phone has two separators, so
# the two never overlap but the fixed order keeps the output
# deterministic anyway). Every pattern is in the common Java-regex /
# RE2 subset (no lookaround, no backreferences, ASCII \b) so a DuckDB
# oracle reproduces the exact replacement bytes.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *,
               out_col: str = "text_redacted") -> DataFrame:
    """Scrub emails / IPv4s / phone numbers from a training corpus —
    ``(id, n_email, n_ipv4, n_phone, out_col)``.

    The standard pre-training privacy pass: each category is counted on
    the ORIGINAL text (`regexp_count`), then replaced with a typed
    placeholder in the fixed `PII_PATTERNS` order. All JVM
    ``regexp_replace``/``regexp_count`` inside whole-stage codegen —
    row-local, zero shuffle, linear at any corpus size. NULL text
    propagates (NULL counts and NULL output), matching the row-local
    NULL convention of the validators."""
    orig = F.col(text_col)
    red = orig
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(orig, F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), *counts, red.alias(out_col))


def blockword_stats(df: DataFrame, blocklist: list[str],
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Word-blocklist screening — the C4 "bad words" rule (Raffel et
    al. 2020 §2.2 drops any page containing a word from a blocklist;
    RefinedWeb/FineWeb keep the same gate with curated lists): per doc
    ``(id, n_blocked, has_blocked)`` where matching is on LOWERCASED
    whitespace words with non-alphanumeric edges stripped (so
    "Casino!", "(casino)" and "casino" all match a `casino` entry, but
    "casinos" does not — whole-word, not substring, the C4 convention).
    Filter on ``has_blocked`` to apply; keep ``n_blocked`` to audit or
    threshold (one incidental hit vs saturation).

    The blocklist compiles to a literal array probed with
    ``array_contains`` — all row-local whole-stage codegen, zero
    shuffle, zero joins, zero Python; for 100k+-entry lists switch to a
    broadcast semi-join on the exploded token (same note as the URL
    blocklist)."""
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    blk = F.array(*[F.lit(w.lower()) for w in blocklist])
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "")
    norm = F.transform(
        words,
        lambda x: F.regexp_replace(
            F.regexp_replace(F.lower(x), "^[^a-z0-9]+", ""),
            "[^a-z0-9]+$", ""))
    n_blocked = F.size(F.filter(norm,
                                lambda x: F.array_contains(blk, x)))
    return df.select(F.col(id_col),
                     n_blocked.alias("n_blocked"),
                     (n_blocked > 0).alias("has_blocked"))


def oov_stats(df: DataFrame, vocab: list[str],
              text_col: str = "text", id_col: str = "doc_id", *,
              lowercase: bool = True,
              round_digits: int = 6) -> DataFrame:
    """Tokenizer-fit measurement: per-document out-of-vocabulary rate
    against a fixed token vocabulary —
    ``(id, n_tokens, n_oov, oov_rate)``.

    The question a corpus must answer before committing to a tokenizer
    (or a tokenizer to a corpus): how much of each document falls
    outside the target vocabulary? High-OOV slices tokenize into long
    byte-fallback sequences — they cost disproportionate context budget
    and train poorly; per-source rollups of ``oov_rate`` locate them.

    Tokens are whitespace words (empty runs dropped — blank/NULL docs
    report 0 tokens, NULL rate), optionally lowercased; NO edge
    stripping, unlike the blocklist gate — a tokenizer sees punctuation,
    so the fit measure must too. The vocabulary compiles to a literal
    array probed with ``array_contains`` — row-local whole-stage
    codegen, zero shuffle, zero joins, zero Python (100k+-entry vocabs:
    the documented broadcast-semi-join switch). ``oov_rate`` is one
    exact-int IEEE division rounded at ``round_digits``."""
    if not vocab:
        raise ValueError("vocab must be non-empty")
    vb = F.array(*[F.lit(w.lower() if lowercase else w) for w in vocab])
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "")
    if lowercase:
        words = F.transform(words, F.lower)
    n_tokens = F.size(words)
    n_oov = F.size(F.filter(words,
                            lambda x: ~F.array_contains(vb, x)))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.round(n_oov / F.nullif(n_tokens, F.lit(0)),
                round_digits).alias("oov_rate"))


# card-shaped digit runs: 13-19 digits, single space/dash separators
# allowed between digits; \b + bounded repetition keep 20+-digit runs
# unmatched in BOTH dialects (Java backtracks to a failing \b, RE2's
# NFA finds no valid end) — parity-tested on adversarial strings
CARD_CANDIDATE_REGEX = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def redact_card_numbers(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", *,
                        out_col: str = "text_redacted",
                        placeholder: str = "[CARD]") -> DataFrame:
    """Payment-card redaction with Luhn validation — the PII category
    :func:`redact_pii`'s pure-regex pass can't do safely: card-shaped
    13-19-digit runs (spaces/dashes allowed) are redacted ONLY when the
    digits pass the Luhn mod-10 checksum, so order ids / tracking
    numbers / timestamps survive while real PANs are scrubbed (the
    regex+checksum convention of public CommonCrawl PII pipelines).
    Output: ``(id, n_card, out_col)``; counts on the original text,
    NULL text propagates (NULL count, NULL output — the redact_pii
    convention).

    All row-local whole-stage codegen: candidate extraction is one
    ``regexp_extract_all``, the Luhn check a per-candidate integer fold
    (doubling from the right, 2d-9 folding), the rewrite a literal
    ``replace`` fold over the validated candidates — zero shuffle, zero
    joins, zero Python. Candidate regex confined to the Java/RE2
    dialect intersection so the DuckDB oracle reproduces the bytes."""
    orig = F.col(text_col)
    cands = F.regexp_extract_all(orig, F.lit(CARD_CANDIDATE_REGEX),
                                 F.lit(0))

    def _luhn_ok(cd):
        ds = F.filter(F.split(cd, ""), lambda c: c.rlike("[0-9]"))
        n = F.size(ds)

        def _dig(i):
            return F.element_at(ds, i).cast("int")

        def _term(i):
            d = _dig(i)
            return F.when(((n - i) % 2) == 1,
                          F.when(d >= 5, d * 2 - 9).otherwise(d * 2)) \
                    .otherwise(d)

        tot = F.aggregate(F.sequence(F.lit(1), n), F.lit(0),
                          lambda acc, i: acc + _term(i))
        return (n >= 13) & (n <= 19) & (tot % 10 == 0)

    valids = F.filter(cands, _luhn_ok)
    red = F.aggregate(valids, orig,
                      lambda acc, c: F.replace(acc, c, F.lit(placeholder)))
    return df.select(F.col(id_col),
                     F.size(valids).alias("n_card"),
                     red.alias(out_col))


CONTROL_CLASS = r"[\x00-\x08\x0B-\x1F\x7F]"  # C0 minus \t \n, plus DEL


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "text_norm",
    strip_control: bool = True,
    nfc: bool = True,
    collapse_ws: bool = True,
    lowercase: bool = False,
) -> DataFrame:
    """Canonical text cleaning for training corpora — the normalization
    stage that runs before dedup/fingerprinting so byte-level noise
    (control chars, combining-character encodings, ragged spacing)
    doesn't defeat exact and near-dup matching. Appends ``out_col``;
    NULL text stays NULL.

    Steps, in a FIXED order (each optional): strip C0 control chars
    (keeping \\t and \\n) and DEL -> Unicode NFC -> collapse space/tab
    runs to one space and trim -> lowercase. The order is part of the
    contract: an oracle applies the identical sequence
    (``regexp_replace`` -> ``nfc_normalize`` -> ``regexp_replace`` +
    ``trim`` -> ``lower``) and must reproduce the exact bytes.

    Scale shape: the regex/case steps are JVM ``regexp_replace`` /
    ``lower`` inside whole-stage codegen; only NFC needs Python
    (``unicodedata`` via an Arrow-batched pandas UDF) — and the UDF is
    compiled into the plan ONLY when ``nfc=True``, so an ASCII-declared
    corpus pays zero Python. Row-local, zero shuffle at any size."""
    col = F.col(text_col)
    if strip_control:
        col = F.regexp_replace(col, CONTROL_CLASS, "")
    if nfc:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfc(s):
            import unicodedata
            return s.map(lambda x: None if x is None
                         else unicodedata.normalize("NFC", x))

        col = _nfc(col)
    if collapse_ws:
        col = F.trim(F.regexp_replace(col, r"[ \t]+", " "))
    if lowercase:
        col = F.lower(col)
    # preserve NULL through trim (trim(NULL) is NULL already; the regex
    # steps are also NULL-safe) — no coalesce anywhere by design
    return df.withColumn(out_col, col)


def duplicated_ngram_coverage(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", *, n: int = 3,
                              min_docs: int = 2, seed: int = 7,
                              round_digits: int = 6) -> DataFrame:
    """Cross-document duplicated n-gram coverage (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better"
    diagnostic): for every document, the fraction of its n-gram
    occurrences whose n-gram also appears in at least ``min_docs``
    distinct documents — ``(id, total_ngrams, dup_ngrams,
    dup_ngram_frac)``. Complements :func:`top_ngram_fraction` (WITHIN-doc
    repetition) with the BETWEEN-doc signal that drives substring-level
    corpus dedup decisions.

    N-grams travel as 64-bit xxhash64 longs (the dedup hashing contract;
    collision probability |grams|^2/2^64). Scale shape: one gram explode
    at scan parallelism (`_spread` + `explode_rows` guards), a per-(doc,
    gram) count with map-side combine (skinny 16-byte keys), ONE gram-keyed
    shuffle where a window count computes each gram's doc-frequency (per
    is already distinct per (doc, gram), so COUNT(*) OVER (PARTITION BY
    gram) IS the doc-frequency), a per-doc rollup, and a left join back so
    short docs (< n words) report 0.0. The window replaces the previous
    self-join (dfreq aggregate + gram-keyed equi-join), which forced the
    scan + explode + first aggregate to run TWICE — measured 5x at sf0.1.
    Skew exposure is unchanged: the join also co-located every row of a
    hot gram on one task. Nothing corpus-wide is collected or broadcast."""
    from pyspark.sql import Window
    per = _per_doc_gram_counts(df, text_col, id_col, n=n, seed=seed)
    rolled = (per.withColumn("__nd",
                             F.count("*").over(Window.partitionBy("__g")))
              .groupBy(id_col)
              .agg(F.sum("__c").alias("total_ngrams"),
                   F.sum(F.when(F.col("__nd") >= min_docs, F.col("__c"))
                         .otherwise(F.lit(0))).alias("dup_ngrams")))
    return _join_back_frac(df, id_col, rolled, "dup_ngrams",
                           "dup_ngram_frac", round_digits)


def ngram_diversity(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", group_col: str = "source",
                    *, n: int = 3, seed: int = 7,
                    round_digits: int = 6) -> DataFrame:
    """Per-group corpus diversity (distinct-n, Li et al. 2016
    "A Diversity-Promoting Objective", arXiv:1510.03055 §5): the fraction
    of a group's word n-gram occurrences that are DISTINCT n-grams —
    ``(group, n_docs, n_grams, n_distinct_grams, diversity)``.

    The diversity complement of the repetition family: where
    ``top_ngram_fraction`` / ``duplicated_ngram_coverage`` flag
    individual repetitive documents, this ranks whole SOURCES — a
    templated/boilerplate source scores low diversity and is a mixing
    liability regardless of any single document's health. Diversity near
    1.0 = almost every n-gram occurrence is unique; near 0 = the source
    keeps re-emitting the same phrases.

    Scale shape: grams as xxhash64 longs (the shared dedup hashing
    contract — 8-byte shuffles, collision odds |grams|²/2⁶⁴ per group);
    TWO stacked hash aggregates, (group, gram) counts first (map-side
    combine absorbs the corpus — vocabulary-sized shuffle) then the
    group rollup — no ``countDistinct`` Expand ever touches the gram
    stream. ``n_docs`` is a group-sized aggregate over the raw table
    (column-pruned scan) joined group-to-group (AQE-broadcast). Groups
    whose docs are all shorter than ``n`` words report 0 grams and NULL
    diversity rather than vanishing."""
    from ..functions.exprs import explode_rows
    from .dedup import _spread
    tmp = "__nd_words"
    grams = F.expr(
        f"if(size({tmp}) >= {n},"
        f" transform(sequence(1, size({tmp}) - {n - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice({tmp}, i, {n})), {seed})),"
        f" array())"
    )
    exploded = explode_rows(
        _spread(df, id_col).withColumn(
            tmp, F.split(F.coalesce(F.col(text_col), F.lit("")), " ")),
        [group_col], grams, "__g")
    per_gram = exploded.groupBy(group_col, "__g").agg(
        F.count("*").alias("__c"))
    rolled = per_gram.groupBy(group_col).agg(
        F.sum("__c").alias("n_grams"),
        F.count("*").alias("n_distinct_grams"))
    docs = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    return (docs.join(rolled, group_col, "left")
            .select(group_col, "n_docs",
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_distinct_grams",
                               F.lit(0)).alias("n_distinct_grams"),
                    F.round(F.col("n_distinct_grams")
                            / F.nullif(F.col("n_grams"), F.lit(0)),
                            round_digits).alias("diversity"))
            .orderBy(group_col))


def vocab_drift(df_a: DataFrame, df_b: DataFrame, text_col: str = "text",
                *, k: int = 100, other: str = "<other>") -> DataFrame:
    """Vocabulary drift between two corpus snapshots: Pearson chi² over
    per-token counts restricted to the BASELINE's top-``k`` vocabulary,
    with every out-of-vocabulary token folded into one ``other`` bucket
    (so new words register as drift instead of being dropped, and the
    category set — hence ``dof = k`` — is fixed by the baseline alone,
    the CCNet convention for monitoring a feed against a reference
    snapshot). Returns :func:`~.stats.chi2_two_sample`'s one-row
    ``(chi2, dof, n_a, n_b)``.

    Scale shape: the baseline vocabulary is ONE corpus token aggregate
    (vocabulary-sized shuffle, map-side combined) + a TakeOrdered head
    by the (count desc, token asc) total order — unique, so any engine
    re-derives it; k tokens come to the driver and categorize both
    sides as a codegen'd literal-array `isin` (no join); the chi² then
    aggregates (k+1)-category counts per side."""
    from ..functions.exprs import explode_rows
    from .stats import chi2_two_sample

    def toks(df: DataFrame) -> DataFrame:
        return explode_rows(
            df.select(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                      .alias("__w")),
            [], F.col("__w"), "__t")

    head = (toks(df_a).groupBy("__t").agg(F.count("*").alias("__c"))
            .orderBy(F.desc("__c"), F.asc("__t")).limit(k).collect())
    vocab = [r["__t"] for r in head]
    lit = F.array(*[F.lit(t) for t in vocab])

    def cat(df: DataFrame) -> DataFrame:
        t = toks(df)
        return t.select(
            F.when(F.array_contains(lit, F.col("__t")), F.col("__t"))
             .otherwise(F.lit(other)).alias("token_cat"))

    return chi2_two_sample(cat(df_a), cat(df_b), "token_cat")


def vocab_remap_plan(df_base: DataFrame, df_cur: DataFrame,
                     text_col: str = "text", *, k: int = 100) -> DataFrame:
    """The ACTING complement of :func:`vocab_drift` (the check↔repair
    symmetry rule): derive a token re-mapping that ALIGNS a drifted
    snapshot back onto a baseline vocabulary. A current-corpus token is
    remapped iff it is NOT in the baseline's top-``k`` vocabulary but
    its casefolded form equals the casefold of exactly ONE baseline
    vocab token (the casing/normalization drift an upstream renderer
    change typically introduces — "KEY" → "key"); ambiguous casefold
    collisions (two vocab tokens sharing a lowercase form) are dropped
    rather than guessed. Returns ``(from_token, to_token, n_cur)`` with
    ``n_cur`` = the token's occurrence count in the current corpus.
    Compose with :func:`remap_tokens` to repair, then re-run
    :func:`vocab_drift` to show the chi² fall — the same
    repair-then-revalidate arc as ``t_repair_validate``.

    Scale shape: the baseline head is the :func:`vocab_drift` TakeOrdered
    total-order top-k (k tokens to the driver); the current side is ONE
    vocabulary-sized token aggregate (map-side combined); membership and
    casefold lookup are codegen'd literals (array + map, k entries) — no
    join anywhere, text never shuffles. Casefold = simple Unicode
    ``lower`` on all engines (ASCII-exact parity; locale-free)."""
    from ..functions.exprs import explode_rows

    def toks(df: DataFrame) -> DataFrame:
        return explode_rows(
            df.select(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                      .alias("__w")),
            [], F.col("__w"), "__t")

    head = (toks(df_base).groupBy("__t").agg(F.count("*").alias("__c"))
            .orderBy(F.desc("__c"), F.asc("__t")).limit(k).collect())
    vocab = [r["__t"] for r in head]
    by_norm: dict = {}
    for t in vocab:
        by_norm.setdefault(t.lower(), []).append(t)
    norm_map = {n: ts[0] for n, ts in sorted(by_norm.items())
                if len(ts) == 1}
    cur = (toks(df_cur).groupBy(F.col("__t").alias("from_token"))
           .agg(F.count("*").alias("n_cur")))
    if not norm_map:
        return cur.filter(F.lit(False)).select(
            "from_token", F.lit(None).cast("string").alias("to_token"),
            "n_cur")
    vocab_lit = F.array(*[F.lit(t) for t in vocab])
    map_lit = F.create_map(*[F.lit(x) for kv in norm_map.items()
                             for x in kv])
    return (cur.filter(~F.array_contains(vocab_lit, F.col("from_token")))
               .withColumn("to_token",
                           F.element_at(map_lit,
                                        F.lower(F.col("from_token"))))
               .filter(F.col("to_token").isNotNull())
               .select("from_token", "to_token", "n_cur"))


def remap_tokens(df: DataFrame, mapping, text_col: str = "text", *,
                 out_col: str = "clean_text", id_col: str = "doc_id",
                 max_literal: int = 10_000,
                 max_mapping: int = 10_000_000) -> DataFrame:
    """Apply a token re-mapping to a text column — every whitespace
    token equal to a ``from_token`` is replaced by its ``to_token``,
    everything else (including whitespace structure) passes through
    byte-identical; NULL text stays NULL. ``mapping`` is a dict or a
    DataFrame whose first two columns are (from, to) — e.g.
    :func:`vocab_remap_plan`'s output.

    Scale shape, two declared strategies by mapping size:

    - ``<= max_literal`` entries (the vocabulary-drift case — a remap
      table is vocabulary-sized by construction): codegen'd map literal,
      ``transform(split(text), t -> coalesce(map[t], t))`` — ZERO
      shuffle, zero Python, text never moves.
    - larger: tokens posexplode to skinny ``(id, pos, tok)`` rows, the
      mapping BROADCASTS into a left join, and the doc re-assembles via
      one id-grain ``array_agg`` sorted by position — text shuffles
      once, the mapping never does. Requires ``id_col``; mappings past
      ``max_mapping`` fail fast (a remap table larger than that is not
      a vocabulary anymore)."""
    if isinstance(mapping, DataFrame):
        fcol, tcol = mapping.columns[0], mapping.columns[1]
        # Deterministic duplicate resolution: a duplicate-keyed mapping
        # would multiply exploded tokens through the broadcast left
        # join while the dict path silently kept an arbitrary row —
        # min(to) per from makes both strategies agree. On the common
        # vocabulary-sized path the min-wins fold happens DRIVER-side
        # on the collected rows (no extra shuffle/job); only the
        # broadcast-join path pays a groupBy, where uniqueness is a
        # join-correctness requirement (a no-op for vocab_remap_plan
        # output, which already groups by from_token).
        raw = mapping.select(F.col(fcol).alias("__t"),
                             F.col(tcol).alias("__to"))
        rows = raw.limit(max_literal + 1).collect()
        if len(rows) <= max_literal:
            mapping = {}
            for r in rows:
                k, v = r[0], r[1]
                if k in mapping:     # F.min semantics: NULLs ignored
                    old = mapping[k]
                    mapping[k] = (v if old is None
                                  else old if v is None else min(old, v))
                else:
                    mapping[k] = v
        else:
            deduped = raw.groupBy("__t").agg(F.min("__to").alias("__to"))
            n = deduped.count()
            if n > max_mapping:
                raise ValueError(
                    f"mapping has {n} entries > max_mapping={max_mapping}")
            toks = df.select(
                id_col,
                F.posexplode_outer(
                    F.split(F.col(text_col), " ")).alias("__p", "__t"))
            joined = toks.join(F.broadcast(deduped), "__t", "left")
            rebuilt = (joined.filter(F.col("__p").isNotNull())
                       .groupBy(id_col)
                       .agg(F.array_sort(F.collect_list(F.struct(
                           F.col("__p").alias("p"),
                           F.coalesce("__to", "__t").alias("t"))))
                           .alias("__a"))
                       .select(id_col, F.array_join(
                           F.transform("__a", lambda s: s["t"]), " ")
                           .alias(out_col)))
            return df.join(rebuilt, id_col, "left")
    if not mapping:
        return df.withColumn(out_col, F.col(text_col))
    if len(mapping) > max_literal:
        raise ValueError(
            f"dict mapping has {len(mapping)} entries > "
            f"max_literal={max_literal}; pass a DataFrame for the "
            "broadcast-join path")
    m = F.create_map(*[F.lit(x) for kv in sorted(mapping.items())
                       for x in kv])
    repaired = F.array_join(
        F.transform(F.split(F.col(text_col), " "),
                    lambda t: F.coalesce(F.element_at(m, t), t)), " ")
    return df.withColumn(out_col, repaired)


def remove_duplicated_spans(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", *, k: int = 10,
                            min_count: int = 2, seed: int = 7,
                            round_digits: int = 6) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" §4.1),
    re-expressed over fixed ``k``-token windows: every token covered by
    at least one ``k``-gram whose total occurrence count across the
    corpus is ``>= min_count`` (within-doc repeats included, per the
    paper's any-second-occurrence rule) is deleted, and the remainder is
    re-joined with single spaces. Where :func:`duplicated_ngram_coverage`
    *measures* cross-doc duplication, this operator *acts* on it.

    Returns ``(id_col, clean_text, n_tokens, n_removed, removed_frac)``.
    Docs shorter than ``k`` tokens have no windows and pass through
    unchanged; a fully-duplicated doc becomes the empty string.

    Scale shape (the paper's suffix array is a full corpus sort; this is
    strictly cheaper): one gram explode at scan parallelism emitting
    SKINNY ``(id, pos, hash64)`` rows (corpus text stays in place), a
    gram-keyed occurrence count with map-side combine, a gram-keyed
    equi-join of the positions against the duplicated-gram set (both
    sides already hash-partitioned by gram), a per-doc
    ``collect_set(pos)`` rollup (only docs containing duplicated grams —
    skinny ints), and ONE doc-keyed join of that rollup back onto the
    corpus — the single stage where text shuffles, and only if AQE does
    not broadcast the (duplication-bounded) rollup. The rewrite itself
    is row-local whole-stage codegen: covered positions =
    ``distinct(flatten(sequence(s, s+k-1)))`` over the start set, kept
    tokens filtered by position — O(tokens x covered) per row worst
    case (array_contains is a linear probe), which is fine at normal
    document sizes (<= a few thousand tokens) and bounded corpus-wide
    by chunking pathological documents upstream
    (:func:`~.packing.chunk_windows`)."""
    from ..functions.exprs import explode_rows
    from .dedup import _spread

    tmp = "__span_words"
    pos_arr = F.expr(
        f"if(size({tmp}) >= {k},"
        f" transform(sequence(1, size({tmp}) - {k - 1}),"
        f" i -> struct(i AS p,"
        f" xxhash64(concat_ws(' ', slice({tmp}, i, {k})), {seed}) AS g)),"
        f" array())")
    base = _spread(df.select(id_col, text_col), id_col).withColumn(
        tmp, F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    pos = explode_rows(base, [id_col], pos_arr, "__pg").select(
        id_col, F.col("__pg.p").alias("__p"), F.col("__pg.g").alias("__g"))
    dup = (pos.groupBy("__g").agg(F.count("*").alias("__n"))
           .filter(F.col("__n") >= min_count).select("__g"))
    return _rewrite_without_spans(base, pos.join(dup, "__g"), id_col,
                                  tmp, k, round_digits)


def dup_ngram_within(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", *, n: int = 5,
                     seed: int = 7, round_digits: int = 6) -> DataFrame:
    """WITHIN-doc duplicated n-gram coverage — the remaining Gopher
    repetition signal (arXiv:2112.11446 Table A1 "duplicate 5..10-gram
    character fraction"): the fraction of a document's words/characters
    covered by an ``n``-gram that occurs MORE THAN ONCE inside that
    same document. Completes the family: :func:`top_ngram_fraction` =
    within-doc top-gram mass, :func:`duplicated_ngram_coverage` =
    cross-doc, this = within-doc any-repeat. Per doc: ``(id, n_words,
    dup_words, dup_word_frac, dup_chars, dup_char_frac)`` (char mass
    counts word characters, not separators).

    Scale shape (same skeleton as :func:`remove_duplicated_spans`, with
    the duplicated set scoped per doc): skinny ``(id, pos, hash64)``
    gram explode at scan parallelism (text stays in place), occurrence
    count as a window COUNT over the ``(id, gram)`` partition (the
    table is the partition, so its row count IS the count — no
    self-join), per-doc ``collect_set(pos)`` rollup bounded by
    duplication, ONE doc-keyed join back (the only stage text moves;
    AQE broadcasts the rollup when duplication is sparse), then a
    row-local codegen coverage expansion + integer char sums."""
    from pyspark.sql import Window
    from ..functions.exprs import explode_rows
    from .dedup import _spread

    tmp = "__dupw_words"
    pos_arr = F.expr(
        f"if(size({tmp}) >= {n},"
        f" transform(sequence(1, size({tmp}) - {n - 1}),"
        f" i -> struct(i AS p,"
        f" xxhash64(concat_ws(' ', slice({tmp}, i, {n})), {seed}) AS g)),"
        f" array())")
    base = _spread(df.select(id_col, text_col), id_col).withColumn(
        tmp, F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    pos = explode_rows(base, [id_col], pos_arr, "__pg").select(
        id_col, F.col("__pg.p").alias("__p"), F.col("__pg.g").alias("__g"))
    w = Window.partitionBy(id_col, "__g")
    flagged = (pos.withColumn("__cnt", F.count("*").over(w))
               .filter(F.col("__cnt") >= 2))
    starts = (flagged.groupBy(id_col)
              .agg(F.sort_array(F.collect_set("__p")).alias("__starts")))
    joined = base.join(starts, id_col, "left").withColumn(
        "__cov",
        F.expr(f"array_distinct(flatten(transform("
               f"coalesce(__starts, array()),"
               f" s -> sequence(s, s + {n - 1}))))"))
    words = F.col(tmp)
    cov = F.col("__cov")
    total_chars = F.aggregate(words, F.lit(0).cast("long"),
                              lambda acc, x: acc + F.length(x))
    dup_chars = F.aggregate(
        cov, F.lit(0).cast("long"),
        lambda acc, p: acc + F.length(F.element_at(words, p)))
    frac = lambda a, b: F.round(  # noqa: E731
        F.coalesce(F.try_divide(a.cast("double"), b.cast("double")),
                   F.lit(0.0)), round_digits)
    return joined.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.size(cov).alias("dup_words"),
        frac(F.size(cov), F.size(words)).alias("dup_word_frac"),
        dup_chars.alias("dup_chars"),
        frac(dup_chars, total_chars).alias("dup_char_frac"))


def _rewrite_without_spans(base: DataFrame, flagged_pos: DataFrame,
                           id_col: str, tmp: str, k: int,
                           round_digits: int) -> DataFrame:
    """Shared tail of the span-removal operators: roll flagged window
    starts up per doc, compute covered positions row-locally, delete the
    covered tokens and re-join — one doc-keyed join is the only stage
    where text moves (and only for docs with flagged spans when AQE
    broadcasts the rollup)."""
    starts = (flagged_pos
              .groupBy(id_col)
              .agg(F.sort_array(F.collect_set("__p")).alias("__starts")))
    joined = base.join(starts, id_col, "left").withColumn(
        "__cov",
        F.expr(f"array_distinct(flatten(transform("
               f"coalesce(__starts, array()),"
               f" s -> sequence(s, s + {k - 1}))))"))
    kept = F.expr(
        f"filter(transform({tmp}, (w, i) -> struct(w AS w, i + 1 AS p)),"
        f" t -> NOT array_contains(__cov, t.p))")
    return joined.withColumn("__kept", kept).select(
        id_col,
        F.array_join(F.expr("transform(__kept, t -> t.w)"), " ")
         .alias("clean_text"),
        F.size(tmp).cast("bigint").alias("n_tokens"),
        F.size("__cov").cast("bigint").alias("n_removed"),
        F.round(
            F.size("__cov").cast("double") / F.size(tmp), round_digits,
        ).alias("removed_frac"),
    )


def unigram_lm_table(df: DataFrame, text_col: str = "text", *,
                     id_col: str | None = None,
                     vocab_size: int = 4096) -> tuple[list[tuple], int, int]:
    """Train the unigram LM used by :func:`lm_quality`: the top
    ``vocab_size`` whitespace tokens by (count desc, token asc) — a total
    order, so the head is unique and any engine re-derives it — plus the
    corpus token total N and the kept vocabulary size V.

    Returns ``(rows, n_total, v)`` where ``rows`` is
    ``[(token, count, micro_nats)]`` and ``micro_nats =
    floor(ln((count+1)/(N+V+1)) * 1e6)`` computed DRIVER-side with C-libm
    ``math.log`` — the engine never evaluates a transcendental, so the
    per-token score is an exact integer contract any libm-based engine
    (DuckDB, Python) reproduces bit-identically. One corpus token
    aggregate (vocabulary-sized shuffle with map-side combine) + a
    TakeOrdered head + one scalar total; V+1 rows reach the driver."""
    import math
    from ..functions.exprs import explode_rows
    from .dedup import _spread
    # only the text column rides the (possible) local-parallelism
    # exchange; spread on id_col when the caller names one (lm_quality
    # does), else round-robin — NEVER hash whatever column happens to be
    # first (it could be the megabyte text itself, or a boolean)
    base = df.select(text_col)
    if id_col is not None:
        base = _spread(df.select(id_col, text_col), id_col).select(text_col)
    else:
        target = df.sparkSession.sparkContext.defaultParallelism
        if base.rdd.getNumPartitions() < target:  # same guard as _spread
            base = base.repartition(target)
    toks = explode_rows(
        base.withColumn(
            "__lm_words",
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")),
        [], F.col("__lm_words"), "__t")
    # the head and the total are two actions over the same
    # vocabulary-sized aggregate — persist it so the corpus-wide token
    # explode runs ONCE, not twice
    cnt = toks.groupBy("__t").agg(F.count("*").alias("__c")).persist()
    try:
        head = (cnt.orderBy(F.desc("__c"), F.asc("__t"))
                .limit(vocab_size).collect())
        n_total = cnt.agg(F.sum("__c")).collect()[0][0] or 0
    finally:
        cnt.unpersist()
    v = len(head)
    denom = float(n_total + v + 1)
    rows = [(r["__t"], r["__c"],
             int(math.floor(math.log((r["__c"] + 1) / denom) * 1_000_000)))
            for r in head]
    return rows, int(n_total), v


def lm_quality(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *, vocab_size: int = 4096,
               lm: tuple[list[tuple], int, int] | None = None,
               round_digits: int = 6) -> DataFrame:
    """Unigram language-model quality score (the CCNet/Wikipedia-LM
    filtering shape with a self-trained unigram model): per document the
    add-one-smoothed average log-probability of its tokens —
    ``(id, n_tokens, logp_micro, avg_logp)``. Low ``avg_logp`` = token
    distribution far from the corpus head = boilerplate/garble candidate.
    Pass ``lm=unigram_lm_table(reference_df)`` to score against a held
    reference corpus instead of ``df`` itself.

    Exactness: every per-token score is an INTEGER (micro-nats, ln done
    once per vocab entry on the driver — see :func:`unigram_lm_table`),
    so the per-doc sum is order-free and bit-exact; the only float ops
    are one division and one round at the very end. Scale shape: scoring
    is one token explode + a BROADCAST left join against the V-row vocab
    + a per-doc integer sum with map-side combine (skinny (id, long)
    shuffle); OOV tokens take the constant smoothing score via coalesce.
    Training reads the corpus once (see :func:`unigram_lm_table`)."""
    import math
    rows, n_total, v = lm if lm is not None else unigram_lm_table(
        df, text_col, id_col=id_col, vocab_size=vocab_size)
    oov_micro = int(math.floor(
        math.log(1.0 / (n_total + v + 1)) * 1_000_000)) if n_total else 0
    spark = df.sparkSession
    from ..functions.exprs import arrow_local_df, explode_rows
    vocab = arrow_local_df(
        spark, [(t, m) for t, _, m in rows], "__t string, __m bigint")
    from .dedup import _spread
    toks = explode_rows(
        _spread(df, id_col).withColumn(
            "__lm_words",
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")),
        [id_col], F.col("__lm_words"), "__t")
    scored = (toks.join(F.broadcast(vocab), "__t", "left")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_tokens"),
                   F.sum(F.coalesce(F.col("__m"), F.lit(oov_micro)))
                   .alias("logp_micro")))
    # avg via exact integer floor division, NOT round(): the quotient of
    # an integer micro-nat sum by a small token count regularly lands on
    # exact decimal ties (x.5 micro-nats whenever 2·logp ≡ n (mod 2n))
    # where Spark's BigDecimal HALF_UP and DuckDB's scale-then-round
    # disagree; floor(a/b)/1e6 is the same IEEE op sequence everywhere
    return scored.select(
        F.col(id_col), F.col("n_tokens"), F.col("logp_micro"),
        (F.floor(F.col("logp_micro") / F.col("n_tokens")).cast("double")
         / F.lit(1_000_000.0)).alias("avg_logp"))


def heavy_hitters(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *, min_frac: float = 0.001,
                  sketch_k: int | None = None) -> DataFrame:
    """EXACT corpus heavy hitters at sketch cost: every token whose
    occurrence count is ``>= ceil(min_frac * N)`` (N = total tokens),
    with its exact count — ``(token, n_occurrences)``, (count desc,
    token asc) total order.

    :func:`top_tokens` shuffles the whole vocabulary to rank it; at
    web scale the vocabulary IS corpus-sized (typos, hashes, URLs), so
    this is the scale path: a two-pass candidates-then-recount plan
    built on a mergeable Misra-Gries sketch (Agarwal et al.,
    "Mergeable Summaries", PODS'12).

    - Pass 1 (zero shuffle): one ``mapInPandas`` over the raw docs keeps
      ``sketch_k`` (default ``ceil(2/min_frac)``) Misra-Gries counters
      PER PARTITION — batch counts via ``collections.Counter`` merged by
      the standard decrement-by-(k+1)-th-count rule. A token with global
      count >= min_frac*N undercounts by < n_p/k on each partition
      stream, so with k >= 1/min_frac it must survive in at least one
      partition summary: the union of summaries is a guaranteed
      candidate SUPERSET (<= k rows per partition out, not vocab-sized).
    - Pass 2: exact recount restricted to candidates — token explode,
      BROADCAST semi-join against the candidate set, hash aggregate with
      map-side partial combine; only (candidate, partial-count) pairs
      shuffle. The exact ``>= ceil(min_frac*N)`` filter then discards
      the sketch's false positives, so the sketch never touches the
      RESULT — only the cost. N itself is one codegen'd
      ``sum(size(split))`` aggregate attached as a 1-row broadcast.

    Candidate volume is bounded by ``sketch_k x input partitions``
    (driver-free: it stays a DataFrame); size ``min_frac`` so that stays
    broadcastable — at 1000 partitions and the default k it is ~2M
    skinny strings for min_frac=1e-3. Analog of the reference's
    corpus-stats ambitions (research/benchmark/README.md:3-16) at a
    scale its single-node design cannot reach."""
    import math

    from ..functions.exprs import explode_rows
    from .dedup import _spread
    k = sketch_k if sketch_k is not None else int(math.ceil(2.0 / min_frac))

    def mg_partition(batches):
        import pandas as pd
        from collections import Counter
        running: Counter = Counter()
        for pdf in batches:
            batch = Counter()
            for toks in pdf[text_col].fillna("").str.split(" "):
                batch.update(toks)
            running.update(batch)
            if len(running) > k:
                # decrement every counter by the (k+1)-th largest count;
                # <= 0 drops out -- the mergeable-MG reduction step
                kth = sorted(running.values(), reverse=True)[k]
                running = Counter({t: c - kth for t, c in running.items()
                                   if c - kth > 0})
        yield pd.DataFrame({"token": list(running.keys())})

    spread = _spread(df, id_col)
    cand = spread.mapInPandas(mg_partition,
                              schema="token string").dropDuplicates()
    total = spread.agg(F.sum(F.size(F.split(
        F.coalesce(F.col(text_col), F.lit("")), " "))).alias("_n"))
    toks = explode_rows(
        spread.withColumn("__hh_words",
                          F.split(F.coalesce(F.col(text_col), F.lit("")),
                                  " ")),
        [], F.col("__hh_words"), "token")
    counts = (toks.join(F.broadcast(cand), "token", "left_semi")
                  .groupBy("token").agg(F.count("*").alias("n_occurrences")))
    return (counts.join(F.broadcast(total))
            .filter(F.col("n_occurrences") >=
                    F.ceil(F.lit(float(min_frac)) * F.col("_n")))
            .select("token", "n_occurrences")
            .orderBy(F.desc("n_occurrences"), F.asc("token")))


def encoding_damage(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", *,
                    max_ratio: float = 0.001,
                    round_digits: int = 6) -> DataFrame:
    """Encoding-damage triage for web-scale text — the hygiene check a
    crawled corpus needs before any tokenizer sees it. Three exact,
    codegen'd per-doc counters and a verdict:

    - ``n_replacement``: U+FFFD replacement characters (the decoder
      already gave up);
    - ``n_mojibake``: signature sequences of UTF-8 read as Latin-1 —
      U+00C3 followed by a Latin-1-supplement char (the classic two-byte
      mangle), plus the U+00E2 U+20AC family (curly quotes/dashes
      through the same mangle);
    - ``n_control``: C0 control chars other than tab/newline/carriage
      return (binary junk or protocol bleed);
    - ``damage_ratio`` = damaged chars / total chars (0.0 for empty);
      ``verdict`` = 'damaged' when the ratio exceeds ``max_ratio`` or
      any replacement char exists, else 'clean'.

    Pure ``regexp_count`` scan projection — zero shuffle, zero Python,
    trivially row-parallel at any scale. The regexes use explicit
    codepoint escapes (no locale/ICU class dependence) so any engine
    counts the same spans."""
    n_rep = F.regexp_count(F.col(text_col), F.lit("\\ufffd"))
    n_moj = F.regexp_count(
        F.col(text_col),
        F.lit("\\u00c3[\\u0080-\\u00bf\\u00c0-\\u00ff]"
              "|\\u00e2\\u20ac."))
    n_ctl = F.regexp_count(
        F.col(text_col),
        F.lit("[\\u0000-\\u0008\\u000b\\u000c\\u000e-\\u001f]"))
    n_chars = F.length(text_col).cast("double")
    damaged = (n_rep + n_moj + n_ctl).cast("double")
    ratio = F.coalesce(F.try_divide(damaged, n_chars), F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_rep.alias("n_replacement"),
        n_moj.alias("n_mojibake"),
        n_ctl.alias("n_control"),
        F.round(ratio, round_digits).alias("damage_ratio"),
        F.when((ratio > max_ratio) | (n_rep > 0), F.lit("damaged"))
         .otherwise(F.lit("clean")).alias("verdict"),
    )


def conversation_quality(
    df: DataFrame,
    *,
    min_quality: float = 0.5,
    conv_col: str = "conv_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Conversation-grain quality gate — curation at the grain sampling
    already respects (key-coherent: conversations are kept or dropped
    WHOLE; doc-grain gating truncates dialogues mid-turn). Scores every
    turn with the shared :func:`quality_exprs` formula, aggregates per
    conversation, and emits a verdict:
    ``(conv_col, n_turns, mean_quality, min_turn_quality, verdict)``
    with ``verdict`` = 'keep' when ``mean_quality >= min_quality``.

    Cross-engine determinism: each turn's quality is the 6-dp-rounded
    score, summed as exact integer micro-units (the
    quality_propagate/lm_quality recipe), so the conversation mean is
    one division over exact integers — summation-order independent.
    NULL text scores through the formula's empty-string semantics
    (length 0 band) rather than being skipped, so every turn counts
    against its conversation.

    Scale shape: the score is row-local codegen in the scan projection;
    ONE hash aggregate on ``conv_col`` (map-side partials absorb hot
    conversations) moves only (conv, int, int) — text never shuffles."""
    q = quality_exprs(text_col)
    qmic = F.round(F.round(q["quality"], 6) * 1e6).cast("bigint")
    coalesced = df.select(
        F.col(conv_col),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    staged = coalesced.select(conv_col, qmic.alias("_qm"))
    agg = (staged.groupBy(conv_col)
           .agg(F.count(F.lit(1)).alias("n_turns"),
                F.sum("_qm").alias("_s"),
                F.min("_qm").alias("_min")))
    mean = (F.col("_s").cast("double")
            / (F.col("n_turns").cast("double") * 1e6))
    # emitted mean via exact integer floor division (round() of an
    # integer micro sum over a small turn count hits exact decimal
    # ties where engines disagree); _min is already integer micro, so
    # its /1e6 is a single exact division needing no rounding at all
    return agg.select(
        conv_col, "n_turns",
        (F.floor(F.col("_s") / F.col("n_turns")).cast("double") / 1e6)
        .alias("mean_quality"),
        (F.col("_min").cast("double") / 1e6).alias("min_turn_quality"),
        F.when(mean >= F.lit(float(min_quality)), F.lit("keep"))
         .otherwise(F.lit("drop")).alias("verdict"))


def vocab_growth(df: DataFrame, text_col: str = "text",
                 ts_col: str = "ts", *, grain: str = "day",
                 round_digits: int = 6) -> DataFrame:
    """New-vocabulary rate over time — the crawler-health monitor: a
    healthy ingest keeps finding NEW tokens; a recrawl's curve collapses
    to ~0. Per calendar bucket (``date_trunc(grain)``):
    ``(window_start, n_tokens, n_distinct, n_new, new_rate)`` where
    ``n_new`` counts tokens whose FIRST occurrence (minimum bucket) is
    this bucket and ``new_rate`` = n_new / n_distinct (rounded; 0-token
    buckets cannot appear by construction).

    Scale shape: one explode feeding TWO vocabulary-sized hash
    aggregates — per-(bucket, token) counts (map-side combine absorbs
    the corpus), then min-bucket per token; the join of
    first-occurrence onto the per-bucket distinct counts is
    vocabulary-grain, the output bucket-grain. Corpus text never
    shuffles (tokens do — the same cost class as top_tokens; cap with
    heavy_hitters' candidate trick if the vocabulary is corpus-sized)."""
    from ..functions.exprs import explode_rows
    toks = explode_rows(
        df.select(F.date_trunc(grain, F.col(ts_col)).alias("_b"),
                  F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                   .alias("_w")),
        ["_b"], F.col("_w"), "token")
    per = toks.groupBy("_b", "token").agg(F.count("*").alias("_c"))
    first = per.groupBy("token").agg(F.min("_b").alias("_fb"))
    joined = per.join(first, "token")
    return (joined.groupBy("_b")
            .agg(F.sum("_c").alias("n_tokens"),
                 F.count("*").alias("n_distinct"),
                 F.sum((F.col("_b") == F.col("_fb")).cast("bigint"))
                  .alias("n_new"))
            .select(F.col("_b").alias("window_start"),
                    "n_tokens", "n_distinct", "n_new",
                    F.round(F.col("n_new")
                            / F.col("n_distinct").cast("double"),
                            round_digits).alias("new_rate")))


def char_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *,
               round_digits: int = 6) -> DataFrame:
    """Character-level quality signals — the gibberish/randomness filter
    family (base64 blobs, minified code, key dumps all score as text by
    word heuristics but scream at the character level). Per doc:
    ``(id, n_chars, digit_ratio, upper_ratio, space_ratio,
    char_entropy)`` with entropy in nats over the doc's own character
    distribution (0.0 for empty docs; ~ln(alphabet) for uniform noise —
    English prose sits near 2.8-3.2).

    All row-local: the ratios are codegen'd ``regexp_count``; the
    entropy is a single run-length fold over the doc's SORTED
    characters — each run closing adds its ``-(c/n)·ln(c/n)`` term in
    sorted-character order, the SAME terms in the SAME order as the
    per-distinct-char formulation (so the float result is bit-identical
    and cross-engine reproducible) at O(len log len) per doc instead of
    O(distinct_chars x len). Zero shuffle, zero joins, zero Python."""
    chars = F.split(F.col(text_col), "")
    n = F.length(text_col)
    nd = n.cast("double")

    def _term(run):
        p = run.cast("double") / nd
        return -p * F.log(p)

    ent = F.aggregate(
        F.array_sort(chars),
        F.struct(F.lit(None).cast("string").alias("p"),
                 F.lit(0).cast("long").alias("r"),
                 F.lit(0.0).alias("a")),
        lambda st, c: F.when(
            st["p"].isNull() | (st["p"] == c),
            F.struct(c.alias("p"), (st["r"] + 1).alias("r"),
                     st["a"].alias("a")))
        .otherwise(F.struct(c.alias("p"),
                            F.lit(1).cast("long").alias("r"),
                            (st["a"] + _term(st["r"])).alias("a"))),
        lambda st: F.when(st["r"] > 0, st["a"] + _term(st["r"]))
                    .otherwise(st["a"]))
    return df.select(
        F.col(id_col),
        F.coalesce(n, F.lit(0)).alias("n_chars"),
        F.round(F.coalesce(
            F.try_divide(F.regexp_count(F.col(text_col), F.lit("[0-9]")),
                         nd), F.lit(0.0)), round_digits)
         .alias("digit_ratio"),
        F.round(F.coalesce(
            F.try_divide(F.regexp_count(F.col(text_col), F.lit("[A-Z]")),
                         nd), F.lit(0.0)), round_digits)
         .alias("upper_ratio"),
        F.round(F.coalesce(
            F.try_divide(F.regexp_count(F.col(text_col), F.lit(" ")),
                         nd), F.lit(0.0)), round_digits)
         .alias("space_ratio"),
        F.round(F.coalesce(F.when(n > 0, ent), F.lit(0.0)),
                round_digits).alias("char_entropy"),
    )


def line_repetition(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", *,
                    round_digits: int = 6) -> DataFrame:
    """Within-doc line/paragraph repetition signals — the Gopher
    (Rae et al. 2021, arXiv:2112.11446 Table A1) repetition family that
    :func:`top_ngram_fraction` does not cover: web boilerplate, scraped
    menus, and chat loops repeat whole LINES verbatim inside one
    document. Per doc: ``(id, n_lines, dup_line_frac,
    dup_line_char_frac, n_paras, dup_para_frac, dup_para_char_frac)``.

    Definitions (fixed as contract): lines split on ``\\r?\\n``,
    paragraphs on blank-line runs ``(\\r?\\n){2,}``; segments are
    trimmed and empties dropped. ``dup_*_frac`` = fraction of segments
    that are EXCESS copies of an earlier-seen segment
    (``(n - n_distinct) / n``); ``dup_*_char_frac`` = fraction of
    segment characters inside those excess copies
    (``(chars - distinct_chars) / chars``). Gopher drops docs above
    0.30 / 0.20 respectively. Empty docs report 0 counts and 0.0
    fractions.

    All row-local whole-stage codegen (split / array_distinct /
    aggregate folds over integers — ratios are single IEEE divisions of
    exact ints, so cross-engine bit-stable before rounding). Zero
    shuffle, zero joins, zero Python.
    """
    def _segs(pat: str):
        raw = F.split(F.coalesce(F.col(text_col), F.lit("")), pat)
        return F.filter(F.transform(raw, lambda x: F.trim(x)),
                        lambda x: x != "")

    def _chars(arr):
        return F.aggregate(arr, F.lit(0).cast("long"),
                           lambda acc, x: acc + F.length(x))

    def _signals(arr, prefix: str):
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        c = _chars(arr)
        cd = _chars(F.array_distinct(arr))
        frac = lambda a, b: F.round(  # noqa: E731
            F.coalesce(F.try_divide((a - b).cast("double"),
                                    a.cast("double")), F.lit(0.0)),
            round_digits)
        return [n.alias(f"n_{prefix}s"),
                frac(n, nd).alias(f"dup_{prefix}_frac"),
                frac(c, cd).alias(f"dup_{prefix}_char_frac")]

    return df.select(
        F.col(id_col),
        *_signals(_segs(r"\r?\n"), "line"),
        *_signals(_segs(r"(\r?\n){2,}"), "para"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def gopher_gate(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", *,
                min_words: int = 50, max_words: int = 100_000,
                min_mean_word_len: float = 3.0,
                max_mean_word_len: float = 10.0,
                max_symbol_ratio: float = 0.1,
                max_bullet_line_frac: float = 0.9,
                max_ellipsis_line_frac: float = 0.3,
                min_alpha_word_frac: float = 0.8,
                min_stopwords: int = 2,
                round_digits: int = 6) -> DataFrame:
    """The Gopher quality rulebook (Rae et al. 2021, arXiv:2112.11446
    Table A1) — the fixed per-doc gate complementing the statistical
    :func:`quality_score`: word count in ``[min_words, max_words]``,
    mean word length in ``[3, 10]``, hash/ellipsis symbol-to-word
    ratio ≤ 0.1, ≤ 90% of lines bullet-started, ≤ 30% ellipsis-ended,
    ≥ 80% of words containing an alphabetic character, and ≥ 2 of the
    eight English stop words present. Output: ``(id, n_words,
    mean_word_len, symbol_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, n_stopwords_present, keep)``.

    Cross-engine exactness: every emitted ratio is a single IEEE
    division of exact integers (rounded only for display); ``keep``
    compares the UNROUNDED quotients, so both engines take identical
    branches. All row-local split/HOF/regexp codegen — zero shuffle,
    zero joins, zero Python."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
    lines = F.filter(
        F.transform(F.split(txt, r"\r?\n"), lambda x: F.trim(x)),
        lambda x: x != "")
    nw = F.size(words)
    nl = F.size(lines)
    wchars = F.aggregate(words, F.lit(0).cast("long"),
                         lambda acc, x: acc + F.length(x))
    symbols = (F.regexp_count(txt, F.lit("#"))
               + F.regexp_count(txt, F.lit(r"\.\.\.")))
    n_bullet = F.size(F.filter(
        lines, lambda x: x.startswith("•") | x.startswith("- ")))
    n_ellipsis = F.size(F.filter(
        lines, lambda x: x.endswith("...") | x.endswith("…")))
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    stop_lit = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, lambda x: F.lower(x))),
        stop_lit))
    div = lambda a, b: F.try_divide(a.cast("double"),  # noqa: E731
                                    b.cast("double"))
    mean_len = div(wchars, nw)
    sym_r = div(symbols, nw)
    bul_r = div(n_bullet, nl)
    ell_r = div(n_ellipsis, nl)
    alpha_r = div(n_alpha, nw)
    keep = ((nw >= min_words) & (nw <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (sym_r <= max_symbol_ratio)
            & F.coalesce(bul_r <= max_bullet_line_frac, F.lit(False))
            & F.coalesce(ell_r <= max_ellipsis_line_frac, F.lit(False))
            & (alpha_r >= min_alpha_word_frac)
            & (n_stop >= min_stopwords))
    rd = lambda c, name: F.round(F.coalesce(c, F.lit(0.0)),  # noqa: E731
                                 round_digits).alias(name)
    return df.select(
        F.col(id_col), nw.alias("n_words"),
        rd(mean_len, "mean_word_len"), rd(sym_r, "symbol_ratio"),
        rd(bul_r, "bullet_line_frac"), rd(ell_r, "ellipsis_line_frac"),
        rd(alpha_r, "alpha_word_frac"),
        n_stop.alias("n_stopwords_present"),
        F.coalesce(keep, F.lit(False)).alias("keep"))


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", *, min_words_per_line: int = 3,
             min_sentences: int = 5) -> DataFrame:
    """The C4 rule-based cleaner (Raffel et al. 2020, arXiv:1910.10683
    §2.2) — the RULE-driven complement of the statistical filters
    (:func:`quality_score` scores, :func:`drop_boilerplate_lines` needs
    corpus frequencies; this one is a fixed per-doc rulebook). Line
    rules: keep only trimmed lines that end in terminal punctuation
    (``. ! ? "``) AND have at least ``min_words_per_line`` words AND do
    not contain the word "javascript" (case-insensitive). Doc rules:
    ``keep_doc`` is false when the cleaned text has fewer than
    ``min_sentences`` terminal-punctuation sentences, or the ORIGINAL
    text contains "lorem ipsum" (case-insensitive) or a curly brace
    (code). Output: ``(id, clean_text, n_lines_kept, n_lines_dropped,
    keep_doc)`` — filter on ``keep_doc`` to apply, keep the column to
    audit.

    All row-local whole-stage codegen (split + HOF filter + regexp
    counts) — zero shuffle, zero joins, zero Python; the rulebook is a
    pure scan projection at any corpus size."""
    lines = F.filter(
        F.transform(F.split(F.coalesce(F.col(text_col), F.lit("")),
                            r"\r?\n"),
                    lambda x: F.trim(x)),
        lambda x: x != "")
    keep = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]$')
        & (F.size(F.filter(F.split(x, " "), lambda w: w != ""))
           >= min_words_per_line)
        & ~F.lower(x).contains("javascript"))
    clean = F.array_join(keep, "\n")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(keep).alias("n_lines_kept"),
        (F.size(lines) - F.size(keep)).alias("n_lines_dropped"),
        ((F.regexp_count(clean, F.lit(r"[.!?]")) >= min_sentences)
         & ~F.lower(F.coalesce(F.col(text_col), F.lit("")))
            .contains("lorem ipsum")
         & ~F.coalesce(F.col(text_col), F.lit("")).contains("{")
         & ~F.coalesce(F.col(text_col), F.lit("")).contains("}"))
        .alias("keep_doc"))


def remove_contaminated_spans(df: DataFrame, benchmark: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id", *, k: int = 10,
                              seed: int = 7,
                              round_digits: int = 6) -> DataFrame:
    """Span-level benchmark decontamination — the surgical alternative
    to :func:`~.decontam.decontaminate`'s doc-drop: delete ONLY the
    ``k``-token windows that occur verbatim in the eval set (the Lee et
    al. ExactSubstr rule pointed at a benchmark instead of the corpus
    itself), keeping the rest of the document. A doc that merely quotes
    one benchmark sentence loses that sentence, not its other 10k
    tokens. Same output contract as :func:`remove_duplicated_spans`:
    ``(id_col, clean_text, n_tokens, n_removed, removed_frac)``.

    Scale shape: the corpus side is remove_duplicated_spans' shape
    minus the gram-count shuffle — corpus window hashes join a
    BROADCAST distinct benchmark gram set (eval suites are small), so
    flagging is shuffle-free; then the shared per-doc rollup + row-local
    rewrite (one doc-keyed join, text moves once)."""
    from ..functions.exprs import explode_rows
    from .dedup import _spread

    tmp = "__span_words"
    pos_arr = F.expr(
        f"if(size({tmp}) >= {k},"
        f" transform(sequence(1, size({tmp}) - {k - 1}),"
        f" i -> struct(i AS p,"
        f" xxhash64(concat_ws(' ', slice({tmp}, i, {k})), {seed}) AS g)),"
        f" array())")
    gram_arr = F.expr(
        f"if(size({tmp}) >= {k},"
        f" transform(sequence(1, size({tmp}) - {k - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice({tmp}, i, {k})), {seed})),"
        f" array())")
    base = _spread(df.select(id_col, text_col), id_col).withColumn(
        tmp, F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    pos = explode_rows(base, [id_col], pos_arr, "__pg").select(
        id_col, F.col("__pg.p").alias("__p"), F.col("__pg.g").alias("__g"))
    bench = (benchmark.select(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                 .alias(tmp))
             .select(F.explode(gram_arr).alias("__g"))
             .dropDuplicates())
    flagged = pos.join(F.broadcast(bench), "__g", "left_semi")
    return _rewrite_without_spans(base, flagged, id_col, tmp, k,
                                  round_digits)
