"""Text-analysis operators for large-scale training-data pipelines:
token statistics, quality scoring, language identification, and document
fingerprinting. All pure JVM-side column expressions (whole-stage
codegen, no Python in the hot path) over a ``documents(doc_id, text)``
table — map-only, zero shuffle, linear scale-out.

These extend the reference's text toolkit (tools/TextTools.java:991,1245
charCount/getStringStats; getWords :315) to the corpus-statistics ops a
10^12-doc ingest needs; every operator has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nobletools_spark.functions.ids import doc_id_col, ws_tokens_col

from nobletools_spark.functions.hashing import HASH_MOD, h64

# Stop-word lists for the language-ID voting heuristic. Deterministic,
# tiny, broadcast as literals inside the plan (no lookup table needed).
# Top function words per language (public frequency lists) — the voting
# signal. Overlapping words across languages are expected; the argmax
# cascade resolves them. Both the Spark expression and the DuckDB oracle
# are generated from this one table.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "an", "of", "and", "to", "in", "is", "that", "it",
           "for", "on", "with", "as", "was", "at", "by", "be", "this",
           "are", "from", "or", "not", "but"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
           "zu", "den", "von", "mit", "auf", "für", "im", "des", "dem",
           "sich", "auch", "es", "als", "wie", "aus", "wird"),
    "es": ("el", "la", "los", "las", "y", "es", "que", "en", "un", "una",
           "del", "se", "no", "con", "por", "para", "su", "al", "lo",
           "como", "más", "pero", "sus", "le"),
    "fr": ("le", "la", "les", "et", "est", "une", "un", "dans", "des",
           "du", "que", "qui", "ne", "pas", "pour", "sur", "se", "ce",
           "il", "au", "plus", "par", "avec", "son"),
    "it": ("il", "lo", "le", "gli", "che", "di", "un", "una", "per",
           "non", "con", "si", "da", "come", "del", "della", "dei",
           "al", "ma", "anche", "più", "nel", "sono", "alla"),
    "nl": ("de", "het", "een", "en", "niet", "van", "dat", "die", "op",
           "te", "met", "voor", "aan", "er", "maar", "als", "ook", "om",
           "bij", "naar", "dan", "zijn", "uit", "worden"),
    "pt": ("o", "os", "as", "é", "em", "um", "uma", "do", "da", "dos",
           "das", "não", "com", "para", "por", "se", "no", "na", "mais",
           "ao", "seu", "sua", "ou", "quando"),
    "sv": ("och", "att", "det", "som", "en", "ett", "är", "av", "på",
           "med", "den", "till", "inte", "om", "har", "jag", "du",
           "han", "var", "men", "sig", "efter", "vid", "kan"),
}
LANGS = tuple(sorted(LANG_STOPWORDS))  # deterministic cascade order

# Unicode-script ranges voted AHEAD of the stopword cascade (a crawl
# corpus is mostly non-Latin by volume; stopword lists only separate
# Latin-script languages). Order is semantic: kana/hangul decide before
# han so Japanese/Korean text containing Chinese characters resolves to
# ja/ko, not zh. Ranges are the core BMP blocks; patterns are literal
# character classes so the Spark (Java) and DuckDB (RE2) regex engines
# see identical bytes.
SCRIPT_RANGES: dict[str, str] = {
    "kana": "぀-ヿ",      # hiragana + katakana
    "hangul": "가-힣",    # hangul syllables
    "han": "一-鿿",       # CJK unified ideographs
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "greek": "Ͱ-Ͽ",
}
SCRIPTS = tuple(SCRIPT_RANGES)    # decision order, not alphabetical
SCRIPT_LANG = {"kana": "ja", "hangul": "ko", "han": "zh",
               "cyrillic": "ru", "arabic": "ar", "greek": "el"}


def _tokens(col: str = "text") -> Column:
    """ids.ws_tokens_col — THE null-safe whitespace tokenization (NULL
    text ⇒ one '' token, so token_stats/quality_score/fingerprints emit
    real rows for NULL-text docs like every sibling operator)."""
    assert col == "text"
    from nobletools_spark.functions.ids import ws_tokens_col

    return ws_tokens_col()


# BPE-ish pre-tokenizer: alnum runs OR single non-alnum-non-space marks —
# the subword-count proxy used to estimate training-token budgets
BPE_TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts: (doc_id, n_tokens, n_distinct,
    distinct_ratio, avg_token_len, n_bpe_tokens) — whitespace counts
    plus the BPE-ish regex count (JVM regexp_extract_all)."""
    toks = _tokens()
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_bpe = F.size(F.expr(
        f"regexp_extract_all(lower(text), '{BPE_TOKEN_RE}', 0)"))
    return docs.select(
        doc_id_col(docs),
        n.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        (nd.cast("double") / n.cast("double")).alias("distinct_ratio"),
        (total_len.cast("double") / n.cast("double")).alias("avg_token_len"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
    )


def quality_score(docs: DataFrame,
                  stop_words: tuple[str, ...] = LANG_STOPWORDS["en"]) -> DataFrame:
    """Heuristic document-quality score: linear blend of lexical-diversity,
    non-stopword density, and token-length signals — the shape used to
    filter web-crawl training corpora. Deterministic double arithmetic
    (no transcendental fns) so the SQL oracle is bit-identical."""
    toks = _tokens()
    n = F.size(toks).cast("double")
    nd = F.size(F.array_distinct(toks)).cast("double")
    nstop = F.size(F.filter(toks, lambda t: t.isin(*stop_words))).cast("double")
    total_len = F.aggregate(toks, F.lit(0),
                            lambda acc, t: acc + F.length(t)).cast("double")
    distinct_ratio = nd / n
    stop_ratio = nstop / n
    avg_len = total_len / n
    quality = (F.lit(0.4) * distinct_ratio
               + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
               + F.lit(0.3) * F.least(avg_len / F.lit(8.0), F.lit(1.0)))
    return docs.select(
        doc_id_col(docs),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stop_ratio"),
        avg_len.alias("avg_token_len"),
        quality.alias("quality"),
    )


# classifier_score defaults, shared verbatim with the DuckDB oracle in
# __spark_entry__ so the two sides cannot silently desynchronize
CLF_SEED = 7
CLF_MIX = 2654435761  # Knuth multiplicative-hash constant
CLF_BUCKETS = 4096
CLF_SCALE = 1000
# b·CLF_MIX inside the default-weights fold must stay < 2^63:
# 2^31 · 2654435761 ≈ 5.7e18 < 2^63−1 (≈9.2e18)
_CLF_MAX_BUCKETS = 1 << 31


def classifier_score(docs: DataFrame, n_buckets: int = CLF_BUCKETS,
                     scale: int = CLF_SCALE, threshold: float = 0.0,
                     seed: int = CLF_SEED,
                     weights: "list[int] | None" = None,
                     hasher=None) -> DataFrame:
    """Model-based quality gate: a hashed bag-of-n-grams linear
    classifier over (unigram + bigram) features — the fastText-shaped
    scorer used for corpus filtering at crawl scale (quality/educational
    classifiers gating web text before training). ``quality_score``
    above is the heuristic-ratio gate; this is the learned-model gate's
    exact plan shape: per token one md5 + modulo into ``n_buckets``
    hash buckets, an integer weight per bucket, one in-array fold —
    all whole-stage-codegen column expressions, map-only, zero shuffle.

    ``weights`` is the trained model: ``n_buckets`` integer fixed-point
    weights (trained floats rounded to ``round(w·scale)``), inlined as
    an array literal and looked up with ``element_at`` inside the fold —
    the production path for any model that fits a plan literal (a 2^20
    float32 model is 4 MB — broadcast territory; same plan shape).
    When ``weights`` is None a deterministic function of the bucket id
    stands in (``(b·2654435761) mod (2·scale+1) − scale``, the Knuth
    multiplicative mix) since no learned artifact ships in this
    sandbox — identical plan, identical cost, exercised by the same
    oracle. Scoring is integer fixed-point: ``logit_fp`` is an exact
    BIGINT sum (order-free, bit-reproducible across partitionings and
    engines); ``score = logit_fp / (scale·n_features)`` is one IEEE
    division of exactly-agreed integers, so the DuckDB oracle matches
    bit-for-bit. NULL text scores as the empty document ('' token).

    ``hasher`` follows the hashing-module convention: a
    ``Column -> Column`` bucket-hash builder over the seeded feature
    string; default ``h64`` (md5-derived, DuckDB-replayable). On a
    real cluster swap ``hasher=F.xxhash64`` — same plan shape, ~3x
    cheaper per feature, no oracle parity needed there.

    Output: (doc_id, n_features, logit_fp, score, keep) with
    ``keep = score >= threshold``.
    """
    if not 1 <= n_buckets <= _CLF_MAX_BUCKETS:
        raise ValueError(
            f"n_buckets must be in [1, {_CLF_MAX_BUCKETS}] (the default"
            f"-weights mix overflows BIGINT past that)")
    if weights is not None and len(weights) != n_buckets:
        raise ValueError(
            f"weights must have exactly n_buckets={n_buckets} entries,"
            f" got {len(weights)}")
    hasher = hasher or h64
    pre = F.lit(f"{seed}|")
    toks = ws_tokens_col()
    nt = F.size(toks)
    bmod = F.lit(int(n_buckets))
    # pmod, not %: xxhash64 yields negative longs and a negative bucket
    # would break both weight paths; for the non-negative default h64
    # pmod == %, so oracle parity is unaffected
    uni = F.transform(toks,
                      lambda t: F.pmod(hasher(F.concat(pre, t)), bmod))
    big = F.zip_with(
        F.slice(toks, 1, nt - F.lit(1)),
        F.slice(toks, 2, nt - F.lit(1)),
        lambda a, b: F.pmod(hasher(
            F.concat(pre, a, F.lit(" "), b)), bmod))
    feats = F.concat(uni, big)
    if weights is not None:
        warr = F.lit([int(w) for w in weights])
        logit = F.aggregate(
            feats, F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(
                warr, (b + F.lit(1)).cast("int")).cast("long"))
    else:
        wmod = F.lit(2 * int(scale) + 1)
        logit = F.aggregate(
            feats, F.lit(0).cast("long"),
            lambda acc, b: acc + (b * F.lit(CLF_MIX)) % wmod
            - F.lit(int(scale)))
    nf = F.size(feats).cast("long")
    score = logit.cast("double") / (nf * F.lit(int(scale))).cast("double")
    return docs.select(
        doc_id_col(docs),
        nf.alias("n_features"),
        logit.alias("logit_fp"),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array = max
    occurrence count of any element — computed as a single map-side
    left fold (struct state: prev/run/best), no explode, no shuffle.
    The DuckDB oracle computes the same integer via unnest + GROUP BY +
    max(count); identical ints either way."""
    init = F.struct(F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"))

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4-style filters a
    crawl-scale training corpus needs): per document, the most frequent
    token's share, the most frequent word-bigram's share, and the
    duplicate-token fraction. Map-only whole-stage codegen: occurrence
    maxima come from a sorted-array fold (no explode→groupBy shuffle —
    that formulation is corpus×tokens shuffle at 10^12 docs; the fold
    is linear per row)."""
    # null-safe: a NULL text tokenizes as [''] (n=1) on both engines
    d = docs.select(doc_id_col(docs),
                    ws_tokens_col()
                    .alias("toks"))
    n = F.size(F.col("toks"))
    d = d.withColumn("n", n) \
         .withColumn("bigrams", F.zip_with(
             F.slice(F.col("toks"), 1, F.greatest(n - 1, F.lit(0))),
             F.slice(F.col("toks"), 2, F.greatest(n - 1, F.lit(0))),
             lambda a, b: F.concat_ws(" ", a, b)))
    top_tok = _max_run(F.array_sort(F.col("toks")))
    top_bi = F.when(F.size(F.col("bigrams")) > 0,
                    _max_run(F.array_sort(F.col("bigrams")))) \
              .otherwise(F.lit(0).cast("long"))
    nd = F.size(F.array_distinct(F.col("toks")))
    return d.select(
        "doc_id", F.col("n").cast("long").alias("n_tokens"),
        top_tok.alias("top_token_n"),
        (top_tok.cast("double") / F.col("n")).alias("top_token_ratio"),
        top_bi.alias("top_bigram_n"),
        F.when(F.size(F.col("bigrams")) > 0,
               top_bi.cast("double") / F.size(F.col("bigrams")))
         .otherwise(F.lit(0.0)).alias("top_bigram_ratio"),
        (F.lit(1.0) - nd.cast("double") / F.col("n"))
        .alias("dup_token_ratio"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Split documents into fixed token-window chunks with overlap —
    the context-window packing prep step of a training pipeline.
    Chunk k covers tokens [1 + k·(chunk_tokens − overlap), …] of the
    whitespace tokenization, the final chunk is whatever remains
    (≥ overlap + 1 tokens by construction), and docs at or under
    chunk_tokens stay whole. Returns (doc_id, chunk_id, text,
    n_tokens) with text rejoined by single spaces.

    Scale shape: map-only explode (Generate + immediate projection),
    zero shuffle, whole-stage codegen; output row count ≈
    corpus_tokens / (chunk_tokens − overlap)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"{overlap} / {chunk_tokens}")
    step = chunk_tokens - overlap
    toks = ws_tokens_col()
    d = docs.select(doc_id_col(docs),
                    toks.alias("toks"))
    n = F.size(F.col("toks"))
    starts = F.when(n > chunk_tokens,
                    F.sequence(F.lit(1), n - overlap, F.lit(step))) \
              .otherwise(F.array(F.lit(1)))
    d = d.select("doc_id", "toks",
                 F.posexplode(starts).alias("chunk_id", "s"))
    piece = F.slice(F.col("toks"), F.col("s"), chunk_tokens)
    n_tok = F.least(F.lit(chunk_tokens), F.size(F.col("toks")) - F.col("s")
                    + 1)
    return d.select("doc_id", "chunk_id",
                    F.array_join(piece, " ").alias("text"),
                    n_tok.cast("long").alias("n_tokens"))


def sample_to_token_budget(docs: DataFrame, budgets,
                           group_col: str | None = None,
                           n_buckets: int = 1024,
                           salt: str = "tb0") -> DataFrame:
    """Deterministic token-budget sampling — the training-MIXTURE
    construction step: within each group (language, domain, source),
    documents are taken in stable hash order until the group's token
    budget is reached, i.e. a doc is kept iff the cumulative token
    count of the docs hash-ordered before it is < budget (so the
    budget may overshoot by at most one document per group).
    ``budgets`` is an int (single global budget, group_col=None) or a
    dict {group value → budget}; groups absent from the dict are
    dropped (a mixture spec is exhaustive). Returns (doc_id, grp,
    n_tokens). Same keys + salt ⇒ same sample on any cluster, any
    partitioning, any engine.

    Scale shape — the naive form is a whole-group window sort (one
    reducer holds an entire 100 TB language!). Instead: docs map-side
    get a 60-bit hash and a hash-RANGE bucket (top ``log2 n_buckets``
    bits, order-preserving); one tiny (groups × buckets) sum
    aggregation is collected and prefix-scanned on the driver
    (limit-probe-sized decision table, same pattern as the closure
    fast paths); buckets wholly inside the budget join back
    broadcast; ONLY the single boundary bucket per group (~1/n_buckets
    of the group) pays a window sort."""
    if (n_buckets & (n_buckets - 1)) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    if isinstance(budgets, int):
        if group_col is not None:
            raise ValueError("int budget requires group_col=None")
        budgets = {"": budgets}
    elif group_col is None:
        raise ValueError("dict budgets require a group_col")
    from nobletools_spark.functions.hashing import h64

    bits = n_buckets.bit_length() - 1
    # grp/h are join keys below: coalesce marks them non-nullable so
    # no scan-level isnotnull(<md5 chain>) filter is inferred (NULL
    # group values — only possible via a NULL group column — sample as
    # the '' group)
    grp = F.coalesce((F.col(group_col) if group_col else F.lit(""))
                     .cast("string"), F.lit(""))
    d = docs.select(
        doc_id_col(docs),
        grp.alias("grp"),
        F.size(ws_tokens_col())
        .cast("long").alias("n_tokens"),
        F.coalesce(h64(F.concat(F.lit(f"{salt}|"),
                                F.col("doc_id").cast("string"))),
                   F.lit(0).cast("long")).alias("h"))
    d = d.withColumn("bucket", F.shiftright(F.col("h"), 60 - bits))
    # restrict to the BUDGETED groups before aggregating: the mixture
    # spec is exhaustive (unbudgeted groups are dropped anyway), and
    # without the filter the collected sum table is (data-groups ×
    # buckets)-sized — millions of rows for a by-domain web corpus,
    # not the |budgets|-bounded decision table the driver expects
    budget_keys = [str(g) for g in budgets]
    d = d.filter(F.col("grp").isin(budget_keys))
    by_group: dict[str, dict[int, int]] = {}
    for r in (d.groupBy("grp", "bucket")
              .agg(F.sum("n_tokens").alias("s")).collect()):
        by_group.setdefault(r["grp"], {})[r["bucket"]] = r["s"]
    full_rows, bound_rows = [], []
    for g, budget in budgets.items():
        g = str(g)
        prefix = 0
        gsums = by_group.get(g, {})
        for b in sorted(gsums):
            s = gsums[b]
            if prefix + s <= budget:
                full_rows.append((g, b))
            elif prefix < budget:
                bound_rows.append((g, b, prefix, budget))
            prefix += s
    spark = docs.sparkSession
    out_cols = ["doc_id", "grp", "n_tokens"]
    from nobletools_spark.session import local_table

    # decision tables are (groups × buckets)-sized: JVM LocalRelations,
    # so the broadcast builds never spawn Python workers
    full_df = local_table(spark, full_rows or [],
                          "grp string, bucket long")
    kept = d.join(F.broadcast(full_df), ["grp", "bucket"]).select(*out_cols)
    if bound_rows:
        from pyspark.sql import Window

        bdf = local_table(
            spark, bound_rows,
            "grp string, bucket long, prefix long, budget long")
        w = (Window.partitionBy("grp").orderBy("h", "doc_id")
             .rowsBetween(Window.unboundedPreceding, 0))
        boundary = (d.join(F.broadcast(bdf), ["grp", "bucket"])
                    .withColumn("cum", F.sum("n_tokens").over(w))
                    .filter(F.col("prefix") + F.col("cum")
                            - F.col("n_tokens") < F.col("budget"))
                    .select(*out_cols))
        kept = kept.unionByName(boundary)
    return kept


def filter_decisions(docs: DataFrame, *,
                     min_tokens: int = 20, max_tokens: int = 50_000,
                     min_avg_token_len: float = 2.0,
                     max_avg_token_len: float = 12.0,
                     min_stop_ratio: float = 0.02,
                     max_top_token_ratio: float = 0.15,
                     max_dup_token_ratio: float = 0.55,
                     stop_words: tuple[str, ...] = LANG_STOPWORDS["en"],
                     ) -> DataFrame:
    """Gopher-style composite corpus-filter decision (Rae et al. 2021
    Table A1's shape): evaluate the cheap per-document signals — token
    count bounds, mean token length bounds, stopword density,
    top-token share, duplicate-token fraction — in ONE map-only pass
    and emit (doc_id, n_tokens, keep, reason) where ``reason`` names
    the FIRST failing rule in documentation order ('kept' when none).
    This is the decision step a training pipeline joins against to
    materialize the filtered corpus.

    Scale shape: zero shuffle, whole-stage codegen; the token array is
    staged once as a named column so each signal traverses it once.
    The output carries no float columns, and both engines derive the
    comparison inputs with the identical IEEE arithmetic already
    pinned bit-for-bit by text_quality / text_repetition — so the
    boolean/string outputs are exactly reproducible."""
    d = docs.select(
        doc_id_col(docs),
        ws_tokens_col().alias("toks"))
    n = F.size(F.col("toks"))
    nd = F.size(F.array_distinct(F.col("toks")))
    nstop = F.size(F.filter(F.col("toks"),
                            lambda t: t.isin(*stop_words)))
    total_len = F.aggregate(F.col("toks"), F.lit(0),
                            lambda acc, t: acc + F.length(t))
    dn = n.cast("double")
    avg_len = total_len.cast("double") / dn
    stop_ratio = nstop.cast("double") / dn
    top_ratio = _max_run(F.array_sort(F.col("toks"))).cast("double") / dn
    dup_ratio = F.lit(1.0) - nd.cast("double") / dn
    reason = (F.when(n < min_tokens, "too_few_tokens")
              .when(n > max_tokens, "too_many_tokens")
              .when(avg_len < min_avg_token_len, "short_tokens")
              .when(avg_len > max_avg_token_len, "long_tokens")
              .when(stop_ratio < min_stop_ratio, "low_stopword_density")
              .when(top_ratio > max_top_token_ratio, "repetitive_top_token")
              .when(dup_ratio > max_dup_token_ratio, "high_duplicate_tokens")
              .otherwise("kept"))
    return d.select("doc_id", n.cast("long").alias("n_tokens"),
                    (reason == "kept").alias("keep"),
                    reason.alias("reason"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Script-then-stopword language ID, all JVM-side (regexp_count +
    array filters, zero shuffle):

    1. Unicode-script vote (r2 verdict task #7): any kana → ja, hangul
       → ko, han → zh, then cyrillic → ru / arabic → ar / greek → el —
       script presence beats stopword counts because stopword lists
       only discriminate between Latin-script languages.
    2. Stopword vote for Latin text: per language, count tokens in its
       list; argmax with a fixed cascade (sorted languages, first
       maximal wins, all-zero → 'und')."""
    toks = F.coalesce(_tokens(), F.array().cast("array<string>"))
    def _vote(ws: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*ws))).cast("long")

    votes = {lang: _vote(ws) for lang, ws in LANG_STOPWORDS.items()}
    txt = F.coalesce(F.col("text"), F.lit(""))  # NULL text → 0 counts,
    #                        like repetition_stats/duplicated_window_spans
    sc = {s: F.regexp_count(txt, F.lit(f"[{r}]")).cast("long")
          for s, r in SCRIPT_RANGES.items()}
    expr = None
    for s in SCRIPTS:  # script cascade first, in SCRIPTS order
        w = (sc[s] > 0, F.lit(SCRIPT_LANG[s]))
        expr = F.when(*w) if expr is None else expr.when(*w)
    for lang in LANGS:  # CASE cascade: first maximal wins
        cond = (votes[lang] > 0)
        for other in LANGS:
            if other != lang:
                cond = cond & (votes[lang] >= votes[other])
        expr = expr.when(cond, F.lit(lang))
    pred = expr.otherwise(F.lit("und"))
    cols = [doc_id_col(docs),
            pred.alias("lang_pred")]
    cols += [votes[lang].alias(f"votes_{lang}") for lang in LANGS]
    cols += [sc[s].alias(f"sc_{s}") for s in SCRIPTS]
    return docs.select(*cols)


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints, all JVM-side:
    - content_md5: exact-duplicate key (raw text)
    - bag_sig:     word-set signature (order/multiplicity-insensitive) —
                   md5 of the sorted distinct token list
    - rolling_h:   order-sensitive polynomial rolling hash over 60-bit
                   token hashes, mod 2^31 (left fold ⇒ overflow-free and
                   reproducible by DuckDB's list_reduce)
    """
    toks = _tokens()
    bag = F.array_sort(F.array_distinct(toks))
    rolling = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + h64(t)) % F.lit(HASH_MOD))
    return docs.select(
        doc_id_col(docs),
        # NULL coalesced: a NULL-text doc keys as the empty doc, never
        # as a NULL key a downstream dedup group-by would collapse
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("content_md5"),
        F.md5(F.concat_ws(" ", bag)).alias("bag_sig"),
        rolling.alias("rolling_h"),
    )


# PII patterns (pure JVM regexp_replace — zero Python in the hot path).
# Deliberately conservative/deterministic: emails, US-style phone
# numbers, SSNs, IPv4s, and long digit runs (card-like). The clinical
# **TAG[...]** DeID convention is handled separately by
# functions/textkit.filter_deid_tags (length-preserving).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # no leading \b: it cannot assert before '(' (both sides non-word),
    # and RE2 (the DuckDB oracle engine) has no lookbehind alternative
    (r"(?:\+?1[-. ])?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b",
     "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<NUMBER>"),
)


def pii_scrub(docs: DataFrame,
              patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
              ) -> DataFrame:
    """Corpus-scale PII scrubbing: chained ``regexp_replace`` over the
    text column (whole-stage codegen, no shuffle, no Python) plus a
    per-document count of replacements made — (doc_id, text, n_pii).
    The count is computed as the token-length delta of each rewrite
    round so the scan stays single-pass per pattern."""
    out = F.coalesce(F.col("text"), F.lit(""))  # null text scrubs to ""
    hits = F.lit(0).cast("long")
    for pat, repl in patterns:
        hits = hits + F.size(F.split(out, pat)) - 1
        out = F.regexp_replace(out, pat, repl)
    return docs.select(doc_id_col(docs),
                       out.alias("text"), hits.alias("n_pii"))


def sample_by_hash(docs: DataFrame, rate: float,
                   key: str = "doc_id", salt: str = "s0") -> DataFrame:
    """Deterministic reproducible sampling: keep a document iff the
    first 8 md5 hex digits of (salt || key) fall under ``rate`` of the
    32-bit space. Unlike ``DataFrame.sample`` this is stable across
    runs, partitionings, and engines (the DuckDB oracle reproduces it
    bit-exactly) — the property a training-corpus subset needs for
    reproducibility. Adding documents never changes the verdict for
    existing ones (pure function of the key), so incremental corpus
    builds stay consistent."""
    threshold = int(rate * (1 << 32))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8),
        16, 10).cast("long")
    return docs.filter(h < F.lit(threshold))


def vocab_top_k(docs: DataFrame, k: int = 1000) -> DataFrame:
    """Global top-k pre-token vocabulary — the tokenizer-training prep
    step: BPE-ish pre-tokens (the same ``BPE_TOKEN_RE`` family as
    ``token_stats``) counted corpus-wide with document frequency,
    ranked by (cnt desc, token asc) so the top-k SET is fixed by a
    total order (engine-independent, no arbitrary ties at the k-th
    row). Returns (token, cnt, n_docs).

    Scale shape: per-document term frequencies are computed entirely
    MAP-SIDE by a sorted-array boundary fold (the same idiom as
    ``repetition_stats`` — each document's tokens live in one row, so
    no (doc, token) shuffle exists at all); the ONLY exchange is the
    token rollup, carrying one row per document-distinct token; the
    top-k is TakeOrderedAndProject (per-partition k-row heap, driver
    merge of k·partitions rows) — never a global sort.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    # sorted tokens → boundary start indices → (token, tf) structs,
    # all within the row (empty guards: sequence(0,-1) DESCENDS)
    d = docs.select(
        doc_id_col(docs),
        F.expr(f"array_sort(regexp_extract_all(lower(coalesce(text, "
               f"'')), '{BPE_TOKEN_RE}', 0))").alias("_ts"))
    d = d.withColumn("_bs", F.expr(
        "CASE WHEN size(_ts) = 0 THEN array() "
        "ELSE filter(sequence(0, size(_ts) - 1), "
        "            i -> i = 0 OR _ts[i] != _ts[i - 1]) END"))
    pairs = F.expr(
        "CASE WHEN size(_bs) = 0 THEN "
        " CAST(array() AS array<struct<token:string, tf:bigint>>)"
        " ELSE transform(sequence(0, size(_bs) - 1),"
        "  j -> struct(_ts[_bs[j]] AS token,"
        "   CAST(IF(j = size(_bs) - 1, size(_ts), _bs[j + 1])"
        "        - _bs[j] AS BIGINT) AS tf)) END")
    per_doc = d.select("doc_id", F.explode(pairs).alias("p"))
    counts = (per_doc
              .groupBy(F.col("p.token").alias("token"))
              .agg(F.sum("p.tf").cast("long").alias("cnt"),
                   F.count("*").cast("long").alias("n_docs")))
    return (counts
            .orderBy(F.col("cnt").desc(), F.col("token").asc())
            .limit(k))


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   n_shards: int = 256, sep_tokens: int = 1,
                   salt: str = "pk0") -> DataFrame:
    """Concat-and-chop sequence packing offsets — the final pretraining
    layout step: documents are hash-assigned to one of ``n_shards``
    output shards, concatenated in doc_id order within the shard (each
    document followed by ``sep_tokens`` separator tokens, e.g. EOS),
    and the shard's token stream is chopped into fixed ``seq_len``
    training sequences (documents split at sequence boundaries, the
    standard GPT-style packing). Returns per document (doc_id, shard,
    start_tok, n_tokens, first_seq, last_seq): where its whitespace
    tokens land in the shard stream and which packed sequences it
    spans. Deterministic: same keys + salt ⇒ same layout on any
    cluster, any partitioning, any engine.

    Scale shape: map-side token counts + shard hash, ONE shuffle on
    shard, one window cumsum per shard. The per-shard cumsum is
    sequential by definition — a packed shard IS one ordered stream —
    so ``n_shards`` is the parallelism knob exactly like output-file
    sharding: at 100 TB set n_shards so one shard's documents fit a
    task (e.g. 2^16 shards → ~1.5 GB of text each); at local test
    scale the default keeps every core busy.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    if sep_tokens < 0:
        raise ValueError(f"sep_tokens must be >= 0: {sep_tokens}")
    from pyspark.sql import Window

    n = F.size(ws_tokens_col())
    # coalesce marks the shard key non-nullable: no inferred
    # isnotnull(<md5 chain>) scan filter re-evaluating the hash
    shard = F.pmod(
        F.coalesce(h64(F.concat(F.lit(f"{salt}|"),
                                F.col("doc_id").cast("string"))),
                   F.lit(0).cast("long")),
        F.lit(n_shards))
    d = docs.select(doc_id_col(docs), shard.alias("shard"),
                    n.cast("long").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(
        F.sum(F.col("n_tokens") + F.lit(sep_tokens)).over(w),
        F.lit(0).cast("long"))
    d = d.withColumn("start_tok", start)
    # the doc's own last token (the trailing separator occupies stream
    # positions — it shifts later docs — but is not part of this doc's
    # span); integral `div`, not floor(double /): exact at any offset
    return d.select(
        "doc_id", "shard", "start_tok", "n_tokens",
        F.expr(f"start_tok div {seq_len}").alias("first_seq"),
        F.expr(f"(start_tok + n_tokens - 1) div {seq_len}")
        .alias("last_seq"))


def pack_manifest(docs: DataFrame, seq_len: int = 2048,
                  n_shards: int = 256, sep_tokens: int = 1,
                  salt: str = "pk0") -> DataFrame:
    """Per-SEQUENCE view of the concat-and-chop layout — the manifest a
    shard writer consumes: one row per packed training sequence with
    the documents contributing tokens to it, in stream order. Returns
    (shard, seq, n_docs, doc_ids sorted array, n_doc_tokens = how many
    of the sequence's token slots hold document text — the rest are
    separators or, in a shard's final sequence, padding).

    Scale shape: pack_sequences' per-doc spans explode into one row
    per (doc, touched sequence) — each doc touches
    ceil(n_tokens/seq_len)+1 sequences at most, so the explode is
    ~|docs| rows — then a (shard, seq)-keyed aggregation that REUSES
    pack_sequences' shard partitioning (ClusteredDistribution on a
    prefix key is already satisfied): ONE exchange total.
    """
    d = pack_sequences(docs, seq_len=seq_len, n_shards=n_shards,
                       sep_tokens=sep_tokens, salt=salt)
    seq = F.explode(F.sequence(F.col("first_seq"),
                               F.col("last_seq"))).alias("seq")
    # tokens of THIS doc landing inside sequence [seq*L, (seq+1)*L)
    lo = F.greatest(F.col("seq") * seq_len, F.col("start_tok"))
    hi = F.least((F.col("seq") + 1) * seq_len,
                 F.col("start_tok") + F.col("n_tokens"))
    occ = (d.select("doc_id", "shard", "start_tok", "n_tokens", seq)
           .withColumn("in_seq", (hi - lo).cast("long")))
    return (occ.groupBy("shard", "seq")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
                 F.sum("in_seq").alias("n_doc_tokens")))


def shuffle_assignments(docs: DataFrame, n_shards: int = 64,
                        seed: int = 11) -> DataFrame:
    """Deterministic global corpus shuffle — the reproducible training
    order a data pipeline needs before packing/serving: every document
    gets (shard, pos) from a seeded content-independent hash, so the
    permutation is a pure function of (doc_id, seed) — stable across
    runs, partitionings, engines, and corpus growth (appending docs
    never reorders existing (shard, pos<=their pos) prefixes within a
    shard only when ids are new; re-seeding reshuffles globally).

    Scale design: shard = h64(seed|doc_id) mod n_shards, pos = rank of
    the hash within the shard — ONE shuffle keyed on shard and an
    in-shard sort; NEVER a global total-order sort (a 10^12-doc global
    row_number would funnel through one range-partition boundary
    computation and a single final-rank pass). n_shards is the
    parallelism/file-size knob, exactly like output sharding; readers
    consume shards in any order and within-shard order is the training
    order."""
    from pyspark.sql import Window

    from nobletools_spark.functions.hashing import h64_seeded

    did = doc_id_col(docs)
    h = h64_seeded(seed, did.cast("string"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (docs.select(did, h.alias("h"),
                        (h % n_shards).alias("shard"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .select("doc_id", F.col("shard").cast("long").alias("shard"),
                    "pos"))
