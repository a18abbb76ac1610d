"""Deduplication operators for web-scale training corpora: exact
(hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and embedding
near-duplicates. All pure DataFrame expressions (whole-stage codegen) —
the only Python is plan construction.

Scale design (the part that must survive 100 TB):
- Exact / bag dedup: one shuffle on a 60-bit signature — uniform keys,
  AQE-coalesced.
- MinHash signatures are computed map-side as K independent
  ``array_min(transform(shingles, ...))`` columns (no explode, no
  shuffle); only the banded LSH bucket join shuffles, and it shuffles
  *band keys*, not shingles. Pathologically hot buckets (boilerplate
  documents) are capped with ``max_bucket`` — the blacklist analog
  (util/BlacklistHandler.java) for dedup.
- Pairwise Jaccard is never run all-pairs at scale: candidates come from
  LSH buckets (or an explicit grouping column for the oracle-checked
  variant); verification joins shingle sets back per candidate pair.
- Hashes are md5-derived 60-bit ints for cross-engine oracle parity;
  swap the builder for xxhash64 on a real cluster (functions/hashing.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from nobletools_spark.functions.ids import (
    _INTEGRAL, doc_id_col, tok_docs, ws_tokens_col)

from nobletools_spark.functions.hashing import h64

P31 = 2147483647  # Mersenne prime 2^31-1: the minhash arithmetic field


def h32(col: Column) -> Column:
    """32-bit portable token hash (first 8 hex digits of md5) — small
    enough that affine combinations stay overflow-free in int64 on both
    engines (DuckDB raises on BIGINT overflow; Java wraps — either would
    break parity)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_coeffs(num_hashes: int, seed: int = 13) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine coefficients in [1, P31); shared
    verbatim by the SQL oracle."""
    rng = np.random.default_rng(seed)
    return [(int(rng.integers(1, P31)), int(rng.integers(0, P31)))
            for _ in range(num_hashes)]


# fixed combiner weights for n-gram token-hash composition (n ≤ 5)
SHINGLE_WEIGHTS = (1000003, 999983, 999979, 999961, 999959)


def _tokens(col: str = "text") -> Column:
    """ids.ws_tokens_col — THE null-safe whitespace tokenization (NULL
    text ⇒ one \'\' token, so every operator emits a row for every
    input document). The alias exists for call-site brevity only."""
    assert col == "text"
    return ws_tokens_col()


NEAR_DUP_ID_OFFSET = 10_000_000


def with_near_duplicates(docs: DataFrame) -> DataFrame:
    """Deterministic near-duplicate augmentation for end-to-end dedup
    checks: union the corpus with a copy of every document minus its
    first token (doc_id + NEAR_DUP_ID_OFFSET). The planted pairs have
    Jaccard ≈ (s-n)/(s+n-? ) ≫ any random pair, so LSH must recover
    them. Derived purely from the input — no external data.

    Requires an integral doc_id (the clone ids are offsets): loud
    ValueError for string/decimal ids — an ANSI runtime would throw a
    CAST_INVALID_INPUT deep inside the plan, a non-ANSI one would
    silently merge every clone under one NULL id."""
    if not isinstance(docs.schema["doc_id"].dataType, _INTEGRAL):
        raise ValueError(
            "with_near_duplicates needs an integral doc_id to derive "
            f"clone ids; got {docs.schema['doc_id'].dataType}")
    toks = _tokens()
    clone = docs.select(
        (F.col("doc_id").cast("long") + F.lit(NEAR_DUP_ID_OFFSET)).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 2, F.size(toks) - 1)).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")])
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text",
                       *[c for c in docs.columns if c not in ("doc_id", "text")])
    return base.unionByName(clone)


def _wins_expr(window: int) -> Column:
    """Array of 60-bit hashes of every ``window``-token sliding window
    of the staged ``toks`` column (element k = window starting at
    1-based token k+1; empty for shorter docs).

    Returned as a raw EXPRESSION to explode directly, never as a named
    column: naming it lets InferFiltersFromConstraints derive a
    scan-level `size(wins) > 0` filter with the whole md5 chain
    inlined, silently hashing every window TWICE (a measured 2.5×
    regression)."""
    n = F.size(F.col("toks"))
    # guard: Spark sequence(1, 0) would COUNT DOWN ([1, 0]) — short
    # docs must yield no windows, not phantom ones
    starts = F.when(n >= window, F.sequence(F.lit(1), n - window + 1)) \
              .otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: h64(
        F.concat_ws(" ", F.slice(F.col("toks"), i, window))))


def duplicated_window_spans(docs: DataFrame, window: int = 8,
                            min_count: int = 2) -> DataFrame:
    """Exact duplicated-token-window detection — the boilerplate /
    repeated-passage signal of substring-level corpus dedup (the
    fixed-window simplification of suffix-array training-data dedup,
    Lee et al. 2022): hash every ``window``-token sliding window
    map-side, then one count aggregation keyed by the 60-bit hash.
    Returns (whash, n_occ, n_docs) for windows occurring ≥ min_count
    times corpus-wide.

    Scale shape: windows never materialize as strings off the map side
    — only their hashes shuffle (same single-shuffle profile as
    exact_dedup); a hot boilerplate window is a single counter cell,
    not a join side, so no skew cap is needed."""
    return (tok_docs(docs)
            .select("doc_id", F.explode(_wins_expr(window)).alias("whash"))
            .groupBy("whash")
            .agg(F.count("*").alias("n_occ"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_occ") >= min_count))


def strip_duplicated_windows(docs: DataFrame, window: int = 8,
                             min_count: int = 2) -> DataFrame:
    """Substring-level dedup, the removal step: every token covered by
    a ``window``-token window whose exact text occurs ≥ ``min_count``
    times corpus-wide is deleted (ALL copies — the aggressive
    boilerplate-removal mode), and documents are reassembled from the
    surviving tokens → (doc_id, text). Output text is the surviving
    tokens joined by single spaces (whitespace-normalized by
    construction, like any token-level rewrite).

    Scale shape: per-doc window hashes map-side; one count shuffle on
    the hash; one hash-keyed semi-join of the exploded occurrences
    against the (duplicates-only, far smaller) hot table; one doc-keyed
    regroup of hot starts; one doc-keyed join back. The window hashes
    are DELIBERATELY computed twice (once feeding the count, once
    feeding the semi-join probe): the single-evaluation alternatives
    all materialize or shuffle the corpus×windows occurrence table
    (persist, or a count-over-window instead of groupBy+join), and at
    100 TB that I/O dwarfs the map-side md5 recompute. Coverage
    marking is a JVM array lambda, O(tokens × covered-positions) per
    document — fine for web-document lengths; chunk book-length docs
    upstream."""
    base = tok_docs(docs)
    occ = base.select("doc_id",
                      F.posexplode(_wins_expr(window)).alias("pos0",
                                                             "whash"))
    hot = (occ.groupBy("whash").agg(F.count("*").alias("n_occ"))
           .filter(F.col("n_occ") >= min_count))
    hot_starts = (occ.join(hot.select("whash"), "whash")
                  .groupBy("doc_id")
                  .agg(F.collect_list(F.col("pos0") + 1).alias("starts")))
    covered = F.array_distinct(F.flatten(F.transform(
        F.coalesce(F.col("starts"), F.array().cast("array<int>")),
        lambda s: F.sequence(s, s + window - 1))))
    joined = (base.join(hot_starts, "doc_id", "left")
              .withColumn("covered", covered))
    kept = F.filter(
        F.col("toks"),
        lambda x, i: ~F.array_contains(F.col("covered"), i + 1))
    return joined.select("doc_id", F.array_join(kept, " ").alias("text"))


def _exploded_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, line_no, line): one row per newline-delimited line."""
    return docs.select(
        doc_id_col(docs),
        F.posexplode(F.split(F.coalesce(F.col("text"), F.lit("")), "\n"))
        .alias("line_no", "line"))


def _dup_line_table(lines: DataFrame, min_count: int,
                    min_len: int) -> DataFrame:
    """(line, n_occ, keeper struct<doc_id,line_no>) for every line of
    ≥ min_len chars occurring ≥ min_count times corpus-wide; keeper =
    the lexicographically first occurrence."""
    return (lines.filter(F.length("line") >= min_len)
            .groupBy("line")
            .agg(F.count("*").alias("n_occ"),
                 F.min(F.struct("doc_id", "line_no")).alias("keeper"))
            .filter(F.col("n_occ") >= min_count))


def duplicated_lines(docs: DataFrame, min_count: int = 2,
                     min_len: int = 10) -> DataFrame:
    """Global exact line-duplication table (the detection half of
    C4-style line dedup, Raffel et al. 2020 §2.2): (line, n_occ,
    keeper_doc_id, keeper_line_no) for every line of ≥ ``min_len``
    characters whose exact text occurs ≥ ``min_count`` times in the
    corpus. ``min_len`` keeps blank/trivial lines (which would
    otherwise all collide) out of the table.

    Scale shape: explode is map-side; the single groupBy on the line
    text partial-aggregates map-side, so a boilerplate line repeated
    10^9 times arrives at its reducer as one pre-combined cell per
    upstream partition, not 10^9 rows."""
    return (_dup_line_table(_exploded_lines(docs), min_count, min_len)
            .select("line", "n_occ",
                    F.col("keeper.doc_id").alias("keeper_doc_id"),
                    F.col("keeper.line_no").alias("keeper_line_no")))


def strip_duplicated_lines(docs: DataFrame, min_count: int = 2,
                           min_len: int = 10) -> DataFrame:
    """C4-style global line dedup, the removal step: every line whose
    exact text occurs ≥ ``min_count`` times corpus-wide is deleted
    from every document EXCEPT its single keeper occurrence (the
    first by (doc_id, line_no)), and documents are reassembled in
    original line order → (doc_id, text). Documents whose every line
    was removed come back with empty text rather than vanishing.

    Scale shape (the C4 recipe's distributed form): map-side explode →
    one partial-agg count/keeper shuffle on the line text → one join
    of the exploded lines against the (much smaller, AQE-broadcastable
    when thresholds are high) duplicate table → one groupBy doc_id to
    reassemble. Nothing is all-pairs; the hot line is a counter cell
    and a single join row, never a join side."""
    lines = _exploded_lines(docs)
    dup = _dup_line_table(lines, min_count, min_len)
    kept = (lines.join(dup.select("line", "keeper"), "line", "left")
            .filter(F.col("keeper").isNull()
                    | ((F.col("keeper.doc_id") == F.col("doc_id"))
                       & (F.col("keeper.line_no") == F.col("line_no")))))
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"]),
            "\n").alias("text"))
    return (docs.select(doc_id_col(docs))
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text", F.lit("")).alias("text")))


def flag_contaminated(docs: DataFrame, benchmark_texts: list[str],
                      window: int = 13) -> DataFrame:
    """Test-set decontamination (the GPT-3/Llama 13-gram recipe): a
    document is contaminated iff it shares any exact ``window``-token
    n-gram with a benchmark/eval text. Returns (doc_id, n_hits,
    contaminated) for every document.

    Scale shape: the benchmark side is tokenized and hashed
    driver-side (h64_py ≡ the corpus-side JVM h64) into a deduped hash
    table that broadcasts — benchmark suites are tiny next to the
    corpus; the corpus pays one map-side window-hash explode, a
    broadcast semi-join, and a doc-keyed count over only the MATCHING
    occurrences (contaminated docs only, so the rollup and the
    join-back are duplicate-sized, not corpus-sized)."""
    from nobletools_spark.functions.hashing import h64_py

    bench = sorted({
        h64_py(" ".join(toks[i:i + window]))
        for t in benchmark_texts
        for toks in [(t or "").split(" ")]
        if len(toks) >= window
        for i in range(len(toks) - window + 1)})
    d = tok_docs(docs)
    spark = docs.sparkSession
    from nobletools_spark.session import local_table

    # benchmark-suite-sized: a JVM LocalRelation for the broadcast build
    bh = local_table(spark, [(h,) for h in bench], "whash long")
    occ = d.select("doc_id", F.explode(_wins_expr(window)).alias("whash"))
    hits = (occ.join(F.broadcast(bh), "whash")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    return (d.select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0).cast("long"))
                    .alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") > 0))


def exact_sig(by: str = "content") -> Column:
    """THE exact-duplicate signature expression, shared by batch
    (``exact_dedup``) and streaming (``streaming_exact_dedup``) so the
    two paths can never diverge. ``by`` = 'content' (raw text md5) or
    'bag' (sorted distinct token set — catches word-order shuffles).
    NULL text is treated as empty content (sig = md5('') either mode,
    per the ws_tokens_col NULL contract): contentless documents form
    ONE duplicate group rather than a NULL key — deterministic, and
    identical between the modes."""
    if by == "content":
        return F.md5(F.coalesce(F.col("text"), F.lit("")))
    if by == "bag":
        return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens()))))
    raise ValueError(by)


def exact_dedup(docs: DataFrame, by: str = "content") -> DataFrame:
    """Exact-duplicate groups: (sig, keep_doc_id, n_docs). keep = min
    doc_id per group; signature semantics in ``exact_sig``."""
    sig = exact_sig(by)
    return (docs.select(sig.alias("sig"), doc_id_col(docs))
            .groupBy("sig")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").cast("long").alias("n_docs")))


def jaccard_pairs(docs: DataFrame, n: int = 3,
                  group_cols: tuple[str, ...] = ("lang", "source"),
                  threshold: float = 0.125,
                  max_group: int = 10_000) -> DataFrame:
    """n-gram Jaccard near-dup pairs within candidate groups:
    (doc_a, doc_b, jaccard). ``group_cols`` bounds the quadratic
    blow-up — at scale the grouping is an LSH bucket (minhash_lsh_pairs,
    where this op is the verification stage); here it doubles as the
    SQL-oracle-checkable variant. ``max_group`` is the hard scale guard:
    groups larger than it are dropped entirely (window count filter, same
    trade as minhash's max_bucket) rather than silently running an O(n²)
    straggler — a coarse grouping on a real corpus must go through LSH,
    not through this cap. max_group<=0 disables. Jaccard is an exact
    rational in double (|∩| / |∪|) ⇒ bit-stable cross-engine."""
    if max_group > 0:
        # group_cols are low-cardinality ⇒ the count table is tiny:
        # partial-aggregated count + broadcast anti-join beats shuffling
        # full rows through a window (the right cap shape here; LSH
        # bucket keys are high-cardinality, hence the window cap there)
        big = (docs.groupBy(*group_cols).count()
               .filter(F.col("count") > max_group).drop("count"))
        docs = docs.join(F.broadcast(big), list(group_cols), "left_anti")
    base = docs.select(
        *group_cols, doc_id_col(docs),
        F.transform(_tokens(), h32).alias("ht"))
    # 31-bit hashed shingles: integer array_intersect is ~5× cheaper
    # than string intersect per pair, and the oracle shares the exact
    # hash construction so Jaccard values stay bit-identical
    base = base.select(*group_cols, "doc_id",
                       _set_barrier(shingle_hashes(F.col("ht"), n)).alias("sh"))
    base = base.withColumn("nsh", F.size("sh"))
    # co-partition by group below the self-join (reused exchange) — the
    # correct 100 TB join shape; the _set_barrier above additionally
    # pins the shingle computation below this exchange (see its doc)
    base = base.repartition(*group_cols)
    a, b = base.alias("a"), base.alias("b")
    # |∪| = |a|+|b|-|∩| (arrays are distinct) — one array op per pair
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    jac = (inter.cast("double")
           / (F.col("a.nsh") + F.col("b.nsh") - inter).cast("double"))
    return (a.join(b, list(group_cols))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def shingle_hashes(ht: Column, n: int = 3) -> Column:
    """Distinct 31-bit shingle hashes from a *materialized* token-hash
    array column: sh_i = Σ_j w_j·ht[i+j] (mod P31), each product reduced
    before summing so every intermediate fits int64 (DuckDB raises on
    BIGINT overflow; Java wraps — either would break oracle parity).

    ``ht`` MUST be a plain column reference (see shingle_hash_df), never
    an inline ``transform(toks, h32)``: element_at over an inline
    transform re-evaluates the whole md5 array per access — O(tokens²·n)
    hashing instead of O(tokens). Documents shorter than n tokens fold
    all their token hashes into a single hash."""
    ws = SHINGLE_WEIGHTS[:n]

    def comb(i: Column) -> Column:
        acc = None
        for j, w in enumerate(ws):
            term = (F.element_at(ht, i + j + 1) * F.lit(w)) % F.lit(P31)
            acc = term if acc is None else acc + term
        return acc % F.lit(P31)

    grams = F.transform(F.sequence(F.lit(0), F.size(ht) - n), comb)
    short = F.array(F.aggregate(
        ht, F.lit(0).cast("long"),
        lambda a, h: (a * F.lit(SHINGLE_WEIGHTS[0]) + h) % F.lit(P31)))
    return F.array_distinct(F.when(F.size(ht) >= n, grams).otherwise(short))


def _set_barrier(col: Column) -> Column:
    """Optimizer barrier for a SET-valued array column: F.shuffle marks
    the expression nondeterministic, which stops InferFiltersFromConstraints
    from inlining the whole (expensive, O(tokens²) when element_at sits
    over an inline transform) expression into scan-level isnotnull
    filters, and stops CollapseProject/ColumnPruning from floating it
    above joins (per-pair re-evaluation). Only legal because every
    consumer — array_min, array_intersect, size — is order-insensitive."""
    return F.shuffle(col)


def shingle_hash_df(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shh) — staged projections so the expensive md5 token-hash
    array is computed once per row (CollapseProject keeps non-cheap
    multiply-referenced aliases in their own projection)."""
    base = docs.select(doc_id_col(docs),
                       F.transform(_tokens(), h32).alias("ht"))
    return base.select(
        "doc_id", _set_barrier(shingle_hashes(F.col("ht"), n)).alias("shh"))


def minhash_signature_cols(shh: Column, num_hashes: int) -> list[Column]:
    """K minhash values over a shingle-hash array, each a map-side
    ``array_min(transform(...))`` of an affine rehash in GF(P31) — no
    explode, no shuffle, pure integer codegen."""
    coeffs = minhash_coeffs(num_hashes)

    def _mh(a: int, b: int) -> Column:
        # NB: the lambda must take exactly one arg — F.transform treats a
        # two-arg lambda (incl. default args) as (element, index)
        return F.array_min(F.transform(
            shh, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(P31)))

    return [_mh(a, b).alias(f"mh{i}") for i, (a, b) in enumerate(coeffs)]


def minhash_signatures(docs: DataFrame, n: int = 3,
                       num_hashes: int = 16) -> DataFrame:
    """(doc_id, mh0..mhK-1) MinHash signature table."""
    return shingle_hash_df(docs, n).select(
        "doc_id", *minhash_signature_cols(F.col("shh"), num_hashes))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 16,
                      bands: int = 4, threshold: float = 0.125,
                      max_bucket: int = 64) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with true Jaccard:
    (doc_a, doc_b, jaccard).

    shingle → K minhashes (map-side) → band keys (md5 of each row of the
    banded signature) → explode bands → bucket self-join (the one
    shuffle; key space = bands × distinct band hashes, uniform unless the
    corpus has boilerplate — then ``max_bucket`` drops buckets larger
    than the cap, trading recall for a hard skew bound; dropped buckets
    are countable by the caller from ``lsh_buckets``) → distinct
    candidate pairs → Jaccard verification join."""
    if not 1 <= bands <= num_hashes or num_hashes % bands:
        # a silent rows=0 would key EVERY band on md5('') — one
        # corpus-wide bucket that cap_buckets then drops wholesale,
        # returning zero pairs as if the corpus had no near-dups;
        # a non-divisible split would silently ignore trailing hashes
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})")
    rows = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes)
    band_cols = []
    for b in range(bands):
        key = F.md5(F.concat_ws(
            ",", *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]))
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("bkey")))
    buckets = (sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk"))
               .select("doc_id", F.col("bk.band").alias("band"),
                       F.col("bk.bkey").alias("bkey")))
    if max_bucket > 0:
        from nobletools_spark.operators.similarity import cap_buckets

        buckets = cap_buckets(buckets, ["band", "bkey"], max_bucket)
    cand = (buckets.alias("x").join(buckets.alias("y"), ["band", "bkey"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .distinct())
    # verification over the same hashed shingles the signatures used
    sh = shingle_hash_df(docs, n).withColumnRenamed("shh", "sh")
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jac = (inter.cast("double")
           / (F.size("sa") + F.size("sb") - inter).cast("double"))
    return (cand
            .join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")),
                  "doc_a")
            .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")),
                  "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Per-document SimHash: token-frequency-weighted bit votes over
    60-bit token hashes → ``bits``-bit fingerprint (doc_id, simhash).
    explode + single groupBy (partial aggregation map-side); near-dup
    candidates are then doc pairs within small Hamming distance."""
    tok = (docs.select(doc_id_col(docs),
                       F.explode(_tokens()).alias("tok"))
           .withColumn("h", h64("tok")))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.alias("simhash"))


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.98,
                        group_col: str | None = "label",
                        planes: list[list[float]] | None = None,
                        max_bucket: int = 1024) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within candidate groups:
    (vec_a, vec_b, cos). Cosine in double precision via ordered fold
    (F.aggregate) so the SQL oracle reproduces it. Candidate grouping:
    an explicit ``group_col`` (oracle-checkable), or — the scale path —
    sign-random-projection LSH buckets via ``planes``
    (similarity.hyperplanes, use ≥16 in production): N²→N²/2^P candidate
    work, with ``max_bucket`` bounding the worst bucket's quadratic task
    (same trade as minhash_lsh_pairs; applies to the planes path only —
    an explicit group_col is the caller's contract)."""
    # the fold shapes are similarity's — oracle-parity-critical
    # (ordered fold ≡ DuckDB list_reduce), so never re-implemented here
    from nobletools_spark.operators.similarity import (
        _cosine, _dot, _norm, _vec_double)

    vec = _vec_double()
    norm = _norm(vec)
    if planes is not None:
        from nobletools_spark.operators.similarity import bucket_expr, cap_buckets

        # inline bucket: no second scan / vec_id shuffle (see lsh_topk)
        emb = (emb.withColumn("vec_id", F.col("vec_id").cast("long"))
               .withColumn("bucket", bucket_expr(vec, planes)))
        emb = cap_buckets(emb, ["bucket"], max_bucket)
        group_col = "bucket"
    base = emb.select(F.col(group_col).alias("g"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      vec.alias("v"), norm.alias("nrm"))
    base = base.repartition("g")  # materialize v/nrm below the join
    cos = _cosine(_dot(F.col("a.v"), F.col("b.v")),
                  F.col("a.nrm"), F.col("b.nrm"))
    return (base.alias("a").join(base.alias("b"), "g")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"), cos.alias("cos"))
            .filter(F.col("cos") >= threshold))


def dedup_clusters(docs: DataFrame, n: int = 3, num_hashes: int = 16,
                   bands: int = 4, threshold: float = 0.125,
                   max_bucket: int = 64) -> DataFrame:
    """The dedup DECISION step: near-duplicate pairs
    (minhash_lsh_pairs) → undirected connected components → one row per
    document (doc_id, cluster_id, keep) where cluster_id is the min
    doc_id of the near-dup cluster and keep marks its canonical
    representative. Downstream training-data pipelines anti-join on
    keep=false.

    Scale shape: the pair table is tiny relative to the corpus (only
    near-dups), so the component computation runs on edges only
    (driver union-find for small pair tables, large-star/small-star
    doubling beyond — see operators/canonical.py) and joins back to
    the corpus once, broadcast when the dup set is small."""
    from nobletools_spark.operators.canonical import connected_components

    pairs = minhash_lsh_pairs(docs, n, num_hashes, bands, threshold,
                              max_bucket)
    edges = pairs.select(F.col("doc_a").alias("a"),
                         F.col("doc_b").alias("b"))
    comp = connected_components(edges) \
        .withColumnRenamed("node", "doc_id")
    base = docs.select(doc_id_col(docs))
    return (base.join(comp, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.least("component", "doc_id"),
                               F.col("doc_id")).alias("cluster_id"))
            .withColumn("keep", F.col("doc_id") == F.col("cluster_id")))


def drop_near_duplicates(docs: DataFrame, n: int = 3,
                         num_hashes: int = 16, bands: int = 4,
                         threshold: float = 0.125,
                         max_bucket: int = 64) -> DataFrame:
    """The near-dup REMOVAL step: MinHash-LSH pairs → connected
    clusters → the deduplicated corpus (doc_id, text), keeping only
    each cluster's canonical representative (min doc_id) plus every
    unclustered document.

    Scale shape: the drop list is only the NON-representative
    clustered docs — a subset of the (already small) near-dup set —
    so the corpus pays a single left-anti join against it
    (broadcastable at realistic dup rates; AQE falls back to
    sort-merge otherwise). The corpus itself is never grouped or
    sorted."""
    from nobletools_spark.operators.canonical import connected_components

    pairs = minhash_lsh_pairs(docs, n, num_hashes, bands, threshold,
                              max_bucket)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("a"),
                     F.col("doc_b").alias("b")))
    drop = (comp.filter(F.col("node")
                        != F.least("component", F.col("node")))
            .select(F.col("node").alias("doc_id")))
    return (docs.select(doc_id_col(docs),
                        "text")
            .join(drop, "doc_id", "left_anti"))
