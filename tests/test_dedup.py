"""Dedup operator scale-guard behavior (the oracle pins values; these
pin the skew/cap semantics that only show on adversarial fixtures)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_jaccard_max_group_drops_oversized_group(spark):
    """A (lang, source) group over the cap is excluded wholesale —
    bounded pair work instead of an O(n²) straggler; small groups keep
    identical results."""
    from nobletools_spark.operators.dedup import jaccard_pairs

    big = [(i, "alpha beta gamma delta epsilon zeta", "en", "bulk")
           for i in range(8)]
    small = [(100, "one two three four five six", "en", "niche"),
             (101, "one two three four five seven", "en", "niche")]
    docs = _docs(spark, big + small)
    capped = {(r.doc_a, r.doc_b)
              for r in jaccard_pairs(docs, n=3, threshold=0.1,
                                     max_group=4).collect()}
    assert capped == {(100, 101)}  # 'bulk' group (8 > 4) dropped entirely
    uncapped = {(r.doc_a, r.doc_b)
                for r in jaccard_pairs(docs, n=3, threshold=0.1,
                                       max_group=0).collect()}
    assert (100, 101) in uncapped and len(uncapped) > 1


def test_jaccard_cap_plan_uses_broadcast_anti_join(spark):
    """The guard must be an aggregated-count broadcast anti-join (tiny
    group-key table), not a full-row window shuffle."""
    from nobletools_spark.operators.dedup import jaccard_pairs

    docs = _docs(spark, [(0, "a b c d", "en", "s")])
    plan = jaccard_pairs(docs, max_group=10)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "LeftAnti" in plan


def test_dedup_clusters_planted(spark):
    """Planted near-dups cluster with their source; originals keep."""
    from nobletools_spark.operators.dedup import (
        NEAR_DUP_ID_OFFSET,
        dedup_clusters,
        with_near_duplicates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    out = {r.doc_id: r for r in
           dedup_clusters(with_near_duplicates(docs),
                          threshold=0.5).collect()}
    n_orig = 50
    assert len(out) == 2 * n_orig
    clustered = 0
    for doc_id, r in out.items():
        if doc_id >= NEAR_DUP_ID_OFFSET:
            src = doc_id - NEAR_DUP_ID_OFFSET
            if r.cluster_id == src:
                clustered += 1
                assert not r.keep                   # clone never keeps
                assert out[src].keep                # original does
    assert clustered >= n_orig * 0.9                # LSH recall on plants


def test_lang_id_discriminates_eight_languages(spark):
    from nobletools_spark.operators.textstats import lang_id

    samples = [
        (0, "the cat sat on the mat and it was not a dog", "en"),
        (1, "der hund ist nicht auf der straße und die katze", "de"),
        (2, "el perro no es un gato y la casa es grande", "es"),
        (3, "le chien est dans la maison et il ne dort pas", "fr"),
        (4, "il cane non è un gatto ma anche la casa è grande", "it"),
        (5, "de hond is niet een kat maar ook het huis", "nl"),
        (6, "o cão não é um gato e a casa é grande", "pt"),
        (7, "hunden är inte en katt och det är ett stort hus", "sv"),
        (8, "zxqv wvutk pqrs", "und"),
    ]
    docs = spark.createDataFrame([(i, t) for i, t, _ in samples],
                                 "doc_id long, text string")
    got = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    for i, _t, want in samples:
        assert got[i] == want, (i, got[i], want)


def test_lang_id_null_text_yields_zero_counts(spark):
    """NULL text coalesces to '' like the other textstats operators:
    every votes_*/sc_* column is 0 (not NULL) and pred is 'und'."""
    from nobletools_spark.operators.textstats import lang_id

    docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = lang_id(docs).collect()[0]
    assert r.lang_pred == "und"
    for name, val in r.asDict().items():
        if name.startswith(("votes_", "sc_")):
            assert val == 0, (name, val)


def test_duplicated_window_spans(spark):
    """Exact duplicated-window detection: a boilerplate tail shared by
    two docs yields exactly its fully-inside windows; short docs yield
    none (the sequence(1,0) count-down guard)."""
    from nobletools_spark.functions.hashing import h64_py
    from nobletools_spark.operators.dedup import duplicated_window_spans

    boiler = "please subscribe to our channel for more daily content now"
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma " + boiler),
         (1, "delta epsilon " + boiler),
         (2, "unique words only here today"),
         (3, "tiny")],                        # shorter than the window
        "doc_id long, text string")
    rows = {r.whash: r for r in
            duplicated_window_spans(docs, window=8).collect()}
    toks = boiler.split()
    want = {h64_py(" ".join(toks[i:i + 8])) for i in range(len(toks) - 7)}
    assert set(rows) == want                  # 3 fully-inside windows
    assert all(r.n_occ == 2 and r.n_docs == 2 for r in rows.values())


def test_repetition_stats(spark):
    """Gopher-style repetition signals: top-token/bigram shares from
    sorted-array folds (no shuffle) must equal the obvious counts."""
    from nobletools_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(0, "spam spam spam eggs"),               # 3/4 token, 2/3 bigram
         (1, "a b c d"),                           # all unique
         (2, "x"),                                 # single token: no bigrams
         (3, "go go go go")],                      # fully repeated
        "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[0].n_tokens == 4 and rows[0].top_token_n == 3
    assert rows[0].top_token_ratio == 0.75
    assert rows[0].top_bigram_n == 2            # 'spam spam' twice
    assert rows[0].top_bigram_ratio == 2 / 3
    assert rows[0].dup_token_ratio == 0.5       # 2 distinct of 4
    assert rows[1].top_token_n == 1 and rows[1].dup_token_ratio == 0.0
    assert rows[2].top_bigram_n == 0 and rows[2].top_bigram_ratio == 0.0
    assert rows[3].top_token_ratio == 1.0 and rows[3].top_bigram_ratio == 1.0


def test_lang_id_script_vote_beats_stopwords(spark):
    """Unicode-script vote ahead of the stopword cascade (r2 verdict
    task #7): CJK/Cyrillic/Arabic/Greek/Japanese/Korean text resolves
    by script even when Latin stopwords are present; kana/hangul beat
    han so mixed Japanese/Korean text is not labeled zh."""
    from nobletools_spark.operators.textstats import lang_id

    samples = [
        (0, "这是一个中文测试文档 没有别的", "zh"),
        (1, "日本語のテストです", "ja"),          # han + kana → ja
        (2, "이것은 한국어 테스트입니다", "ko"),
        (3, "это русский тестовый документ", "ru"),
        (4, "هذا مستند تجريبي باللغة العربية", "ar"),
        (5, "αυτό είναι ένα ελληνικό έγγραφο", "el"),
        # Latin stopwords in the text do not override script presence
        (6, "the report 中文内容 with some english", "zh"),
        (7, "the cat sat on the mat and it was not a dog", "en"),
    ]
    docs = spark.createDataFrame([(i, t) for i, t, _ in samples],
                                 "doc_id long, text string")
    rows = {r.doc_id: r for r in lang_id(docs).collect()}
    for i, _t, want in samples:
        assert rows[i].lang_pred == want, (i, rows[i].lang_pred, want)
    assert rows[1].sc_kana > 0 and rows[1].sc_han > 0
    assert rows[7].sc_han == 0


def test_pii_scrub(spark):
    from nobletools_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [(1, "email j.doe@example.com phone (412) 555-1234 ok"),
         (2, "ssn 123-45-6789 ip 192.168.0.1 card 4111111111111111"),
         (3, "nothing sensitive here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].text == "email <EMAIL> phone <PHONE> ok"
    assert out[1].n_pii == 2
    assert out[2].text == "ssn <SSN> ip <IP> card <NUMBER>"
    assert out[2].n_pii == 3
    assert out[3].text == "nothing sensitive here" and out[3].n_pii == 0


def test_sample_by_hash_deterministic_and_stable(spark):
    """Same keys always get the same verdict: repeated runs agree, the
    kept set is a subset relation under growing rate, and adding rows
    never flips existing ones."""
    from nobletools_spark.operators.textstats import sample_by_hash

    docs = spark.range(2000).select(F.col("id").alias("doc_id"),
                                    F.lit("x").alias("text"))
    a = {r.doc_id for r in sample_by_hash(docs, 0.2).collect()}
    b = {r.doc_id for r in sample_by_hash(docs, 0.2).collect()}
    assert a == b and 0.15 < len(a) / 2000 < 0.25
    wider = {r.doc_id for r in sample_by_hash(docs, 0.5).collect()}
    assert a <= wider
    grown = spark.range(4000).select(F.col("id").alias("doc_id"),
                                     F.lit("x").alias("text"))
    g = {r.doc_id for r in sample_by_hash(grown, 0.2).collect()}
    assert {d for d in g if d < 2000} == a


def test_pii_scrub_null_text(spark):
    from nobletools_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame([(1, None), (2, "a@b.io x")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].text == "" and out[1].n_pii == 0
    assert out[2].n_pii == 1


def test_strip_duplicated_lines(spark):
    """C4-style line dedup: >=10-char lines duplicated >=2x are removed
    everywhere except the first (doc_id, line_no) occurrence; short
    duplicate lines are immune; documents reassemble in original line
    order; docs stripped to nothing come back with empty text."""
    from nobletools_spark.operators.dedup import (
        duplicated_lines,
        strip_duplicated_lines,
    )

    boiler = "SHARED BOILERPLATE LINE HERE"
    rows = [
        (1, f"unique leading line one\n{boiler}\nok unique tail line"),
        (2, boiler),
        (3, f"another unique line\n{boiler}"),
        (4, "hi\nhi"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in strip_duplicated_lines(docs).collect()}
    assert out[1] == rows[0][1]          # keeper occurrence survives
    assert out[2] == ""                  # only line was a later dup
    assert out[3] == "another unique line"
    assert out[4] == "hi\nhi"            # below min_len: immune
    assert out[5] == ""                  # NULL text round-trips empty
    dup = duplicated_lines(docs).collect()
    assert [(r.line, r.n_occ, r.keeper_doc_id, r.keeper_line_no)
            for r in dup] == [(boiler, 3, 1, 1)]


def test_filter_decisions_first_failing_rule(spark):
    """Gopher-style composite filter: reason is the FIRST failing rule
    in documentation order, keep only when every rule passes; no float
    output columns."""
    from nobletools_spark.operators.textstats import filter_decisions

    good = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the woods tonight again happily") # 20 toks
    rows = [
        (1, good),
        (2, "way too short"),                          # too_few_tokens
        (3, "spam " * 19 + "spam"),                    # repetitive (but
        #      first failing rule is low_stopword_density? no stops →
        #      stop rule fires BEFORE top-token rule
        (4, ("abcdefghijklmnopqrstu " * 20).strip()),  # long tokens, but
        #      stopword rule is later than avg-len rule → long_tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in filter_decisions(docs).collect()}
    assert out[1].keep and out[1].reason == "kept"
    assert out[2].reason == "too_few_tokens" and not out[2].keep
    assert out[3].reason == "low_stopword_density"
    assert out[4].reason == "long_tokens"
    assert out[1].n_tokens == 20
    assert set(type(v) for r in out.values()
               for v in (r.n_tokens, r.keep, r.reason)) <= {int, bool, str}


def test_strip_duplicated_windows(spark):
    """Window-level removal: tokens covered by a corpus-duplicated
    8-token window vanish from ALL occurrences; unique text and
    below-window docs pass through; reconstruction keeps token order."""
    from nobletools_spark.operators.dedup import strip_duplicated_windows

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    rows = [
        (1, "u1 u2 u3 " + boiler),
        (2, boiler + " v1 v2"),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        (4, "short doc"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in strip_duplicated_windows(docs, window=8).collect()}
    assert out[1] == "u1 u2 u3"
    assert out[2] == "v1 v2"
    assert out[3] == rows[2][1]
    assert out[4] == "short doc"
    assert out[5] == ""


def test_sample_to_token_budget(spark):
    """Mixture sampler: kept set == the pure-Python replay (hash-order
    cumulative tokens < budget, overshoot <= one doc per group),
    identical across bucket counts (boundary-bucket path exercised at
    n_buckets=4), groups absent from the spec dropped, int budget =
    single global group."""
    from nobletools_spark.functions.hashing import h64_py
    from nobletools_spark.operators.textstats import sample_to_token_budget

    rows = [(i, ("tok " * (5 + i % 7)).strip(), str(i % 3))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, g string")
    budgets = {"0": 100, "1": 55}          # group '2' absent: dropped

    def replay(budget, ids):
        order = sorted(ids, key=lambda i: (h64_py(f"tb0|{i}"), i))
        kept, cum = set(), 0
        for i in order:
            n = 5 + i % 7
            if cum < budget:
                kept.add(i)
            cum += n
        return kept

    want = replay(100, [i for i in range(60) if i % 3 == 0]) \
        | replay(55, [i for i in range(60) if i % 3 == 1])
    for nb in (4, 1024):
        got = {r.doc_id for r in sample_to_token_budget(
            docs, budgets, group_col="g", n_buckets=nb).collect()}
        assert got == want, nb
    # per-doc token counts come back too
    out = {r.doc_id: r.n_tokens for r in sample_to_token_budget(
        docs, budgets, group_col="g").collect()}
    assert all(out[i] == 5 + i % 7 for i in out)
    # int budget = one global group
    got_all = {r.doc_id for r in
               sample_to_token_budget(docs, 90).collect()}
    assert got_all == replay(90, range(60))


def test_chunk_documents(spark):
    """Chunking: overlapping fixed windows, short docs stay whole, the
    final chunk carries the remainder (> overlap tokens), chunk text
    reassembles the exact token slices."""
    import pytest as _pytest

    from nobletools_spark.operators.textstats import chunk_documents

    t20 = " ".join(f"w{i}" for i in range(1, 21))
    rows = [(1, t20), (2, "a b c"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_id, r.chunk_id): (r.text, r.n_tokens)
           for r in chunk_documents(docs, chunk_tokens=8,
                                    overlap=2).collect()}
    # doc 1: starts 1, 7, 13 (step 6, last start <= 20-2)
    assert out[(1, 0)] == (" ".join(f"w{i}" for i in range(1, 9)), 8)
    assert out[(1, 1)] == (" ".join(f"w{i}" for i in range(7, 15)), 8)
    assert out[(1, 2)] == (" ".join(f"w{i}" for i in range(13, 21)), 8)
    assert out[(2, 0)] == ("a b c", 3)      # short doc stays whole
    assert out[(3, 0)] == ("", 1)           # NULL text -> one '' token
    assert len(out) == 5
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_drop_near_duplicates_consistent_with_clusters(spark):
    """The removal step keeps exactly the keep=true rows of the
    decision step, with the surviving text intact."""
    from nobletools_spark.operators.dedup import (
        dedup_clusters,
        drop_near_duplicates,
        with_near_duplicates,
    )

    base = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(12))) for i in range(8)],
        "doc_id long, text string")
    docs = with_near_duplicates(base)
    kept = {r.doc_id: r.text
            for r in drop_near_duplicates(docs, threshold=0.5).collect()}
    decide = {r.doc_id for r in dedup_clusters(docs, threshold=0.5)
              .collect() if r.keep}
    assert set(kept) == decide
    assert set(kept) == set(range(8))        # clones all dropped
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert all(kept[i] == texts[i] for i in kept)


def test_flag_contaminated(spark):
    """13-gram decontamination: docs sharing an exact 13-token window
    with a benchmark text are flagged with their hit counts; shorter
    docs and non-overlapping docs are clean; benchmark texts below the
    window contribute nothing."""
    from nobletools_spark.operators.dedup import flag_contaminated

    snip = " ".join(f"e{i}" for i in range(14))         # 2 windows of 13
    rows = [
        (1, "lead text " + snip),
        (2, "totally unrelated content here that is long enough to have "
            "plenty of its own thirteen token windows in it today"),
        (3, "tiny"),
        (4, snip),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in flag_contaminated(docs, [snip, "short bench"]).collect()}
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[4] == (2, True)


def test_removal_ops_match_python_replay(spark):
    """Seeded random corpus over a tiny vocabulary (so real window/line
    collisions occur): strip_duplicated_windows, strip_duplicated_lines
    and flag_contaminated each equal an independent pure-Python replay
    of their documented semantics."""
    import random

    from nobletools_spark.operators.dedup import (
        flag_contaminated,
        strip_duplicated_lines,
        strip_duplicated_windows,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(6)]
    line_pool = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 6)))
                 for _ in range(12)]
    texts = {}
    for d in range(80):
        lines = [rng.choice(line_pool) for _ in range(rng.randint(1, 4))]
        texts[d] = "\n".join(lines)
    docs = spark.createDataFrame(sorted(texts.items()),
                                 "doc_id long, text string")

    # --- windows (window=4, min_count=2), replay on window TEXT ---
    W = 4
    from collections import Counter
    occ = Counter()
    toks = {d: t.split(" ") for d, t in texts.items()}
    for t in toks.values():
        for i in range(len(t) - W + 1):
            occ[tuple(t[i:i + W])] += 1
    hot = {w for w, n in occ.items() if n >= 2}
    want_w = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - W + 1):
            if tuple(t[i:i + W]) in hot:
                covered.update(range(i, i + W))
        want_w[d] = " ".join(x for j, x in enumerate(t) if j not in covered)
    got_w = {r.doc_id: r.text
             for r in strip_duplicated_windows(docs, window=W).collect()}
    assert got_w == want_w

    # --- lines (min_count=2, min_len=5) ---
    lcount = Counter()
    keeper = {}
    for d in sorted(texts):
        for no, ln in enumerate(texts[d].split("\n")):
            if len(ln) >= 5:
                lcount[ln] += 1
                keeper.setdefault(ln, (d, no))
    dup = {ln for ln, n in lcount.items() if n >= 2}
    want_l = {}
    for d in sorted(texts):
        kept = [ln for no, ln in enumerate(texts[d].split("\n"))
                if ln not in dup or keeper[ln] == (d, no)]
        want_l[d] = "\n".join(kept)
    got_l = {r.doc_id: r.text
             for r in strip_duplicated_lines(docs, min_len=5).collect()}
    assert got_l == want_l

    # --- contamination (window=4 against two bench texts) ---
    long_line = next(ln for ln in line_pool if len(ln.split(" ")) >= 4)
    bench = [long_line, "never in corpus x y z"]
    bwins = set()
    for b in bench:
        bt = b.split(" ")
        for i in range(len(bt) - W + 1):
            bwins.add(tuple(bt[i:i + W]))
    want_c = {}
    for d, t in toks.items():
        n = sum(1 for i in range(len(t) - W + 1)
                if tuple(t[i:i + W]) in bwins)
        want_c[d] = (n, n > 0)
    got_c = {r.doc_id: (r.n_hits, r.contaminated)
             for r in flag_contaminated(docs, bench, window=W).collect()}
    assert got_c == want_c
    assert any(c for _n, c in want_c.values())   # the replay has real hits


def test_vocab_top_k(spark):
    """Vocabulary: counts and doc frequencies equal the pure-Python
    replay of the BPE-ish pre-tokenizer; the top-k set follows the
    (cnt desc, token asc) total order; invalid k raises."""
    import re

    import pytest as _pytest

    from nobletools_spark.operators.textstats import (BPE_TOKEN_RE,
                                                      vocab_top_k)

    rows = [(1, "Spark spark ROW!"), (2, "row row, spark"),
            (3, "unique"), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from collections import Counter
    cnt, df = Counter(), Counter()
    for _d, t in rows:
        toks = re.findall(BPE_TOKEN_RE, (t or "").lower())
        cnt.update(toks)
        df.update(set(toks))
    got = [(r.token, r.cnt, r.n_docs)
           for r in vocab_top_k(docs, k=3).collect()]
    want = sorted(((t, cnt[t], df[t]) for t in cnt),
                  key=lambda x: (-x[1], x[0]))[:3]
    assert got == want
    assert got[0] == ("row", 3, 2)        # 3-count tie broken by token
    # full table matches the replay exactly
    full = {(r.token, r.cnt, r.n_docs)
            for r in vocab_top_k(docs, k=100).collect()}
    assert full == {(t, cnt[t], df[t]) for t in cnt}
    with _pytest.raises(ValueError):
        vocab_top_k(docs, k=0)


def test_pack_sequences(spark):
    """Packing: offsets equal the pure-Python concat-and-chop replay
    (doc_id order within hash shards, separator-shifted starts, spans
    over the doc's own tokens only); empty/NULL text packs as one ''
    token; invalid params raise."""
    import pytest as _pytest

    from nobletools_spark.functions.hashing import h64_py
    from nobletools_spark.operators.textstats import pack_sequences

    rows = [(i, ("t " * (1 + i % 9)).strip() if i % 11 else None)
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    SEQ, SHARDS, SEP = 7, 4, 1
    want = {}
    shard_of = {i: h64_py(f"pk0|{i}") % SHARDS for i, _ in rows}
    for s in range(SHARDS):
        pos = 0
        for i in sorted(i for i in shard_of if shard_of[i] == s):
            n = len(((rows[i][1] or "")).split(" "))
            want[i] = (s, pos, n, pos // SEQ, (pos + n - 1) // SEQ)
            pos += n + SEP
    got = {r.doc_id: (r.shard, r.start_tok, r.n_tokens,
                      r.first_seq, r.last_seq)
           for r in pack_sequences(docs, seq_len=SEQ, n_shards=SHARDS,
                                   sep_tokens=SEP).collect()}
    assert got == want
    assert len({v[0] for v in want.values()}) > 1    # >1 real shard
    assert any(v[3] != v[4] for v in want.values())  # a doc spans seqs
    for bad in (dict(seq_len=0), dict(n_shards=0), dict(sep_tokens=-1)):
        with _pytest.raises(ValueError):
            pack_sequences(docs, **bad)


def test_vocab_and_pack_adversarial_corpus(spark):
    """Seeded adversarial corpus (empties, NULLs, whitespace runs,
    unicode, numerals, one giant doc) through vocab_top_k and
    pack_sequences vs exact pure-Python replays."""
    import random
    import re
    from collections import Counter

    from nobletools_spark.functions.hashing import h64_py
    from nobletools_spark.operators.textstats import (BPE_TOKEN_RE,
                                                      pack_sequences,
                                                      vocab_top_k)

    rng = random.Random(20260817)
    pool = ["the", "Spark", "naïve", "grade", "3", "φ-x", "a" * 40,
            "don't", "v2.1", "", "  ", "\t", "α β", "row,col", "END."]
    rows = []
    for i in range(300):
        if i % 17 == 0:
            rows.append((i, None))
        elif i % 23 == 0:
            rows.append((i, ""))
        else:
            n = rng.randint(1, 30)
            rows.append((i, " ".join(rng.choice(pool) for _ in range(n))))
    rows.append((1000, "giant " * 5000))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cnt, df_ = Counter(), Counter()
    for _i, t in rows:
        toks = re.findall(BPE_TOKEN_RE, (t or "").lower())
        cnt.update(toks)
        df_.update(set(toks))
    want_v = sorted(((t, cnt[t], df_[t]) for t in cnt),
                    key=lambda x: (-x[1], x[0]))[:50]
    got_v = [(r.token, r.cnt, r.n_docs)
             for r in vocab_top_k(docs, k=50).collect()]
    assert got_v == want_v

    SEQ, SHARDS, SEP = 64, 8, 1
    shard_of = {i: h64_py(f"pk0|{i}") % SHARDS for i, _ in rows}
    want_p = {}
    for s in range(SHARDS):
        pos = 0
        for i in sorted(i for i in shard_of if shard_of[i] == s):
            t = dict(rows)[i]
            n = len((t or "").split(" "))
            want_p[i] = (s, pos, n, pos // SEQ, (pos + n - 1) // SEQ)
            pos += n + SEP
    got_p = {r.doc_id: (r.shard, r.start_tok, r.n_tokens,
                        r.first_seq, r.last_seq)
             for r in pack_sequences(docs, seq_len=SEQ, n_shards=SHARDS,
                                     sep_tokens=SEP).collect()}
    assert got_p == want_p
    assert got_p[1000][4] > got_p[1000][3] + 10   # giant doc spans many


def test_pack_manifest_matches_replay(spark):
    """Per-sequence manifest vs the pure-Python concat-and-chop
    replay: every sequence's doc list and document-token occupancy,
    including boundary-straddling docs; totals reconcile with the
    per-doc layout."""
    from nobletools_spark.functions.hashing import h64_py
    from nobletools_spark.operators.textstats import pack_manifest

    rows = [(i, ("w " * (1 + (i * 7) % 23)).strip()) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    SEQ, SHARDS, SEP = 10, 3, 1
    shard_of = {i: h64_py(f"pk0|{i}") % SHARDS for i, _ in rows}
    want = {}
    for s in range(SHARDS):
        pos = 0
        for i in sorted(i for i in shard_of if shard_of[i] == s):
            n = len(rows[i][1].split(" "))
            for q in range(pos // SEQ, (pos + n - 1) // SEQ + 1):
                lo, hi = max(q * SEQ, pos), min((q + 1) * SEQ, pos + n)
                ds, tok = want.setdefault((s, q), ([], 0))
                want[(s, q)] = (ds + [i], tok + (hi - lo))
            pos += n + SEP
    got = {(r.shard, r.seq): (list(r.doc_ids), r.n_doc_tokens)
           for r in pack_manifest(docs, seq_len=SEQ, n_shards=SHARDS,
                                  sep_tokens=SEP).collect()}
    assert got == {k: (sorted(d), t) for k, (d, t) in want.items()}
    # occupancy reconciles: sum over sequences == sum of doc tokens
    assert sum(t for _d, t in got.values()) == \
        sum(len(t.split(" ")) for _i, t in rows)
    # at least one doc straddles a boundary in this fixture
    assert any(len(d) and t < SEQ for d, t in got.values())


def test_cosine_zero_norm_vectors_never_win(spark):
    """A zero vector (undefined cosine) must not crash the job under
    ANSI mode and must score 0.0 — never outranking real neighbors —
    in brute-force, LSH, and grouped-dedup paths."""
    from nobletools_spark.operators.dedup import embedding_dup_pairs
    from nobletools_spark.operators.similarity import (cosine_topk,
                                                       hyperplanes,
                                                       lsh_topk)

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),
            (3, [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in cosine_topk(emb, n_queries=1, k=3).collect()}
    assert got[(0, 1)] == 1          # most similar real vector first
    assert got[(0, 3)] == 2          # zero vector ranks LAST
    planes = hyperplanes(n_planes=1, dim=2, seed=3)
    lsh_topk(emb, planes, k=2).collect()        # must not raise
    dups = embedding_dup_pairs(emb.withColumn("label", emb.vec_id % 1),
                               group_col="label", threshold=0.5).collect()
    assert all({r.vec_a, r.vec_b} != {2} for r in dups)


def test_exact_sig_shared_and_null_text_deterministic(spark):
    """exact_sig is THE one signature definition (batch exact_dedup and
    streaming_exact_dedup both call it); NULL text signs as empty
    content in BOTH modes — contentless docs form one deterministic
    group, never a NULL key."""
    from nobletools_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x y"), (4, None)],
        "doc_id long, text string")
    for by in ("content", "bag"):
        got = {r.sig: (r.keep_doc_id, r.n_docs)
               for r in exact_dedup(docs, by=by).collect()}
        assert None not in got
        assert sorted(got.values()) == [(1, 3), (3, 1)], by


def test_doc_id_col_never_casts_lossily(spark):
    """Integral ids normalize to long; decimal/double/string ids pass
    through unchanged (a lossy cast would NULL-merge distinct docs)."""
    from nobletools_spark.functions.ids import doc_id_col

    from decimal import Decimal

    big = 2**63 + 10  # does not fit int64
    dec = spark.createDataFrame([(Decimal(big),), (Decimal(big + 1),)],
                                "doc_id decimal(20,0)")
    out = dec.select(doc_id_col(dec)).collect()
    assert sorted(int(r.doc_id) for r in out) == [big, big + 1]
    dbl = spark.createDataFrame([(1.5,)], "doc_id double")
    assert dbl.select(doc_id_col(dbl)).collect()[0].doc_id == 1.5
    ints = spark.createDataFrame([(7,)], "doc_id int")
    assert ints.select(doc_id_col(ints)).schema[0].dataType.simpleString() \
        == "bigint"


def test_semantic_dedup_min_id_keeper_and_cells(spark):
    """SemDeDup decisions: near-identical vectors in the same cell mark
    all but the lowest id as duplicates; distant vectors survive."""
    from nobletools_spark.operators.similarity import semantic_dedup

    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.99, 0.02]),
            (3, [0.0, 1.0]), (4, [0.01, 0.999]),
            (5, [-1.0, -1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: (r.cell, r.is_dup)
           for r in semantic_dedup(emb, n_cells=3, threshold=0.98,
                                   seed=17).collect()}
    assert len(out) == 6
    # the x-axis trio share a cell: 0 keeps, 1 and 2 drop
    assert out[0][1] is False and out[1][1] is True and out[2][1] is True
    assert out[0][0] == out[1][0] == out[2][0]
    # the y-axis pair: 3 keeps, 4 drops; the lone vector survives
    assert out[3][1] is False and out[4][1] is True
    assert out[5][1] is False


def test_semantic_dedup_max_cell_drops_cell_entirely(spark):
    """Cells over max_cell contribute NO rows (dropped, not passed
    through as unique) — the same both-sides cap semantics as the LSH
    self-joins."""
    from nobletools_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0 + i / 100.0, 0.0]) for i in range(5)] \
        + [(10, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, n_cells=2, threshold=0.999, seed=17,
                         max_cell=4).collect()
    ids = {r.vec_id for r in out}
    assert 10 in ids and len(ids) < 6  # big cell dropped, small kept


def test_semantic_dedup_threshold_boundary(spark):
    """cos >= threshold is inclusive: identical vectors (cos == 1.0)
    dedup even at threshold=1.0."""
    from nobletools_spark.operators.similarity import semantic_dedup

    rows = [(0, [3.0, 4.0]), (1, [3.0, 4.0]), (2, [4.0, -3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.is_dup
           for r in semantic_dedup(emb, n_cells=1, threshold=1.0,
                                   seed=17).collect()}
    assert out == {0: False, 1: True, 2: False}


def test_shuffle_assignments_deterministic_and_contiguous(spark):
    """Deterministic corpus shuffle: same (shard, pos) across runs and
    partitionings; positions are 1..n_in_shard contiguous per shard;
    shards within range; a different seed produces a different
    permutation."""
    from nobletools_spark.operators.textstats import shuffle_assignments

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(100)],
                                 "doc_id long, text string")
    a = {r.doc_id: (r.shard, r.pos)
         for r in shuffle_assignments(docs, n_shards=8, seed=11).collect()}
    b = {r.doc_id: (r.shard, r.pos)
         for r in shuffle_assignments(docs.repartition(13), n_shards=8,
                                      seed=11).collect()}
    assert a == b and len(a) == 100
    assert all(0 <= s < 8 for s, _ in a.values())
    by_shard: dict = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    c = {r.doc_id: (r.shard, r.pos)
         for r in shuffle_assignments(docs, n_shards=8, seed=12).collect()}
    assert c != a


def test_shuffle_assignments_stable_under_corpus_growth(spark):
    """Appending documents never changes an existing doc's shard or its
    order relative to other surviving docs in the shard (hash is a pure
    function of (seed, doc_id))."""
    from nobletools_spark.operators.textstats import shuffle_assignments

    small = spark.createDataFrame([(i, "x") for i in range(50)],
                                  "doc_id long, text string")
    big = spark.createDataFrame([(i, "x") for i in range(80)],
                                "doc_id long, text string")
    a = {r.doc_id: (r.shard, r.pos)
         for r in shuffle_assignments(small, n_shards=4, seed=3).collect()}
    b = {r.doc_id: (r.shard, r.pos)
         for r in shuffle_assignments(big, n_shards=4, seed=3).collect()}
    for d, (s, _) in a.items():
        assert b[d][0] == s  # shard never moves
    for s in range(4):
        old = [d for d, (sh, p) in sorted(a.items(), key=lambda x: x[1][1])
               if sh == s]
        new = [d for d, (sh, p) in sorted(b.items(), key=lambda x: x[1][1])
               if sh == s and d in a]
        assert old == new, s  # relative order preserved


def test_classifier_score_replays_in_python(spark):
    """Hashed n-gram classifier: logit_fp equals the exact pure-Python
    replay (md5 bucket hash, Knuth-mix integer weights, unigrams +
    bigrams), NULL text scores as the empty doc, a single-token doc has
    no bigram features, and the keep flag follows the threshold."""
    import hashlib

    import pytest as _pytest

    from nobletools_spark.operators.textstats import classifier_score

    B, SCALE, SEED = 64, 1000, 7

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def replay(text: str | None):
        toks = (text or "").split(" ")
        feats = [h(f"{SEED}|{t}") % B for t in toks]
        feats += [h(f"{SEED}|{a} {b}") % B
                  for a, b in zip(toks, toks[1:])]
        logit = sum((f * 2654435761) % (2 * SCALE + 1) - SCALE
                    for f in feats)
        return len(feats), logit, logit / (SCALE * len(feats))

    rows = [(1, "the quick brown fox"), (2, "single"), (3, None),
            (4, "a a a"), (5, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r
           for r in classifier_score(docs, n_buckets=B,
                                     scale=SCALE).collect()}
    for d, t in rows:
        nf, logit, score = replay(t)
        assert (got[d].n_features, got[d].logit_fp) == (nf, logit), d
        assert got[d].score == score, d
        assert got[d].keep == (score >= 0.0), d
    assert got[2].n_features == 1          # single token -> no bigrams
    assert got[3].n_features == 1          # NULL text == '' token
    # repeated tokens hash identically: doc 4 = 3 equal unigrams + 2
    # equal bigrams
    u = h(f"{SEED}|a") % B
    bg = h(f"{SEED}|a a") % B
    assert got[4].logit_fp == (
        3 * ((u * 2654435761) % 2001 - 1000)
        + 2 * ((bg * 2654435761) % 2001 - 1000))
    # threshold moves the keep flag
    hi = {r.doc_id: r.keep
          for r in classifier_score(docs, n_buckets=B,
                                    threshold=1.1).collect()}
    assert not any(hi.values())            # score <= 1 always
    with _pytest.raises(ValueError):
        classifier_score(docs, n_buckets=0)


def test_classifier_score_trained_weights_path(spark):
    """The explicit-weights path: inlining the Knuth-mix table as a
    trained-weights array reproduces the default path exactly (same
    plan family, same scores); custom weights replay in Python; a
    wrong-length table raises."""
    import hashlib

    import pytest as _pytest

    from nobletools_spark.operators.textstats import (CLF_MIX, CLF_SEED,
                                                      classifier_score)

    B, SCALE = 32, 1000
    rows = [(1, "alpha beta gamma"), (2, "beta beta"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    mix_table = [(b * CLF_MIX) % (2 * SCALE + 1) - SCALE for b in range(B)]
    base = {r.doc_id: r for r in
            classifier_score(docs, n_buckets=B, scale=SCALE).collect()}
    same = {r.doc_id: r for r in
            classifier_score(docs, n_buckets=B, scale=SCALE,
                             weights=mix_table).collect()}
    for d, _t in rows:
        assert (base[d].logit_fp, base[d].score) == \
               (same[d].logit_fp, same[d].score), d

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    custom = [((b * 13) % 7) - 3 for b in range(B)]
    got = {r.doc_id: r for r in
           classifier_score(docs, n_buckets=B, scale=SCALE,
                            weights=custom).collect()}
    for d, t in rows:
        toks = (t or "").split(" ")
        feats = [h(f"{CLF_SEED}|{x}") % B for x in toks]
        feats += [h(f"{CLF_SEED}|{a} {b}") % B
                  for a, b in zip(toks, toks[1:])]
        want = sum(custom[f] for f in feats)
        assert got[d].logit_fp == want, d
        assert got[d].score == want / (SCALE * len(feats)), d
    with _pytest.raises(ValueError):
        classifier_score(docs, n_buckets=B, weights=[1, 2, 3])


def test_classifier_score_adversarial_corpus(spark):
    """Seeded adversarial corpus (NULLs, empties, whitespace runs,
    unicode, numerals, repeated tokens, one giant doc) through
    classifier_score vs the exact pure-Python replay — logit_fp and
    score bit-equal on every row, in both weight modes."""
    import hashlib
    import random

    from nobletools_spark.operators.textstats import (CLF_MIX, CLF_SEED,
                                                      classifier_score)

    rng = random.Random(20260818)
    pool = ["the", "Spark", "naïve", "grade", "3", "φ-x", "a" * 40,
            "don't", "v2.1", "", "  ", "\t", "α β", "row,col", "END."]
    rows = []
    for i in range(200):
        if i % 17 == 0:
            rows.append((i, None))
        elif i % 23 == 0:
            rows.append((i, ""))
        else:
            n = rng.randint(1, 30)
            rows.append((i, " ".join(rng.choice(pool) for _ in range(n))))
    rows.append((1000, "giant " * 3000))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    B, SCALE = 128, 1000
    custom = [((b * 29) % 11) - 5 for b in range(B)]

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def replay(text, weights):
        toks = (text or "").split(" ")
        feats = [h(f"{CLF_SEED}|{t}") % B for t in toks]
        feats += [h(f"{CLF_SEED}|{a} {b}") % B
                  for a, b in zip(toks, toks[1:])]
        if weights is None:
            logit = sum((f * CLF_MIX) % (2 * SCALE + 1) - SCALE
                        for f in feats)
        else:
            logit = sum(weights[f] for f in feats)
        return len(feats), logit, logit / (SCALE * len(feats))

    for weights in (None, custom):
        got = {r.doc_id: r
               for r in classifier_score(docs, n_buckets=B, scale=SCALE,
                                         weights=weights).collect()}
        assert len(got) == len(rows)
        for d, t in rows:
            assert (got[d].n_features, got[d].logit_fp,
                    got[d].score) == replay(t, weights), (d, weights is None)


def test_null_text_docs_keep_rows_everywhere(spark):
    """NULL-text documents flow through the shared ws_tokens_col
    contract (one '' token): every per-doc operator emits a row for
    them — a silent row drop (simhash's old explode of a null split)
    breaks any pipeline that inner-joins results back to the corpus."""
    from nobletools_spark.operators.dedup import exact_dedup, simhash
    from nobletools_spark.operators.textstats import (
        fingerprints, token_stats)

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d")], "doc_id long, text string")
    assert simhash(docs).count() == 2
    assert token_stats(docs).filter("n_tokens IS NULL").count() == 0
    assert fingerprints(docs).filter("content_md5 IS NULL").count() == 0
    assert exact_dedup(docs, by="bag").count() == 2


def test_minhash_lsh_rejects_bad_band_split(spark):
    """bands must divide num_hashes: a silent rows=0 keys every band on
    md5('') — one corpus-wide bucket that the skew cap then drops,
    returning zero pairs as if the corpus were duplicate-free."""
    import pytest

    from nobletools_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, num_hashes=16, bands=32)
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, num_hashes=16, bands=5)


def test_with_near_duplicates_rejects_string_ids(spark):
    """String doc_ids cannot take the clone-id offset: loud ValueError
    instead of an ANSI cast crash deep inside the plan."""
    import pytest

    from nobletools_spark.operators.dedup import with_near_duplicates

    docs = spark.createDataFrame([("d1", "a b")],
                                 "doc_id string, text string")
    with pytest.raises(ValueError):
        with_near_duplicates(docs)
