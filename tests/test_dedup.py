from __future__ import annotations

from pyspark.sql import functions as F

from redskins_rule_spark.operators.dedup import (
    dedup_by_content,
    dedup_exact,
    hamming64,
    jaccard,
    minhash_dedup_pairs,
    ngram_jaccard_pairs_exact,
    simhash,
    simhash_pairs,
)


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    other = "completely different words about spark engines and parquet columnar files"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], "doc_id long, text string"
    )


def test_dedup_exact_and_content(spark):
    df = _corpus(spark)
    assert dedup_exact(df, ["text"]).count() == 3
    groups = dedup_by_content(df, "text", "doc_id").collect()
    dup = [g for g in groups if g.dup_count == 2]
    assert len(dup) == 1 and dup[0].keep_id == 1


def test_jaccard_expr(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], "a array<string>, b array<string>")
    assert abs(df.select(jaccard(F.col("a"), F.col("b")).alias("j")).first().j - 0.5) < 1e-9


def test_minhash_dedup_pairs_finds_near_dups(spark):
    df = _corpus(spark)
    pairs = minhash_dedup_pairs(
        df, "doc_id", "text", shingle_k=5, num_perm=32, bands=16, threshold=0.6
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # identical pair always; near pair (1,3)/(2,3) should be caught at 0.6
    assert (1, 2) in got
    assert (1, 3) in got and (2, 3) in got
    assert not any(4 in p for p in got)


def test_ngram_jaccard_exact_is_lossless(spark):
    df = _corpus(spark)
    pairs = ngram_jaccard_pairs_exact(df, "doc_id", "text", n=3, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard_sim for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_properties(spark):
    df = _corpus(spark)
    vals = {r.doc_id: r.s for r in df.select("doc_id", simhash("text").alias("s")).collect()}
    assert vals[1] == vals[2]  # identical text ⇒ identical simhash
    h13 = spark.createDataFrame([(vals[1], vals[3])], "a long, b long").select(
        hamming64(F.col("a"), F.col("b")).alias("h")
    ).first().h
    h14 = spark.createDataFrame([(vals[1], vals[4])], "a long, b long").select(
        hamming64(F.col("a"), F.col("b")).alias("h")
    ).first().h
    assert h13 < h14  # near-dup closer than unrelated doc


def test_simhash_pairs_blocking_matches_brute_force(spark):
    df = _corpus(spark)
    got = {(r.id_a, r.id_b) for r in simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()}
    # brute force over all 6 pairs
    vals = {r.doc_id: r.s for r in df.select("doc_id", simhash("text").alias("s")).collect()}
    expect = set()
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(vals[a] ^ vals[b]).count("1") <= 3:
                expect.add((a, b))
    assert got == expect


def test_prefix_filter_equals_exact(spark):
    from redskins_rule_spark.operators.dedup import (
        ngram_jaccard_pairs_exact,
        ngram_jaccard_pairs_prefix,
    )
    from redskins_rule_spark.sources.io import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    exact = {tuple(r) for r in ngram_jaccard_pairs_exact(docs, "doc_id", "text", 3, 0.8).collect()}
    pref = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs, "doc_id", "text", 3, 0.8).collect()}
    assert pref == exact
    # and at a lower threshold (longer prefixes, more candidates kept)
    exact5 = {tuple(r) for r in ngram_jaccard_pairs_exact(docs, "doc_id", "text", 3, 0.5).collect()}
    pref5 = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs, "doc_id", "text", 3, 0.5).collect()}
    assert pref5 == exact5


def test_embedding_dup_pairs_threshold_not_inflated_by_rounding(spark):
    import math

    # two vectors with cosine just BELOW 0.95 that rounds to 0.95
    a = [1.0, 0.0]
    theta = math.acos(0.94996)
    b = [math.cos(theta), math.sin(theta)]
    from redskins_rule_spark.operators.dedup import embedding_dup_pairs

    df = spark.createDataFrame(
        [(1, a), (2, b)], "vec_id long, embedding array<double>"
    )
    out = embedding_dup_pairs(df, "vec_id", "embedding", threshold=0.95, dim=2)
    assert out.count() == 0
    # and a genuinely-above pair passes
    out2 = embedding_dup_pairs(df, "vec_id", "embedding", threshold=0.9, dim=2)
    assert out2.count() == 1


def test_minhash_pairs_skip_empty_shingle_docs(spark):
    from redskins_rule_spark.operators.dedup import minhash_dedup_pairs

    # one-char docs have no 5-char shingles; they must not pair
    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)] + [(10, "a" * 30), (11, "a" * 30)],
        "doc_id long, text string",
    )
    out = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(10, 11)]


def test_dedup_by_content_excludes_null_text(spark):
    from redskins_rule_spark.operators.dedup import dedup_by_content

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)], "id long, text string"
    )
    rows = dedup_by_content(df, "text", "id").collect()
    assert len(rows) == 1 and rows[0]["dup_count"] == 2


def test_max_postings_caps_only_hot_buckets(spark):
    from redskins_rule_spark.operators.dedup import pairs_from_posting_lists

    # hot bucket H holds ids 1..6 (15 pairs); small bucket S holds (1,2);
    # small bucket T holds (5,6) — so (1,2)/(5,6) each ALSO share a
    # capped bucket and must survive via their small one.
    rows = [(i, "H") for i in range(1, 7)] + [(1, "S"), (2, "S"), (5, "T"), (6, "T")]
    df = spark.createDataFrame(rows, "id long, key string")

    uncapped = {(r.id_a, r.id_b) for r in
                pairs_from_posting_lists(df, ["key"], "id").distinct().collect()}
    capped = {(r.id_a, r.id_b) for r in
              pairs_from_posting_lists(df, ["key"], "id", max_postings=3)
              .distinct().collect()}

    assert capped == {(1, 2), (5, 6)}
    # recall invariant: capped ⊆ uncapped, and every lost pair shared
    # ONLY the hot bucket
    assert capped <= uncapped
    lost = uncapped - capped
    assert lost == {(a, b) for a in range(1, 7) for b in range(a + 1, 7)} - {(1, 2), (5, 6)}


def test_max_postings_validation(spark):
    import pytest

    from redskins_rule_spark.operators.dedup import pairs_from_posting_lists

    df = spark.createDataFrame([(1, "k")], "id long, key string")
    with pytest.raises(ValueError, match="max_postings"):
        pairs_from_posting_lists(df, ["key"], "id", max_postings=1)


def test_simhash_pairs_higher_hamming_lossless(spark):
    # chunk count derives from max_hamming (k+1 pigeonhole) — blocking
    # stays lossless for k > 3, which the old fixed-4-chunk split broke.
    docs = _corpus(spark).union(
        _corpus(spark).select(
            (F.col("doc_id") + 10).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra suffix words here")).alias("text"),
        )
    )
    for k in (0, 5, 7):
        got = {(r.id_a, r.id_b) for r in
               simhash_pairs(docs, "doc_id", "text", max_hamming=k).collect()}
        vals = {r.doc_id: r.s for r in
                docs.select("doc_id", simhash("text").alias("s")).collect()}
        ids = sorted(vals)
        expect = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                  if bin(vals[a] ^ vals[b]).count("1") <= k}
        assert got == expect, f"max_hamming={k}"


def test_simhash_pairs_max_hamming_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(_corpus(spark), "doc_id", "text", max_hamming=16)


# -- FastSS edit-distance-1 fuzzy join --------------------------------------

from redskins_rule_spark.operators.dedup import fuzzy_pairs_edit1  # noqa: E402


def test_fuzzy_edit1_matches_brute_force(spark):
    names = [
        "cold ring", "old ring", "bold ring", "cold rings", "cord ring",
        "totally different", "ab", "ba", "a", "",
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs_edit1(df, "p_name").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        tuple(sorted([a, b]))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if a != b and lev(a, b) == 1
    }
    assert got == want


def test_fuzzy_edit1_dedups_and_excludes_duplicates_of_same_string(spark):
    df = spark.createDataFrame(
        [("aa",), ("aa",), ("ab",)], "p_name string"
    )
    got = [tuple(r) for r in fuzzy_pairs_edit1(df, "p_name").collect()]
    assert got == [("aa", "ab")]


def test_ngram_max_df_cut_recall_contract(spark):
    """max_df removes stop-grams from the gram UNIVERSE: pairs related
    only through a hot gram disappear, pairs sharing sub-cap grams
    survive with Jaccard computed over the filtered gram space."""
    from redskins_rule_spark.operators.dedup import ngram_jaccard_pairs_exact

    hot = "the cat sat"          # one shared 3-gram for every doc below
    rows = [
        # near-dup pair: share rare grams besides the hot one
        (1, hot + " on red mat today"),
        (2, hot + " on red mat tonight"),
        # hot-gram-only cluster: each doc otherwise unique
        *[(10 + i, hot + f" uniquely phrased tail number {i} here") for i in range(6)],
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = ngram_jaccard_pairs_exact(docs, "doc_id", "text", n=3, threshold=0.01)
    capped = ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.01, max_df=4
    )
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}

    # every doc shares 'the cat sat' (df=8 > 4): exact emits all C(8,2) pairs
    assert len(exact_pairs) == 28
    # capped: only sub-cap-gram pairs survive — the real near-dup pair
    # (plus the 'on red'-style grams it shares are df=2) — and nothing
    # related solely through the hot gram
    assert capped_pairs == {(1, 2)}
    assert capped_pairs <= exact_pairs
    # Jaccard over the FILTERED universe: both docs lose the hot grams
    # from numerator and denominator symmetrically
    sim = capped.collect()[0].jaccard_sim
    assert 0 < sim <= 1

    with __import__("pytest").raises(ValueError, match="max_df"):
        ngram_jaccard_pairs_exact(docs, "doc_id", "text", max_df=1).collect()


def test_workload_caps_inert_at_test_sf(spark):
    """q19's max_df=64 / q20's max_postings=64 must not change results
    at driver SFs (max gram df is 25, max band bucket 19 at sf0.1) —
    the cap is a scale guard, not a semantics change the oracle would
    miss."""
    from redskins_rule_spark.operators.dedup import ngram_jaccard_pairs_exact
    from redskins_rule_spark.sources.io import table

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    uncapped = ngram_jaccard_pairs_exact(docs, "doc_id", "text", n=3, threshold=0.8)
    capped = ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    )
    a = sorted(map(tuple, uncapped.collect()))
    b = sorted(map(tuple, capped.collect()))
    assert a == b and len(a) > 0


# --- keep-best-per-cluster (round-4 continuation) --------------------------

def test_keep_best_per_cluster_quality_and_ties(spark):
    from redskins_rule_spark.operators.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50), (5, 10), (6, 999)],
        "doc_id long, n_chars long",
    )
    # clusters: {1,2,3} (quality tie 2 vs 3 -> keep 2), {4,5}; 6 singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {r.cluster_id: (r.kept_id, r.kept_quality, r.cluster_size)
           for r in keep_best_per_cluster(docs, pairs, "doc_id", "n_chars").collect()}
    assert out == {1: (2, 300, 3), 4: (4, 50, 2)}
    # singleton 6 must NOT appear
    assert 6 not in out


def test_incremental_dedup_lsh(spark):
    from redskins_rule_spark.operators.dedup import incremental_dedup_lsh

    base = ("the quick brown fox jumps over the lazy dog "
            "and then runs far away into the deep green forest tonight")
    corpus = spark.createDataFrame(
        [(10, base),
         (11, base.replace("tonight", "today")),      # near-dup of base
         (12, "completely different words about spark shuffles and joins "
              "with partitions and codegen in the query engine runtime")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base),                                   # dup (sim 1.0 vs 10)
         (2, "nothing like anything in the corpus at all just noise tokens "
             "zebra quartz violin mango theremin umbrella cascade")],
        "doc_id long, text string",
    )
    out = {r.new_id: (r.is_dup, r.best_match, r.n_matches) for r in
           incremental_dedup_lsh(new, corpus, "doc_id", "text").collect()}
    assert out[1][0] is True and out[1][1] == 10 and out[1][2] >= 1
    assert out[2] == (False, None, 0)


def test_incremental_dedup_lsh_empty_text_is_novel(spark):
    from redskins_rule_spark.operators.dedup import incremental_dedup_lsh

    corpus = spark.createDataFrame(
        [(10, "some corpus document with enough words to form shingles ok")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r.new_id: r.is_dup for r in
           incremental_dedup_lsh(new, corpus, "doc_id", "text").collect()}
    assert out == {1: False, 2: False}


def test_lsh_max_postings_cap_fires_and_recall_contract_holds(spark):
    """VERDICT r4 item 5: exercise `max_postings` on a corpus where a
    band bucket is ACTIVELY hot (50 postings >> cap 10), not inert.

    - pairs whose ONLY shared bucket is the hot one are dropped (the
      documented cut: a bucket shared by dozens of items carries no
      discriminating signal at scale);
    - a true near-dup pair that ALSO shares a sub-cap bucket survives
      (the recall contract: lost only if EVERY shared bucket is hot);
    - uncapped run on the same corpus emits the full quadratic set,
      proving the cap (not the data) removed the rest.
    """
    from redskins_rule_spark.operators.dedup import lsh_candidates

    num_perm, bands = 64, 16
    r = num_perm // bands

    def sig(band_slices: dict[int, int], uniq: int) -> list[int]:
        # band b's slice hashes equal iff the 4 values equal; unseeded
        # bands get values unique to `uniq` so they collide with nobody
        out = []
        for b in range(bands):
            v = band_slices.get(b, 1_000_000 + uniq * bands + b)
            out += [v] * r
        return out

    rows = [(i, sig({0: 1}, i)) for i in range(50)]  # hot band-0 bucket
    rows += [(100, sig({0: 1, 1: 7}, 100)), (101, sig({0: 1, 1: 7}, 101))]
    df = spark.createDataFrame(rows, "doc_id long, minhash array<long>")

    capped = {
        (p.id_a, p.id_b)
        for p in lsh_candidates(
            df, "doc_id", "minhash", num_perm, bands, max_postings=10
        ).collect()
    }
    # the 52-posting band-0 bucket was dropped whole; (100, 101)
    # survives through its 2-posting band-1 bucket
    assert capped == {(100, 101)}

    uncapped = {
        (p.id_a, p.id_b)
        for p in lsh_candidates(df, "doc_id", "minhash", num_perm, bands).collect()
    }
    assert len(uncapped) == 52 * 51 // 2  # full quadratic set without the cap
    assert (100, 101) in uncapped


from redskins_rule_spark.functions.hashing import word_shingles  # noqa: E402
from redskins_rule_spark.operators.dedup import distinct_word_ngram_rows  # noqa: E402


def test_arrow_gram_rows_match_expression_pipeline(spark):
    """distinct_word_ngram_rows (the Arrow tokenizer that replaced the
    interpreted-HOF gram pipeline inside _gram_intersections, r13 opt)
    must emit the EXACT row set of
    explode(array_distinct(word_shingles(text, n))) — including the
    Java-regex \\s+ edge cases: leading/trailing non-space whitespace
    produces empty tokens on both paths, trim strips 0x20 only, NULL
    and <n-token docs emit nothing."""
    rows = [
        (1, "a b c d"),
        (2, None),
        (3, ""),
        (4, "  x  y\tz  w "),
        (5, "\ta b c"),
        (6, "a b c\n"),
        (7, "one two"),
        (8, "a b c a b c a b c"),
        (9, "é € \U00010348 x y"),
        (10, "a\x0bb c d"),
        (11, " "),
        (12, "tok " * 50),
        (13, " x y z w "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3):
        old = docs.select(
            "doc_id",
            F.explode(F.array_distinct(word_shingles("text", n))).alias("gram"),
        )
        new = distinct_word_ngram_rows(docs, "doc_id", "text", n)
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0
        assert old.count() == new.count()


def test_arrow_simhash_matches_expression_pipeline(spark):
    """_simhash_arrow (the Arrow signature path behind with_simhash,
    r13 opt) must emit the EXACT (id, sig) row set of the expression
    pipeline — explode(array_distinct(split)) + per-bit SUM votes —
    for BOTH known hash families (xxhash64 seed-7 via the pure-Python
    XXH64 port; the xengine dual rolling hash), including NULL text
    (dropped), empty/whitespace-only text (token '' votes), unicode
    code points (split('')/ascii = ord), and ≥32-byte tokens (the
    XXH64 stripe loop)."""
    from functools import reduce

    from redskins_rule_spark.functions.hashing import (
        hashed,
        simhash_token_hash_xengine,
    )
    from redskins_rule_spark.operators.dedup import with_simhash

    rows = [
        (1, "a b c d"),
        (2, None),
        (3, ""),
        (4, "  x  y\tz  w "),
        (5, "é € \U00010348 mix"),
        (6, "a"),
        (7, "a a a b"),
        (8, "x" * 200),
        (9, "y" * 32 + " " + "z" * 33),
        (10, " lead trail "),
        (11, "tok " * 50),
        (12, "\t\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def expr_sig(hash_expr, bits):
        c = F.col("text")
        toks = F.array_distinct(F.split(F.trim(c), r"\s+"))
        ex = docs.select(F.col("doc_id"), F.explode(toks).alias("__t")).select(
            "doc_id", hash_expr(F.col("__t")).alias("__h")
        )
        votes = ex.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1))
                ).alias(f"__b{j}")
                for j in range(bits)
            ],
        )
        terms = [
            F.when(
                F.col(f"__b{j}") * 2 > F.col("__n"),
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(bits)
        ]
        sig = reduce(lambda x, y: x.bitwiseOR(y), terms)
        return votes.select(F.col("doc_id"), sig.alias("__sim"))

    for fam_expr, bits in [
        (None, 64),
        (simhash_token_hash_xengine, 62),
    ]:
        ref = expr_sig(
            fam_expr if fam_expr is not None else (lambda t: hashed(t, 7)),
            bits,
        )
        got = with_simhash(
            docs, "doc_id", "text", out="__sim", bits=bits, hash_expr=fam_expr
        )
        # the arrow path must actually be in play (no silent fallback)
        assert "MapInPandas" in got._jdf.queryExecution().executedPlan().toString()
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0
        assert got.count() == ref.count() == 11  # NULL row dropped


def test_arrow_minhash_rows_match_expression_pipeline(spark):
    """word_ngram_minhash_rows (the Arrow grams+signature pass behind
    q20/q83/q140, r13 opt) must emit the EXACT (id, g, sig) row set —
    gram-array order included — of
    array_distinct(word_shingles(text, n)) +
    minhash_signature_xengine(g, k), and drop NULL/<n-token docs the
    way the callers' where(size(g) > 0) did."""
    from redskins_rule_spark.functions.hashing import (
        minhash_signature_xengine,
        word_shingles,
    )
    from redskins_rule_spark.operators.dedup import word_ngram_minhash_rows

    rows = [
        (1, "a b c d e"),
        (2, None),
        (3, ""),
        (4, "one two"),          # < 3 tokens -> dropped at n=3
        (5, "  x  y\tz  w "),
        (6, "é € \U00010348 p q r"),
        (7, "tok " * 50),
        (8, " lead mid trail "),
        (9, "a\x0bb c d e"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n, k in [(3, 8), (2, 4)]:
        grams = F.array_distinct(word_shingles("text", n))
        ref = (
            docs.select("doc_id", grams.alias("g"))
            .where(F.size("g") > 0)
            .withColumn("sig", minhash_signature_xengine(F.col("g"), k))
        )
        got = word_ngram_minhash_rows(docs, "doc_id", "text", n, k)
        assert "MapInPandas" in got._jdf.queryExecution().executedPlan().toString()
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0
        assert got.count() == ref.count()
