from __future__ import annotations

import math

from pyspark.sql import functions as F

from redskins_rule_spark.operators.similarity import (
    assign_ivf_cells,
    cosine,
    cosine_topk,
    cosine_topk_for_id,
    ivf_topk,
)
from redskins_rule_spark.operators.text import (
    lang_id,
    quality_score,
    subword_token_count,
    token_count,
)


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_expr(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<double>, b array<double>")
    got = [r.c for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert got == [0.0, 1.0]


def test_cosine_topk_literal_query(spark):
    out = cosine_topk(_vecs(spark), [1.0, 0.0, 0.0], "vec_id", "embedding", k=2).collect()
    assert [r.vec_id for r in out] == [0, 1]


def test_cosine_topk_for_id_excludes_self(spark):
    out = cosine_topk_for_id(_vecs(spark), 0, "vec_id", "embedding", k=2).collect()
    assert [r.vec_id for r in out] == [1, 4]


def test_ivf_matches_brute_force_on_probed_space(spark):
    df = _vecs(spark)
    centroids = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    cells = {r.vec_id: r.cell for r in assign_ivf_cells(df, centroids, "embedding").collect()}
    assert cells[0] == 0 and cells[2] == 1 and cells[3] == 2
    out = ivf_topk(df, centroids, [1.0, 0.05, 0.0], "vec_id", "embedding", k=3, nprobe=2)
    ids = [r.vec_id for r in out.collect()]
    assert ids[0] == 0 and 3 not in ids  # cell 2 pruned


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat with a hat in the flat today ok",), ("x",)],
        "text string",
    )
    rows = df.select(
        token_count("text").alias("n"),
        subword_token_count("text").alias("sw"),
        quality_score("text").alias("q"),
    ).collect()
    assert rows[0].n == 14 and rows[1].n == 1
    assert rows[0].sw >= 14 - 2  # short words ≈ 1 subword each
    assert rows[0].q > rows[1].q  # long stopword-y text scores higher


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("el perro y la casa de un gato es",),
            ("qqq zzz www",),
        ],
        "text string",
    )
    got = [r.lang for r in df.select(lang_id("text").alias("lang")).collect()]
    assert got == ["en", "es", "und"]


def test_train_ivf_centroids_and_full_probe_equals_brute_force(spark):
    from redskins_rule_spark.operators.similarity import (
        assign_ivf_cells,
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )
    from redskins_rule_spark.sources.io import table
    from pyspark.sql import functions as F

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    k = 4
    cents = train_ivf_centroids(emb, "vec_id", "embedding", k=k, iters=3)
    assert len(cents) == k and all(len(c) == 64 for c in cents)
    # every vector lands in a valid cell
    cells = assign_ivf_cells(emb, cents, "embedding").select("cell").distinct()
    assert {r["cell"] for r in cells.collect()} <= set(range(k))

    qvec = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
    body = emb.where(F.col("vec_id") != 1)
    # probing ALL cells must equal exact brute force (losslessness of
    # the pruning mechanism itself)
    approx = {tuple(r) for r in ivf_topk(body, cents, qvec, "vec_id", "embedding", k=5, nprobe=k).collect()}
    exact = {tuple(r) for r in cosine_topk(body, qvec, "vec_id", "embedding", k=5).collect()}
    assert approx == exact


# -- inverted index ----------------------------------------------------------

from redskins_rule_spark.operators.text import build_inverted_index  # noqa: E402


def test_inverted_index_postings_sorted_dedup_and_df_window(spark):
    docs = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "banana cherry"),
            (2, "banana! only-here cherry"),
        ],
        "doc_id bigint, text string",
    )
    idx = {
        r["token"]: (r["df"], list(r["postings"]))
        for r in build_inverted_index(docs, min_df=2, max_df=2).collect()
    }
    # 'banana' df=3 exceeds max_df (stop-token cut); 'only'/'here'/'apple'
    # df=1 below min_df; duplicates within a doc collapse
    assert idx == {"cherry": (2, [1, 2])}


def test_inverted_index_df_counts_distinct_docs_not_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "x x x"), (2, "x")], "doc_id bigint, text string"
    )
    [(df_, postings)] = [
        (r["df"], list(r["postings"]))
        for r in build_inverted_index(docs, min_df=2).collect()
    ]
    assert (df_, postings) == (2, [1, 2])


# -- repetition + decontamination -------------------------------------------

from redskins_rule_spark.operators.text import (  # noqa: E402
    contamination_pairs,
    repetition_stats,
)


def test_repetition_dup_fraction(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 trigrams, 3 distinct
            (2, "one two three four"),  # 2 trigrams, all distinct
            (3, "too short"),  # no trigram -> dropped
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["dup_frac"]) for r in repetition_stats(docs).collect()}
    assert got == {1: (7, round(1 - 3 / 7, 4)), 2: (2, 0.0)}


def test_contamination_counts_distinct_shared_shingles(spark):
    corpus = spark.createDataFrame(
        [(10, "the quick brown fox jumps over"), (11, "totally unrelated words here now")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(1, "quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    got = [
        (r["doc_id"], r["bench_id"], r["n_shared"])
        for r in contamination_pairs(corpus, bench, min_shared=2).collect()
    ]
    # shared trigrams: 'quick brown fox', 'brown fox jumps', 'fox jumps over'
    assert got == [(10, 1, 3)]


def test_contamination_benchmark_side_is_broadcast(spark):
    from redskins_rule_spark.plans.explain import formatted_plan

    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    bench = spark.createDataFrame([(2, "b c d e")], "doc_id bigint, text string")
    assert "BroadcastHashJoin" in formatted_plan(
        contamination_pairs(corpus, bench)
    )


def test_inverted_index_vocabulary_pushdown(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple cherry")], "doc_id bigint, text string"
    )
    got = {
        r["token"]: (r["df"], list(r["postings"]))
        for r in build_inverted_index(
            docs, min_df=1, vocabulary=["apple"]
        ).collect()
    }
    assert got == {"apple": (2, [1, 2])}


def test_inverted_index_prepass_path_equals_single_agg(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} shared") for i in range(9)], "doc_id bigint, text string"
    )
    pre = {
        (r["token"], r["df"], tuple(r["postings"]))
        for r in build_inverted_index(docs, min_df=1, max_df=100).collect()
    }
    single = {
        (r["token"], r["df"], tuple(r["postings"]))
        for r in build_inverted_index(docs, min_df=1).collect()
    }
    assert pre == single


# --- vocab_prune ---------------------------------------------------------

def test_vocab_prune_semantics(spark):
    from redskins_rule_spark.operators.text import vocab_prune

    # 10 docs all containing 'common'; 'rare' appears twice; 'mid' in 3 docs
    rows = [(i, "common mid keepme" if i < 3 else "common keepme") for i in range(10)]
    rows[0] = (0, "common rare mid keepme")
    rows[1] = (1, "rare common mid keepme")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.kept for r in vocab_prune(df, max_df_ratio=0.7, min_count=3).collect()}
    # 'common' df=10 > 7 -> dropped; 'rare' cnt=2 < 3 -> dropped;
    # 'mid' df=3 cnt=3 -> kept; 'keepme' df=10 -> dropped (boilerplate)
    assert out[0] == ["mid"] and out[1] == ["mid"] and out[2] == ["mid"]
    assert set(out) == {0, 1, 2}  # docs with no survivors drop out


def test_vocab_prune_preserves_order(spark):
    from redskins_rule_spark.operators.text import vocab_prune

    df = spark.createDataFrame(
        [(i, "b a b c a") for i in range(3)], "doc_id long, text string"
    )
    out = vocab_prune(df, max_df_ratio=1.0, min_count=3).collect()
    assert all(r.kept == ["b", "a", "b", "c", "a"] for r in out)


# --- product quantization ------------------------------------------------

def _pq_vectors(spark, n=64, dim=8, vocab=4):
    # vectors whose subvectors come from a tiny vocabulary -> codebooks
    # with k >= vocab can represent them EXACTLY
    rows = []
    for i in range(n):
        v = []
        for s in range(2):  # m=2 subspaces of width 4
            j = (i * (s + 3)) % vocab
            v += [float(j), float(j + 1), float(2 * j), 1.0]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_exact_when_codebook_covers_vocab(spark):
    from redskins_rule_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    df = _pq_vectors(spark)
    books = train_pq_codebooks(df, "vec_id", "embedding", m=2, k=4, iters=4)
    coded = pq_encode(df, books, "embedding")
    q = [float(x) for x in df.where("vec_id = 0").first()["embedding"]]
    got = pq_topk(coded, books, q, "vec_id", k=5).collect()
    # exact representation -> ADC distance == true squared L2; the
    # query vector itself must rank first at distance 0
    assert got[0]["vec_id"] == 0 and got[0]["approx_dist"] == 0.0
    # verify against brute-force squared L2
    import math
    rows = {r["vec_id"]: r["embedding"] for r in df.collect()}
    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))
    want = sorted(rows, key=lambda i: (round(l2sq(rows[i], q), 9), i))[:5]
    assert [r["vec_id"] for r in got] == want


def test_pq_recall_on_clustered_embeddings(spark):
    """Lossy-regime recall: 64-dim vectors around 8 cluster centers
    with per-coordinate noise. PQ (m=4, k=16) must retrieve the
    query's own cluster ahead of the other seven. (On pure
    i.i.d.-random vectors distance concentration makes ANY quantizer
    near-useless, so random data is not a meaningful recall fixture;
    the exactness test above pins the encode/ADC arithmetic.)"""
    from redskins_rule_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    import random

    rng = random.Random(7)
    centers = [
        [rng.uniform(-1, 1) for _ in range(64)] for _ in range(8)
    ]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, [x + rng.gauss(0, 0.05) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = train_pq_codebooks(df, "vec_id", "embedding", m=4, k=16, iters=4)
    coded = pq_encode(df, books, "embedding")
    q = [float(x) for x in df.where("vec_id = 0").first()["embedding"]]
    approx = [r["vec_id"] for r in pq_topk(coded, books, q, "vec_id", k=10).collect()]
    data = {r["vec_id"]: r["embedding"] for r in df.collect()}

    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    exact = sorted(data, key=lambda i: (l2sq(data[i], q), i))[:10]
    assert approx[0] == 0
    # within a cluster all members quantize to the same codes, so
    # intra-cluster order is tie-broken by id — the PQ contract here is
    # CLUSTER identification: every returned neighbor (and every exact
    # neighbor) must come from the query's own cluster (vec_id % 8 == 0)
    assert all(i % 8 == 0 for i in approx)
    assert all(i % 8 == 0 for i in exact)


# --- bigram LM surprisal (round-4 continuation) ----------------------------

def test_bigram_lm_nll_matches_python_reference(spark):
    import math
    import re
    from collections import Counter

    from redskins_rule_spark.operators.text import bigram_lm_nll

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
        (4, "zzz"),                     # single token -> no bigrams, dropped
    ]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    out = {r.doc_id: (r.n_bigrams, r.nll)
           for r in bigram_lm_nll(df, "doc_id", "text").collect()}

    toks = {i: [t for t in re.split(r"[^a-z]+", s.lower()) if t]
            for i, s in corpus}
    vocab = {t for ws in toks.values() for t in ws}
    c2: Counter = Counter()
    c1: Counter = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    for i, ws in toks.items():
        bigrams = list(zip(ws, ws[1:]))
        if not bigrams:
            assert i not in out
            continue
        nll = -sum(
            math.log(c2[(a, b)] + 1) - math.log(c1[a] + v) for a, b in bigrams
        ) / len(bigrams)
        assert out[i][0] == len(bigrams)
        assert out[i][1] == round(nll, 4), i


def test_bigram_lm_repeated_bigram_multiplicity(spark):
    # "go go go" has the bigram (go,go) twice; multiplicity must count
    from redskins_rule_spark.operators.text import bigram_lm_nll

    df = spark.createDataFrame(
        [(1, "go go go"), (2, "stop go stop")], "doc_id int, text string"
    )
    out = {r.doc_id: r.n_bigrams for r in
           bigram_lm_nll(df, "doc_id", "text").collect()}
    assert out == {1: 2, 2: 2}


# --- PII scrubbing ----------------------------------------------------------

def test_scrub_pii_all_classes(spark):
    from redskins_rule_spark.operators.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@sub.example.co.uk now, dial +1 555-0134, "
             "host 10.0.255.3 end")],
        "id int, t string",
    )
    counts = pii_counts("t")
    row = df.select(
        scrub_pii("t").alias("s"),
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ip"].alias("i"),
    ).collect()[0]
    assert row.e == 1 and row.p == 1 and row.i == 1
    assert row.s == "mail <EMAIL> now, dial <PHONE>, host <IP> end"


def test_scrub_pii_email_before_ip_ordering(spark):
    # dotted-digit subdomain inside a real email: email-first scrubbing
    # must emit ONE <EMAIL>, not 'a@<IP>.example.com'
    from redskins_rule_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "x a@10.0.0.1.example.com y")], "id int, t string"
    )
    assert df.select(scrub_pii("t").alias("s")).collect()[0].s == "x <EMAIL> y"


def test_bm25_topk_matches_python_reference(spark):
    import math
    import re
    from collections import Counter

    from redskins_rule_spark.operators.text import bm25_topk

    corpus = [
        (1, "spark table spark window"),
        (2, "table only here"),
        (3, "no relevant words at all"),
        (4, "window window window table spark"),
    ]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    got = [(r.doc_id, r.score, r.n_terms_hit) for r in
           bm25_topk(df, "doc_id", "text",
                     ["spark", "table", "window"], k=3).collect()]

    toks = {i: re.findall(r"[a-z]+", s.lower()) for i, s in corpus}
    dl = {i: len(ws) for i, ws in toks.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    tf = {i: Counter(w for w in ws if w in {"spark", "table", "window"})
          for i, ws in toks.items()}
    dfreq = Counter(t for c in tf.values() for t in c)
    want = []
    for i in toks:
        if not tf[i]:
            continue
        s = sum(
            math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1)
            * f / (f + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl))
            for t, f in tf[i].items()
        )
        want.append((i, round(s, 4), len(tf[i])))
    want.sort(key=lambda t: (-t[1], t[0]))
    assert got == want[:3]


def test_block_dedup_first_occurrence_wins(spark):
    from redskins_rule_spark.operators.text import block_dedup

    blk_a = "a b c d"          # 4-token block (block_tokens=4)
    blk_b = "e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{blk_a} {blk_b}"),       # both blocks first here
            (2, f"{blk_b} x y z w"),       # blk_b dup -> dropped; new block kept
            (3, blk_a),                    # entire doc is a dup -> empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_blocks, r.n_kept, r.kept_text)
           for r in block_dedup(docs, "doc_id", "text", block_tokens=4).collect()}
    assert out == {
        1: (2, 2, f"{blk_a} {blk_b}"),
        2: (2, 1, "x y z w"),
        3: (1, 0, ""),
    }


def test_block_dedup_within_doc_repeat_also_dropped(spark):
    from redskins_rule_spark.operators.text import block_dedup

    docs = spark.createDataFrame(
        [(1, "p q r s p q r s")], "doc_id long, text string"
    )
    out = block_dedup(docs, "doc_id", "text", block_tokens=4).collect()[0]
    assert (out.n_blocks, out.n_kept, out.kept_text) == (2, 1, "p q r s")


def test_cosine_topk_batch_matches_per_query_brute_force(spark):
    import numpy as np

    from redskins_rule_spark.operators.similarity import cosine_topk_batch

    rng = np.random.default_rng(5)
    corpus_vecs = rng.normal(size=(30, 8))
    query_vecs = rng.normal(size=(3, 8))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus_vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(query_vecs)],
        "query_id long, embedding array<double>",
    )
    got = {}
    for r in cosine_topk_batch(corpus, queries, "vec_id", "embedding",
                               k=5).collect():
        got.setdefault(r.query_id, []).append(r.vec_id)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qi, qv in enumerate(query_vecs):
        sims = [(round(cos(qv, cv), 4), i) for i, cv in enumerate(corpus_vecs)]
        want = [i for _, i in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        assert got[100 + qi] == want, qi


def test_ivf_topk_batch_full_probe_equals_exact_batch(spark):
    import numpy as np

    from redskins_rule_spark.operators.similarity import (
        cosine_topk_batch,
        ivf_topk_batch,
        train_ivf_centroids,
    )
    from redskins_rule_spark.sources.io import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = train_ivf_centroids(emb, "vec_id", "embedding", k=4, iters=2)
    rng = np.random.default_rng(3)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=64)]) for i in range(3)],
        "query_id long, embedding array<double>",
    )
    exact = {(r.query_id, r.vec_id) for r in cosine_topk_batch(
        emb, queries, "vec_id", "embedding", k=5).collect()}
    # probing ALL cells must equal the exact batch result
    full = {(r.query_id, r.vec_id) for r in ivf_topk_batch(
        emb, cents, queries, "vec_id", "embedding", k=5, nprobe=4).collect()}
    assert full == exact
    # pruned probe returns k rows per query from the probed cells only
    pruned = ivf_topk_batch(
        emb, cents, queries, "vec_id", "embedding", k=5, nprobe=1
    ).groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in pruned)


def test_rrf_fuse_matches_hand_computation(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.text import rrf_fuse

    la = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, rank int"
    )
    lb = spark.createDataFrame(
        [("b", 1), ("a", 2), ("d", 3)], "id string, rank int"
    )
    got = {
        r.id: (r.n_lists, round(r.rrf_score, 6))
        for r in rrf_fuse([la, lb], "id", k=60).collect()
    }
    assert got == {
        "a": (2, round(1 / 61 + 1 / 62, 6)),
        "b": (2, round(1 / 62 + 1 / 61, 6)),
        "c": (1, round(1 / 63, 6)),
        "d": (1, round(1 / 63, 6)),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([], "id")


# --- round-5: SRP (hyperplane) LSH --------------------------------------


def test_srp_bits_match_numpy_reference(spark):
    """Signature bits equal sign(V @ W.T >= 0) computed by numpy for
    the same deterministic integer planes."""
    import numpy as np

    from redskins_rule_spark.operators.similarity import (
        srp_plane_weight,
        srp_signature_bits,
    )

    rng = np.random.RandomState(3)
    dim, n_planes = 16, 8
    V = rng.randn(20, dim)
    W = np.array(
        [[srp_plane_weight(j, i, dim) for i in range(dim)]
         for j in range(n_planes)],
        dtype=np.float64,
    )
    expect = (V @ W.T) >= 0

    df = spark.createDataFrame(
        [(k, [float(x) for x in V[k]]) for k in range(20)],
        "vec_id long, v array<double>",
    )
    got = {
        r.vec_id: r.bits
        for r in df.select(
            "vec_id",
            srp_signature_bits(F.col("v"), n_planes, dim).alias("bits"),
        ).collect()
    }
    for k in range(20):
        assert got[k] == [bool(b) for b in expect[k]], k


def test_srp_lsh_finds_planted_near_dups_and_is_subquadratic(spark):
    """A planted pair of nearly-identical vectors collides in (at
    least) one band and survives the cosine verify; orthogonal
    distractors with cosine < threshold never appear in the output
    even when they share a band bucket (verify kills them)."""
    import numpy as np

    from redskins_rule_spark.operators.similarity import srp_lsh_pairs

    rng = np.random.RandomState(11)
    dim = 16
    base = rng.randn(dim)
    near = base + 0.01 * rng.randn(dim)  # cosine ~ 0.9999
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near])]
    rows += [
        (k, [float(x) for x in rng.randn(dim)]) for k in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = srp_lsh_pairs(
        df, "vec_id", "v", dim=dim, n_planes=16, bands=4, threshold=0.95
    ).collect()
    pairs = {(r.id_a, r.id_b): r.cos_sim for r in out}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] > 0.99
    assert all(p == (0, 1) for p in pairs)  # distractors verified away


def test_srp_lsh_max_postings_caps_hot_buckets(spark):
    """All-identical vectors collide in EVERY band (one hot bucket
    per band); with max_postings below the family size the whole
    family is dropped, while a pair in a cool bucket still survives
    through its own bands."""
    import numpy as np

    from redskins_rule_spark.operators.similarity import srp_lsh_pairs

    rng = np.random.RandomState(5)
    dim = 16
    hot = [float(x) for x in rng.randn(dim)]
    cool = rng.randn(dim)
    rows = [(k, hot) for k in range(30)]
    rows += [(100, [float(x) for x in cool]),
             (101, [float(x) for x in cool + 0.001 * rng.randn(dim)])]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    capped = srp_lsh_pairs(
        df, "vec_id", "v", dim=dim, n_planes=16, bands=4,
        threshold=0.9, max_postings=10,
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(100, 101)}
    uncapped = srp_lsh_pairs(
        df, "vec_id", "v", dim=dim, n_planes=16, bands=4, threshold=0.9
    ).collect()
    assert len(uncapped) == 30 * 29 // 2 + 1  # full family + the cool pair


def test_knn_label_consistency_flags_planted_mislabel(spark):
    """Three tight clusters; one vector carries the wrong label — it
    must be the ONLY suspect, and its knn_label must be its cluster's
    true label. Votes are unanimous (n_agree == k) inside clusters."""
    import numpy as np

    from redskins_rule_spark.operators.similarity import (
        knn_label_consistency,
    )

    rng = np.random.RandomState(2)
    dim, per = 8, 6
    rows = []
    vid = 0
    for c in range(3):
        center = np.zeros(dim)
        center[c] = 10.0
        for _ in range(per):
            v = center + 0.05 * rng.randn(dim)
            label = c
            if vid == 7:  # planted mislabel inside cluster 1
                label = 0
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, label int")
    out = {r.id: r for r in knn_label_consistency(
        df, "vec_id", "v", "label", k=5).collect()}
    suspects = [i for i, r in out.items() if r.is_suspect]
    assert suspects == [7]
    assert out[7].knn_label == 1 and out[7].n_agree == 5
    # everyone else's majority is their own label; cluster-1 members
    # see the planted mislabel in their panel (n_agree 4), the other
    # clusters vote unanimously (n_agree 5)
    for i, r in out.items():
        if i == 7:
            continue
        assert r.knn_label == r.label
        assert r.n_agree == (4 if 6 <= i < 12 else 5), (i, r)


def test_round_half_up_like_sql_matches_spark_round(spark):
    """ADVICE r5: the exact-kNN block-local selection key must round
    IDENTICALLY to the downstream F.round (BigDecimal HALF_UP on the
    shortest decimal repr) — the pure-binary floor(x*1e4+0.5) path can
    disagree for doubles essentially on a .00005 boundary, dropping a
    true global top-k row inside its block. Pin the helper against
    Spark's own round over a battery of boundary-adversarial doubles."""
    import numpy as np
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.similarity import (
        _round_half_up_like_sql,
    )

    vals = []
    for m in range(-60, 61):
        x = (m + 0.5) / 1e4  # binary double nearest the decimal boundary
        for _ in range(4):
            x = np.nextafter(x, -np.inf)
        for _ in range(9):  # 4 ulps below .. 4 ulps above
            vals.append(float(x))
            x = np.nextafter(x, np.inf)
    vals += [i * 0.000037 - 0.001 for i in range(100)]  # plain values

    got = _round_half_up_like_sql(np.array(vals, dtype=np.float64), 4)
    exp = {
        r.i: r.r
        for r in spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, x double"
        ).select("i", F.round("x", 4).alias("r")).collect()
    }
    mismatches = [
        (vals[i], got[i], exp[i])
        for i in range(len(vals))
        if got[i] != exp[i]
    ]
    assert mismatches == []
    # and the battery genuinely exercises the slow path: the naive
    # binary rounding must disagree somewhere in it
    naive = np.floor(np.array(vals) * 1e4 + 0.5) / 1e4
    assert any(naive[i] != exp[i] for i in range(len(vals)))


def test_knn_blocked_autosize_and_byte_budget(spark, monkeypatch):
    """VERDICT r5 item 2: block packing is byte-budgeted in CODE —
    num_blocks=None derives B from n*row_bytes/block_bytes, an
    over-budget explicit sizing raises with the minimum feasible B,
    and the auto-sized result is identical to an explicit one (the
    operator is exact for ANY block count)."""
    import pytest

    from redskins_rule_spark.operators import similarity

    rows = [
        (i, [float((i * j) % 7 + 1) for j in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    base = sorted(
        (r.id, r.nb, r.cos_sim)
        for r in similarity.knn_candidates_blocked(
            df, "id", "v", k=3, num_blocks=4
        ).collect()
    )
    # 40 rows * (8*8 + 48) B = 4480 B total -> ceil(4480/512) = 9 blocks
    auto = sorted(
        (r.id, r.nb, r.cos_sim)
        for r in similarity.knn_candidates_blocked(
            df, "id", "v", k=3, num_blocks=None, block_bytes=512
        ).collect()
    )
    assert auto == base

    monkeypatch.setattr(similarity, "_MAX_BLOCK_BYTES", 1000)
    with pytest.raises(ValueError, match="block ceiling"):
        similarity.knn_candidates_blocked(df, "id", "v", k=3, num_blocks=1)
    # the error names the minimum feasible block count: ceil(4480/1000)=5
    with pytest.raises(ValueError, match="num_blocks>=5"):
        similarity.knn_candidates_blocked(df, "id", "v", k=3, num_blocks=2)


def test_passage_dedup_removes_long_passages_keeps_incidental(spark):
    """The Lee-et-al. contract: a boilerplate PASSAGE (>= min_run
    consecutive duplicate blocks) repeated in a later doc is removed
    whole, while a single duplicated block inside otherwise novel
    text survives; min_run=1 degenerates to block_dedup exactly."""
    from redskins_rule_spark.operators.text import block_dedup, passage_dedup

    passage = "p1 p2 p3 p4 p5 p6 p7 p8"  # two 4-token blocks
    docs = spark.createDataFrame(
        [
            (1, passage + " tail1 tail2 tail3 tail4"),
            # later doc: same 8-token passage (2 dup blocks, removed
            # whole) + one incidental repeat of a single block from
            # doc 1's tail (kept) + novel text
            (2, passage + " n1 n2 n3 n4 tail1 tail2 tail3 tail4 m1 m2 m3 m4"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in passage_dedup(
        docs, "doc_id", "text", block_tokens=4, min_run=2).collect()}
    assert out[1].n_kept == out[1].n_blocks == 3  # first occurrence intact
    assert out[2].n_blocks == 5 and out[2].n_kept == 3
    # the >=2-block passage is gone; the single-block repeat survived
    assert out[2].kept_text == "n1 n2 n3 n4 tail1 tail2 tail3 tail4 m1 m2 m3 m4"

    a = {(r.doc_id, r.n_blocks, r.n_kept, r.kept_text)
         for r in passage_dedup(
             docs, "doc_id", "text", block_tokens=4, min_run=1).collect()}
    b = {(r.doc_id, r.n_blocks, r.n_kept, r.kept_text)
         for r in block_dedup(docs, "doc_id", "text", block_tokens=4).collect()}
    assert a == b


def test_cosine_pairs_blocked_autosize_and_budget(spark, monkeypatch):
    """The shared _resolve_num_blocks budget applies to
    cosine_pairs_blocked too: auto-sizing changes only the block
    layout, never the (exact) result; over-budget sizing raises."""
    import pytest

    from redskins_rule_spark.operators import similarity

    rows = [
        (i, [float((i * j) % 5 + 1) for j in range(6)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    base = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.9, num_blocks=4
        ).collect()
    )
    assert base  # non-trivial fixture
    auto = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.9, num_blocks=None, block_bytes=400
        ).collect()
    )
    assert auto == base
    monkeypatch.setattr(similarity, "_MAX_BLOCK_BYTES", 500)
    with pytest.raises(ValueError, match="cosine_pairs_blocked.*block ceiling"):
        similarity.cosine_pairs_blocked(df, "id", "v", 0.9, num_blocks=1)


def test_train_ivf_centroids_sample_rows(spark):
    """sample_rows trains on a deterministic hash-modulus slice:
    partitioning-independent (same centroids under repartition), a
    sample covering the whole corpus (sample_rows >= n) degenerates
    to full training, and sample_rows < k is rejected."""
    import pytest

    from redskins_rule_spark.operators.similarity import train_ivf_centroids

    rows = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(4)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    full = train_ivf_centroids(df, "vec_id", "v", k=3, iters=2)
    degenerate = train_ivf_centroids(
        df, "vec_id", "v", k=3, iters=2, sample_rows=60
    )
    assert degenerate == full

    s1 = train_ivf_centroids(
        df, "vec_id", "v", k=3, iters=2, sample_rows=20
    )
    s2 = train_ivf_centroids(
        df.repartition(7), "vec_id", "v", k=3, iters=2, sample_rows=20
    )
    assert s1 == s2  # hash slice ignores physical layout
    assert len(s1) == 3 and all(len(c) == 4 for c in s1)

    with pytest.raises(ValueError, match="sample_rows must be >= k"):
        train_ivf_centroids(df, "vec_id", "v", k=5, sample_rows=3)


def test_train_ivf_centroids_unlucky_slice_widens(spark):
    """ADVICE r6: the hash-modulus training slice is ~binomial around
    sample_rows — when the slice lands with fewer than k rows the
    trainer must WIDEN the modulus (ultimately to the full corpus)
    instead of silently training fewer than k centroids. Fixture: ids
    chosen so the initial d=5 slice (xxhash64(id,7) % 5 == 0) holds
    fewer than k=3 rows."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.similarity import train_ivf_centroids

    base = spark.range(0, 400).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(7)), F.lit(5))
        .alias("slot"),
    )
    # keep every row OUTSIDE slot 0 plus exactly one inside it: the
    # d=ceil(n/sample_rows)=5 slice then has 1 < k rows
    ids = [r.vec_id for r in base.where("slot != 0").collect()][:95]
    ids += [r.vec_id for r in base.where("slot = 0").limit(1).collect()]
    rows = [
        (int(i), [float((i * 7 + j * 3) % 11) for j in range(4)])
        for i in sorted(ids)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    n = df.count()
    assert n >= 90  # sanity: d = ceil(96/20) = 5 on this fixture
    cents = train_ivf_centroids(
        df, "vec_id", "v", k=3, iters=2, sample_rows=20
    )
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)
    assert len({tuple(c) for c in cents}) == 3  # three REAL centroids


def test_resolve_num_blocks_cheap_sizing_and_opt_out(spark, monkeypatch):
    """ADVICE r6: block sizing must not pre-scan the vector column.
    Three pins: (1) auto-sizing and the over-budget ValueError still
    work off the one-row dim probe + count; (2) the sizing plan
    contains NO aggregate over size(v) — the old max(size(...)) read
    every row's array; (3) explicit num_blocks + validate=False runs
    ZERO jobs, pinned by resolving against a frame whose evaluation
    always throws (mapInPandas that raises)."""
    import pytest
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators import similarity

    rows = [(i, [float(j) for j in range(6)]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    # (1) auto-size from byte budget; over-budget explicit raises
    auto, total = similarity._resolve_num_blocks(df, "v", None, 400, "t")
    assert auto == (30 * (6 * 8 + 48) + 399) // 400
    with monkeypatch.context() as mp:
        mp.setattr(similarity, "_MAX_BLOCK_BYTES", 500)
        with pytest.raises(ValueError, match="block ceiling"):
            similarity._resolve_num_blocks(df, "v", 1, 400, "t_over")
    # well within the real 256 MB ceiling: explicit sizing passes
    assert similarity._resolve_num_blocks(df, "v", 4, 64 << 20, "t")[0] == 4

    # (3) validate=False + explicit sizing: no job may run — resolve
    # against a frame every evaluation of which raises
    def boom(_batches):
        raise AssertionError("sizing ran a job despite validate=False")
        yield  # pragma: no cover

    poison = df.mapInPandas(boom, schema="id long, v array<double>")
    assert (
        similarity._resolve_num_blocks(
            poison, "v", 7, 400, "t", validate=False
        )
        == (7, None)
    )
    with pytest.raises(Exception):  # sanity: the poison frame DOES throw
        poison.count()


def test_resolve_num_blocks_skips_null_vectors(spark):
    """ADVICE r7: the one-row dim probe must come from a NON-NULL
    vector — a null in the sampled row made dim=0 and silently
    disabled the byte budget. Pin by putting the null FIRST (the row
    a bare first() returns on a local frame) and asserting the
    auto-derived block count reflects the real 6-element dim, not the
    48-byte null-row floor."""
    from redskins_rule_spark.operators import similarity

    rows = [(0, None)] + [
        (i, [float(j) for j in range(6)]) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>").coalesce(1)
    auto, total = similarity._resolve_num_blocks(df, "v", None, 200, "t")
    # 5 rows x (6*8+48) bytes = 480 -> 3 blocks at a 200-byte budget;
    # the null-sampled regression sized 5 x 48 = 240 -> 2 blocks
    assert auto == 3 and total == 480


def test_srp_candidate_budget_guard(spark):
    """x100-probe finding: random band collisions are ~bands*n^2 /
    2^(r+1) — quadratic in n once 2^r stops dominating. The guard
    raises with the minimum n_planes before the shuffle OOMs; a
    max_postings bucket cap (which bounds pairs independently of n)
    disarms it; generous budgets leave small corpora untouched."""
    import pytest

    from redskins_rule_spark.operators.similarity import srp_lsh_pairs

    rows = [
        (i, [float((i * 13 + j * 5) % 17 - 8) for j in range(8)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    # 200 vectors, 8 bands x 4-bit keys: ~2*200^2/2^5 = 10,000 expected
    with pytest.raises(ValueError, match="n_planes>=") as ei:
        srp_lsh_pairs(
            df, "vec_id", "v", dim=8, n_planes=32, bands=8,
            candidate_budget=1000,
        )
    assert "quadratic" in str(ei.value)

    # same parameters pass with a bucket cap (pairs bounded by cap^2)
    capped = srp_lsh_pairs(
        df, "vec_id", "v", dim=8, n_planes=32, bands=8,
        candidate_budget=1000, max_postings=16,
    )
    capped.count()  # plans and runs

    # and with the default generous budget
    ok = srp_lsh_pairs(df, "vec_id", "v", dim=8, n_planes=32, bands=8)
    ok.count()


def test_blocked_sim_chunking_is_value_invisible(spark, monkeypatch):
    """The bounded sim-slab chunking (x100-probe kernel-OOM fix) must
    not change a single emitted value: force many tiny chunks and
    compare both blocked operators against the unchunked default."""
    from redskins_rule_spark.operators import similarity

    rows = [
        (i, [float((i * j) % 7 + 1) for j in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    knn_ref = sorted(
        (r.id, r.nb, r.cos_sim)
        for r in similarity.knn_candidates_blocked(
            df, "id", "v", k=3, num_blocks=3
        ).collect()
    )
    pairs_ref = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.9, num_blocks=3
        ).collect()
    )
    monkeypatch.setattr(similarity, "_SIM_SLAB_BYTES", 64)  # ~1-row chunks
    knn_chunked = sorted(
        (r.id, r.nb, r.cos_sim)
        for r in similarity.knn_candidates_blocked(
            df, "id", "v", k=3, num_blocks=3
        ).collect()
    )
    pairs_chunked = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.9, num_blocks=3
        ).collect()
    )
    assert knn_chunked == knn_ref and pairs_chunked == pairs_ref


def test_srp_auto_band_bits_taper():
    """VERDICT r7 item 3: the auto-banding cost target is 16n (linear),
    not the old max(1M, 16n) floor. Pins the THREE contracts the taper
    must hold: (1) r=8 at every oracle-SF corpus size (both gate
    fixtures hold 500 embeddings — q185's 64-plane SQL oracle is valid
    exactly there, ADVICE r7); (2) the taper actually fires between
    the gate scale and sf1 (r rises 9/13 at 2k/20k, where the old
    floor pinned 8/11); (3) the x100-probe configuration is UNCHANGED
    (r=16 at 200k), so the measured 17.3x sf10 ratio still describes
    this code."""
    from redskins_rule_spark.operators.similarity import srp_auto_band_bits

    assert srp_auto_band_bits(500) == 8       # sf0.001 & sf0.01 gates
    assert srp_auto_band_bits(1024) == 8      # last n the oracle covers
    assert srp_auto_band_bits(1025) == 9
    assert srp_auto_band_bits(2000) == 9      # sf0.1 (bench), skew0.1
    assert srp_auto_band_bits(20000) == 13    # sf1 probe
    assert srp_auto_band_bits(200000) == 16   # sf10 probe — unchanged
    # the candidate_budget ceiling still dominates when tighter
    assert srp_auto_band_bits(1000) == 8
    assert srp_auto_band_bits(1000, 8, candidate_budget=10_000) == 9


def test_srp_auto_banding(spark):
    """VERDICT r6: n_planes=None applies the banding guard's own
    formula instead of raising. At small n the auto choice IS the
    8-bit default (identical pairs to an explicit n_planes=64); under
    a budget small enough that 8-bit bands would raise, auto widens r
    and runs — and planted identical vectors (equal signatures under
    ANY banding) are still recalled."""
    from redskins_rule_spark.operators.similarity import srp_lsh_pairs

    rows = [
        (i, [float((i * 13 + j * 5) % 17 - 8) for j in range(8)])
        for i in range(200)
    ]
    # plant an exact duplicate direction: vec 200 == 2 * vec 0
    rows.append((200, [2.0 * x for x in rows[0][1]]))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    explicit = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in srp_lsh_pairs(
            df, "vec_id", "v", dim=8, n_planes=64, bands=8, threshold=0.9
        ).collect()
    )
    auto = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in srp_lsh_pairs(
            df, "vec_id", "v", dim=8, n_planes=None, bands=8, threshold=0.9
        ).collect()
    )
    assert auto == explicit  # generous budget -> auto == 8-bit default

    # budget 1000 makes 8-bit bands raise (see the guard test); auto
    # must instead widen r until ~8*n^2/2^(r+1) <= 1000 and run
    tight = srp_lsh_pairs(
        df, "vec_id", "v", dim=8, n_planes=None, bands=8,
        threshold=0.9, candidate_budget=1000,
    )
    got = {(r.id_a, r.id_b) for r in tight.collect()}
    assert (0, 200) in got  # identical vectors collide under any banding


def test_label_noise_from_all_pairs_equals_exact(spark):
    """The candidates= path must be PROVABLY the same computation as
    the exact path when fed a complete candidate set: all-pairs
    cosine (threshold 0.0 == the exact path's min_sim) through
    topk_from_pairs + votes == knn_candidates_blocked + votes, row
    for row."""
    from redskins_rule_spark.operators.similarity import (
        cosine_pairs_blocked,
        knn_label_consistency,
    )

    rows = [
        (
            i,
            [float((i * 7 + j * 3) % 11 - 5) for j in range(6)],
            "abc"[i % 3],
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>, label string")

    exact = sorted(
        tuple(r)
        for r in knn_label_consistency(df, "id", "v", "label", k=5).collect()
    )
    allpairs = cosine_pairs_blocked(df, "id", "v", threshold=0.0)
    via = sorted(
        tuple(r)
        for r in knn_label_consistency(
            df, "id", "v", "label", k=5, candidates=allpairs
        ).collect()
    )
    assert via == exact
    assert exact  # non-trivial fixture


def test_ann_label_noise_recall_contract(spark):
    """VERDICT r6 item 1's pytest contract: a PLANTED mislabel whose
    neighbors share a band is found by the ANN-sourced screen. Two
    well-separated clusters of parallel vectors (equal directions ->
    equal SRP signatures -> guaranteed band collisions); one cluster-A
    point carries cluster B's label."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.similarity import (
        knn_label_consistency,
        srp_lsh_pairs,
    )

    a_dir = [1.0, 0.5, -0.25, 2.0, 1.5, -1.0, 0.75, 0.1]
    b_dir = [-1.0, 2.0, 1.0, -0.5, 0.25, 1.75, -2.0, 0.6]
    rows = [(i, [x * (1.0 + i) for x in a_dir], "a") for i in range(10)]
    rows += [(100 + i, [x * (1.0 + i) for x in b_dir], "b") for i in range(10)]
    rows.append((999, [x * 3.5 for x in a_dir], "b"))  # the mislabel
    df = spark.createDataFrame(rows, "id long, v array<double>, label string")

    pairs = srp_lsh_pairs(
        df, "id", "v", dim=8, n_planes=64, bands=8, threshold=0.5
    )
    out = knn_label_consistency(
        df, "id", "v", "label", k=5, candidates=pairs
    )
    flagged = {r.id for r in out.where(F.col("is_suspect")).collect()}
    assert 999 in flagged  # the planted mislabel is caught
    clean = {r.id for r in out.where(~F.col("is_suspect")).collect()}
    assert set(range(10)) <= clean  # true cluster-A members are not


def test_cosine_pairs_copartition_equals_broadcast(spark):
    """VERDICT r6 item 4: the beyond-broadcast layout is CODE now —
    the co-partitioned explode path must produce exactly the pairs
    the packed/broadcast path does (same blocks, same kernel, same
    Spark-side round+filter), its plan must contain NO
    BroadcastNestedLoopJoin and no collect_list packing, and
    strategy='auto' must select it when the sizing estimate exceeds
    the broadcast budget."""
    import pytest

    from redskins_rule_spark.operators import similarity
    from redskins_rule_spark.plans.explain import formatted_plan

    rows = [
        (i, [float((i * j) % 7 - 3) for j in range(6)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    base = sorted(
        tuple(r)
        for r in similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.8, num_blocks=4,
            strategy="broadcast",
        ).collect()
    )
    cop = sorted(
        tuple(r)
        for r in similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.8, num_blocks=4,
            strategy="copartition",
        ).collect()
    )
    assert base == cop
    assert base  # non-trivial fixture (same-block AND cross-block pairs)

    plan = formatted_plan(
        similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.8, num_blocks=4,
            strategy="copartition",
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" not in plan
    bplan = formatted_plan(
        similarity.cosine_pairs_blocked(
            df, "id", "v", threshold=0.8, num_blocks=4,
            strategy="broadcast",
        )
    )
    # the packed layout's signature: collect_list block packing (the
    # join operator itself hides behind AQE until execution)
    assert "collect_list" in bplan

    # auto switches on the sizing estimate
    import unittest.mock as mock
    with mock.patch.object(similarity, "_BROADCAST_PAIRS_BYTES", 100):
        aplan = formatted_plan(
            similarity.cosine_pairs_blocked(
                df, "id", "v", threshold=0.8, num_blocks=4,
            )
        )
        assert "BroadcastNestedLoopJoin" not in aplan
        auto = sorted(
            tuple(r)
            for r in similarity.cosine_pairs_blocked(
                df, "id", "v", threshold=0.8, num_blocks=4,
            ).collect()
        )
        assert auto == base

    with pytest.raises(ValueError, match="strategy"):
        similarity.cosine_pairs_blocked(
            df, "id", "v", 0.8, num_blocks=4, strategy="nope"
        )


def test_char_ngrams_matches_substr_construction(spark):
    """Round-7 skew-probe fix: char_ngrams' hoisted zip_with shape
    must be code-point-identical to the naive substr-by-index
    construction (which is O(L²) per doc and was the 5.7x wall
    blowup on power-law doc lengths) — newlines, unicode, short and
    empty strings included."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.text import char_ngrams

    rows = [
        (1, "hello world"),
        (2, "ab"),            # shorter than n -> empty
        (3, ""),
        (4, "line one\nline two\ttab"),
        (5, "naïve café über"),
        (6, "abcdefgh" * 50),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    naive = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("t") - 2, F.lit(0))),
        lambda i: F.col("t").substr(i, F.lit(3)),
    )
    got = df.select(
        "id",
        char_ngrams(F.col("t"), 3).alias("fast"),
        F.when(F.length("t") >= 3, naive)
        .otherwise(F.array().cast("array<string>"))
        .alias("slow"),
    ).collect()
    for r in got:
        assert list(r.fast) == list(r.slow), r.id

    # bigrams and 4-grams too (the loop generalizes past n=3)
    for n in (2, 4):
        got = df.select(
            char_ngrams(F.col("t"), n).alias("fast"),
            F.when(
                F.length("t") >= n,
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length("t") - (n - 1), F.lit(0))
                    ),
                    lambda i: F.col("t").substr(i, F.lit(n)),
                ),
            ).otherwise(F.array().cast("array<string>")).alias("slow"),
        ).collect()
        for r in got:
            assert list(r.fast) == list(r.slow), n


def test_srp_hot_band_capped_by_max_postings(spark):
    """Round-7 skew probe lever proof: a hot LSH BAND (here from a
    cluster of shared-direction vectors, which collide in EVERY band
    the way the skew fixture's planted 10% do) emits O(cluster²)
    candidate pairs uncapped; max_postings bounds the hot bucket so
    the emitted volume drops to O(cap²) while capped output stays a
    subset of the uncapped pairs and survivors keep their exact
    verified cosines. Partitioning-independent (deterministic cap)."""
    from redskins_rule_spark.operators.similarity import srp_lsh_pairs

    base_dir = [1.0, -0.5, 2.0, 0.25, -1.5, 0.75, -0.25, 1.25]
    rows = [(i, [x * (1.0 + i / 100.0) for x in base_dir]) for i in range(60)]
    rows += [
        (1000 + i, [float((i * 13 + j * 7) % 19 - 9) for j in range(8)])
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    uncapped = {
        (r.id_a, r.id_b): r.cos_sim
        for r in srp_lsh_pairs(
            df, "vec_id", "v", dim=8, n_planes=64, bands=8, threshold=0.9
        ).collect()
    }
    # the planted cluster alone contributes 60*59/2 pairs
    assert len(uncapped) >= 60 * 59 // 2

    capped = {
        (r.id_a, r.id_b): r.cos_sim
        for r in srp_lsh_pairs(
            df, "vec_id", "v", dim=8, n_planes=64, bands=8, threshold=0.9,
            max_postings=8,
        ).collect()
    }
    assert set(capped) <= set(uncapped)          # no invented pairs
    assert len(capped) <= 8 * 7 // 2 * 8 + 100   # O(bands * cap²), not O(n²)
    assert len(capped) >= 8 * 7 // 2             # the hot bucket still yields
    for k, v in capped.items():
        assert uncapped[k] == v                  # verified cosines unchanged

    capped2 = {
        (r.id_a, r.id_b)
        for r in srp_lsh_pairs(
            df.repartition(7), "vec_id", "v", dim=8, n_planes=64, bands=8,
            threshold=0.9, max_postings=8,
        ).collect()
    }
    assert capped2 == set(capped)  # cap is deterministic, not arrival-order


# --- DSIR hashed n-gram importance weights ---------------------------------


def _py_roll(s: str, base: int = 257, mod: int = 2147483647) -> int:
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % mod
    return acc


def test_dsir_importance_matches_python_reference(spark):
    """Exact parity with an independent Python implementation of the
    DSIR bucket-model formula on a hand-built corpus (2 target docs
    sharing a vocabulary, 2 raw-only docs, 1 mixed, 1 no-letters doc
    that must drop out)."""
    import math
    import re
    from collections import Counter

    import pytest
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.text import dsir_importance

    rows = [
        (1, "the quick brown fox jumps", "en"),
        (2, "the quick brown dog runs", "en"),
        (3, "der schnelle braune fuchs", "de"),
        (4, "le renard brun rapide", "fr"),
        (5, "the quick renard", "de"),  # raw doc with target-like text
        (6, "12345 !!!", "zh"),  # no [a-z] words -> drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: r
        for r in dsir_importance(
            df, "doc_id", "text", F.col("lang") == "en", n_buckets=16, seed=7
        ).collect()
    }
    assert 6 not in got

    # independent reference
    def grams(text):
        w = [t for t in re.split("[^a-z]+", text.lower()) if t]
        return w + [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]

    bucket = lambda g: _py_roll(f"7:{g}") % 16
    nt, nr = Counter(), Counter()
    for _id, text, lang in rows:
        for g in grams(text):
            b = bucket(g)
            nr[b] += 1
            if lang == "en":
                nt[b] += 1
    NR, NT = sum(nr.values()), sum(nt.values())
    for _id, text, lang in rows:
        gs = grams(text)
        if not gs:
            continue
        s = sum(math.log(nt[bucket(g)] + 1) - math.log(nr[bucket(g)] + 1) for g in gs)
        s += len(gs) * (math.log(NR + 16) - math.log(NT + 16))
        expect = round(s, 4) + 0.0
        assert got[_id].n_grams == len(gs)
        assert got[_id].log_importance == pytest.approx(expect, abs=1e-9), _id
        assert got[_id].keep == (expect > 0)

    # semantics: target-vocabulary docs score above the foreign docs,
    # and the raw doc sharing target vocabulary lands in between
    assert got[1].log_importance > 0 and got[2].log_importance > 0
    assert got[3].log_importance < got[5].log_importance
    assert got[4].log_importance < got[1].log_importance


def test_gopher_rules_each_rule_fires(spark):
    """One hand-built document per rule violation; the clean doc
    passes everything. Thresholds are integer arithmetic, so each
    boundary case is exact."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.text import gopher_filter

    rows = [
        (1, "the cat and dog sat of the mat with tea"),       # clean
        (2, "the cat"),                                        # too few words
        (3, "the of and aa bb " + "x" * 200),                  # mean len > 10
        (4, "the of and one two ### #### hash heavy ok"),      # symbols
        (5, "- a\n- b\n- c\n- d\nthe of and plain line here"), # bullets 4/5 lines
        (6, "end one...\nend two...\nthe of and plain here"),  # ellipsis 2/3 lines
        (7, "the of 11 22 33 44 55 66 77 88"),                 # alpha 2/10 words
        (8, "cat dog sat mat tea cup pot lid jar tin"),        # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in gopher_filter(df, "text", min_words=5).collect()
    }
    assert got[1].gopher_pass
    assert all(
        got[1][c]
        for c in ("words_ok", "mean_len_ok", "symbol_ok", "bullet_ok",
                  "ellipsis_ok", "alpha_ok", "stop_ok")
    )
    assert not got[2].words_ok and not got[2].gopher_pass
    assert not got[3].mean_len_ok and not got[3].gopher_pass
    # doc 4: 10 words, '#'x7 -> 10*7 > 1*10
    assert not got[4].symbol_ok and not got[4].gopher_pass
    # doc 5: 4 bullet lines of 5 -> 40 > 9*5=45? no: 40 <= 45 passes;
    # recompute: bullet rule is <= 0.9 so 4/5 passes — make it fail
    # via the stricter check below instead
    assert got[5].n_lines == 5
    assert not got[6].ellipsis_ok and not got[6].gopher_pass
    assert not got[7].alpha_ok and not got[7].gopher_pass
    assert not got[8].stop_ok and not got[8].gopher_pass
    # bullet rule boundary: 10 lines, 10 bullets -> 100 > 90 fails
    df2 = spark.createDataFrame(
        [(9, "\n".join("- b%d the of and" % i for i in range(10)))],
        "doc_id long, text string",
    )
    g9 = gopher_filter(df2, "text", min_words=5).collect()[0]
    assert not g9.bullet_ok and not g9.gopher_pass


def test_semdedup_survivors_hand_computed(spark):
    """Pinned SemDeDup semantics on hand-built vectors: cell = argmax
    axis (ties to higher index), smaller id survives, chains kill all
    later members (order-greedy), cross-cell near-dups are NEVER
    compared, and the hot-cell guard raises with the remedy."""
    import pytest
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.similarity import semdedup_survivors

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),    # cell 0
        (2, [1.0, 0.01, 0.0, 0.0]),   # cell 0, ~dup of 1 -> dies
        (3, [1.0, 0.02, 0.0, 0.0]),   # cell 0, ~dup of 1 and 2 -> dies
        (4, [0.0, 1.0, 0.0, 0.0]),    # cell 1, survives
        (5, [0.0, 0.0, 1.0, 0.001]),  # cell 2
        (6, [0.0, 0.0, 1.0, 0.0]),    # cell 2, ~dup of 5 -> dies
        (7, [0.0, 0.0, 0.0, 1.0]),    # cell 3 — near 5/6 in id space,
                                      # different cell: never compared
        (8, [0.5, 0.5, 0.5, 0.5]),    # exact 4-way tie -> cell 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        r.vec_id: r
        for r in semdedup_survivors(
            df, "vec_id", "v", n_cells=4, threshold=0.97
        ).collect()
    }
    assert [got[i].cell for i in (1, 4, 5, 7)] == [0, 1, 2, 3]
    assert got[8].cell == 3  # tie pinned to the HIGHEST index
    assert {i: got[i].survived for i in sorted(got)} == {
        1: True, 2: False, 3: False, 4: True,
        5: True, 6: False, 7: True, 8: True,
    }
    # the hot-cell guard belongs to the expression strategy (the
    # blocked default ROUTES hot cells instead of raising, r7 item 1)
    with pytest.raises(ValueError, match="max_cell_rows"):
        semdedup_survivors(
            df, "vec_id", "v", n_cells=4, max_cell_rows=2,
            strategy="expression",
        )
    # same corpus through the blocked router with a 2-row cap: RUNS
    # and produces the identical survivor map
    routed = {
        r.vec_id: (r.cell, r.survived)
        for r in semdedup_survivors(
            df, "vec_id", "v", n_cells=4, threshold=0.97,
            max_cell_rows=2, block_target_rows=2,
        ).collect()
    }
    assert routed == {i: (got[i].cell, got[i].survived) for i in got}


def test_semdedup_pair_budget_binds_before_row_cap(spark):
    """The quadratic guard: a cell can satisfy the row cap while its
    pair volume is already fatal — the pair budget must fire and the
    message must carry a corrective n_cells estimate."""
    import pytest

    from redskins_rule_spark.operators.similarity import semdedup_survivors

    rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-4]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="max_cell_pairs.*n_cells"):
        semdedup_survivors(
            df, "vec_id", "v", n_cells=4,
            max_cell_rows=1000, max_cell_pairs=100,
            strategy="expression",
        )


def test_axis_pq_codebooks_encode_semantics(spark):
    """q97b's verification codebooks: centroid i = e_i, so the encode
    argmin reduces to argmax coordinate with ties to the SMALLER
    index (struct(d, i) min) — pinned on hand vectors, plus the
    k <= w validation."""
    import pytest

    from redskins_rule_spark.operators.similarity import (
        axis_pq_codebooks,
        pq_encode,
    )

    with pytest.raises(ValueError, match="k <= w"):
        axis_pq_codebooks(m=2, k=5, w=4)
    books = axis_pq_codebooks(m=2, k=3, w=3)
    assert books[0][1] == [0.0, 1.0, 0.0] and len(books) == 2
    df = spark.createDataFrame(
        [
            (1, [0.0, 2.0, 0.0, 5.0, 0.0, 0.0]),   # argmax 1 / 0
            (2, [3.0, 3.0, 0.0, 0.0, 1.0, 1.0]),   # tie -> smaller i
        ],
        "vec_id long, v array<double>",
    )
    got = {
        r.vec_id: list(r.code)
        for r in pq_encode(df, books, "v").collect()
    }
    assert got == {1: [1, 0], 2: [0, 1]}


def test_semdedup_blocked_equals_expression(spark):
    """VERDICT r7 item 1: the blocked (per-cell co-partitioned matmul)
    strategy must be value-identical to the original interpreted
    within-cell join — every (id, cell, survived) row equal on a
    200-vector corpus with planted near-dups, natural near-threshold
    pairs, and a multi-block split forced by block_target_rows."""
    from redskins_rule_spark.operators.similarity import semdedup_survivors

    rows = [
        (i, [float((i * 13 + j * 7) % 19 - 9) for j in range(8)])
        for i in range(200)
    ]
    # planted near-dups of every 9th vector (usually same cell)
    rows += [
        (1000 + i, [x + 0.003 * ((i + j) % 2) for j, x in enumerate(v)])
        for i, v in rows[::9]
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    kw = dict(n_cells=4, threshold=0.8, round_dp=4)
    expr = {
        r.vec_id: (r.cell, r.survived)
        for r in semdedup_survivors(
            df, "vec_id", "v", strategy="expression", **kw
        ).collect()
    }
    blocked = {
        r.vec_id: (r.cell, r.survived)
        for r in semdedup_survivors(
            df, "vec_id", "v", strategy="blocked", block_target_rows=16,
            **kw
        ).collect()
    }
    assert blocked == expr
    assert len(expr) == len(rows)
    assert not all(s for _, s in expr.values())  # dups actually died


def test_token_entropy_hand_computed(spark):
    """Exact entropy/TTR on hand-built docs: uniform tokens → ln k,
    single repeated token → 0, and a mixed case against the closed
    form. Python's math.log is the same ln both engines use."""
    import math

    from redskins_rule_spark.operators.text import token_entropy

    rows = [
        (1, "a b c d"),            # 4 uniform -> H = ln 4, ttr 1
        (2, "spam spam spam"),     # 1 type -> H = 0, ttr 1/3
        (3, "x x y"),              # H = ln3 - (2 ln2)/3
        (4, "The THE the"),        # lowercased -> one type
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert got[1].n_tokens == 4 and got[1].n_types == 4
    assert got[1].entropy == round(math.log(4), 4) and got[1].ttr == 1.0
    assert got[2].entropy == 0.0 and got[2].ttr == 0.3333
    assert got[3].entropy == round(math.log(3) - 2 * math.log(2) / 3, 4)
    assert got[4].n_types == 1 and got[4].entropy == 0.0


def test_semdedup_null_vectors_survive_both_strategies(spark):
    """ADVICE r8: strategy='blocked' crashed on null vectors
    (np.asarray(None) in the matmul kernel) where the expression path
    silently dropped them via null cosine. Pinned policy: a null
    vector is never compared — it survives (cell 0) — and both
    strategies agree on the full survivor map around it."""
    from redskins_rule_spark.operators.similarity import semdedup_survivors

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0, 0.0]),  # dies to 1
        (3, None),                   # null: survives, cell 0
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = {}
    for strat in ("blocked", "expression"):
        out[strat] = {
            r.vec_id: (r.cell, r.survived)
            for r in semdedup_survivors(
                df, "vec_id", "v", n_cells=4, threshold=0.97,
                strategy=strat,
            ).collect()
        }
    assert out["blocked"] == out["expression"]
    assert out["blocked"][3] == (0, True)
    assert out["blocked"][2][1] is False and out["blocked"][1][1] is True


# --- SQ8 scalar quantization ------------------------------------------------

from redskins_rule_spark.operators.similarity import (  # noqa: E402
    sq_encode,
    sq_quantize_query,
    sq_topk,
    train_sq_bounds,
)


def _sq_frame(spark):
    rows = [
        (0, [0.0, -1.0, 5.0, 2.5]),
        (1, [1.0, 1.0, 5.0, 0.0]),
        (2, [0.5, 0.0, 5.0, 10.0]),
        (3, [0.25, -0.5, 5.0, -3.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_sq_bounds_are_exact_per_dim_min_max(spark):
    df = _sq_frame(spark)
    bounds = train_sq_bounds(df, "embedding", dim=4)
    assert bounds == [(0.0, 1.0), (-1.0, 1.0), (5.0, 5.0), (-3.0, 10.0)]


def test_sq_encode_codes_and_constant_dim(spark):
    df = _sq_frame(spark)
    bounds = train_sq_bounds(df, "embedding", dim=4)
    got = {
        r["vec_id"]: r["sq_code"]
        for r in sq_encode(df, bounds, "embedding").collect()
    }
    # dim 2 is constant -> code 0 everywhere; extremes land on 0/255
    # (max maps to floor(255.0) = 255, no clamp needed at the top)
    assert [got[i][2] for i in range(4)] == [0, 0, 0, 0]
    assert got[0][0] == 0 and got[1][0] == 255
    assert got[1][1] == 255 and got[0][1] == 0
    assert got[2][3] == 255 and got[3][3] == 0


def test_sq_query_quantization_matches_spark_encode(spark):
    # the driver-side Python affine must reproduce sq_encode
    # bit-for-bit: quantize row 3's vector both ways
    df = _sq_frame(spark)
    bounds = train_sq_bounds(df, "embedding", dim=4)
    vec = df.where(F.col("vec_id") == 3).first()["embedding"]
    py = sq_quantize_query([float(x) for x in vec], bounds)
    jvm = (
        sq_encode(df, bounds, "embedding")
        .where(F.col("vec_id") == 3)
        .first()["sq_code"]
    )
    assert py == list(jvm)


def test_sq_topk_integer_distance_and_pinned_ties(spark):
    df = _sq_frame(spark)
    bounds = train_sq_bounds(df, "embedding", dim=4)
    coded = sq_encode(df, bounds, "embedding")
    q = sq_quantize_query([0.0, -1.0, 5.0, 2.5], bounds)  # == row 0
    out = sq_topk(coded, q, "vec_id", k=4).collect()
    assert out[0]["vec_id"] == 0 and out[0]["sq_dist"] == 0
    dists = [r["sq_dist"] for r in out]
    assert dists == sorted(dists)
    assert all(isinstance(d, int) for d in dists)


def test_bm25_rank_matches_python_reference_per_query(spark):
    import math
    import re
    from collections import Counter

    from redskins_rule_spark.operators.text import bm25_rank

    corpus = [
        (1, "spark table spark window"),
        (2, "table only here"),
        (3, "no relevant words at all"),
        (4, "window window window table spark"),
        (5, "merge merge join join hash"),
    ]
    queries = [("qa", "spark table window"), ("qb", "hash join"),
               ("qc", "table table")]  # duplicate term counts ONCE
    docs = spark.createDataFrame(corpus, "doc_id int, text string")
    qdf = spark.createDataFrame(queries, "qid string, qtext string")
    got = [(r.qid, r.doc_id, r.rank, r.score, r.n_terms_hit) for r in
           bm25_rank(docs, "doc_id", "text", qdf, k=3)
           .orderBy("qid", "rank").collect()]

    toks = {i: re.findall(r"[a-z]+", s.lower()) for i, s in corpus}
    dl = {i: len(ws) for i, ws in toks.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    want = []
    for qid, qtext in queries:
        qterms = set(re.findall(r"[a-z]+", qtext.lower()))
        tf = {i: Counter(w for w in ws if w in qterms)
              for i, ws in toks.items()}
        # df over the union of ALL query vocabularies == corpus df
        dfreq = {t: sum(1 for ws in toks.values() if t in ws)
                 for t in qterms}
        rows = []
        for i in toks:
            if not tf[i]:
                continue
            s = sum(
                math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1)
                * f / (f + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl))
                for t, f in tf[i].items()
            )
            rows.append((i, round(s, 4), len(tf[i])))
        rows.sort(key=lambda t: (-t[1], t[0]))
        want += [(qid, i, r + 1, s, h)
                 for r, (i, s, h) in enumerate(rows[:3])]
    assert got == want


def test_bm25_rank_empty_query_and_no_hits(spark):
    from redskins_rule_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id int, text string"
    )
    qdf = spark.createDataFrame(
        [("q1", "zzz qqq"), ("q2", "")], "qid string, qtext string"
    )
    # no term matches anywhere -> empty result, schema intact
    out = bm25_rank(docs, "doc_id", "text", qdf, k=5)
    assert out.columns == ["qid", "doc_id", "rank", "score", "n_terms_hit"]
    assert out.count() == 0


def test_rolling_fingerprint_dedup_catches_unaligned_passage(spark):
    from redskins_rule_spark.operators.text import rolling_fingerprint_dedup

    shared = "one two three four five six"  # 6 tokens, k=4 -> 3 windows
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail alpha beta"),
            # same passage OFFSET BY ONE token — invisible to aligned
            # block dedup, caught at stride 1
            (2, f"pad {shared} gamma delta"),
            (3, "wholly novel words here again ok"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           rolling_fingerprint_dedup(docs, "doc_id", "text", k=4).collect()}
    # doc 1 is the first occurrence everywhere -> nothing marked
    assert got[1].n_dup_pos == 0 and got[1].cover_tokens == 0
    assert got[1].kept_tokens == got[1].n_tokens == 9
    # doc 2: shared windows at positions 1,2,3 (after 'pad') -> one
    # run, cover = (3-1)+4 = 6 tokens
    assert got[2].n_dup_pos == 3
    assert got[2].n_runs == 1
    assert got[2].cover_tokens == 6
    assert got[2].max_run_cover == 6
    assert got[2].kept_tokens == got[2].n_tokens - 6
    assert got[3].n_dup_pos == 0 and got[3].n_runs == 0


def test_rolling_fingerprint_dedup_interval_merge_rule(spark):
    from redskins_rule_spark.operators.text import rolling_fingerprint_dedup

    # two dup positions with a gap of exactly k merge (windows touch);
    # a gap of k+1 does not
    a = "a b c"       # k=3 window w1
    b = "x y z"       # k=3 window w2
    docs = spark.createDataFrame(
        [
            (1, f"{a} {b}"),
            # positions: w1 at 0, w2 at 3 -> gap 3 == k -> ONE run
            (2, f"{a} {b} novel1 novel2"),
            # positions: w1 at 0, w2 at 4 -> gap 4 > k -> TWO runs
            (3, f"{a} pad {b} other tokens"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           rolling_fingerprint_dedup(docs, "doc_id", "text", k=3).collect()}
    two = got[2]
    # doc2 shares doc1's whole prefix "a b c x y z": dup positions
    # 0-3 (including the seam windows) -> one merged interval of
    # (3 - 0) + 3 = 6 tokens
    assert two.n_runs == 1
    assert two.cover_tokens == (3 - 0) + 3  # merged interval
    three = got[3]
    assert three.n_runs == 2
    assert three.cover_tokens == 3 + 3
    assert three.max_run_cover == 3


def test_rolling_fingerprint_dedup_boilerplate_budget(spark):
    from redskins_rule_spark.operators.text import rolling_fingerprint_dedup

    boiler = "the same header text"  # k=4: one window per doc
    rows = [(i, f"{boiler} body{i} junk{i} word{i}") for i in range(1, 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # the header window occurs 4 times > max_df=2 -> boilerplate:
    # counted, NOT removed
    got = {r.doc_id: r for r in
           rolling_fingerprint_dedup(
               docs, "doc_id", "text", k=4, max_df=2).collect()}
    for i in range(1, 5):
        assert got[i].n_boiler == 1, i
        assert got[i].n_dup_pos == 0, i
        assert got[i].cover_tokens == 0, i
    # without the budget the later 3 occurrences are removed
    got2 = {r.doc_id: r for r in
            rolling_fingerprint_dedup(docs, "doc_id", "text", k=4).collect()}
    assert got2[1].n_dup_pos == 0
    for i in range(2, 5):
        assert got2[i].n_dup_pos == 1 and got2[i].cover_tokens == 4, i


def test_rolling_fingerprint_dedup_short_docs_and_guards(spark):
    import pytest

    from redskins_rule_spark.operators.text import rolling_fingerprint_dedup

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           rolling_fingerprint_dedup(docs, "doc_id", "text", k=4).collect()}
    assert got[1].n_windows == 0 and got[1].kept_tokens == 3
    assert got[2].n_windows == 2
    with pytest.raises(ValueError, match="k must be"):
        rolling_fingerprint_dedup(docs, "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="max_df"):
        rolling_fingerprint_dedup(docs, "doc_id", "text", k=4, max_df=0)


# --- phrase_search (q243) -------------------------------------------------

def test_phrase_search_overlapping_matches(spark):
    from redskins_rule_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x a b y"), (3, "b a")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "a b a").collect()
    }
    # 'a b a b a' contains 'a b a' at starts 0 AND 2 (overlap counts)
    assert got == {1: (2, 0)}


def test_phrase_search_repeated_term_phrase(spark):
    from redskins_rule_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [(1, "the big the end"), (2, "the big big the")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "the big the").collect()
    }
    # doc 2 has 'the big' and 'big the' but never 'the big the'
    assert got == {1: (1, 0)}


def test_phrase_search_positions_index_filtered_tokens(spark):
    from redskins_rule_spark.operators.text import phrase_search

    # punctuation/digit runs collapse; positions number the FILTERED
    # sequence, so 'big data' sits at start 1, not 2
    df = spark.createDataFrame(
        [(1, "!! so... big DATA 99 ok")], "doc_id bigint, text string"
    )
    r = phrase_search(df, "big data").collect()
    assert [(x["doc_id"], x["n_matches"], x["first_pos"]) for x in r] == [(1, 1, 1)]


def test_phrase_search_single_term_refused(spark):
    import pytest

    from redskins_rule_spark.operators.text import phrase_search

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="phrase_search needs >= 2 terms"):
        phrase_search(df, "solo")


def test_phrase_search_plan_no_join_one_scan(spark):
    from redskins_rule_spark.operators.text import phrase_search
    from redskins_rule_spark.plans.explain import formatted_plan

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = formatted_plan(phrase_search(df, "a b c"))
    # offset voting has NO join of any kind and exactly one scan of
    # the input — the whole phrase match is explode + two aggregates
    # (vote uniqueness makes the distinct-offset count a plain COUNT,
    # so exactly two exchanges: (id, start) votes, then (id) rollup)
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD (") == 1  # tree renders once
    assert plan.count("+- Exchange") == 2
