"""Chunking operator tests: expression path, UDTF path, equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from redskins_rule_spark.operators.chunking import (
    chunk_documents,
    make_chunk_udtf,
)
from redskins_rule_spark.sources.io import table


def test_chunk_shapes(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "id long, text string"
    )
    out = chunk_documents(df, "id", "text", window=4, stride=3).collect()
    # 10 tokens, W=4, S=3 → chunks at 0,3,6 (1+ceil(6/3)=3)
    assert [(r["chunk_idx"], r["n_tokens"]) for r in out] == [(0, 4), (1, 4), (2, 4)]
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    out = chunk_documents(df, "id", "text", window=8, stride=4).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "a b" and out[0]["n_tokens"] == 2


def test_udtf_matches_expression(spark):
    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    expr = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, "doc_id", "text", 16, 8).collect()
    }
    chunker = make_chunk_udtf(16, 8)
    spark.udtf.register("chunk_docs", chunker)
    docs.createOrReplaceTempView("docs_chunk_src")
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
            "FROM docs_chunk_src d, LATERAL chunk_docs(d.text) c"
        ).collect()
    }
    assert got == expr and len(expr) > 50
