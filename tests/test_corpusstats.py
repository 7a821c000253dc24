"""Round-6 corpus-statistics operators: TF-IDF keywords, bigram-LM NLL
scoring, and rewriting block dedup — semantics pinned on constructed
corpora (oracle parity covers the synthetic tables)."""

from __future__ import annotations

import math

from ndl_core_data_pipeline_spark.operators.textops import bigram_nll, tfidf_topk
from ndl_core_data_pipeline_spark.operators.training import dedup_block_rewrite


def _docs_dir(spark, tmp_path, texts):
    rows = [
        (i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def test_tfidf_prefers_rare_terms(spark, tmp_path):
    d = _docs_dir(
        spark,
        tmp_path,
        [
            "common common common zebra",
            "common common common yak yak",
            "common plain words here",
        ],
    )
    rows = {(r["doc_id"], r["rnk"]): r for r in tfidf_topk(spark, d).collect()}
    # 'common' appears in every doc -> idf ln(4/4) = 0 -> never the top term
    assert rows[(0, 1)]["term"] == "zebra"
    assert rows[(1, 1)]["term"] == "yak"
    expected = round(1 * math.log((3 + 1) / (1 + 1)), 6)
    assert rows[(0, 1)]["tfidf"] == expected
    assert rows[(1, 1)]["tfidf"] == round(2 * math.log(2.0), 6)


def test_bigram_nll_flags_improbable_text(spark, tmp_path):
    # three fluent documents repeating the same bigrams + one scrambled
    fluent = "the cat sat on the mat"
    d = _docs_dir(spark, tmp_path, [fluent, fluent, fluent, "mat the on cat sat the"])
    got = {r["doc_id"]: r["avg_nll"] for r in bigram_nll(spark, d).collect()}
    # the corpus LM assigns the scrambled doc a strictly worse (higher) NLL
    assert got[3] > got[0]
    assert got[0] == got[1] == got[2]


def test_block_rewrite_cuts_second_occurrence(spark, tmp_path):
    block = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    d = _docs_dir(
        spark,
        tmp_path,
        [
            block + " tail words here",      # doc 0: first occurrence, kept
            block + " other ending",        # doc 1: duplicate block cut
            "short doc",                    # doc 2: no full block, tail only
        ],
    )
    got = {r["doc_id"]: r for r in dedup_block_rewrite(spark, d).collect()}
    assert got[0]["n_blocks"] == 1 and got[0]["n_kept"] == 1
    assert got[0]["clean_text"] == block + " tail words here"
    assert got[1]["n_blocks"] == 1 and got[1]["n_kept"] == 0
    assert got[1]["clean_text"] == "other ending"  # only the tail survives
    assert got[2]["n_blocks"] == 0 and got[2]["clean_text"] == "short doc"
