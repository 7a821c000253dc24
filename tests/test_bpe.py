"""Distributed BPE merge learning vs a pure-Python reference: the merge
SEQUENCE (order, pairs, counts) must match exactly — the algorithm is
deterministic with the (count desc, left, right) tiebreak."""

from __future__ import annotations

from collections import Counter

from ndl_core_data_pipeline_spark.operators.bpe import (
    END_MARK,
    tokenize_words,
    train_bpe_merges,
)


def _ref_bpe(texts: list[str], n_merges: int):
    """Textbook in-memory BPE (Sennrich-style) with the same tiebreak
    and the same ASCII-whitespace tokenization as the Spark plan."""
    freqs = Counter()
    for t in texts:
        for w in tokenize_words(t):
            freqs[w] += 1
    vocab = {
        w: [c if i < len(w) - 1 else c + END_MARK for i, c in enumerate(w)]
        for w in freqs
    }
    merges = []
    for rank in range(n_merges):
        pair_counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += freqs[w]
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), count = best
        merges.append((rank, left, right, count))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low new wide lowest",
]


def test_matches_reference_sequence(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    got = train_bpe_merges(docs, n_merges=12)
    assert got == _ref_bpe(TEXTS, 12)
    assert len(got) == 12


def test_merges_respect_word_boundary(spark):
    # the end marker fuses into the last char, so no merge can pair a
    # word-final symbol with the next word's first symbol
    docs = spark.createDataFrame([("ab ab ab ba",)], "text STRING")
    got = train_bpe_merges(docs, n_merges=3)
    assert got == _ref_bpe(["ab ab ab ba"], 3)
    for _rank, left, _right, _count in got:
        assert not left.endswith(END_MARK)


def test_registry_query_runs(spark, sf_small):
    from ndl_core_data_pipeline_spark.operators.bpe import bpe_merges_query

    df = bpe_merges_query(spark, sf_small, n_merges=4)
    rows = df.collect()
    assert len(rows) == 4
    assert [r["rank"] for r in rows] == [0, 1, 2, 3]
    # counts are non-increasing: any pair created by a merge occurs at
    # most as often as the pair that was merged, and all others were
    # already below the max
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_encode_with_merges(spark):
    from ndl_core_data_pipeline_spark.operators.bpe import encode_with_merges

    docs = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    merges = train_bpe_merges(docs, n_merges=12)
    out = encode_with_merges(docs, merges).collect()
    assert len(out) == len(TEXTS)
    for row in out:
        # every word ends at an end-marked token; n_tokens consistent
        assert row["n_tokens"] == len(row["tokens"])
        assert row["tokens"][-1].endswith(END_MARK)
        rebuilt = "".join(row["tokens"]).replace(END_MARK, " ").strip()
        assert rebuilt == " ".join(row["text"].lower().strip().split())


def test_encode_greedy_rank_order(spark):
    from ndl_core_data_pipeline_spark.operators.bpe import encode_with_merges

    docs = spark.createDataFrame([("low low low",)], "text STRING")
    merges = train_bpe_merges(docs, n_merges=2)
    out = encode_with_merges(docs, merges).first()
    # after 2 merges on a single repeated word, tokens shrink below chars
    assert len(out["tokens"]) < 3 * 4


def test_nbsp_tokenization_matches_spark(spark):
    # NBSP (common in scraped HTML) is NOT whitespace to Java regex \s;
    # train and encode must agree on keeping it inside the word
    texts = ["low\xa0tier low\xa0tier low tier", "wide　gap wide"]
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = train_bpe_merges(docs, n_merges=6)
    assert got == _ref_bpe(texts, 6)
    # and the divergent tokenization would actually have differed here:
    # unicode split would break 'low\xa0tier' into two words
    assert tokenize_words("low\xa0tier") == ["low\xa0tier"]
    assert "low\xa0tier".split() == ["low", "tier"]


def test_distributed_loop_matches_reference(spark, monkeypatch):
    # force the distributed path (the small-vocab fast path would
    # otherwise absorb every test corpus): both strategies must produce
    # the identical merge sequence
    from ndl_core_data_pipeline_spark.operators import bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "VOCAB_DRIVER_MAX", 0)
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    got = train_bpe_merges(docs, n_merges=12)
    assert got == _ref_bpe(TEXTS, 12)


def test_driver_path_equals_distributed_path(spark, monkeypatch):
    from ndl_core_data_pipeline_spark.operators import bpe as bpe_mod

    docs = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    small = train_bpe_merges(docs, n_merges=8)
    monkeypatch.setattr(bpe_mod, "VOCAB_DRIVER_MAX", 0)
    big = train_bpe_merges(docs, n_merges=8)
    assert small == big
