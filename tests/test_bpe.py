"""Gates for learned BPE (functions/bpe.py): merge learning picks the
most frequent pair first, encoding respects merge order, and the
Arrow-batched tokenizer matches a pure-python re-encode."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dataframe_sql_spark.functions.bpe import (
    _encode_word,
    bpe_token_count_col,
    bpe_tokenize_col,
    learn_bpe,
)


def _corpus(spark):
    rows = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "low low low low low",
                "lower lower newest newest",
                "newest newest newest newest",
                "widest widest widest",
            ],
        }
    )
    return spark.createDataFrame(rows)


def test_learn_bpe_first_merge_is_most_frequent_pair(spark):
    merges = learn_bpe(_corpus(spark), "text", n_merges=10)
    # 'es' and 't</w>' both weigh 9 (newest 6 + widest 3); the
    # deterministic tie-break picks the lexicographically larger pair.
    assert merges[0] == ("t", "</w>")
    # the est</w> suffix cascade dominates: after 10 merges the most
    # frequent words encode to one or two symbols
    ranks = {p: i for i, p in enumerate(merges)}
    assert len(_encode_word("newest", ranks)) <= 2
    assert len(_encode_word("low", ranks)) <= 2
    assert len(merges) == 10
    # deterministic across runs
    assert merges == learn_bpe(_corpus(spark), "text", n_merges=10)


def test_bpe_tokenize_matches_driver_encode(spark):
    df = _corpus(spark)
    merges = learn_bpe(df, "text", n_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    out = df.select(
        "text",
        bpe_tokenize_col(F.col("text"), merges).alias("toks"),
        bpe_token_count_col(F.col("text"), merges).alias("n"),
    ).collect()
    for r in out:
        expect = []
        for w in r.text.strip().lower().split():
            expect.extend(_encode_word(w, ranks))
        assert list(r.toks) == expect
        assert r.n == len(expect)


def test_learn_bpe_vocab_cap(spark):
    import pytest

    with pytest.raises(AssertionError, match="max_vocab"):
        learn_bpe(_corpus(spark), "text", n_merges=1, max_vocab=2)
