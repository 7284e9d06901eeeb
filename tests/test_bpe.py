"""BPE tokenizer pins: the distributed word-count pass equals a local
Counter, the trainer reproduces the hand-computable merges of the
classic Sennrich toy corpus, encoding is lossless (tokens concatenate
back to word + </w>), and both queries are deterministic."""

import collections
import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines import bpe

SF = "/root/testdata/sf0.001"


def test_train_toy_corpus_hand_computed():
    # Sennrich's example family: 'low' x5, 'lower' x2, 'newest' x6,
    # 'widest' x3.  First merges are forced: (e,s) 9, (es,t) 9,
    # (est,</w>) 9, then (l,o) 7, (lo,w) 7 ...
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(wc, num_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]


def test_encode_replays_training_segmentation():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(wc, num_merges=10)
    ranks = {p: r for r, p in enumerate(merges)}
    # every training word must encode losslessly
    for w in wc:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + bpe.END
    # an unseen word still encodes with partial merges
    toks = bpe.encode_word("lowest", ranks)
    assert "".join(toks) == "lowest" + bpe.END
    assert "est</w>" in toks  # the learned suffix fires on unseen words


def test_tie_break_is_lexicographic():
    # 'ab' and 'cd' both have count 1: (a,b) < (c,d) must win
    merges = bpe.train_bpe({"ab": 1, "cd": 1}, num_merges=1)
    assert merges == [("a", "b")]


@pytest.mark.usefixtures("ray_session")
def test_distributed_word_count_matches_local():
    got = bpe.corpus_word_counts(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    want = collections.Counter()
    for t in docs["text"].to_pylist():
        want.update(re.findall(r"[a-z0-9]+", t.lower()))
    assert dict(got) == dict(want)


@pytest.mark.usefixtures("ray_session")
def test_bpe_queries_deterministic_and_bounded():
    t1 = bpe.q_bpe_train(SF)
    t2 = bpe.q_bpe_train(SF)
    pd.testing.assert_frame_equal(t1, t2)
    # the trainer stops early once every word is a single token, so
    # the table is bounded by NUM_MERGES, not necessarily equal to it
    assert 0 < len(t1) <= bpe.NUM_MERGES

    c = bpe.q_bpe_token_count(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert len(c) == len(docs)
    # per-word token count is in [1, len(word)+1]: total bpe tokens
    # bounded below by word count and above by chars + words
    n_chars = docs.sort_values("doc_id")["text"].str.lower() \
        .str.findall(r"[a-z0-9]+").map(lambda ws: sum(len(w) for w in ws))
    assert (c["n_bpe_tokens"] >= c["n_words"]).all()
    assert (c["n_bpe_tokens"].to_numpy()
            <= n_chars.to_numpy() + c["n_words"].to_numpy()).all()
    # merges actually fire: strictly fewer tokens than the no-merge bound
    assert c["n_bpe_tokens"].sum() < (n_chars + c["n_words"]).sum()


@pytest.mark.usefixtures("ray_session")
def test_bpe_token_count_matches_local_encode(tmp_path):
    # tiny crafted corpus: distributed pipeline == pure-local encode
    rows = ["the lowest low", "newest widest lower", ""]
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["unit"] * len(rows)),
        "n_chars": pa.array([len(r) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    got = bpe.q_bpe_token_count(sf)
    merges = bpe.train_bpe(bpe.corpus_word_counts(sf))
    ranks = {p: r for r, p in enumerate(merges)}
    for i, text in enumerate(rows):
        words = re.findall(r"[a-z0-9]+", text.lower())
        want = sum(len(bpe.encode_word(w, ranks)) for w in words)
        assert got.loc[got["doc_id"] == i, "n_bpe_tokens"].iloc[0] == want
        assert got.loc[got["doc_id"] == i, "n_words"].iloc[0] == len(words)
