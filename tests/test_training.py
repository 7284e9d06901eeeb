"""Structural pins for the training-assembly operators
(pipelines/training.py) beyond their DuckDB-oracle parity: the epoch
shuffle is a deterministic salt-keyed permutation, the repeated-n-gram
detector counts exactly the cross-doc windows, the bigram LM is a
proper conditional distribution, and retention partials are additive.
"""

import numpy as np
import pandas as pd
import pytest

from crawler_tjce_ray.pipelines.training import (
    DUP_N,
    _doc_window_pairs,
    _md5_hex,
    q_bigram_lm,
    q_dup_ngram_docs,
    q_epoch_shuffle,
    q_retention,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_is_permutation_and_deterministic():
    a = q_epoch_shuffle(SF_DIR)
    # pos is exactly 0..n-1, once each
    assert a["pos"].tolist() == list(range(len(a)))
    assert a["doc_id"].is_unique
    # deterministic: a second run is byte-identical
    b = q_epoch_shuffle(SF_DIR)
    pd.testing.assert_frame_equal(a, b)
    # and it actually permutes (md5 order != doc_id order)
    assert a["doc_id"].tolist() != sorted(a["doc_id"].tolist())


def test_epoch_salt_changes_the_permutation():
    ids = pd.Series(range(1000), dtype="int64")
    k1 = _md5_hex(ids, "epoch1:")
    k2 = _md5_hex(ids, "epoch2:")
    order1 = np.argsort(np.asarray(k1))
    order2 = np.argsort(np.asarray(k2))
    assert not np.array_equal(order1, order2)


def test_doc_window_pairs_counts_and_boundaries():
    # doc 1: 10 words -> 10 - DUP_N + 1 = 3 distinct windows
    # doc 2: DUP_N - 1 words -> no window
    # doc 3: identical text to doc 1 -> the same 3 window digests
    words = " ".join(f"w{i}" for i in range(10))
    short = " ".join(f"s{i}" for i in range(DUP_N - 1))
    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3], dtype="int64"),
        "text": [words, short, words],
    })
    pairs = _doc_window_pairs(df)
    per_doc = pairs.groupby("doc_id").size().to_dict()
    assert per_doc == {1: 3, 3: 3}
    k1 = set(pairs.loc[pairs["doc_id"] == 1, "gkey"])
    k3 = set(pairs.loc[pairs["doc_id"] == 3, "gkey"])
    assert k1 == k3  # exact-match digests, no doc-boundary bleed


def test_doc_window_pairs_never_crosses_documents():
    # two docs of DUP_N/2 words each: no valid window exists even
    # though the concatenated word stream would form several
    half = " ".join(f"x{i}" for i in range(DUP_N // 2))
    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2], dtype="int64"),
        "text": [half, half],
    })
    assert len(_doc_window_pairs(df)) == 0


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_docs_bounds():
    out = q_dup_ngram_docs(SF_DIR)
    assert (out["n_shared"] <= out["n_grams"]).all()
    assert (out["n_grams"] >= 1).all()
    assert ((out["shared_frac"] >= 0) & (out["shared_frac"] <= 1)).all()
    # is_dup is exactly the majority-shared rule
    expect = (out["n_shared"] * 2 >= out["n_grams"]).astype("int64")
    assert (out["is_dup"] == expect).all()


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_is_conditional_distribution():
    out = q_bigram_lm(SF_DIR)
    assert len(out) == 20
    assert (out["c12"] <= out["c1"]).all()
    assert ((out["cond_p"] > 0) & (out["cond_p"] <= 1)).all()
    # descending head with deterministic tie-break
    assert out["c12"].is_monotonic_decreasing


@pytest.mark.usefixtures("ray_session")
def test_retention_bounds():
    out = q_retention(SF_DIR)
    assert (out["n_retained"] <= out["n_active"]).all()
    assert ((out["retention"] >= 0) & (out["retention"] <= 1)).all()
    assert out["day"].is_monotonic_increasing and out["day"].is_unique
