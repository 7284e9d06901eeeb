"""Learned byte-pair-encoding tokenizer over the documents corpus —
the real-tokenizer step a training-data pipeline runs after curation
(the ``token_count`` query approximates it with a fixed regex; this
module LEARNS the merge table from the corpus, Sennrich et al. 2016).

Scale shape: BPE training needs only the WORD-FREQUENCY table, not
the corpus — so the corpus-scale work is ONE streaming word-count
pass (per-batch ``Counter`` partials reduced on the driver, O(vocab)
state, exactly the ``unigram_logprob`` discipline), and the iterative
merge loop then runs driver-locally over that bounded table (~10M
types at web scale, independent of corpus row count).  Encoding
broadcasts the merge-rank dict once via ``ray.put``; each batch
encodes only its UNIQUE words (memoized), then maps per-word token
counts back to documents vectorized.  No shuffle anywhere — the only
cross-node traffic is count partials and the one broadcast.

Determinism: merge selection breaks count ties on the
lexicographically smallest pair, so the merge table is a pure
function of the corpus.  Both queries are rows-only for the driver
(no SQL analog); tests pin the distributed word count against a local
Counter and the whole trainer against a hand-computed toy corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_tjce_ray.pipelines.textops import _read_docs

END = "</w>"          # Sennrich word-end marker
# Default merge budget for the queries.  The synthetic corpus has a
# small closed vocabulary that fully merges (every word -> 1 token)
# after ~107 merges, which would make the per-doc counts degenerate —
# 64 stops mid-segmentation so the learned subword structure is
# visible in the output.  Real corpora use 30k-100k merges; the cost
# model is unchanged (training is driver-local over the vocab table).
NUM_MERGES = 64


def corpus_word_counts(sf_dir: str) -> pd.Series:
    """Global word -> count via per-batch combiner partials (the only
    corpus-scale pass in BPE training)."""
    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        from crawler_tjce_ray.pipelines.textops import tokens_flat

        ex = pd.Series(tokens_flat(t.column("text"))[1], dtype=object)
        if ex.empty:
            return pd.DataFrame({"w": pd.Series([], dtype="string"),
                                 "n": pd.Series([], dtype="int64")})
        g = ex.value_counts()
        return pd.DataFrame({"w": g.index.astype("string"),
                             "n": g.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby("w")["n"].sum().sort_index()


def train_bpe(word_counts: dict[str, int] | pd.Series,
              num_merges: int = NUM_MERGES) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a word-frequency table.

    Classic frequency-table BPE: each word is a symbol sequence
    (chars + ``</w>``); every round counts adjacent symbol pairs
    weighted by word frequency, merges the most frequent pair
    everywhere (ties -> lexicographically smallest pair), and repeats.
    Runs driver-local on the O(vocab) table — the corpus itself is
    never touched here."""
    if isinstance(word_counts, pd.Series):
        word_counts = word_counts.to_dict()
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        seq = tuple(w) + (END,)
        vocab[seq] = vocab.get(seq, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, c in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for seq, c in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        vocab = nxt
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair (standard inference rule — equivalent
    to replaying the merges in training order)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        cand = [(ranks[p], i) for i, p in enumerate(zip(seq, seq[1:]))
                if p in ranks]
        if not cand:
            break
        _, i = min(cand)
        seq[i: i + 2] = [seq[i] + seq[i + 1]]
    return seq


# per-process memo: bpe_train and bpe_token_count share one trained
# merge table per corpus dir (deterministic result; the _crawl_run
# memo precedent in registry.py) instead of each re-running the
# corpus-scale count pass + trainer
_TRAIN_MEMO: dict[str, list[tuple[str, str]]] = {}


def _trained(sf_dir: str) -> list[tuple[str, str]]:
    if sf_dir not in _TRAIN_MEMO:
        _TRAIN_MEMO[sf_dir] = train_bpe(corpus_word_counts(sf_dir))
    return _TRAIN_MEMO[sf_dir]


def q_bpe_train(sf_dir: str) -> pd.DataFrame:
    """The learned merge table itself as data: (rank, left, right).
    Deterministic for a given corpus (count-then-lexicographic tie
    break), so the driver's rows-only check is stable."""
    merges = _trained(sf_dir)
    return pd.DataFrame({
        "rank": pd.Series(range(len(merges)), dtype="int64"),
        "left": pd.Series([a for a, _ in merges], dtype="object"),
        "right": pd.Series([b for _, b in merges], dtype="object"),
    })


def q_bpe_token_count(sf_dir: str) -> pd.DataFrame:
    """Per-document token count under the corpus's own learned BPE —
    the real-tokenizer counterpart of ``token_count``'s fixed regex.
    One count pass + driver-local training (see module docstring),
    then a broadcast-encode pass: each batch encodes only its unique
    words and maps counts back vectorized."""
    import ray

    merges = _trained(sf_dir)
    ranks = {p: r for r, p in enumerate(merges)}
    ranks_ref = ray.put(ranks)

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pd.DataFrame:
        rk = ray.get(ranks_ref)
        from crawler_tjce_ray.pipelines.textops import tokens_flat

        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        idx, w = tokens_flat(t.column("text"))
        ex = pd.DataFrame({"doc_id": doc[idx], "w": w})
        base = pd.DataFrame({"doc_id": doc})
        if ex.empty:
            base["n_words"] = np.int64(0)
            base["n_bpe_tokens"] = np.int64(0)
            return base
        lens = {w: len(encode_word(w, rk)) for w in pd.unique(ex["w"])}
        ex["tl"] = ex["w"].map(lens)
        g = ex.groupby("doc_id", as_index=False).agg(
            n_words=("tl", "size"), n_bpe_tokens=("tl", "sum")
        )
        out = base.merge(g, on="doc_id", how="left")
        out["n_words"] = out["n_words"].fillna(0).astype("int64")
        out["n_bpe_tokens"] = out["n_bpe_tokens"].fillna(0).astype("int64")
        return out

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES = {
    "bpe_train": q_bpe_train,
    "bpe_token_count": q_bpe_token_count,
}

ORACLE_SQL: dict[str, str] = {}  # no SQL analog: learned merges
