"""BPE merge training: the distributed operator must reproduce the
reference greedy algorithm (Sennrich et al. 2016) merge-for-merge.

The reference implementation below is the textbook word-frequency
version: count adjacent symbol pairs weighted by word frequency, take
the (count DESC, lhs ASC, rhs ASC) winner, apply it greedily
left-to-right inside every word, repeat.
"""

from collections import Counter

import pytest

from credit_ocr_system_spark.operators.textops import bpe_merges


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    syms = {w: list(w) for w in word_freqs}
    out = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (l, r), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((l, r, c))
        for w in syms:
            s, new, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    new.append(l + r)
                    i += 2          # greedy skip-after-merge
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
    return out


@pytest.fixture(scope="module")
def bpe_docs(spark):
    # the classic corpus, plus an identical-symbol run (aaaa) that
    # only the exact greedy fold handles right, plus a punctuated
    # token that must be excluded from the vocabulary
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 4}
    text = " ".join(w for w, f in words.items() for _ in range(f))
    rows = [(0, text + " don't", "s")]
    return (spark.createDataFrame(
        rows, "doc_id long, text string, source string"), words)


def test_bpe_matches_reference_merge_for_merge(bpe_docs):
    docs, words = bpe_docs
    got = [(r["lhs"], r["rhs"], r["pair_count"])
           for r in bpe_merges(docs, n_merges=6)
           .orderBy("merge_rank").collect()]
    assert got == _ref_bpe(words, 6)


def test_bpe_greedy_run_semantics(spark):
    # "aaaa" x1: first merge (a,a) count 3 (overlapping positions),
    # applied greedily -> aa|aa; second merge (aa,aa) count 1
    docs = spark.createDataFrame(
        [(0, "aaaa", "s")], "doc_id long, text string, source string")
    got = [(r["lhs"], r["rhs"], r["pair_count"])
           for r in bpe_merges(docs, n_merges=2)
           .orderBy("merge_rank").collect()]
    assert got == [("a", "a", 3), ("aa", "aa", 1)]


def test_bpe_vocab_emits_merged_tokens(bpe_docs):
    from credit_ocr_system_spark.operators.textops import bpe_vocab

    docs, words = bpe_docs
    got = {r["token"]: r["n_occurrences"]
           for r in bpe_vocab(docs, n_merges=6).collect()}
    # reference: re-encode every word with the reference merges
    merges = [(l, r) for l, r, _c in _ref_bpe(words, 6)]
    from collections import Counter
    expect: Counter = Counter()
    for w, f in words.items():
        s = list(w)
        for l, r in merges:
            new, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            s = new
        for tok in s:
            expect[tok] += f
    assert got == dict(expect)
