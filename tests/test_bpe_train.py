"""BPE vocabulary induction (operators/text.py bpe_train_merges) vs an
independent pure-Python implementation of the classic trainer
(Sennrich et al. get_stats/merge_vocab) — validates the algorithm itself,
not just Spark/DuckDB consistency (tests/test_oracle_parity.py covers
that)."""

from __future__ import annotations

import re
from collections import Counter

from network_iq_spark.operators.text import bpe_train_merges


def _ref_bpe(texts: list[str], k: int) -> list[tuple[int, str, str, int]]:
    """Classic BPE trainer on word counts; tie-break = (count DESC, marked
    pair string ASC) — the engine's total order."""
    wc = Counter(w for t in texts for w in re.findall("[a-z0-9]+", t.lower()))
    vocab: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), c) for w, c in wc.items()
    ]
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"|{kv[0][0]} |{kv[0][1]}")
        )
        merges.append((rank, a, b, cnt))
        new_vocab = []
        for syms, c in vocab:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((tuple(out), c))
        vocab = new_vocab
    return merges


def _run(spark, texts: list[str], k: int):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = [
        (r.rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(df, n_merges=k).collect()
    ]
    assert got == _ref_bpe(texts, k), got
    return got


def test_textbook_corpus(spark):
    # the classic low/lower/newest example: 'e s' then 'es t' style merges
    texts = ["low low low lower lower", "newest newest widest widest"] * 2
    got = _run(spark, texts, 6)
    assert len(got) == 6
    # ranks are 1..k and counts are non-increasing only per re-count round,
    # but every count must be positive
    assert [r for r, *_ in got] == [1, 2, 3, 4, 5, 6]
    assert all(c > 0 for *_, c in got)


def test_greedy_chaining_consecutive_pairs(spark):
    # 'aaaa' must merge (a,a) -> 'aa aa' (greedy leftmost CHAINS through
    # consecutive occurrences), so round 2's top pair is (aa, aa)
    got = _run(spark, ["aaaa aaaa aaaa b"], 2)
    assert got[0][1:3] == ("a", "a")
    assert got[1][1:3] == ("aa", "aa")


def test_prefix_hazard_multichar_symbols(spark):
    # after (e,r)->'er', a later (x, e) pair must not match inside '|x |er'
    # and merged symbols must participate as whole units; cross-check the
    # whole trajectory against the reference on a corpus full of shared
    # prefixes/suffixes
    texts = [
        "er er er er er xe xe xer xer zer zerure urer",
        "ere ere rere xere zere er er er xe xe",
    ]
    _run(spark, texts, 8)


def test_single_char_words_never_pair(spark):
    # 1-symbol words contribute no pairs; corpus of them still trains on
    # the multi-char remainder
    got = _run(spark, ["a b c d e f g ab ab ab"], 1)
    assert got[0][1:3] == ("a", "b") and got[0][3] == 3
