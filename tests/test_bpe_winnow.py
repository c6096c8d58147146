"""BPE merge induction (ops/bpe, q86) and winnowing fingerprints
(ops/dedup.winnow_*, q87)."""

import hashlib

import pytest
from pyspark.sql import Row

from datascrapexter_spark.ops.bpe import apply_merges, bpe_merges
from datascrapexter_spark.ops.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


# ------------------------------------------------------------------- BPE


def _ref_bpe(texts, n_merges):
    """Plain-Python reference BPE (greedy leftmost merge application,
    (count DESC, lhs, rhs) tie-break)."""
    import collections
    import re

    wf = collections.Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\r]+", t.strip().lower()):
            if w:
                wf[w] += 1
    words = {w: tuple(w) for w in wf}
    out = []
    for rank in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        mx = max(pc.values())
        lhs, rhs = sorted(p for p, c in pc.items() if c == mx)[0]
        out.append((rank, lhs, rhs, lhs + rhs, mx))
        nxt = {}
        for w, syms in words.items():
            acc, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    acc.append(lhs + rhs)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            nxt[w] = tuple(acc)
        words = nxt
    return out


def test_bpe_matches_reference_sennrich_corpus(spark):
    # the corpus from the BPE paper's worked example, frequency-weighted
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    got = [tuple(r) for r in
           bpe_merges(_docs(spark, [" ".join(texts)]), n_merges=6)
           .orderBy("merge_rank").collect()]
    assert got == _ref_bpe([" ".join(texts)], 6)
    # first merge on this corpus is the famous (e, s) -> es (freq 9)
    assert got[0][1:] == ("e", "s", "es", 9)


def test_bpe_consecutive_pair_runs_merge_greedily(spark):
    # 'a a a a' (as the word 'aaaa') must merge to (aa)(aa), and 'aaa'
    # to (aa)(a) — the leftmost non-overlapping discipline the sentinel
    # replace() encodes
    got = [tuple(r) for r in
           bpe_merges(_docs(spark, ["aaaa aaa"]), n_merges=2)
           .orderBy("merge_rank").collect()]
    assert got == _ref_bpe(["aaaa aaa"], 2)
    # round 1: (a, a) with 5 disjoint-ish... reference computes exact
    assert got[0][1:3] == ("a", "a")


def test_bpe_early_stop_when_pairs_exhaust(spark):
    # single-char words only -> zero adjacent pairs -> empty merge table
    out = bpe_merges(_docs(spark, ["a b c a b"]), n_merges=4).collect()
    assert out == []


def test_bpe_tie_breaks_lexicographically(spark):
    # 'ab' and 'ba' both appear once -> counts tie at 1; (a,b) < (b,a)
    got = bpe_merges(_docs(spark, ["ab ba"]), n_merges=1).collect()
    assert (got[0]["lhs"], got[0]["rhs"]) == ("a", "b")


def test_apply_merges_roundtrip(spark):
    texts = ["lowest lower low", "newest new"]
    merges = [(r["lhs"], r["rhs"]) for r in
              bpe_merges(_docs(spark, texts), n_merges=4)
              .orderBy("merge_rank").collect()]
    out = apply_merges(_docs(spark, ["low lowest"]), merges) \
        .orderBy("doc_id").collect()
    toks = out[0]["bpe_tokens"]
    # every output token is a concatenation chain over the original
    # chars and rejoining reproduces the input words
    assert "".join(toks) == "lowlowest"


# ------------------------------------------------------------- winnowing


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_winnow(text, k, w):
    toks = [t for t in text.strip().lower().split() if t]
    if len(toks) < k:
        return set()
    hs = [_h64(" ".join(toks[p:p + k])) for p in range(len(toks) - k + 1)]
    sel = set()
    for start in range(max(len(hs) - w, 0) + 1):
        win = hs[start:start + w]
        mn = min(win)
        # rightmost occurrence
        pos = start + max(i for i, v in enumerate(win) if v == mn)
        sel.add((pos, mn))
    return sel


@pytest.mark.parametrize("text", [
    "the quick brown fox jumps over the lazy dog again and again",
    "a b a b a b a b a b a b",          # periodic -> min-hash ties
    "one two three four five",           # n_grams < w -> one window
])
def test_winnow_fingerprints_match_reference(spark, text):
    out = winnow_fingerprints(_docs(spark, [text]), "doc_id", "text",
                              k=4, w=5).collect()
    got = {(r["pos"], r["fp"]) for r in out}
    assert got == _ref_winnow(text, 4, 5)


def test_winnow_short_doc_yields_nothing(spark):
    out = winnow_fingerprints(_docs(spark, ["one two three"]),
                              "doc_id", "text", k=4, w=5).collect()
    assert out == []


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # two docs sharing a run of w + k - 1 = 8 tokens inside otherwise
    # disjoint text MUST share at least one fingerprint value
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(spark, [f"xx1 xx2 xx3 {shared} yy1 yy2",
                       f"zz1 {shared} qq1 qq2 qq3 qq4"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=4, w=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1]


def test_winnow_overlap_pairs_containment(spark):
    base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 "
            "w16 w17 w18 w19 w20")
    df = _docs(spark, [base, "pre1 pre2 " + base + " post1 post2",
                       "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"])
    out = winnow_overlap_pairs(df, "doc_id", "text", k=4, w=5,
                               threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["overlap"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.9
    assert not any(2 in p for p in pairs)


def test_winnow_overlap_max_fp_doc_freq_drops_boilerplate(spark):
    # the same passage in 4 docs: with cap=2 the shared fingerprints are
    # dropped and no pair survives; without the cap all 6 pairs surface
    passage = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    df = _docs(spark, [f"d{i} " + passage for i in range(4)])
    full = winnow_overlap_pairs(df, "doc_id", "text", k=4, w=5,
                                threshold=0.3).collect()
    assert len(full) == 6
    capped = winnow_overlap_pairs(df, "doc_id", "text", k=4, w=5,
                                  threshold=0.3,
                                  max_fp_doc_freq=2).collect()
    assert capped == []
