"""Seeded randomized python-twin parity for the round-5 batch-3 operators
(the test_sampling pattern: one Spark job over a few hundred generated
rows, expected values computed by an independent plain-Python reference).
"""

import random
from collections import Counter, defaultdict

from pyspark.sql import Row


def _rand_docs(seed, n, vocab, lo=0, hi=12):
    rng = random.Random(seed)
    return [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(lo, hi))))
            for i in range(n)]


def test_phrase_search_parity(spark):
    from datascrapexter_spark.ops.retrieval import phrase_search

    docs = _rand_docs(93, 300, ["a", "b", "c"], 0, 15)
    phrase = ["a", "b", "a"]

    def count(text):
        toks = text.split()
        return sum(1 for s in range(len(toks) - 2)
                   if toks[s:s + 3] == phrase)

    expect = {i: count(t) for i, t in docs if count(t) > 0}
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(df, "a b a").collect()}
    assert got == expect


def test_stupid_backoff_parity(spark):
    from datascrapexter_spark.ops.textstats import stupid_backoff_scores

    train = _rand_docs(941, 200, ["u", "v", "w", "x"], 0, 10)
    score = _rand_docs(942, 200, ["u", "v", "w", "x", "oov"], 0, 10)

    c2 = Counter()
    for _, t in train:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
    ctx = Counter()
    uni = Counter()
    for (a, b), c in c2.items():
        ctx[a] += c
        uni[b] += c
    T = sum(uni.values())

    def doc_score(text):
        toks = text.split()
        n, s = 0, 0
        for a, b in zip(toks, toks[1:]):
            n += 1
            if (a, b) in c2:
                s += (1_000_000 * c2[(a, b)]) // ctx[a]
            elif b in uni:
                s += (400_000 * uni[b]) // T
        return n, s

    expect = {}
    for i, t in score:
        n, s = doc_score(t)
        expect[i] = (n, s, s // n if n else 0)
    tr = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in train],
                               schema="doc_id long, text string")
    sc = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in score],
                               schema="doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_ppm"], r["avg_ppm"])
           for r in stupid_backoff_scores(tr, sc).collect()}
    assert got == expect


def test_exact_quantiles_parity(spark):
    from datascrapexter_spark.ops.sketches import exact_group_quantiles

    rng = random.Random(95)
    rows = [(rng.choice("abc"), rng.randint(0, 40)) for _ in range(500)]

    def q1(vals, pct):  # type-1 lower discrete quantile
        vals = sorted(vals)
        k = -(-pct * len(vals) // 100)  # ceil
        return vals[k - 1]

    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    expect = {g: (len(vs), q1(vs, 50), q1(vs, 90), q1(vs, 99))
              for g, vs in by_g.items()}
    df = spark.createDataFrame([Row(g=g, v=v) for g, v in rows])
    got = {r["g"]: (r["n"], r["p50"], r["p90"], r["p99"])
           for r in exact_group_quantiles(df, "g", "v").collect()}
    assert got == expect


def test_gini_parity(spark):
    from datascrapexter_spark.monitoring import schedule_fairness

    rng = random.Random(97)
    rows = [(f"h{rng.randint(0, 30)}", rng.randint(1, 9))
            for _ in range(400)]
    per_host = Counter()
    for h, w in rows:
        per_host[h] += w
    xs = sorted(per_host.values())
    n, s = len(xs), sum(xs)
    expect = (1_000_000 * sum((2 * (i + 1) - n - 1) * x
                              for i, x in enumerate(xs))) // (n * s)
    df = spark.createDataFrame([Row(host=h, w=w) for h, w in rows])
    r = schedule_fairness(df, "host", "w").collect()[0]
    assert (r["n_hosts"], r["total"], r["gini_ppm"]) == (n, s, expect)


def test_cdx_delta_parity(spark):
    import datetime as dt

    from datascrapexter_spark.functions.surt import cdx_delta

    rng = random.Random(96)
    keys = [f"com,s{i})/p/{i}" for i in range(60)]

    def snapshot(tag):
        rows = []
        for k in keys:
            for c in range(rng.randint(0, 3)):
                rows.append((k, dt.datetime(2026, 1, 1 + rng.randint(0, 27)),
                             f"{tag}{rng.randint(0, 4)}"))
        return rows

    old, new = snapshot("o"), snapshot("n")
    # some byte-identical re-serves so 'unchanged' occurs
    for k in keys[:20]:
        ts = dt.datetime(2026, 3, 1)
        old.append((k, ts, "same"))
        new.append((k, ts, "same"))

    def latest(rows):
        best = {}
        for k, ts, d in rows:
            if k not in best or (ts, d) > best[k]:
                best[k] = (ts, d)
        return {k: d for k, (ts, d) in best.items()}

    lo, ln = latest(old), latest(new)
    expect = {}
    for k in set(lo) | set(ln):
        if k not in lo:
            st = "added"
        elif k not in ln:
            st = "removed"
        elif lo[k] == ln[k]:
            st = "unchanged"
        else:
            st = "changed"
        expect[k] = (st, lo.get(k), ln.get(k))
    mk = lambda rows: spark.createDataFrame(
        [Row(surt_key=k, ts=ts, digest=d) for k, ts, d in rows])
    got = {r["surt_key"]: (r["status"], r["old_digest"], r["new_digest"])
           for r in cdx_delta(mk(old), mk(new)).collect()}
    assert got == expect
