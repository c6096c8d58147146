"""Deterministic scale-up generator for the documents table.

The driver ships testdata only up to sf0.1 (5,000 docs); the round-5
verdict asks for the LLM-pipeline headliners to be scale-proofed at 10x.
This tool synthesizes an sfN documents.parquet whose distributions are
CALIBRATED TO sf0.1 (same 31-token vocabulary with empirical unigram
frequencies, same uniform 10..100 token length range, same lang/source
categoricals) so the per-row work and key distributions of every
documents-driven operator match the driver data — only the row count
scales. Everything is seeded numpy; same (seed, n_docs) -> byte-identical
table. No external data; writes only under /root/repo.

Usage: python tools/gen_scale_data.py [out_dir] [n_docs] [seed]
       defaults: dist/sf1  50000  42
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01_DOCS = "/root/testdata/sf0.1/documents.parquet"


def _calibration(src_path: str = SF01_DOCS):
    """Empirical (vocab+freqs, length range, lang probs, sources) from the
    driver's sf0.1 table — read once at generate time, so the synthetic
    table tracks the driver data by construction, not by hardcoded
    guesses."""
    t = pq.read_table(src_path, columns=["text", "lang", "source"])
    texts = t.column("text").to_pylist()
    from collections import Counter

    tok_counts: Counter = Counter()
    lengths = []
    for s in texts:
        toks = s.split(" ")
        lengths.append(len(toks))
        tok_counts.update(toks)
    vocab = sorted(tok_counts)
    freqs = np.array([tok_counts[w] for w in vocab], dtype=np.float64)
    freqs /= freqs.sum()
    langs = Counter(t.column("lang").to_pylist())
    lang_names = sorted(langs)
    lang_p = np.array([langs[k] for k in lang_names], dtype=np.float64)
    lang_p /= lang_p.sum()
    sources = sorted(set(t.column("source").to_pylist()))
    return (vocab, freqs, int(min(lengths)), int(max(lengths)),
            lang_names, lang_p, sources)


def generate_documents(out_dir: str, n_docs: int, seed: int = 42) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    vocab, freqs, lmin, lmax, lang_names, lang_p, sources = _calibration()
    rng = np.random.default_rng(seed)
    vocab_arr = np.array(vocab)
    lens = rng.integers(lmin, lmax + 1, size=n_docs)
    total = int(lens.sum())
    toks = vocab_arr[rng.choice(len(vocab), size=total, p=freqs)]
    offs = np.r_[0, np.cumsum(lens)]
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    lang = np.array(lang_names)[
        rng.choice(len(lang_names), size=n_docs, p=lang_p)]
    source = np.array(sources)[rng.integers(0, len(sources), size=n_docs)]
    table = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(lang.tolist(), type=pa.string()),
        "source": pa.array(source.tolist(), type=pa.string()),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    pq.write_table(table, path)
    return path


SF01_EMB = "/root/testdata/sf0.1/embeddings.parquet"


def generate_embeddings(out_dir: str, n_vecs: int, seed: int = 43) -> str:
    """Scale-up embeddings table, calibrated to sf0.1 (same dim, float32
    list column, same label domain); seeded standard-normal vectors —
    the same distribution family the driver's random embeddings show."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    src = pq.read_table(SF01_EMB)
    dim = len(src.column("embedding")[0])
    labels = sorted(set(src.column("label").to_pylist()))
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    lab = rng.choice(np.array(labels, dtype=np.int32), size=n_vecs)
    table = pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array(lab, type=pa.int32()),
    })
    pq.write_table(table, path)
    return path


def ensure_scale_dir(out_dir: str, n_docs: int, seed: int = 42) -> str:
    """Idempotent: generate only if a table is absent or the wrong
    size (a partial previous run). Embeddings keep sf0.1's 2:5 ratio
    to documents."""
    path = os.path.join(out_dir, "documents.parquet")
    ok = False
    if os.path.exists(path):
        try:
            ok = pq.read_metadata(path).num_rows == n_docs
        except Exception:
            ok = False
    if not ok:
        generate_documents(out_dir, n_docs, seed)
    n_vecs = (n_docs * 2) // 5
    epath = os.path.join(out_dir, "embeddings.parquet")
    ok = False
    if os.path.exists(epath):
        try:
            ok = pq.read_metadata(epath).num_rows == n_vecs
        except Exception:
            ok = False
    if not ok:
        generate_embeddings(out_dir, n_vecs, seed + 1)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    print(generate_documents(out, n, seed))
