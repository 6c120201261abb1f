#!/usr/bin/env python3
"""Synthesize a 10×-sf0.1 documents/embeddings fixture for UPWARD scaling
evidence (VERDICT r4 next-round #6).

The driver's largest testdata is sf0.1 (5,000 documents / 2,000
embeddings). The dedup/curation families carry 100 TB scale claims whose
downward evidence (sf0.01 → sf0.1 ratio table in BASELINE.md) proves no
quadratic drift — this script adds the upward point: 50,000 documents /
20,000 embeddings with the SAME generative shape as the driver testdata
(measured from /root/testdata/sf0.1, seed-deterministic):

- text: 10–100 tokens uniform from the observed 31-word vocabulary
  (avg ~54 tokens), matching the sf0.1 marginal;
- near-dups: ~4.3% of docs are a copy of an earlier doc with a few token
  substitutions (sf0.1 has 216 same-prefix groups / 5,000 docs) and
  ~0.15% are exact copies (8 / 5,000);
- lang mix: en-heavy (~41%) over {en, de, es, fr, zh}; sources src0..19;
- embeddings: 64-dim unit-norm gaussian, label uniform 0..9 (the driver
  embeddings have centroid-norm ≈ 0.07 — i.e. NO cluster structure).

Writes to .scale10/ inside the repo (never touches /root/testdata).
Usage: python scripts/gen_scale_fixture.py [n_docs] (default 50000)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, ".scale10")

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def gen_documents(n_docs: int, rng: np.random.Generator):
    texts: list[str] = []
    token_lists: list[list[str]] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.0015:  # exact dup of an earlier doc
            toks = list(token_lists[int(rng.integers(0, i))])
        elif i > 10 and r < 0.045:  # near-dup: a few token substitutions
            toks = list(token_lists[int(rng.integers(0, i))])
            n_edit = 1 + int(rng.integers(0, max(2, len(toks) // 12)))
            for _ in range(n_edit):
                toks[int(rng.integers(0, len(toks)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
        else:
            n_tok = int(rng.integers(10, 101))
            toks = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), n_tok)]
        token_lists.append(toks)
        texts.append(" ".join(toks))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([str(x) for x in langs]),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_embeddings(n_vecs: int, rng: np.random.Generator):
    m = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_vecs), type=pa.int32()),
        }
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(n_docs, rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(n_docs * 2 // 5, rng), os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {OUT}: {n_docs} documents, {n_docs * 2 // 5} embeddings")


if __name__ == "__main__":
    main()
