#!/usr/bin/env python3
"""Synthesize larger documents/embeddings fixtures for UPWARD scaling
evidence (VERDICT r4 #6, r5 #5/#6).

The driver's largest testdata is sf0.1 (5,000 documents / 2,000
embeddings). The dedup/curation families carry 100 TB scale claims whose
downward evidence (sf0.01 → sf0.1 ratio table in BASELINE.md) proves no
quadratic drift — these fixtures add the upward points with the SAME
generative shape as the driver testdata (measured from
/root/testdata/sf0.1, seed-deterministic):

- text: 10–100 tokens uniform (avg ~54), matching the sf0.1 marginal;
- near-dups: ~4.3% of docs copy an earlier doc with a few token
  substitutions (sf0.1 has 216 same-prefix groups / 5,000 docs) and
  ~0.15% are exact copies (8 / 5,000);
- lang mix: en-heavy (~41%) over {en, de, es, fr, zh}; sources src0..19;
- embeddings: 64-dim unit-norm gaussian, label uniform 0..9 (the driver
  embeddings have centroid-norm ≈ 0.07 — i.e. NO cluster structure).

Two vocabulary modes (VERDICT r5 #5):

- default: the observed sf0.1 vocabulary, constant 31 words. HONEST
  CAVEAT (BASELINE.md): holding vocabulary constant while docs grow
  densifies every blocking key n× — adversarial for blocked-quadratic
  fallbacks, unrealistic for real corpora.
- --vocab-growth: Heaps-law shape, vocab = round(31 * sqrt(n/5000)) —
  the 31 sf0.1 words plus deterministic synthetic words — so blocking-key
  densification matches how real corpora grow.

Writes inside the repo (never touches /root/testdata).
Usage: python scripts/gen_scale_fixture.py [n_docs] [--vocab-growth]
       [--out DIR]   (defaults: 50000, constant vocab, .scale10/)
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def build_vocab(n_docs: int, vocab_growth: bool) -> list[str]:
    if not vocab_growth:
        return list(BASE_VOCAB)
    # Heaps-law: sf0.1 (5,000 docs) observed 31 words -> vocab ∝ sqrt(n)
    target = max(len(BASE_VOCAB), round(len(BASE_VOCAB) * math.sqrt(n_docs / 5000)))
    extra = [f"w{i:04d}" for i in range(len(BASE_VOCAB), target)]
    return BASE_VOCAB + extra


def gen_documents(n_docs: int, rng: np.random.Generator, vocab: list[str]):
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
                toks[int(rng.integers(0, len(toks)))] = vocab[
                    int(rng.integers(0, len(vocab)))
                ]
        else:
            n_tok = int(rng.integers(10, 101))
            toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n_tok)]
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


def gen_embeddings(
    n_vecs: int, rng: np.random.Generator, *, clustered: bool = False,
    rho: float = 0.5,
):
    """Default: 64-dim unit-norm isotropic gaussian (the driver testdata
    shape — centroid-norm ≈ 0.07, i.e. NO cluster structure). With
    ``clustered`` (VERDICT r8 #2): 10 planted Gaussian clusters, one per
    label — vec = normalize(sqrt(rho)·centroid[label] + sqrt(1-rho)·noise)
    so expected within-cluster cosine ≈ rho and cross-cluster ≈ 0, the
    label-correlated structure real text-embedding corpora have and the
    sized-LSH recall claim depends on. Clustered mode uses its OWN rng
    seed (1234) so the stream is identical whether or not documents were
    generated first (--embeddings-only)."""
    if clustered:
        rng = np.random.default_rng(1234)
        cents = rng.standard_normal((10, 64))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n_vecs)
        noise = rng.standard_normal((n_vecs, 64))
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        m = math.sqrt(rho) * cents[labels] + math.sqrt(1.0 - rho) * noise
        m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
    else:
        m = rng.standard_normal((n_vecs, 64)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n_vecs)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )


def gen_lineitem(out: str, n_docs: int) -> int:
    """Minimal lineitem for the sketch-family scale points (r8): the
    columns the sketch entries read — (l_orderkey, l_linenumber,
    l_extendedprice) for kll_quantile_sketch plus (l_quantity,
    l_discount) for theta_sketch_setops — with every value column
    RESAMPLED from the real sf0.1 marginals so quantile/selectivity
    targets match the driver fixture's distribution. Row count keeps
    sf0.1's 120 lineitem rows per document. Chunked write (the 100×
    point is 60M rows). Own seed, so the table can be added to an
    existing fixture without disturbing the doc/embedding streams."""
    rng = np.random.default_rng(4242)
    base_tbl = pq.read_table(
        "/root/testdata/sf0.1/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity", "l_discount"],
    )
    base = base_tbl["l_extendedprice"].to_numpy()
    base_qty = base_tbl["l_quantity"].to_numpy()
    base_disc = base_tbl["l_discount"].to_numpy()
    n_rows = n_docs * 120
    schema = pa.schema(
        [
            pa.field("l_orderkey", pa.int64()),
            pa.field("l_linenumber", pa.int32()),
            pa.field("l_extendedprice", pa.float64()),
            pa.field("l_quantity", pa.float64()),
            pa.field("l_discount", pa.float64()),
        ]
    )
    chunk = 2_000_000
    with pq.ParquetWriter(os.path.join(out, "lineitem.parquet"), schema) as w:
        for start in range(0, n_rows, chunk):
            n = min(chunk, n_rows - start)
            idx = np.arange(start, start + n, dtype=np.int64)
            w.write_table(
                pa.table(
                    {
                        "l_orderkey": pa.array(idx // 7 + 1, type=pa.int64()),
                        "l_linenumber": pa.array(
                            (idx % 7 + 1).astype(np.int32), type=pa.int32()
                        ),
                        "l_extendedprice": pa.array(
                            rng.choice(base, size=n), type=pa.float64()
                        ),
                        "l_quantity": pa.array(
                            rng.choice(base_qty, size=n), type=pa.float64()
                        ),
                        "l_discount": pa.array(
                            rng.choice(base_disc, size=n), type=pa.float64()
                        ),
                    },
                    schema=schema,
                )
            )
    return n_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_docs", nargs="?", type=int, default=50_000)
    ap.add_argument("--vocab-growth", action="store_true",
                    help="Heaps-law vocabulary (∝ sqrt(n)) instead of constant 31 words")
    ap.add_argument("--out", default=None,
                    help="output dir (default .scale10/, or .scale10h/ with --vocab-growth)")
    ap.add_argument("--with-lineitem", action="store_true",
                    help="also write the 3-column lineitem (sketch-family points)")
    ap.add_argument("--clustered", action="store_true",
                    help="planted-Gaussian-cluster embeddings (10 label-aligned "
                    "clusters, within-cluster cosine ≈ 0.5) instead of isotropic")
    ap.add_argument("--embeddings-only", action="store_true",
                    help="write only embeddings.parquet (the ANN recall points "
                    "read nothing else; skips the slow document loop)")
    args = ap.parse_args()
    out = args.out or os.path.join(
        ROOT, ".scale10h" if args.vocab_growth else ".scale10"
    )
    if not os.path.isabs(out):
        out = os.path.join(ROOT, out)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    if args.embeddings_only:
        if not args.clustered:
            raise SystemExit("--embeddings-only requires --clustered (the "
                             "isotropic stream shares rng state with documents)")
        vocab = []
    else:
        vocab = build_vocab(args.n_docs, args.vocab_growth)
        pq.write_table(gen_documents(args.n_docs, rng, vocab), os.path.join(out, "documents.parquet"))
    pq.write_table(
        gen_embeddings(args.n_docs * 2 // 5, rng, clustered=args.clustered),
        os.path.join(out, "embeddings.parquet"),
    )
    n_li = gen_lineitem(out, args.n_docs) if args.with_lineitem else 0
    print(
        f"wrote {out}: "
        + ("(embeddings only)" if args.embeddings_only
           else f"{args.n_docs} documents")
        + f", {args.n_docs * 2 // 5} embeddings"
        + (" (clustered)" if args.clustered else "")
        + ("" if args.embeddings_only
           else f", vocab={len(vocab)} ({'heaps' if args.vocab_growth else 'constant'})")
        + (f", {n_li} lineitem rows" if n_li else "")
    )


if __name__ == "__main__":
    main()
