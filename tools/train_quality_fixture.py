"""Train the pinned hashed-feature quality-classifier weights for
``doc_quality_classifier``.

Offline, run-once reproducibility tool: fits a logistic-regression
scorer (the fastText-shaped linear-over-hashed-unigrams model modern
selection pipelines train; Joulin et al. '16) on the sf0.01 documents
corpus and prints the ``QC_WEIGHTS`` / ``QC_BIAS`` constants pinned in
sec_xbrl_finwarehouse_spark/plans/corpus_queries.py.

* Features: per-document term frequency over md5-hashed unigram AND
  word-bigram buckets (bucket z = md5-prefix % QC_B -- the exact DSIR
  hash spelling, so train-time and serve-time featurization cannot
  drift; bigrams are the space-joined adjacent token pairs, the
  fastText word-n-gram trick -- measured on this corpus they lift AUC
  0.69 -> 0.83 and precision-at-15% 0.28 -> 0.51 over unigrams).
* Label: source in QC_TARGET_SOURCES (the same "quality domain"
  stand-in the DSIR target uses -- a deterministic proxy for
  "Wikipedia-like" labels).
* Optimizer: full-batch gradient descent, zero init, fixed step and
  iteration count -- bitwise deterministic, no RNG anywhere.
* Output: weights quantized to integer micro-nats and stored SPARSE
  (only buckets seen in training are nonzero; L2 keeps unseen buckets
  at exactly 0), so the pinned constant stays small while serving
  reads "0 for any unseen bucket".

Usage: python tools/train_quality_fixture.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np

QC_B = 1024
QC_TARGET_SOURCES = ("src0", "src1", "src2")
ITERS = 4000
LR = 100.0
L2 = 1e-5
KEEP_QUANTILE = 0.85  # keep flag calibrated to the top 15% of logits


def bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:12], 16) % QC_B


def featurize(text: str) -> tuple[np.ndarray, int]:
    toks = [t for t in (text or "").lower().strip().split(" ") if t]
    feats = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
    x = np.zeros(QC_B)
    for t in feats:
        x[bucket(t)] += 1.0
    n = max(len(feats), 1)
    return x / n, len(feats)


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT text, source FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    X = np.stack([featurize(t)[0] for t, _ in rows])
    y = np.array([1.0 if s in QC_TARGET_SOURCES else 0.0 for _, s in rows])
    w = np.zeros(QC_B)
    b = 0.0
    n = len(y)
    for _ in range(ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g / n + L2 * w)
        b -= LR * float(g.mean())
    z = X @ w + b
    pos, neg = z[y == 1], z[y == 0]
    auc = float((pos[:, None] > neg[None, :]).mean())
    thr = round(float(np.quantile(z, KEEP_QUANTILE)), 6)
    kept = z > thr
    print(f"# train auc {auc:.3f}  precision@{1 - KEEP_QUANTILE:.0%} "
          f"{float(y[kept].mean()):.3f}  base rate {float(y.mean()):.3f}")
    print(f"QC_KEEP_THRESHOLD = {thr!r}")
    wq = np.round(w * 1e6).astype(np.int64)
    nz = [(int(i), int(v)) for i, v in enumerate(wq) if v != 0]
    print(f"QC_BIAS = {round(float(b), 6)!r}")
    print(f"# {len(nz)} nonzero of {QC_B} buckets")
    print("QC_WEIGHTS: dict[int, int] = {")
    for i in range(0, len(nz), 4):
        print(
            "    "
            + " ".join(f"{k}: {v}," for k, v in nz[i : i + 4])
        )
    print("}")


if __name__ == "__main__":
    main()
