"""Near-dup detection-quality harness (PERF.md round-8): the dedup
analog of tools/ann_recall.py. Plants mutated duplicates with KNOWN
ground truth into the testdata corpus and measures, per mutation rate,
what fraction each detector finds (and what it falsely flags) — the
curve a 100 TB dedup run is tuned against instead of folklore
thresholds.

Mutation model: for each sampled base doc, a copy whose tokens are each
replaced by a random vocabulary token with probability p (seeded, so
runs are reproducible). Expected 3-shingle survival is ~(1-p)^3, so
expected Jaccard ~ s/(2-s) — the harness prints that prediction next to
the measured verified-Jaccard so threshold choices are principled.

Detectors measured at library defaults unless flagged:
- minhash: minhash_lsh_pairs (LSH banding + exact-Jaccard verify)
- simhash: simhash_pairs (band-blocked Hamming <= 3)
- winnow:  winnow_overlap_pairs (fingerprint containment)

`extra_pairs` counts flagged pairs NOT in the planted set — on the
synthetic corpus these are mostly GENUINE templated overlap between
base docs (dedup_spans strips spans from 97% of them), so read it as
"how much corpus-internal duplication the detector also surfaces", not
as an error rate; on a clean corpus it becomes the false-positive
count.

Usage: python tools/dedup_recall.py [n_pairs] [sf_dir]
Prints one JSON line:
  {"n_pairs": N, "per_rate": {"0.05": {"expected_jaccard": j,
     "minhash": {"found": f, "rate": r}, ...}, ...},
   "extra_pairs": {...}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epss_spark import tables
from epss_spark.operators import dedup, text
from epss_spark.session import get_spark, sf_dir

RATES = (0.0, 0.05, 0.1, 0.2, 0.3)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    target = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", sf_dir()
    )
    spark = get_spark("epss-spark-dedup-recall")
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    base = [
        (r.doc_id, r.text)
        for r in tables.load_table(spark, target, "documents")
        .select("doc_id", "text").collect()
    ]
    rng = np.random.default_rng(17)
    vocab = sorted({t for _, txt in base for t in (txt or "").lower().split()})

    out: dict = {"n_pairs": n_pairs, "per_rate": {}, "extra_pairs": {}}
    for p in RATES:
        picks = rng.choice(len(base), size=n_pairs, replace=False)
        rows, truth = [], set()
        for j, bi in enumerate(picks):
            did, txt = base[bi]
            toks = (txt or "").split()
            mut = [
                vocab[rng.integers(len(vocab))] if rng.random() < p else t
                for t in toks
            ]
            a, b = 1_000_000 + 2 * j, 1_000_000 + 2 * j + 1
            rows.append((a, txt))
            rows.append((b, " ".join(mut)))
            truth.add((a, b))
        df = spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()

        s = (1 - p) ** 3
        entry: dict = {"expected_jaccard": round(s / (2 - s), 3)}

        def rate(pairs_df, a_col, b_col):
            got = {
                tuple(sorted((r[a_col], r[b_col]))) for r in pairs_df.collect()
            }
            found = len(got & truth)
            return found, len(got - truth)

        mh_found, mh_fp = rate(dedup.minhash_lsh_pairs(df), "a_id", "b_id")
        sh_found, sh_fp = rate(
            dedup.simhash_pairs(df, max_hamming=3), "a_id", "b_id"
        )
        wn_found, wn_fp = rate(
            text.winnow_overlap_pairs(df, threshold=0.5), "a_id", "b_id"
        )
        entry["minhash"] = {"found": mh_found, "rate": round(mh_found / n_pairs, 3)}
        entry["simhash"] = {"found": sh_found, "rate": round(sh_found / n_pairs, 3)}
        entry["winnow"] = {"found": wn_found, "rate": round(wn_found / n_pairs, 3)}
        out["per_rate"][str(p)] = entry
        out["extra_pairs"][str(p)] = {
            "minhash": mh_fp, "simhash": sh_fp, "winnow": wn_fp,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
