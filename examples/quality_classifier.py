"""The trained quality gate end-to-end — distill, evaluate, deploy, watch.

The CCNet/LLaMA recipe over the testdata `documents` table: an expensive
heuristic labels a seed set once, a cheap hashed linear model distills it,
the evaluation loop (accuracy / calibration / AUC) decides whether the
score is trustworthy, and the frozen artifact then gates every nightly
batch as a map-only projection — with the score-distribution stream
watching for crawl-mix drift between retrains.

    heuristic labels -> hashed_features (built once, persisted)
    -> linear_fit (deterministic GD: every epoch ONE aggregate)
    -> calibration_report + auc_report (is the score a probability?)
    -> write_linear_model (flat parquet, feature_scale recorded)
    -> linear_score gate on a "new" batch (zero shuffles)
    -> score_histogram == what streaming/score_stream.py keeps live

At cluster scale nothing here shuffles the corpus after featurize: the
weights embed as plan literals (Arrow-kernel closure above
BATCHED_SCORE_DIMS), each GD epoch collects dim+2 BIGINTs, and the gate
itself is pure codegen.

Usage: python examples/quality_classifier.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import classifier, text  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402

DIM, EPOCHS, LR, SCALE = 64, 10, 1.0, 8.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("quality-classifier")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. the expensive heuristic labels the seed set (here: the
    #    stopword-saturation signal quality_filter gates on; in
    #    production: a slow rules pipeline, human ratings, or
    #    wiki-reference membership)
    toks = text.tokens("text")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*text.STOPWORDS_EN)))
    frac = n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1))
    labeled = docs.select(
        "doc_id", "text",
        F.when(frac >= 0.06, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )

    # 2. featurize ONCE, persist, train
    feats = classifier.hashed_features(
        labeled, dim=DIM, feature_scale=SCALE, carry_cols=("y",)
    ).persist()
    try:
        w, b = classifier.linear_fit(feats, dim=DIM, n_epochs=EPOCHS, lr=LR)
        scored = classifier.linear_score(feats, w, b)
        acc = scored.agg(
            F.avg(((F.col("score") >= 0.5).cast("double") == F.col("y")).cast("double"))
        ).first()[0]
        print(f"trained: dim {DIM}, {EPOCHS} epochs, train accuracy {acc:.3f}")

        # 3. the evaluation loop: AUC + calibration decide trust
        auc = classifier.auc_report(scored, label_col="y").first()
        print(f"AUC {auc.auc:.3f}  ({auc.n_pos} pos / {auc.n_neg} neg)")
        print("calibration (bucket -> avg_score vs frac_pos):")
        for r in (
            classifier.calibration_report(labeled, w, b, label_col="y")
            .orderBy("bucket")
            .collect()
        ):
            print(f"  {r.bucket}: n={r.n:4d} score={r.avg_score:.3f} pos={r.frac_pos:.3f}")
    finally:
        feats.unpersist()

    # 4. freeze the artifact (scale recorded at j=-2: classify refuses
    #    to apply it to mismatched features)
    model_path = os.path.join(".scratch", "example_linmodel")
    classifier.write_linear_model(spark, w, b, model_path, feature_scale=SCALE)

    # 5. gate a "nightly batch" map-only with the frozen model
    rw, rb = classifier.read_linear_model(spark, model_path)
    batch = docs.limit(200)
    gate = classifier.linear_score(
        classifier.hashed_features(batch, dim=DIM, feature_scale=SCALE), rw, rb
    )
    kept = gate.filter(F.col("score") >= 0.5).count()
    print(f"gated batch: {kept}/200 pass at threshold 0.5")

    # 6. the distribution the monitoring stream keeps live
    print("score histogram (streaming/score_stream.py folds to this):")
    for r in (
        classifier.score_histogram(docs, rw, rb, feature_scale=SCALE, n_buckets=10)
        .orderBy("bucket")
        .collect()
    ):
        print(f"  bucket {r.bucket}: n={r.n:4d} avg={r.avg_score:.3f}")


if __name__ == "__main__":
    main()
