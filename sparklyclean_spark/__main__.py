"""CLI parity with the reference's three spark-submit programs.

The reference's user-facing surface is three batch programs with
Scallop CLIs (``GenerateLabeledPoints.scala:37-45``,
``TrainDupClassifier.scala:37-42``, ``ApplyDupClassifier.scala:36-42``).
A user switching engines keeps the same operational contract:

    python -m sparklyclean_spark generate-labeled-points \
        --input data/train.csv --output points/ --reducers 49 --header
    python -m sparklyclean_spark train \
        --input points/ --model model/
    python -m sparklyclean_spark apply \
        --input test-points/ --output preds/ --model model/

Same option names (``--input/--output/--model/--reducers/--header``),
same on-disk interchange (the ``id1, id2, label, f...`` text format,
a saved ``pyspark.ml`` PipelineModel directory, text predictions
sorted by score). Extras beyond the reference: ``--mode sane``
(NULL-imputed numeric comparators instead of the Double.MaxValue
sentinel, SURVEY.md §2.9 G2) and ``--unlabeled`` (skip the Febrl
ground-truth label for truly unlabeled corpora).
"""

from __future__ import annotations

import argparse
import sys


def _spark(app: str):
    from sparklyclean_spark import get_spark

    return get_spark(app)


def _cmd_generate(args: argparse.Namespace) -> int:
    from sparklyclean_spark.operators.dedup.pipeline import generate_labeled_points
    from sparklyclean_spark.sources.csv import read_febrl
    from sparklyclean_spark.sources.points import write_labeled_points

    spark = _spark("sparklyclean-generate-labeled-points")
    people = read_febrl(spark, args.input)
    if not args.header:
        # read_febrl assumes a header row (the reference's --header
        # flag); headerless CSVs are read positionally
        from sparklyclean_spark.sources.csv import FEBRL_SCHEMA, read_csv

        people = read_csv(spark, args.input, FEBRL_SCHEMA, header=False)
    points = generate_labeled_points(
        people, k=args.reducers, mode=args.mode, labeled=not args.unlabeled
    )
    write_labeled_points(points, args.output)
    print(f"labeled points written to {args.output}")
    return 0


def _n_features(spark, path: str) -> int:
    """Auto-detect feature arity from the first line. The on-disk
    format always carries id1, id2 and a (possibly empty) label slot
    before the features (Compare.scala:96), so arity = fields - 3 —
    the reference hardcodes 14; our pipeline emits one feature per
    comparator (12 for the Febrl spec)."""
    first = spark.read.text(path).first()
    return len(first["value"].split(",")) - 3


def _cmd_train(args: argparse.Namespace) -> int:
    from sparklyclean_spark.ml.dup_classifier import (
        feature_importances,
        train_dup_classifier,
    )
    from sparklyclean_spark.operators.dedup.pipeline import FEBRL_FEATURE_NAMES
    from sparklyclean_spark.sources.points import read_labeled_points

    spark = _spark("sparklyclean-train-dup-classifier")
    nf = args.n_features or _n_features(spark, args.input)
    labeled = read_labeled_points(spark, args.input, n_features=nf)
    model, m = train_dup_classifier(labeled, max_iter=args.max_iter)
    print(f"confusion: tn={m.tn} fp={m.fp} fn={m.fn} tp={m.tp}")
    print(
        f"accuracy={m.accuracy:.4f} precision={m.precision:.4f}"
        f" recall={m.recall:.4f} f1={m.f1:.4f}"
    )
    if nf == len(FEBRL_FEATURE_NAMES):
        for name, imp in feature_importances(model, FEBRL_FEATURE_NAMES)[:5]:
            print(f"importance {name}: {imp:.4f}")
    model.write().overwrite().save(args.model)
    print(f"model saved to {args.model}")
    return 0


def _cmd_apply(args: argparse.Namespace) -> int:
    from pyspark.ml import PipelineModel
    from pyspark.sql import functions as F

    from sparklyclean_spark.ml.dup_classifier import apply_dup_classifier
    from sparklyclean_spark.sources.points import read_unlabeled_points

    spark = _spark("sparklyclean-apply-dup-classifier")
    nf = args.n_features or _n_features(spark, args.input)
    unlabeled = read_unlabeled_points(spark, args.input, n_features=nf)
    model = PipelineModel.load(args.model)
    scored = apply_dup_classifier(model, unlabeled)
    # reference output shape: "(t1,t2), prediction" text lines sorted
    # by prediction (ApplyDupClassifier.scala:74-83)
    lines = scored.select(
        F.concat(
            F.lit("("), F.col("id1"), F.lit(","), F.col("id2"), F.lit("), "),
            F.col("prediction").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(args.output)
    print(f"predictions written to {args.output}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sparklyclean_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate-labeled-points", help="blocked pair features (program 1)")
    g.add_argument("--input", required=True, help="input path")
    g.add_argument("--output", required=True, help="output path")
    g.add_argument("--reducers", type=int, default=1, help="number of reducers (k)")
    g.add_argument("--header", action="store_true", help="input has a header row")
    g.add_argument("--mode", choices=["parity", "sane"], default="parity")
    g.add_argument("--unlabeled", action="store_true", help="skip ground-truth labels")
    g.set_defaults(fn=_cmd_generate)

    t = sub.add_parser("train", help="train the GBT duplicate classifier (program 2)")
    t.add_argument("--input", required=True, help="path to training labeled points")
    t.add_argument("--model", required=True, help="path to output model")
    t.add_argument("--max-iter", type=int, default=100)
    t.add_argument("--n-features", type=int, default=0, help="0 = auto-detect")
    t.set_defaults(fn=_cmd_train)

    a = sub.add_parser("apply", help="score unlabeled points (program 3)")
    a.add_argument("--input", required=True, help="path to testing points")
    a.add_argument("--output", required=True, help="path to output predictions")
    a.add_argument("--model", required=True, help="path to trained model")
    a.add_argument("--n-features", type=int, default=0, help="0 = auto-detect")
    a.set_defaults(fn=_cmd_apply)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
