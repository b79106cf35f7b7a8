"""End-to-end parity with the reference's three-program pipeline,
chained through the SAME on-disk handoffs the reference uses:

  program 1 (GenerateLabeledPoints) -> labeled-points text files
  program 2 (TrainDupClassifier)    -> saved PipelineModel dir
  program 3 (ApplyDupClassifier)    -> scored predictions

Each boundary goes through disk (text format of Compare.scala:96 /
pyspark.ml model dir), so a user replacing one reference program at a
time gets byte-compatible interchange."""

from __future__ import annotations

import os

import pytest
from pyspark.ml import PipelineModel

from sparklyclean_spark.datagen import people_df
from sparklyclean_spark.ml.dup_classifier import (
    apply_dup_classifier,
    evaluate,
    feature_importances,
    train_dup_classifier,
)
from sparklyclean_spark.operators.dedup.pipeline import generate_labeled_points
from sparklyclean_spark.sources import (
    read_labeled_points,
    read_unlabeled_points,
    write_labeled_points,
)


@pytest.fixture(scope="module")
def people(spark):
    return people_df(spark, n_originals=80)


def test_three_program_pipeline_via_disk(spark, people, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("refpipe"))

    # ---- program 1: generate labeled points, sink as text ----------
    labeled = generate_labeled_points(people, k=16, mode="sane")
    n_features = len(labeled.take(1)[0].features)
    pts_path = os.path.join(base, "labeled_points")
    write_labeled_points(labeled, pts_path)

    # ---- program 2: read text, train, save model -------------------
    train_in = read_labeled_points(spark, pts_path, n_features=n_features)
    assert train_in.count() == labeled.count()
    model, metrics = train_dup_classifier(train_in, max_iter=10)
    # duplicates are rare but must be found: the reference's own
    # yardstick is recall (README.md:261, ≈97% on Febrl)
    assert metrics.recall >= 0.8, metrics
    model_path = os.path.join(base, "model")
    model.write().overwrite().save(model_path)

    # ---- program 3: load model, score unlabeled points -------------
    unlabeled = generate_labeled_points(people, k=16, mode="sane", labeled=False)
    upts_path = os.path.join(base, "unlabeled_points")
    write_labeled_points(unlabeled, upts_path)
    score_in = read_unlabeled_points(spark, upts_path, n_features=n_features)
    loaded = PipelineModel.load(model_path)
    preds = apply_dup_classifier(loaded, score_in)
    assert preds.columns == ["id1", "id2", "prediction"]

    # scoring the full pair set must flag the planted duplicates
    truth = {
        (r.id1, r.id2)
        for r in labeled.where("label = 1.0").select("id1", "id2").collect()
    }
    flagged = {
        (r.id1, r.id2) for r in preds.where("prediction = 1.0").collect()
    }
    assert truth, "fixture must contain planted duplicates"
    recall = len(truth & flagged) / len(truth)
    assert recall >= 0.8, f"apply recall {recall}"


def test_feature_importances_shape(spark, people):
    labeled = generate_labeled_points(people, k=16, mode="sane")
    model, _ = train_dup_classifier(labeled, max_iter=5)
    n_features = len(labeled.take(1)[0].features)
    imps = feature_importances(model, [f"f{i}" for i in range(n_features)])
    assert len(imps) == n_features
    assert all(imp >= 0 for _, imp in imps)
    # sorted descending like the reference's report (README.md:238-252)
    assert [i for _, i in imps] == sorted((i for _, i in imps), reverse=True)
