"""Trained quality classifier: separability, determinism, scoring
invariance. The fixture plants linearly separable classes (English
prose vs token-salad gibberish) so a correct pipeline must reach
near-perfect held-out accuracy."""

from __future__ import annotations

import random

from tcga_query_project_spark.operators import classifier


def _fixture(n_per_class=120, seed=3):
    rng = random.Random(seed)
    good_words = (
        "the quick brown fox jumps over a lazy dog while reading "
        "careful prose about science history and thoughtful analysis"
    ).split()
    bad_words = [
        "".join(rng.choice("qxzjvkw") for _ in range(rng.randrange(3, 9)))
        for _ in range(40)
    ]
    rows = []
    for i in range(n_per_class):
        rows.append(
            (
                2 * i,
                " ".join(rng.choice(good_words) for _ in range(25)),
                1.0,
            )
        )
        rows.append(
            (
                2 * i + 1,
                " ".join(rng.choice(bad_words) for _ in range(25)),
                0.0,
            )
        )
    return rows


def test_classifier_separates_planted_classes(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = df.filter("doc_id % 5 != 0")
    heldout = df.filter("doc_id % 5 = 0")
    model = classifier.train_quality_classifier(
        train, "text", "label", n_features=1 << 12, max_iter=30
    )
    scored = classifier.score_quality(model, heldout, "doc_id", "text")
    joined = scored.join(heldout.select("doc_id", "label"), "doc_id")
    rowsc = joined.collect()
    assert len(rowsc) == heldout.count()
    acc = sum(
        1 for r in rowsc if (r["clf_quality"] >= 0.5) == (r["label"] == 1.0)
    ) / len(rowsc)
    assert acc >= 0.95, acc
    # probabilities are calibrated-ish: good docs score high, bad low
    goods = [r["clf_quality"] for r in rowsc if r["label"] == 1.0]
    bads = [r["clf_quality"] for r in rowsc if r["label"] == 0.0]
    assert min(goods) > max(bads)


def test_scoring_is_partitioning_invariant_and_deterministic(spark):
    rows = _fixture(n_per_class=60, seed=9)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = classifier.train_quality_classifier(
        df, "text", "label", n_features=1 << 12, max_iter=20
    )
    one = {
        r["doc_id"]: r["clf_quality"]
        for r in classifier.score_quality(
            model, df.coalesce(1), "doc_id", "text"
        ).collect()
    }
    many = {
        r["doc_id"]: r["clf_quality"]
        for r in classifier.score_quality(
            model, df.repartition(16), "doc_id", "text"
        ).collect()
    }
    assert one == many
    # retraining on identical data reproduces identical scores
    model2 = classifier.train_quality_classifier(
        df, "text", "label", n_features=1 << 12, max_iter=20
    )
    again = {
        r["doc_id"]: r["clf_quality"]
        for r in classifier.score_quality(
            model2, df, "doc_id", "text"
        ).collect()
    }
    assert one == again


def test_null_text_scores_as_empty_not_crash(spark):
    rows = _fixture(n_per_class=40, seed=2)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = classifier.train_quality_classifier(
        df, "text", "label", n_features=1 << 12, max_iter=10
    )
    withnull = spark.createDataFrame(
        [(900, None), (901, rows[0][1])], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clf_quality"]
        for r in classifier.score_quality(
            model, withnull, "doc_id", "text"
        ).collect()
    }
    assert set(got) == {900, 901}
    assert 0.0 <= got[900] <= 1.0
