"""Empty-input edges for the round-4 URL / DSIR / classifier ops
(Ray loses the schema of empty materialized datasets, so every
driver-side collect needs a guard — same class of edge as
test_empty_inputs.py covers for the graph ops)."""
import pandas as pd
import ray.data as rd

from kgtk_ray.text import (canonicalize_urls, dedup_urls, dsir_scores,
                           quality_classifier_scores)


def _empty():
    return rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=object),
        "url": pd.Series([], dtype=object)}))


def _one():
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": [1], "text": ["a b"], "url": ["https://x.com/"]}))


def test_url_ops_empty_input():
    assert canonicalize_urls(_empty()).count() == 0
    assert dedup_urls(_empty()).count() == 0


def test_dsir_empty_sides():
    # empty target: smoothing keeps every bucket defined
    out = dsir_scores(_one(), _empty()).to_pandas()
    assert len(out) == 1
    assert dsir_scores(_empty(), _one()).count() == 0


def test_classifier_empty_class():
    # an empty positive class is degenerate but must not crash
    out = quality_classifier_scores(_one(), _empty(), _one()).to_pandas()
    assert len(out) == 1
    assert 0.0 < out.clf_score.iloc[0] < 1.0
