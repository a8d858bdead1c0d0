"""C4 line-level filtering (kgtk_ray/text/lines.py)."""
import pandas as pd
import ray.data as rd

from kgtk_ray.text.lines import c4_line_filter


def _docs():
    good = ("The first sentence is long enough to keep.\n"
            "short line.\n"
            "No terminal punctuation on this long line here\n"
            "Another proper sentence to keep for the test!\n"
            "Is this the third proper surviving sentence now?")
    js = ("The first sentence is long enough to keep.\n"
          "This javascript line is long and punctuated.\n"
          "Another proper sentence to keep for the test!\n"
          "Is this the third proper surviving sentence now?")
    lorem = good + "\nlorem ipsum dolor sit amet consectetur."
    brace = good + "\nA config { snippet appears in this page."
    short = "Only one proper sentence survives in this page."
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [good, js, lorem, brace, short]})


def test_rules():
    out = c4_line_filter(rd.from_pandas(_docs())).to_pandas()
    out = out.sort_values("doc_id")
    # doc 3 (lorem ipsum) and doc 4 ({) page-dropped; doc 5 has <3
    # surviving lines; doc 2's javascript line is dropped but the other
    # three survive
    assert out.doc_id.to_list() == [1, 2]
    t1 = out[out.doc_id == 1].text.iloc[0]
    assert t1.split("\n") == [
        "The first sentence is long enough to keep.",
        "Another proper sentence to keep for the test!",
        "Is this the third proper surviving sentence now?"]
    t2 = out[out.doc_id == 2].text.iloc[0]
    assert "javascript" not in t2
    assert len(t2.split("\n")) == 3


def test_thresholds_and_block_independence():
    ds = rd.from_pandas(_docs()).repartition(4)
    out = c4_line_filter(ds, min_lines_per_doc=1,
                         min_words_per_line=5).to_pandas()
    # with a 1-line minimum, doc 5 survives too
    assert sorted(out.doc_id) == [1, 2, 5]
    out2 = c4_line_filter(rd.from_pandas(_docs()), min_lines_per_doc=1)
    assert sorted(out2.to_pandas().doc_id) == [1, 2, 5]


def test_empty_input():
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=object)}))
    assert c4_line_filter(empty).count() == 0
