"""Two-pass join (J4/J5), wiki-style stream parsing (S6-S8), incoming-link
counts (G1), rank histogram (G3)."""

import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.linkage import (
    incoming_link_counts, parse_doc_stream, two_pass_join,
)

STREAM = """<doc id="12" title="Alpha">
Alpha intro line with a <a href="Beta">link to beta</a>.
More text here.
</doc>
<doc id="13" title="Beta">
Beta intro.
See <a href="Alpha">alpha</a> and <a href="Beta">self</a>.
</doc>
<doc id="14" title="Empty">
</doc>
"""


def _lines():
    rows = [{"text": ln} for ln in STREAM.splitlines()]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_parse_doc_stream():
    out = parse_doc_stream(_lines()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ["12", "13", "14"]
    assert out["title"].tolist() == ["Alpha", "Beta", "Empty"]
    assert out.loc[0, "intro"].startswith("Alpha intro")
    assert list(out.loc[0, "links"]) == ["Beta"]
    assert sorted(out.loc[1, "links"]) == ["Alpha", "Beta"]
    # token count over link-stripped text
    assert out.loc[2, "num_tokens"] == 0
    assert out.loc[0, "num_tokens"] == 11  # link stripped to its anchor text


def test_incoming_link_counts():
    parsed = parse_doc_stream(_lines())
    counts = incoming_link_counts(parsed).to_pandas().set_index("target")
    assert counts.loc["Alpha", "num_incoming_links"] == 1
    assert counts.loc["Beta", "num_incoming_links"] == 2
    import math

    assert counts.loc["Beta", "boost"] == pytest.approx(math.log(3))


def test_two_pass_join():
    left = ray.data.from_arrow(pa.table({
        "title": ["a", "b", "c", "d"],
        "wid": ["W1", "W2", "W3", "W9"],
    }))
    primary = {"a": "E_a", "c": "E_c"}
    fallback = {"W2": "E_b_via_wid"}
    out, _ = two_pass_join(left, primary, fallback, "title", "wid")
    df = out.to_pandas().set_index("title")
    assert df.loc["a", "matched_id"] == "E_a" and df.loc["a", "join_via"] == "primary"
    assert df.loc["b", "matched_id"] == "E_b_via_wid" and df.loc["b", "join_via"] == "fallback"
    assert df.loc["d", "matched_id"] is None and df.loc["d", "join_via"] == "unmatched"


def test_rank_histogram(corpus, pipeline_output):
    from entity_linking_ray.pipelines import eval as ev

    h = ev.rank_histogram(pipeline_output["scored_pairs"], corpus["mentions_gold"].to_pandas())
    assert h["rank<1"] == h["total"]  # recall@1 == 1.0 on the gold corpus
    assert h["rank<100"] >= h["rank<10"] >= h["rank<1"]


def test_parse_doc_stream_truncated_block_fails_loudly():
    """A <doc> split across block boundaries must raise, not silently drop
    the document (read_text may split large files)."""
    rows = [{"text": ln} for ln in STREAM.splitlines()[:3]]  # no closing </doc>
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    with pytest.raises(Exception, match="truncated"):
        parse_doc_stream(ds).to_pandas()


def test_read_doc_stream_whole_file(tmp_path):
    """read_doc_stream reads file-per-row — doc blocks can never straddle
    parser instances regardless of file size."""
    from entity_linking_ray.stages.linkage import read_doc_stream

    p1 = tmp_path / "wiki_00"
    p2 = tmp_path / "wiki_01"
    p1.write_text(STREAM)
    p2.write_text('<doc id="99" title="Gamma">\nGamma intro.\n</doc>\n')
    out = read_doc_stream([str(p1), str(p2)]).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ["12", "13", "14", "99"]
    assert out.loc[3, "title"] == "Gamma"
