"""M9/M14/M15 model-input encoding builders."""

from entity_linking_ray.functions.encoding import (
    build_pair_features, concat_context_candidate, solr_escape,
)


def test_solr_escape():
    # special chars escape; doubled escapes don't stack
    assert solr_escape("a+b") == "a\\+b"
    assert solr_escape('x:"y"') == 'x\\:\\"y\\"'
    assert solr_escape("a\\+b") == "a\\+b"  # already escaped: untouched
    # bare/edge/interior boolean keywords lowercase
    assert solr_escape("OR") == "or"
    assert solr_escape("cats AND dogs") == "cats and dogs"
    assert solr_escape("OR gate") == "or gate"
    assert solr_escape("logic OR") == "logic or"
    assert solr_escape("plain text") == "plain text"


def test_concat_context_candidate():
    ctx = [[101, 5, 6], [101, 9]]
    cands = [[[101, 7, 8], [101, 7]], [[101, 1, 2, 3]]]
    out = concat_context_candidate(ctx, cands, max_seq_length=5)
    # candidate's [CLS] (101) dropped, concat truncated to max length
    assert out[0][0] == [101, 5, 6, 7, 8]
    assert out[0][1] == [101, 5, 6, 7]
    assert out[1][0] == [101, 9, 1, 2, 3]


def test_build_pair_features_masks():
    text = "he visited paris yesterday"
    start, end = 11, 16  # "paris"
    f = build_pair_features("Paris", "capital of france", text, start, end,
                            max_seq_len=32)
    toks = f["tokens"]
    assert toks[0] == "[CLS]"
    # segment A: [unused1] subject [unused2] + kb text
    assert toks[1] == "[unused1]" and toks[2] == "paris" and toks[3] == "[unused2]"
    # candidate one-hot covers exactly [unused1] subject [unused2]
    assert f["entity_can_ids"][1:4] == [1, 1, 1]
    assert sum(f["entity_can_ids"]) == 3
    # mention one-hot covers the mention span inside segment B (widened by
    # one marker either side, reference semantics)
    b_start = f["token_type_ids"].index(1)
    span = [i for i, v in enumerate(f["entity_ids"]) if v]
    assert toks[span[1]] == "paris"  # the mention token inside the widened span
    assert span[0] >= b_start
    # masks align with padding
    n_real = sum(f["attention_mask"])
    assert toks[n_real - 1] == "[SEP]" and toks[n_real] == "[PAD]"
    assert len(toks) == len(f["entity_ids"]) == 32


def test_build_pair_features_cjk():
    text = "他访问了巴黎昨天"
    start, end = 4, 6  # 巴黎
    f = build_pair_features("巴黎", "法国 首都", text, start, end, max_seq_len=24)
    toks = f["tokens"]
    # CJK chars isolate (the 分字 behavior)
    assert toks[1:4] == ["[unused1]", "巴", "黎"][:3] or toks[1] == "[unused1]"
    assert sum(f["entity_can_ids"]) == 4  # [unused1] 巴 黎 [unused2]
    span = [i for i, v in enumerate(f["entity_ids"]) if v]
    got = [toks[i] for i in span]
    assert "巴" in got and "黎" in got
