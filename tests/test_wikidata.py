"""S9 Wikidata bz2 dump reader over a synthetic fixture dump."""

import bz2
import json

from entity_linking_ray.sources.wikidata import read_wikidata

ENTITY = {
    "id": "Q42",
    "sitelinks": {"enwiki": {"title": "Douglas Adams"},
                  "enwikiquote": {"title": "Douglas Adams"}},
    "aliases": {"en": [{"value": "DNA"}, {"value": "Douglas Noel Adams"}]},
    "labels": {"en": {"value": "Douglas Adams"}},
    "descriptions": {"en": {"value": "English writer"}},
}
NO_ENWIKI = {"id": "Q1", "sitelinks": {"dewiki": {"title": "Universum"}},
             "aliases": {}, "labels": {}, "descriptions": {}}
SPARSE = {"id": "Q7", "sitelinks": {"enwiki": {"title": "Sparse"}},
          "aliases": {}, "labels": {}, "descriptions": {}}


def test_read_wikidata_bz2(tmp_path, ray_session):
    dump = "[\n" + ",\n".join(
        json.dumps(o) for o in (ENTITY, NO_ENWIKI, SPARSE)
    ) + ",\nnot json at all\n]\n"
    p = tmp_path / "dump.json.bz2"
    p.write_bytes(bz2.compress(dump.encode("utf8")))

    rows = {r["wikidata_id"]: r for r in read_wikidata(str(p)).take_all()}
    # enwiki filter: Q1 dropped; malformed line + array frame skipped
    assert set(rows) == {"Q42", "Q7"}
    q42 = rows["Q42"]
    assert q42["title"] == "Douglas Adams"
    assert q42["aliases"] == ["DNA", "Douglas Noel Adams"]
    assert q42["wikidata_label"] == "Douglas Adams"
    assert q42["description"] == "English writer"
    assert q42["enwikiquote_title"] == "Douglas Adams"
    q7 = rows["Q7"]
    assert q7["aliases"] is None and q7["wikidata_label"] is None
    assert q7["enwikiquote_title"] is None
