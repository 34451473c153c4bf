"""Quantified parser-deviation test against the frozen golden fixture.

The reference parses caption nouns with spaCy lemmatization + LVIS
synonym matching (open_set/datasets/utils/parser.py:84-145); spaCy is
unavailable here, so data/parser.py uses a rule lemmatizer.  The fixture
(tests/fixtures/parser_golden.json, generated once by
tools/gen_parser_fixture.py) holds 200 captions whose oracle lemmas are
known by construction and whose expected match sets apply the reference's
own word-boundary matching rule.

Measured deviation (frozen in the fixture, asserted here):
micro precision 0.9975, recall 0.9975 (401 expected matches).  The two
known failure classes:
- recall: verb inflections are not lemmatized ("spraying" does not match
  the "spray" synonym of atomizer; spaCy's would),
- precision: "people" is mapped to "person" (spaCy keeps "people", so the
  reference does NOT tag person there — our superset is deliberate).
"""

import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "parser_golden.json")


@pytest.fixture(scope="module")
def fixture_entries():
    with open(FIXTURE) as f:
        return json.load(f)


def test_lvis_parser_matches_reference_expectations(fixture_entries):
    from betrayed_by_captions_tpu.data.parser import LVISParser

    parser = LVISParser()
    tp = fp = fn = 0
    for e in fixture_entries:
        _, ids = parser.parse(e["caption"])
        got, exp = set(ids), set(e["expected_ids"])
        tp += len(got & exp)
        fp += len(got - exp)
        fn += len(exp - got)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    # frozen numbers 0.9975/0.9975; assert with a little slack so a new
    # genuinely-better lemmatizer doesn't need a fixture regen
    assert precision >= 0.995, f"parser precision regressed: {precision:.4f}"
    assert recall >= 0.99, f"parser recall regressed: {recall:.4f}"


def test_fixture_matching_rule_is_reference_faithful(fixture_entries):
    """The expected sets in the fixture must follow the reference's
    matching semantics exactly when given ORACLE lemmas: word-boundary
    containment of each (paren-stripped, lemmatized) synonym."""
    from betrayed_by_captions_tpu.data.parser import LVISParser

    parser = LVISParser()
    # reconstruct the reference lookup from raw synonyms (singular lemma
    # form as stored in LVIS)
    import json as _json

    from betrayed_by_captions_tpu.data.parser import _default_lvis_path

    with open(_default_lvis_path()) as f:
        cats = _json.load(f)
    lookup = {}
    for item in cats:
        cid = item["id"] - 1
        for syn in item["synonyms"]:
            syn = " ".join(syn.split("(")[0].lower().replace("_", " ").split())
            if syn:
                lookup[syn] = cid  # last-write-wins like the reference

    for e in fixture_entries[:50]:
        oracle = " " + e["oracle_lemmas"] + " "
        expected = sorted({cid for s, cid in lookup.items() if f" {s} " in oracle})
        assert expected == e["expected_ids"], e["caption"]


def test_hard_irregulars_lemmatize():
    from betrayed_by_captions_tpu.data.parser import lemmatize_word

    for plural, singular in [
        ("tomatoes", "tomato"),
        ("potatoes", "potato"),
        ("shoes", "shoe"),
        ("canoes", "canoe"),
        ("buses", "bus"),
        ("benches", "bench"),
        ("knives", "knife"),
        ("geese", "goose"),
        ("men", "man"),
        ("cherries", "cherry"),
        ("glasses", "glass"),
        ("horses", "horse"),
    ]:
        assert lemmatize_word(plural) == singular, plural
