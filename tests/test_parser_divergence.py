"""LVIS-parser divergence vs the reference, quantified (VERDICT r2
item 9 / missing #3).

``tests/fixtures/lvis_parser_captions.json`` holds 178 COCO-style
captions with the reference parser's expected 0-based LVIS ids,
computed by replaying the reference algorithm
(reference data/datasets/helper/parser.py:23-74) over hand-derived
spaCy-en_core_web_sm-style gold lemmas (generator:
tests/fixtures/gen_lvis_parser_fixture.py; assumptions documented in
its header).  This file measures and pins our rule-lemmatizer parser's
agreement.

Measured at round 3: 175/178 captions exact (98.3%), 3 reference-id
false positives / 1 false negative over 350+ id decisions.  The three
remaining divergences are deliberate and each favors our parser:

  * "people" -> person id 792 (spaCy keeps lemma "people", so the
    reference MISSES the person category on "people" captions);
  * "a glass of juice" -> glass_(drink_container) 497 (the reference's
    key table collides "glass"/"glasses" onto spectacles 994);
  * caption-side hyphenated compounds ("hot-air balloon") match their
    category (spaCy tokenizes the hyphen apart, so the reference can
    never match its own re-hyphenated keys).
"""

import json
import os

import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.data.parser import get_parser

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "lvis_parser_captions.json",
)

KNOWN_DIVERGENCES = {
    # caption -> (extra ids we add, reference ids we drop)
    "people waiting for a bus": ({792}, set()),
    "a glass of orange juice": ({497}, {994}),
    "a hot-air balloon in the sky": ({570}, set()),
}


@pytest.fixture(scope="module")
def fixture_entries():
    with open(FIXTURE) as f:
        return json.load(f)["entries"]


def test_parser_agreement_rate(fixture_entries):
    p = get_parser()
    exact = 0
    fp = fn = 0
    unexpected = []
    for e in fixture_entries:
        _, ids = p.parse(e["caption"])
        ours = set(ids)
        ref = set(e["reference_ids"])
        if ours == ref:
            exact += 1
            continue
        add, drop = KNOWN_DIVERGENCES.get(e["caption"], (set(), set()))
        if ours != (ref | add) - drop:
            unexpected.append((e["caption"], sorted(ref), sorted(ours)))
        fp += len(ours - ref)
        fn += len(ref - ours)
    n = len(fixture_entries)
    assert not unexpected, unexpected[:10]
    rate = exact / n
    # pin the measured number so regressions in the lemmatizer or the
    # lookup surface immediately
    assert rate >= 0.98, f"agreement regressed: {exact}/{n} = {rate:.3f}"
    assert fp <= 3 and fn <= 1, (fp, fn)


def test_gerund_object_recall(fixture_entries):
    """Activity captions naming LVIS objects through gerunds must yield
    the object id, as spaCy's verb lemmatization does for the reference
    ("a man skiing" -> ski 963)."""
    p = get_parser()
    for cap, want in [
        ("a man skiing down the slope", 963),
        ("a woman drumming on stage", 398),
        ("a boy skateboarding in the park", 961),
    ]:
        _, ids = p.parse(cap)
        assert want in ids, (cap, ids)
    # noun gerunds that ARE categories stay themselves: "painting"
    nns, ids = p.parse("a painting hanging on the wall")
    assert any("painting" in n for n in nns), (nns, ids)


def test_noun_ing_words_not_stemmed():
    """Noun-dominant -ing words must NOT stem into category ids the
    reference's POS-aware spaCy lemmatizer never emits ("salad
    dressing" is not a dress, "bedding" is not a bed)."""
    p = get_parser()
    for cap, wrong in [
        ("salad dressing on the table", "dress"),
        ("fresh bedding in a basket", "bed"),
        ("extra padding around the box", "pad"),
        ("bamboo matting on the floor", "mat"),
        ("canning jars on a shelf", "can"),
        ("a caring gesture", "car"),
    ]:
        nns, _ = p.parse(cap)
        assert wrong not in nns, (cap, nns)
    # single-final-consonant tokens prefer the e-stem: the bare stem
    # would have doubled its consonant before -ing
    assert p._degerund("biking") == "bike"
