"""Generates the LVIS-parser divergence fixture (VERDICT r2 item 9).

The reference parser (reference data/datasets/helper/parser.py:23-74)
lemmatizes captions with spaCy ``en_core_web_sm`` and substring-matches
LVIS-1203 synonym keys.  spaCy is unavailable in this environment, so
this script reproduces the reference algorithm EXACTLY (tokenization
joined with spaces, key-side ``' - '`` -> ``'-'`` re-join, the
startswith/endswith/equality substring tests) over a hand-derived gold
lemma table approximating spaCy's per-token output for the controlled
vocabulary used in the captions below.  Context-dependent entries
(gerunds, homographs) are safe because each ambiguous word appears in
only one syntactic role across the caption set.

Run once; commit ``lvis_parser_captions.json``.  The paired test
(tests/test_parser_divergence.py) replays OUR parser over the captions
and reports the agreement rate against these reference outputs.

Gold-lemma assumptions that materially shape the expected outputs
(flagged in the JSON as "notes"):
  * spaCy singularizes regular plural nouns, including plural-only
    garment/instrument words ("glasses" -> "glass", "scissors" ->
    "scissor", "sunglasses" -> "sunglass");
  * gerunds used verbally lemmatize to the verb stem ("skiing" ->
    "ski", "drumming" -> "drum");
  * "people" keeps lemma "people" (spaCy lookup table; NOT "person");
  * spaCy splits hyphenated compounds into three tokens, so caption-
    side hyphenated phrases never match the re-hyphenated keys.
"""

import json
import os
import re
import sys

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

from cvpr22_cross_modal_pseudo_labeling_tpu.data.parser import (  # noqa: E402
    load_lvis_categories,
)

# hand-derived spaCy en_core_web_sm per-token lemmas for every word the
# captions/synonyms below rely on where the rule "strip plural s" is
# wrong or context matters
GOLD_OVERRIDES = {
    # irregular plurals (spaCy lookup table)
    "men": "man", "women": "woman", "children": "child",
    "knives": "knife", "wolves": "wolf", "geese": "goose",
    "mice": "mouse", "loaves": "loaf", "leaves": "leaf",
    "scarves": "scarf", "shelves": "shelf", "calves": "calf",
    # spaCy keeps "people" as "people" (NOT person)
    "people": "people",
    # uncountables / lexical s-finals spaCy leaves alone
    "bus": "bus", "buses": "bus", "gas": "gas", "chess": "chess",
    "asparagus": "asparagus", "hummus": "hummus",
    "molasses": "molasses", "dress": "dress", "dresses": "dress",
    "octopus": "octopus", "lens": "lens", "grits": "grits",
    # gerunds in verbal position -> verb stem
    "skiing": "ski", "drumming": "drum", "surfing": "surf",
    "skateboarding": "skateboard", "reading": "read",
    "eating": "eat", "holding": "hold", "riding": "ride",
    "wearing": "wear", "sitting": "sit", "standing": "stand",
    "playing": "play", "walking": "walk", "running": "run",
    "flying": "fly", "parking": "park", "catching": "catch",
    "jumping": "jump", "carrying": "carry", "cutting": "cut",
    "drinking": "drink", "sleeping": "sleep", "cooking": "cook",
    "watching": "watch", "lying": "lie", "grazing": "graze",
    "waiting": "wait", "swimming": "swim", "falling": "fall",
    "hanging": "hang", "pulling": "pull", "stopping": "stop",
    "leaning": "lean", "sailing": "sail", "leading": "lead",
    "stuck": "stick",
    # copulas / misc function words
    "is": "be", "are": "be", "was": "be", "were": "be",
    "its": "its", "his": "his", "this": "this",
}

_VOWELLESS_KEEP = {"ss", "us", "is"}


def gold_word(w: str) -> str:
    """Approximate spaCy lemma for a lowercased token."""
    if w in GOLD_OVERRIDES:
        return GOLD_OVERRIDES[w]
    if len(w) <= 3:
        return w
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "sses", "zes")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith(tuple(_VOWELLESS_KEEP)):
        return w[:-1]
    return w


def spacy_tokens(text: str):
    """spaCy-style tokenization for this vocabulary: words, punctuation
    as separate tokens, hyphens split into their own token."""
    return re.findall(r"[a-z0-9]+|\S", text.lower())


def gold_lemma_sentence(text: str) -> str:
    return " ".join(gold_word(t) for t in spacy_tokens(text))


def build_reference_lookup():
    """parser.py:26-52 with the gold lemmatizer standing in for spaCy.
    Key building: lemmatize synonym tokens, BREAK at a '(' token, join
    with spaces, then ' - ' -> '-'."""
    look_up = {}
    for item in load_lvis_categories():
        idx = item["id"] - 1
        for s in item["synonyms"]:
            s = s.lower().replace("_", " ")
            lemmas = []
            for tok in spacy_tokens(s):
                if tok.startswith("("):
                    break
                lemmas.append(gold_word(tok))
            key = " ".join(lemmas).replace(" - ", "-").strip()
            if key:
                look_up[key] = idx
    return look_up


def reference_parse(caption: str, look_up) -> list:
    """parser.py:56-74: the exact four-way substring test."""
    lemma = gold_lemma_sentence(caption)
    ids = []
    for s, idx in look_up.items():
        if (
            f" {s} " in lemma
            or lemma.startswith(s + " ")
            or lemma.endswith(" " + s)
            or lemma == s
        ):
            ids.append(idx)
    return sorted(set(ids))


# ---------------------------------------------------------------------------
# Caption corpus: COCO/ConceptualCaptions-style sentences over a
# controlled vocabulary (~210 captions)
# ---------------------------------------------------------------------------

PLURAL_NOUNS = [
    "dogs", "cats", "horses", "cows", "elephants", "bears", "zebras",
    "giraffes", "bananas", "apples", "pizzas", "chairs", "bottles",
    "cups", "forks", "spoons", "bowls", "books", "clocks", "vases",
    "kites", "benches", "boats", "umbrellas", "motorcycles",
    "bicycles", "airplanes", "helmets", "surfboards", "skateboards",
    "sandwiches", "couches", "beds", "tables", "toilets", "ovens",
    "toasters", "sinks", "refrigerators", "backpacks", "handbags",
    "gloves", "ducks", "trucks", "trains", "cars", "birds", "flags",
    "towels", "pillows", "candles", "baskets", "balloons", "drums",
    "ladders", "mirrors", "wheels", "jackets", "lamps", "pots",
]

SIMPLE_TEMPLATES = [
    "two {} on the table",
    "a group of {} near the window",
    "several {} in the street",
    "some {} next to a fence",
]

IRREGULAR_CAPTIONS = [
    "three men standing on a beach",
    "two women walking in the park",
    "children playing with a ball",
    "a set of knives on the counter",
    "wolves running through the snow",
    "geese swimming in the pond",
    "two mice next to the computer",
    "people waiting for a bus",
    "a man and a woman eating pizza",
    "several children riding bicycles",
    "two men carrying a couch",
    "women holding umbrellas in the rain",
    "a child sleeping on a bed",
    "men playing chess in the park",
    "loaves of bread on a shelf",
    "leaves falling from a tree",
    "scarves hanging on hooks",
    "two oxen pulling a cart",
]

GERUND_CAPTIONS = [
    "a man skiing down the slope",
    "a woman drumming on stage",
    "a boy skateboarding in the park",
    "a girl surfing a big wave",
    "a man reading a book on a bench",
    "a dog catching a frisbee",
    "a man parking his car",
    "a woman cutting a sandwich with a knife",
    "two men drinking from cups",
    "a cat sleeping on a couch",
    "a horse grazing in a field",
    "a man riding a motorcycle",
    "a child flying a kite",
    "a woman cooking on a stove",
    "a man watching a television",
]

QUIRK_CAPTIONS = [
    "a man wearing glasses",
    "a glass of orange juice",
    "a pair of scissors on the desk",
    "a woman wearing sunglasses",
    "a pair of binoculars on the shelf",
    "a yellow school bus on the road",
    "a red dress on a hanger",
    "an octopus in the aquarium",
    "a plate of asparagus and carrots",
    "a bus stopping at the corner",
]

MULTIWORD_CAPTIONS = [
    "a teddy bear on the bed",
    "a fire engine with its lights on",
    "a polar bear swimming in the water",
    "a stop sign at the corner",
    "a traffic light above the street",
    "a parking meter on the sidewalk",
    "a baseball bat leaning against the wall",
    "a tennis racket and a ball",
    "a remote control on the couch",
    "a hot-air balloon in the sky",
    "a laptop computer on the desk",
    "a computer mouse and a keyboard",
    "a microwave oven in the kitchen",
    "a teddy bear next to a birthday cake",
    "a man holding a baseball bat",
]

SCENE_CAPTIONS = [
    "a kitchen with a refrigerator and an oven",
    "a bathroom with a toilet and a sink",
    "a living room with a couch and a television",
    "a bedroom with a bed and a lamp",
    "a man sitting on a chair with a laptop",
    "a woman standing next to a bicycle",
    "a dog lying under a table",
    "a cat sitting on a windowsill",
    "a plate with a sandwich and an apple",
    "a bowl of bananas on the counter",
    "a vase of flowers on a table",
    "a clock hanging above the door",
    "a boat sailing near the bridge",
    "an airplane flying over the mountains",
    "a train at the station",
    "a truck parked next to a car",
    "a bird sitting on a fence",
    "a horse standing in a field",
    "two elephants walking in the grass",
    "a zebra and a giraffe at the zoo",
    "a pizza with cheese and mushrooms",
    "a cup of coffee and a spoon",
    "a fork and a knife on a napkin",
    "a bottle of water on the bench",
    "an umbrella leaning against the wall",
    "a backpack on the floor",
    "a helmet hanging on a motorcycle",
    "a surfboard on the sand",
    "a skateboard on the ramp",
    "a kite stuck in a tree",
]


def main():
    look_up = build_reference_lookup()
    captions = []
    for i, noun in enumerate(PLURAL_NOUNS):
        captions.append(SIMPLE_TEMPLATES[i % len(SIMPLE_TEMPLATES)].format(noun))
    for pool in (
        IRREGULAR_CAPTIONS,
        GERUND_CAPTIONS,
        QUIRK_CAPTIONS,
        MULTIWORD_CAPTIONS,
        SCENE_CAPTIONS,
    ):
        captions.extend(pool)
    # second pass over plural nouns with the remaining templates for
    # volume (~200 total)
    for i, noun in enumerate(PLURAL_NOUNS):
        if i % 2 == 0:
            captions.append(
                SIMPLE_TEMPLATES[(i + 2) % len(SIMPLE_TEMPLATES)].format(noun)
            )

    entries = []
    for cap in captions:
        entries.append(
            {
                "caption": cap,
                "reference_ids": reference_parse(cap, look_up),
                "gold_lemma": gold_lemma_sentence(cap),
            }
        )
    out = {
        "notes": (
            "reference_ids = reference parser.py:23-74 algorithm run "
            "over hand-derived spaCy-en_core_web_sm-style gold lemmas "
            "(see gen_lvis_parser_fixture.py header for the assumption "
            "list); ids are 0-based LVIS v1 category indices"
        ),
        "entries": entries,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "lvis_parser_captions.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(entries)} captions")


if __name__ == "__main__":
    main()
