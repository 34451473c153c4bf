"""One-shot generator for the frozen parser-parity fixture.

The reference LVISParser lemmatizes captions with spaCy and matches
lemmatized LVIS synonyms with word boundaries
(/root/reference/open_set/datasets/utils/parser.py:84-145). spaCy is not
installable here, so the repo's parser uses a rule lemmatizer
(data/parser.py) — a documented deviation. This script freezes a fixture
that puts a NUMBER on that deviation:

- captions are built token by token from curated LVIS lemmas inflected
  with a correct English pluralizer, so each token's oracle lemma is
  known BY CONSTRUCTION (what spaCy would produce on these words);
- the expected match set applies the reference's own matching rule
  (word-boundary containment of each synonym lemma) to the oracle
  lemmatized sentence — including incidental matches (e.g. "fire truck"
  also matches "truck");
- tests/test_parser_fixture.py then measures the rule-lemmatizer
  parser's micro precision/recall against these expectations.

Run once; output is committed at tests/fixtures/parser_golden.json.
Regenerate only if the vocabulary below changes.
"""

from __future__ import annotations

import json
import os
import random

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# host-side tool: never touch the TPU tunnel (axon sitecustomize
# pre-imports jax; env vars are ignored, the config API is required)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from betrayed_by_captions_tpu.data.parser import _default_lvis_path  # noqa: E402

# Curated LVIS category names whose single-word (or multi-word) forms are
# unambiguous singular nouns: spaCy's lemma of the singular form is the
# identity, so the oracle lemma of the inflected form is exactly the name.
VOCAB = [
    "airplane", "apple", "apron", "armchair", "avocado", "awning",
    "backpack", "ball", "balloon", "banana", "banner", "barrel", "basket",
    "bath_towel", "bear", "bed", "bee", "beer_bottle", "bell", "belt",
    "bench", "bicycle", "bird", "blanket", "boat", "book", "boot",
    "bottle", "bowl", "box", "bracelet", "broccoli", "bucket", "bus_(vehicle)",
    "butterfly", "cab_(taxi)", "cake", "camera", "candle", "car_(automobile)",
    "carrot", "cat", "chair", "cherry", "chicken_(animal)", "clock", "coat",
    "computer_keyboard", "cone", "cookie", "cow", "cup", "curtain",
    "deer", "desk", "dog", "doll", "door", "dress", "duck",
    "eagle", "earring", "egg", "elephant",
    "fan", "fire_engine", "fireplace", "flag", "flower_arrangement", "fork",
    "frog", "frisbee",
    # (no "glass_(drink_container)": its lemma key collides with the
    # "spectacles" synonym "glasses" in reference and repo alike —
    # last-write-wins makes the expectation implementation-defined)
    "giraffe", "glove", "goat", "goose", "grape",
    "guitar",
    "hat", "helicopter", "helmet", "horse", "hose",
    "jacket", "jar", "jean", "kayak", "kite", "kitten", "knife",
    "ladder", "lamp", "laptop_computer", "lemon", "lion", "lizard",
    "magazine", "man", "mattress", "microphone", "mirror", "monkey",
    "motorcycle", "mouse_(computer_equipment)", "mug", "mushroom",
    "napkin", "necklace", "newspaper", "notebook",
    "onion", "orange_(fruit)", "oven", "owl",
    "painting", "pan_(for_cooking)", "peach", "pear", "pen", "pencil",
    "person", "piano", "pillow", "pizza", "plate", "pumpkin", "puppy",
    "rabbit", "refrigerator", "ring", "rose",
    "sandal_(type_of_shoe)", "sandwich", "scarf", "sheep", "shirt", "shoe",
    "skateboard", "ski", "sofa", "spider", "spoon", "stool", "stove",
    "strawberry", "suitcase", "surfboard",
    "table", "teapot", "telephone", "television_set", "tent", "toaster",
    "tomato", "toothbrush", "towel", "toy", "tray", "truck", "turtle",
    "umbrella", "vase", "violin", "wagon", "watch", "waterfall", "wheel",
    "window", "wineglass", "wolf", "zebra",
]

# correct English plural construction (the INVERSE problem of
# lemmatization; used to inflect, never to lemmatize)
_IRREGULAR_PLURAL = {
    "man": "men", "woman": "women", "person": "people", "child": "children",
    "goose": "geese", "mouse": "mice", "wolf": "wolves", "knife": "knives",
    "scarf": "scarves", "leaf": "leaves", "shelf": "shelves",
    "sheep": "sheep", "deer": "deer", "foot": "feet", "tooth": "teeth",
    "broccoli": "broccoli",  # mass noun, invariant
}


def pluralize(word: str) -> str:
    if word in _IRREGULAR_PLURAL:
        return _IRREGULAR_PLURAL[word]
    if word.endswith(("s", "sh", "ch", "x", "z")):
        return word + "es"
    if word.endswith("y") and word[-2] not in "aeiou":
        return word[:-1] + "ies"
    if word.endswith("o") and word[-2] not in "aeiou" and word not in ("photo", "piano"):
        return word + "es"
    return word + "s"


# filler tokens with known spaCy lemmas (surface, lemma)
_FILL_DET = [("a", "a"), ("the", "the"), ("two", "two"), ("three", "three"),
             ("several", "several"), ("some", "some")]
_FILL_VERB = [("sits", "sit"), ("stands", "stand"), ("rests", "rest"),
              ("is", "be"), ("are", "be"), ("sitting", "sit"),
              ("standing", "stand"), ("lies", "lie"), ("hangs", "hang")]
_FILL_PREP = [("on", "on"), ("near", "near"), ("next", "next"), ("to", "to"),
              ("beside", "beside"), ("under", "under"), ("above", "above"),
              ("with", "with"), ("in", "in"), ("by", "by")]
_FILL_ADJ = [("red", "red"), ("small", "small"), ("large", "large"),
             ("old", "old"), ("wooden", "wooden"), ("shiny", "shiny"),
             ("green", "green"), ("striped", "striped")]


def phrase_tokens(name: str, plural: bool):
    """(surface tokens, oracle-lemma tokens) for one LVIS category name;
    multi-word names pluralize the head (last) word."""
    # strip parenthesized qualifiers like the reference does
    words = name.split("(")[0].replace("_", " ").split()
    lemmas = list(words)
    surface = list(words)
    if plural:
        surface[-1] = pluralize(words[-1])
    return surface, lemmas


# Hand-written hard cases: (caption, oracle lemma sentence).  Oracle
# lemmas are what spaCy's en_core_web_sm produces on these common words
# (verified against its published lemmatization rules for regular and
# irregular English nouns/verbs).
HARD_CASES = [
    ("two men riding horses on a beach",
     "two man ride horse on a beach"),
    ("a group of people standing around a fire engine",
     "a group of people stand around a fire engine"),
    ("several women holding umbrellas near the buses",
     "several woman hold umbrella near the bus"),
    ("children flying kites in a park",
     "child fly kite in a park"),
    ("a chef with knives slicing tomatoes and potatoes",
     "a chef with knife slice tomato and potato"),
    ("geese and ducks swimming beside two canoes",
     "goose and duck swim beside two canoe"),
    ("wolves chasing sheep across the field",
     "wolf chase sheep across the field"),
    ("three puppies playing with teddy bears",
     "three puppy play with teddy bear"),
    ("cherries and strawberries on white plates",
     "cherry and strawberry on white plate"),
    ("a pile of sandwiches next to wineglasses",
     "a pile of sandwich next to wineglass"),
    ("men in scarves sitting on benches",
     "man in scarf sit on bench"),
    ("two mice next to laptop computers on the desks",
     "two mouse next to laptop computer on the desk"),
    ("a woman wearing sandals carrying boxes of peaches",
     "a woman wear sandal carry box of peach"),
    ("skiers on skis passing wooden sleds",
     "skier on ski pass wooden sled"),
    ("alarm clocks and watches in a shop window",
     "alarm clock and watch in a shop window"),
    ("surfers carrying surfboards past beach umbrellas",
     "surfer carry surfboard past beach umbrella"),
    ("a bunch of bananas hanging above the oranges",
     "a bunch of banana hang above the orange"),
    ("two giraffes and three zebras drinking water",
     "two giraffe and three zebra drink water"),
    ("shelves full of books and magazines",
     "shelf full of book and magazine"),
    ("a man brushing his teeth with a toothbrush",
     "a man brush his tooth with a toothbrush"),
    ("loaves of bread beside a basket of eggs",
     "loaf of bread beside a basket of egg"),
    ("butterflies landing on roses and daisies",
     "butterfly land on rose and daisy"),
    ("firefighters spraying hoses at the flames",
     "firefighter spray hose at the flame"),
    ("two foxes near a family of rabbits",
     "two fox near a family of rabbit"),
    ("dishes and mugs stacked in the sink",
     "dish and mug stack in the sink"),
    ("couches and armchairs around a coffee table",
     "couch and armchair around a coffee table"),
    ("ladies in dresses dancing under awnings",
     "lady in dress dance under awning"),
    ("a pair of shoes next to muddy boots",
     "a pair of shoe next to muddy boot"),
    ("monkeys climbing ladders at the zoo",
     "monkey climb ladder at the zoo"),
    ("churches with tall towers behind the trees",
     "church with tall tower behind the tree"),
]


def main():
    rng = random.Random(20260818)
    with open(_default_lvis_path()) as f:
        cats = json.load(f)

    # the reference's lookup: lemmatized synonym -> 0-based id.  Oracle
    # lemmatization of a synonym = the synonym itself for our curated
    # vocabulary (singular lemma forms); for the full expectation we use
    # every synonym of every category AS WRITTEN (lowercased, underscores
    # to spaces) — LVIS synonyms are stored in singular lemma form.
    lookup = {}
    for item in cats:
        cid = item["id"] - 1
        for syn in item["synonyms"]:
            syn = syn.lower().replace("_", " ")
            clean = []
            for w in syn.split():
                if w.startswith("("):
                    break
                clean.append(w)
            syn = " ".join(clean)
            if syn:
                lookup[syn] = cid  # last-write-wins like the reference

    name_to_id = {}
    for item in cats:
        name_to_id[item["name"]] = item["id"] - 1

    entries = []
    for caption, oracle_lemmas in HARD_CASES:
        oracle = " " + oracle_lemmas + " "
        expected = sorted(
            {cid for syn, cid in lookup.items() if f" {syn} " in oracle}
        )
        entries.append(
            {"caption": caption, "oracle_lemmas": oracle_lemmas,
             "expected_ids": expected}
        )
    for i in range(200 - len(HARD_CASES)):
        n_objects = rng.choice([1, 2, 2, 3])
        surface, lemmas = [], []
        det = rng.choice(_FILL_DET)
        for j in range(n_objects):
            name = rng.choice(VOCAB)
            plural = rng.random() < 0.45
            if plural and det[0] == "a":
                det = ("two", "two")
            if j == 0:
                adj = rng.choice(_FILL_ADJ) if rng.random() < 0.4 else None
                surface.append(det[0])
                lemmas.append(det[1])
                if adj:
                    surface.append(adj[0])
                    lemmas.append(adj[1])
            else:
                verb = rng.choice(_FILL_VERB)
                prep = rng.choice(_FILL_PREP)
                d2 = rng.choice(_FILL_DET)
                for s, l in (verb, prep, d2):
                    surface.append(s)
                    lemmas.append(l)
            s_toks, l_toks = phrase_tokens(name, plural)
            surface.extend(s_toks)
            lemmas.extend(l_toks)

        caption = " ".join(surface)
        oracle = " " + " ".join(lemmas) + " "
        expected = sorted(
            {cid for syn, cid in lookup.items() if f" {syn} " in oracle}
        )
        entries.append(
            {"caption": caption, "oracle_lemmas": " ".join(lemmas),
             "expected_ids": expected}
        )

    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "parser_golden.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(entries, f, indent=1)
    n_exp = sum(len(e["expected_ids"]) for e in entries)
    print(f"wrote {len(entries)} captions, {n_exp} expected matches -> {out}")


if __name__ == "__main__":
    main()
