"""Porter stemmer (Porter, 1980): published example vocabulary through the
FULL pipeline, plus the stemming analyzer end to end."""

from __future__ import annotations

from lucene_solr_intervals_spark.analysis.porter import porter_stem
from lucene_solr_intervals_spark.analysis.tokenizer import ANALYZERS

PAIRS = {
    # step 1 examples (full-pipeline results)
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    # steps 2-4 (note: later steps keep stripping — e.g. differentli ->
    # different (step 2) -> differ (step 4))
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_published_vocabulary():
    bad = {w: (porter_stem(w), want) for w, want in PAIRS.items() if porter_stem(w) != want}
    assert not bad, bad


def test_en_stem_analyzer():
    """EnglishAnalyzer-style chain: tokenize -> lower -> stop (position
    holes preserved) -> Porter stem."""
    terms, positions, doclen = ANALYZERS["en_stem"](
        "The dogs are running quickly through the conditional branches"
    )
    assert terms == ["dog", "run", "quickli", "through", "condit", "branch"]
    # stopword holes: The(0) dogs(1) are(2) running(3) quickly(4) through(5)
    # the(6) conditional(7) branches(8)
    assert positions == [1, 3, 4, 5, 7, 8]
    assert doclen == 6


def test_reference_generated_porter_goldens():
    """400 word->stem pairs produced by compiling and running the
    reference's own PorterStemmer.java (en/PorterStemmer.java:63, javac +
    ArrayUtil shim at fixture-generation time); the generation sweep
    covered 9k words with zero mismatches — porter.py is bit-exact."""
    import json
    import os

    from lucene_solr_intervals_spark.analysis.porter import porter_stem

    path = os.path.join(os.path.dirname(__file__), "data", "porter_golden.json")
    with open(path, encoding="utf-8") as f:
        golden = json.load(f)
    bad = [(w, want, porter_stem(w)) for w, want in golden.items()
           if porter_stem(w) != want]
    assert not bad, bad[:5]
