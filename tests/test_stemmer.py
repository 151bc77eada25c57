"""Porter stemmer differential test against canonical vectors from the
published algorithm (Porter 1980) — the same algorithm OpenNLP's
PorterStemmer implements (reference jobs/Indexer.java:10)."""

from distributed_search_engine_spark.functions.stemmer import porter_stem

VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "operational": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "computing": "comput", "computer": "comput", "compute": "comput",
    "computation": "comput", "searching": "search", "engines": "engin",
    "running": "run", "space": "space", "travel": "travel",
}


def test_vectors():
    bad = {w: (porter_stem(w), e) for w, e in VECTORS.items() if porter_stem(w) != e}
    assert not bad, bad


def test_short_words_unchanged():
    for w in ["a", "ab", "is", "to"]:
        assert porter_stem(w) == w


def test_idempotent_on_own_fixture_vocab():
    from distributed_search_engine_spark.corpus import _VOCAB

    for w in _VOCAB:
        porter_stem(w)  # must not raise
