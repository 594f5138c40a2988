"""Golden vectors ported 1:1 from the reference's PreprocesserTest
(/root/reference/common/src/test/java/.../PreprocesserTest.java:26-99)
plus Porter vectors from the published algorithm examples.
"""

from searchengine_spark.functions.analysis import (
    clean_text,
    process_text,
    remove_stopwords,
    stem_tokens,
    tokenize,
)
from searchengine_spark.functions.porter import stem


def test_clean_url():
    assert (
        clean_text("this is the url of university of Pisa\nhttps://www.unipi.it")
        == "this is the url of university of Pisa"
    )


def test_clean_html():
    assert (
        clean_text("<p> 1343 is the year it was founded </p>")
        == "is the year it was founded"
    )


def test_clean_multispace():
    assert clean_text("another      test") == "another test"


def test_tokenize_camel_case():
    assert tokenize("OnlyCamelCase") == ["only", "camel", "case"]
    assert tokenize("ThisIs a Combination OfBoth") == [
        "this", "is", "a", "combination", "of", "both",
    ]


def test_tokenize_empty():
    assert tokenize("") == [""]


def test_tokenize_truncates_64():
    long = "a" * 100
    # repeated-char collapse happens in clean, not tokenize: direct call keeps len
    assert tokenize(long) == ["a" * 64]


def test_stopword_removal():
    assert remove_stopwords(tokenize("to be or not to be")) == []
    assert remove_stopwords(tokenize("this sentence contains some stopwords")) == [
        "sentence", "stopwords",
    ]


def test_full_pipeline_stem_stop_on():
    assert process_text(
        "my package never arrived https://www.amazon.com please help!"
    ) == ["packag", "arriv", "help"]
    assert process_text("This is soooo cool!!!   AndUnexpected") == [
        "soo", "cool", "unexpect",
    ]
    assert process_text(
        "<body> This is a body, tags should be removed </body>"
    ) == ["bodi", "tag", "remov"]


def test_full_pipeline_stem_stop_off():
    assert process_text(
        "my package never arrived https://www.amazon.com please help!",
        stem_stop=False,
    ) == ["my", "package", "never", "arrived", "please", "help"]
    assert process_text("This is soooo cool!!!   AndUnexpected", stem_stop=False) == [
        "this", "is", "soo", "cool", "and", "unexpected",
    ]
    assert process_text(
        "<body> This is a body, tags should be removed </body>", stem_stop=False
    ) == ["this", "is", "a", "body", "tags", "should", "be", "removed"]


def test_digits_introduce_boundaries():
    # non-letters are replaced by a space, not deleted (Preprocesser.java:135)
    assert clean_text("foo123bar") == "foo bar"


def test_empty_after_clean_yields_blank_token():
    # "" tokenizes to [""]: the blank token counts toward doc length but
    # produces no posting (Spimi.java:264, 282-286)
    assert process_text("1234 !!!") == [""]


def test_porter_reference_vectors():
    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "digitizer": "digit", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis", "triplicate": "triplic",
        "formative": "form", "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
        # reference-pinned goldens (PreprocesserTest.java:48-63)
        "package": "packag", "arrived": "arriv", "help": "help",
        "unexpected": "unexpect", "body": "bodi", "tags": "tag",
        "removed": "remov", "soo": "soo", "cool": "cool",
    }
    for word, expect in vectors.items():
        assert stem(word) == expect, f"{word}: got {stem(word)}, want {expect}"
