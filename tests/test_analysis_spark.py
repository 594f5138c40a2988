"""Spark column-expression chain must agree exactly with the pure-Python
oracle chain on golden vectors and adversarial inputs."""

from pyspark.sql import functions as F

from searchengine_spark.functions.analysis import process_text, tokens_col

CASES = [
    "my package never arrived https://www.amazon.com please help!",
    "This is soooo cool!!!   AndUnexpected",
    "<body> This is a body, tags should be removed </body>",
    "this is the url of university of Pisa\nhttps://www.unipi.it",
    "<p> 1343 is the year it was founded </p>",
    "another      test",
    "OnlyCamelCase",
    "ThisIs a Combination OfBoth",
    "",
    "1234 !!!",
    "foo123bar",
    "def getUserName(self): return self._userName  # töken ünïcode",
    "a" * 100 + " " + "B" * 70,
    "to be or not to be",
    "x.y.z import java.util.ArrayList; // www.example.com",
    "tabs\tand\nnewlines are not split by the literal-space tokenizer",
]


def test_tokens_col_matches_oracle(spark):
    for stem_stop in (True, False):
        df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "id long, content string")
        got = {
            r["id"]: r["toks"]
            for r in df.select("id", tokens_col(F.col("content"), stem_stop).alias("toks")).collect()
        }
        for i, c in enumerate(CASES):
            assert got[i] == process_text(c, stem_stop), (
                f"mismatch stem_stop={stem_stop} case={c!r}:\n"
                f"  spark : {got[i]}\n  oracle: {process_text(c, stem_stop)}"
            )
