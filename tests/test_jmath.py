"""fdlibm log/log10 transcription goldens (values cross-checked against
the JVM via Spark F.log10/F.log — 0 mismatches over 210k inputs)."""

import math

from searchengine_spark.functions.jmath import jlog, jlog10


def test_reference_goldens():
    assert jlog10(1.6) == 0.2041199826559248          # differs from math.log10
    assert jlog10(5 / 3.0) == 0.22184874961635637
    assert jlog10(2.5) == 0.3979400086720376
    assert jlog10(8 / 5.0) == 0.2041199826559248


def test_exact_powers():
    assert jlog10(1.0) == 0.0
    assert jlog10(10.0) == 1.0
    assert jlog10(100.0) == 2.0
    assert jlog(1.0) == 0.0


def test_close_to_math_everywhere():
    for i in range(1, 10000):
        x = i / 7.0
        assert abs(jlog10(x) - math.log10(x)) <= 4 * abs(math.ulp(math.log10(x)) or 1e-300)
        assert abs(jlog(x) - math.log(x)) <= 4 * abs(math.ulp(math.log(x)) or 1e-300)


def test_special_values():
    assert jlog10(float("inf")) == float("inf")
    assert math.isnan(jlog10(float("nan")))
    assert math.isnan(jlog10(-1.0))
    assert jlog10(0.0) == float("-inf")
    assert jlog10(5e-324) == math.log10(5e-324) or abs(jlog10(5e-324) - math.log10(5e-324)) < 1e-12
