"""Property tests (Hypothesis) — SURVEY.md §5 item 3.

The tokenizer property runs the engine's column expressions against a
pure-Python port of the reference mapper loop (mapreduce.c:115-132); the
sort properties assert permutation-invariance and duplicate preservation
of the range-partitioned sort.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.sort import distributed_sort
from mapreduce_implementation_spark.operators.text import tokenize


def reference_tokenize(line: str) -> list[str]:
    """Pure-Python port of do_map's token loop (mapreduce.c:115-132):
    split on single spaces, keep [A-Za-z] lowercased, drop empties."""
    out = []
    for raw in line.split(" "):
        tok = "".join(c.lower() for c in raw if c.isascii() and c.isalpha())
        if tok:
            out.append(tok)
    return out


# printable ASCII minus newline (the reference reads line-at-a-time)
_ascii_line = st.text(
    alphabet=string.ascii_letters + string.digits + string.punctuation + " \t",
    min_size=0, max_size=120,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_ascii_line, min_size=1, max_size=8))
def test_tokenizer_matches_reference_python(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    got = [r["word"] for r in tokenize(df).collect()]
    want = [w for l in lines for w in reference_tokenize(l)]
    assert sorted(got) == sorted(want)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**30 - 1),
                min_size=1, max_size=500))
def test_sort_is_permutation_preserving_duplicates(spark, ints):
    df = spark.createDataFrame([(n,) for n in ints], ["n"])
    got = [r["n"] for r in distributed_sort(df, "n", num_partitions=4).collect()]
    assert got == sorted(ints)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                min_size=1, max_size=300))
def test_sort_handles_negative_and_wide_range(spark, ints):
    """Beyond the reference's [0, 2^30) assumption — sampling-based range
    partitioning has no distribution requirement."""
    df = spark.createDataFrame([(n,) for n in ints], ["n"])
    got = [r["n"] for r in distributed_sort(df, "n", num_partitions=3).collect()]
    assert got == sorted(ints)


def test_tokenizer_reference_edge_cases(spark):
    """The exact cases documented in FIXTURES.md."""
    cases = ["Don't", "well-known", "1865", "end.Start", "", "  ", "a  b"]
    df = spark.createDataFrame([(c,) for c in cases], ["value"])
    got = sorted(r["word"] for r in tokenize(df).collect())
    assert got == sorted(["dont", "wellknown", "endstart", "a", "b"])
