"""Golden-output parity against the reference's own checked-in fixtures
(SURVEY.md §5): run our engine on /root/reference's inputs and diff against
its committed outputs byte-for-byte (after canonical ordering)."""

from __future__ import annotations

import os

from mapreduce_implementation_spark.operators.sort import distributed_sort
from mapreduce_implementation_spark.operators.text import word_count
from mapreduce_implementation_spark.sources.tables import read_int_lines, read_text_dir
from tests.conftest import REFERENCE


def test_word_count_golden(spark):
    """Job A parity: 16,320 distinct words, exact (count desc, word desc) order
    (golden: /root/reference/outputdir/output.txt)."""
    df = word_count(read_text_dir(spark, os.path.join(REFERENCE, "inputdir")))
    got = [(r["word"], r["cnt"]) for r in df.collect()]

    golden = []
    with open(os.path.join(REFERENCE, "outputdir", "output.txt")) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            w, c = line.rsplit(",", 1)
            golden.append((w, int(c)))

    assert len(got) == len(golden) == 16320
    assert got == golden


def test_sort_golden(spark):
    """Job B parity: 327,690 ints globally ascending, duplicates preserved
    (golden: /root/reference/sort_outputdir/output.txt)."""
    df = distributed_sort(
        read_int_lines(spark, os.path.join(REFERENCE, "number_sort_input")),
        col="n", num_partitions=4,
    )
    got = [r["n"] for r in df.collect()]

    with open(os.path.join(REFERENCE, "sort_outputdir", "output.txt")) as f:
        golden = [int(line) for line in f if line.strip()]

    assert len(got) == len(golden) == 327690
    assert got == golden
