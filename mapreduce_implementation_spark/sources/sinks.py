"""Sinks.

The reference's sinks are CSV-ish text files plus a master-side sequential
merge to one ``output.txt`` (mapreduce.c:352-439).  At 100 TB a single-file
merge is an anti-pattern, so the engine's default writers keep many parts;
``single_file=True`` exists only for golden-output parity at toy scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = False, single_file: bool = False) -> None:
    """CSV sink (reference O12, `word,count` lines at mapreduce.c:211,398)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite",
               single_file: bool = False) -> None:
    """One-column text sink (reference O12 bare-int lines, mapreduce.c:255,434)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).text(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-delimited JSON — the interchange format training-data
    pipelines exchange documents in. Many parts, splittable line-wise."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """Columnar ORC sink — same pushdown/pruning properties as parquet
    for deployments standardized on ORC."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
