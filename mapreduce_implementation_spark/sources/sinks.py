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


def compact_parquet_dir(spark, src_dir: str, dst_dir: str,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        sort_by: list[str] | None = None) -> int:
    """Small-file compaction — the table-maintenance job every long-lived
    100 TB dataset needs (streaming sinks and fine-grained upserts leave
    thousands of KB-scale files; scan planning then pays per-file open
    cost and loses row-group-sized reads).

    Rewrites ``src_dir`` into ``dst_dir`` with file count chosen from the
    ACTUAL input byte size (``target_file_bytes`` per output file, the
    128 MB row-group discipline), optionally sorted by ``sort_by`` so
    min/max column stats become selective (the poor man's clustering —
    what OPTIMIZE ... ZORDER does with space-filling curves).  Sorted
    compaction uses ``repartitionByRange`` (files hold disjoint key
    ranges → parquet footer min/max prune whole files); unsorted uses a
    plain round-robin ``repartition``.  Returns the output file count.
    """
    df = spark.read.parquet(src_dir)
    # size the input through Hadoop's FileSystem API, not a local glob:
    # works identically for file:/, hdfs:// and s3a:// paths (a local
    # glob silently returns 0 bytes off-local, collapsing output to one
    # file and reporting count 0)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def _dir_stats(d: str) -> tuple[int, int]:
        path = jvm.org.apache.hadoop.fs.Path(d)
        fs = path.getFileSystem(hconf)
        it = fs.listFiles(path, True)
        nbytes = nfiles = 0
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.endswith(".parquet"):
                nbytes += st.getLen()
                nfiles += 1
        return nbytes, nfiles

    in_bytes, _ = _dir_stats(src_dir)
    n_files = max(1, -(-in_bytes // target_file_bytes))  # ceil
    if sort_by:
        out = (df.repartitionByRange(n_files, *sort_by)
               .sortWithinPartitions(*sort_by))
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    return _dir_stats(dst_dir)[1]
