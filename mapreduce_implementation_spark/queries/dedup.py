"""Dedup queries (north-star Q10/Q11) over ``documents``.

The synthetic corpus has no byte- or normalized-exact duplicate texts, so
``exact_dedup`` demonstrates representative-selection on the (lang,
source) key; the near-dup family (trigram Jaccard / MinHash / SimHash /
embedding cosine) does real work — the corpus contains pairs up to
Jaccard 0.99.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    embedding_near_dup_pairs, embedding_near_dup_pairs_lsh,
    exact_dedup_representatives, minhash_dedup_pairs, ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from ..operators.graph import connected_components
from ..registry import register
from ..sources.tables import load_table

# DuckDB twin of the Spark tokenizer+trigram pipeline (positions assigned
# before the empty-token filter, exactly like posexplode-then-filter).
_DUCK_TRIGRAMS = """
WITH toks AS (
  SELECT doc_id, tok, pos FROM (
    SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
    FROM (SELECT doc_id,
                 string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' ') AS toks
          FROM documents)
  ) WHERE tok <> ''
),
grams AS (
  SELECT DISTINCT doc_id, tri FROM (
    SELECT doc_id,
           concat_ws(' ', tok, lead(tok,1) OVER w, lead(tok,2) OVER w) AS tri,
           lead(tok,2) OVER w AS _l2
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE _l2 IS NOT NULL
)
"""


def _md5_audit_subset(emb: DataFrame, n: int,
                      id_col: str = "vec_id") -> DataFrame:
    """The adaptive md5 audit subset shared by the bounded hash oracles
    (dedup_embedding_lsh, dedup_semantic_kmeans, and — r8 — the
    graduated dedup_minhash_lsh/dedup_simhash over documents):
    K = clamp(50000//n, 1, 50) buckets of 100 keyed by the first 4 md5
    hex digits of the id — identical integer arithmetic to the SQL
    twins, so the brute-force exact leg stays ~500 rows at ANY corpus
    size."""
    kk = max(1, min(50, 50000 // max(n, 1)))
    bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
                     16, 10).cast("long") % 100)
    return emb.filter(bucket < kk)


def _coverage_flag(universe: DataFrame, found: DataFrame, keys: list[str],
                   frac: float, out: str) -> DataFrame:
    """1-row boolean frame: the approximate path ``found`` covers at
    least ``ceil(frac * |universe|)`` of the audit ``universe`` rows —
    the in-query recall/drop-recall bound of the bounded hash oracles.

    Counted via LEFT SEMI join so the bound is duplicate-insensitive by
    construction (r8 ADVICE: a left join would inflate ``_n``/``_h``
    for universe rows matched by duplicate candidate rows, and
    correctness must not depend on every caller remembering its own
    ``.distinct()``).  Join shape: semi-join ``found`` against the
    BROADCAST O(1) audit ``universe`` (left_semi builds right, so the
    tiny side is the build side), which filters the full-corpus
    candidate stream map-side — no shuffle of the candidate set at any
    scale — then a distinct+count over the surviving handful of keys.
    ``universe`` callers pass key-distinct frames (groupBy outputs), so
    distinct matched keys == matched universe rows."""
    hits = (found.join(F.broadcast(universe.select(*keys)), keys, "left_semi")
            .select(*keys).distinct()
            .agg(F.count(F.lit(1)).alias("_h")))
    tot = universe.agg(F.count(F.lit(1)).alias("_n"))
    return tot.crossJoin(hits).select(
        (F.col("_h") >= F.ceil(F.lit(frac) * F.col("_n"))).alias(out))


def _with_flag_sentinel(pairs: DataFrame, flag: DataFrame,
                        score_col: str) -> DataFrame:
    """Audit output = pairs x flag, PLUS one unconditional sentinel row
    ``(-1, -1, 0.0, <flag>)``.  Without the sentinel the verification
    boolean only rides on qualifying audit pairs, so a fixture/SF whose
    md5 subset happens to contain NO such pair would hash-match the
    oracle vacuously and a broken candidate generator would pass the
    driver gate (r8 code-review finding).  The sentinel makes the flag
    itself part of the hashed surface at every scale; the SQL twins
    append the same row with a literal TRUE.

    ``flag`` is persisted here because it has TWO consumers (the
    broadcast cross-join and the sentinel row) and its lineage contains
    the FULL-CORPUS candidate pipeline — without the persist that
    pipeline executes twice per query (measured: dedup_minhash_lsh
    9.9 s -> ~7 s warm at sf0.1, the r8 bench-gap root cause)."""
    from ..operators.caching import tracked_persist

    flag = tracked_persist(flag)
    sent = flag.select(
        F.lit(-1).cast(pairs.schema["a"].dataType).alias("a"),
        F.lit(-1).cast(pairs.schema["b"].dataType).alias("b"),
        F.lit(0.0).alias(score_col),
        F.col(flag.columns[0]))
    return pairs.crossJoin(F.broadcast(flag)).unionByName(sent)


def _char9_jaccard_pairs(docs: DataFrame,
                         min_jaccard: float) -> DataFrame:
    """(a, b, _j) — EXACT char-9-shingle Jaccard pairs with set
    semantics: the ONE Spark pipeline behind both the estimate query's
    truth leg and the graduated dedup_minhash_lsh audit leg (its DuckDB
    twin is :func:`_duck_char9_jaccard`); a normalization change lands
    in exactly two places, Spark and SQL, or the oracle gate fails."""
    from ..operators.caching import tracked_persist
    from ..operators.dedup import char_shingles

    sh = tracked_persist(char_shingles(docs, "doc_id", "text", k=9))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (a.join(b, "shingle").filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c")))
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (inter.join(sa, "a").join(sb, "b")
            .filter(jac >= min_jaccard)
            .select("a", "b", jac.alias("_j")))


# DuckDB twin of _md5_audit_subset over documents (the k/sub CTE pair
# shared by every doc-table audit oracle)
_DUCK_DOC_SUB = """k AS (
      SELECT greatest(1, least(50, CAST(50000 // count(*) AS BIGINT))) AS kk
      FROM documents
    ),
    sub AS (
      SELECT doc_id, text FROM documents, k
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
            % 100 < k.kk
    )"""


def _duck_char9_jaccard(src: str) -> str:
    """DuckDB CTE chain (no leading WITH) producing ``inter``/``sz``
    for char-9-shingle Jaccard over table/CTE ``src`` — the SQL twin of
    :func:`_char9_jaccard_pairs`."""
    return f"""norm AS (
      SELECT doc_id, lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS s
      FROM {src}
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(s, i, 9) AS shingle
      FROM norm, unnest(range(1, len(s) - 7)) t(i)
      WHERE len(s) >= 9
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""


def _token_cosine_pairs(docs: DataFrame, min_cosine: float) -> DataFrame:
    """(a, b, _cos) — EXACT token-count-vector cosine pairs (strict >
    threshold): the ONE Spark pipeline behind both the SimHash estimate
    query's truth leg and the graduated dedup_simhash audit leg (DuckDB
    twin: :func:`_duck_token_cosine`)."""
    from ..functions.textfn import tokens_array

    toks = docs.select(
        "doc_id",
        F.explode(F.filter(tokens_array(F.col("text")),
                           lambda t: t != "")).alias("tok"))
    cnt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    a = cnt.select(F.col("doc_id").alias("a"), "tok", F.col("c").alias("ca"))
    b = cnt.select(F.col("doc_id").alias("b"), "tok", F.col("c").alias("cb"))
    dots = (a.join(b, "tok").filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot")))
    norms = cnt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nn"))
    na = norms.select(F.col("doc_id").alias("a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("nn").alias("nb"))
    # try_divide for ANSI parity with the other cosine sites; norms are
    # structurally > 0 here (every doc in cnt has >= 1 token)
    cos = F.try_divide(F.col("dot"), F.col("na") * F.col("nb"))
    return (dots.join(na, "a").join(nb, "b")
            .filter(cos > min_cosine)
            .select("a", "b", cos.alias("_cos")))


def _duck_token_cosine(src: str) -> str:
    """DuckDB CTE chain (no leading WITH) producing ``dots``/``norms``
    for token-count cosine over table/CTE ``src`` — the SQL twin of
    :func:`_token_cosine_pairs`."""
    return f"""toks AS (
      SELECT doc_id, unnest(list_filter(
          string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' '),
          t -> t <> '')) AS tok
      FROM {src}
    ),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    dots AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             sum(a.c * b.c) AS dot
      FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    norms AS (SELECT doc_id, sqrt(sum(c * c)) AS nn FROM cnt GROUP BY 1)"""


@register(
    "dedup_exact",
    oracle="""
    SELECT lang, source, min(doc_id) AS rep_doc_id, count(*) AS n_docs
    FROM documents
    GROUP BY lang, source
    """,
    doc="Exact dedup (Q10): deterministic representative (min id) per key — "
        "NOT dropDuplicates, whose survivor is partition-order dependent.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dedup_representatives(
        docs.select("lang", "source", F.col("doc_id")), ["lang", "source"], "doc_id")
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        reps.withColumnRenamed("doc_id", "rep_doc_id")
        .join(counts, ["lang", "source"])
        .select("lang", "source", "rep_doc_id", "n_docs")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_DUCK_TRIGRAMS + """,
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i
      FROM grams g1 JOIN grams g2 USING (tri)
      WHERE g1.doc_id < g2.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.a = sa.doc_id
    JOIN sizes sb ON inter.b = sb.doc_id
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    """,
    doc="EXACT word-trigram Jaccard similarity join (Q11 exact baseline): "
        "inverted-index equi-join on shared trigrams, inclusion-exclusion "
        "union size — never an all-pairs product.",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, min_jaccard=0.5)


@register(
    "dedup_minhash_lsh",
    oracle="""
    WITH """ + _DUCK_DOC_SUB + """,
    """ + _duck_char9_jaccard("sub") + """
    SELECT a, b,
           round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard,
           TRUE AS recall_ok
    FROM inter
    JOIN sz sa ON inter.a = sa.doc_id
    JOIN sz sb ON inter.b = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 0.0, TRUE
    """,
    doc="MinHash(64)+LSH(16x4) near-dup candidates (Q11 scale path), "
        "graduated from rows-only to a bounded hash oracle (r8, the "
        "dedup_semantic_kmeans idiom): output = the EXACT char-9-shingle "
        "Jaccard pairs (>= 0.5) within the deterministic md5 audit "
        "subset (~<= 500 docs at any corpus size) + in-query recall_ok "
        "= the full-corpus LSH candidate set covers >= 80% of the audit "
        "pairs with true Jaccard >= 0.7 — the band where the 16x4 "
        "banding's catch probability is 1-(1-0.7^4)^16 ~ 0.99 and the "
        "signature-estimate filter at 0.5 is ~3.5 sigma below the mean, "
        "so with fixed xxhash64 seeds the flag is a deterministic "
        "regression pin on the signature/banding formulas (measured "
        "recall 1.0 at sf0.001/0.01/0.1).  The flag also rides an "
        "unconditional (-1,-1) sentinel row, so a banding or signature "
        "regression breaks the driver hash even at a scale where the "
        "audit subset holds no qualifying pair.",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.caching import tracked_persist

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    sub = _md5_audit_subset(docs, n, id_col="doc_id")
    # exact leg: set-semantics char-9 shingle Jaccard within the audit
    # subset (~500 docs) — the shared estimate-twin pipeline.
    # MEASURED AND REJECTED (r15, VERDICT r14 item 4): persisting ONE
    # full-corpus raw shingle stream and deriving both this leg (subset
    # filter + distinct) and the candidate leg's signatures from it.
    # Interleaved min-of-warm A/B at sf0.1, identical output verified at
    # sf0.01: 32c 4.47 s current vs 4.38 s shared (noise); 8c QUIET
    # floor 3.16 s current vs 3.55 s shared — the persist materializes
    # ~1.9M shingle rows that today flow straight into the partial
    # min-aggregate inside one codegen stage, and that fusion loss
    # costs more than the audit leg's re-scan of the ~10% subset saves.
    exact_sub = tracked_persist(_char9_jaccard_pairs(sub, min_jaccard=0.5))
    # verify stage: the FULL-corpus banded candidate set must catch the
    # audit's high-similarity pairs
    cand = minhash_dedup_pairs(docs, "doc_id", "text",
                               min_jaccard=0.5).select("a", "b")
    high = exact_sub.filter(F.col("_j") >= 0.7).select("a", "b")
    rc = _coverage_flag(high, cand, ["a", "b"], 0.8, "recall_ok")
    return _with_flag_sentinel(
        exact_sub.select("a", "b", F.round("_j", 6).alias("jaccard")),
        rc, "jaccard")


@register(
    "dedup_simhash",
    oracle="""
    WITH """ + _DUCK_DOC_SUB + """,
    """ + _duck_token_cosine("sub") + """
    SELECT dots.a, dots.b,
           round(dots.dot / (na.nn * nb.nn), 6) AS cos,
           TRUE AS bands_complete
    FROM dots
    JOIN norms na ON dots.a = na.doc_id
    JOIN norms nb ON dots.b = nb.doc_id
    WHERE dots.dot / (na.nn * nb.nn) > 0.9
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 0.0, TRUE
    """,
    doc="SimHash(64-bit) near-dup pairs within Hamming distance 3 "
        "(candidates via 16-bit band buckets), graduated from rows-only "
        "to a bounded hash oracle (r8): output = the EXACT token-count-"
        "vector cosine pairs (> 0.9) within the deterministic md5 audit "
        "subset + in-query bands_complete = the full-corpus banded "
        "candidate set restricted to the subset EQUALS the brute-force "
        "Hamming<=3 pair set over the subset's simhashes, both "
        "directions.  Unlike MinHash banding this is not probabilistic: "
        "a pair within Hamming 3 of a 64-bit hash split into 4 16-bit "
        "bands must agree exactly on >= 1 band (pigeonhole), so the "
        "flag asserts a THEOREM about the banding — any bucketing "
        "regression (band arithmetic, the hamming verify filter) makes "
        "the sets differ and breaks the driver hash, and the flag also "
        "rides an unconditional (-1,-1) sentinel row so the theorem is "
        "checked even at a scale where the audit subset holds no "
        "qualifying cosine pair.  The brute-force leg is subset^2 ~ "
        "125k bit_count comparisons, O(1) at any corpus size.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.caching import tracked_persist
    from ..operators.dedup import simhash

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    sub = tracked_persist(_md5_audit_subset(docs, n, id_col="doc_id"))
    # exact leg: token-count cosine within the audit subset (~500 docs)
    # — the shared estimate-twin pipeline
    exact_sub = _token_cosine_pairs(sub, min_cosine=0.9)
    # verify stage: banded candidates restricted to the subset must
    # EQUAL the brute-force Hamming<=3 pairs over the subset (the
    # pigeonhole completeness theorem of 4x16-bit banding)
    shv = simhash(sub, "doc_id", "text")
    la = shv.select(F.col("doc_id").alias("a"), F.col("simhash").alias("_ha"))
    lb = shv.select(F.col("doc_id").alias("b"), F.col("simhash").alias("_hb"))
    brute = (la.crossJoin(F.broadcast(lb)).filter(F.col("a") < F.col("b"))
             .filter(F.bit_count(
                 F.col("_ha").bitwiseXOR(F.col("_hb"))) <= 3)
             .select("a", "b"))
    cand = simhash_near_dup_pairs(docs, "doc_id", "text",
                                  max_hamming=3).select("a", "b")
    ids = sub.select("doc_id")
    cand_sub = (cand
                .join(F.broadcast(ids.withColumnRenamed("doc_id", "a")), "a")
                .join(F.broadcast(ids.withColumnRenamed("doc_id", "b")), "b"))
    sym_diff = (brute.withColumn("_x", F.lit(1))
                .join(cand_sub.withColumn("_y", F.lit(1)),
                      ["a", "b"], "full")
                .filter(F.col("_x").isNull() | F.col("_y").isNull())
                .agg(F.count(F.lit(1)).alias("_d"))
                .select((F.col("_d") == 0).alias("bands_complete")))
    return _with_flag_sentinel(
        exact_sub.select("a", "b", F.round("_cos", 6).alias("cos")),
        sym_diff, "cos")


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs (brute-force baseline; LSH-bucketed "
        "variant is the 100 TB path — see operators/similarity.py).",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, "vec_id", "embedding", min_cosine=0.35)


@register(
    "dedup_clusters",
    oracle="WITH RECURSIVE " + _DUCK_TRIGRAMS.replace("WITH ", "", 1) + """,
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i
      FROM grams g1 JOIN grams g2 USING (tri)
      WHERE g1.doc_id < g2.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a, b FROM inter
      JOIN sizes sa ON inter.a = sa.doc_id
      JOIN sizes sb ON inter.b = sb.doc_id
      WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    ),
    edges AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
    reach(node, lbl) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.v, r.lbl FROM edges e JOIN reach r ON r.node = e.u
    ),
    cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
           FROM reach GROUP BY node)
    SELECT cc.doc_id, cc.cluster_id, sz.cluster_size
    FROM cc JOIN (SELECT cluster_id, count(*) AS cluster_size
                  FROM cc GROUP BY cluster_id) sz USING (cluster_id)
    """,
    doc="Near-dup CLUSTERS (the step after pairwise candidates): connected "
        "components of the trigram-Jaccard>=0.5 pair graph via alternating "
        "large-star/small-star rounds (Kiveris et al.), cluster_id = min "
        "doc_id of the component.  Oracle: DuckDB recursive reachability.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, min_jaccard=0.5)
    cc = connected_components(pairs, "a", "b")
    # cluster_size via a window under one exchange on cluster_id — a
    # groupBy+self-join would traverse the cc frame twice (near-dup
    # clusters are bounded-size, so no mega-partition risk; the
    # exact_dedup_representatives argument)
    wp = Window.partitionBy("cluster_id")
    return cc.select(F.col("node").alias("doc_id"), "cluster_id",
                     F.count(F.lit(1)).over(wp).alias("cluster_size"))


@register(
    "dedup_embedding_lsh",
    oracle="""
    WITH k AS (
      SELECT greatest(1, least(50, CAST(50000 // count(*) AS BIGINT))) AS kk
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings, k
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4))::BIGINT
            % 100 < k.kk
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos,
           TRUE AS recall_ok
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 0.0, TRUE
    """,
    doc="Bucketed embedding near-dup (the 100 TB path): multi-table "
        "sign-LSH candidates joined on (table, bucket) — never all-pairs — "
        "then exact-cosine verified at the same threshold as "
        "dedup_embedding_cosine.  Parameters come from sign_lsh_params "
        "(bits tracks log2(n/bucket), tables hits the Charikar recall "
        "target) — NOT fixture constants: the sf1 scaling bench showed "
        "fixed (bits=4, tables=16) superlinear while the auto rule stays "
        "~linear (VERDICT r04 item 3).  Graduated to a bounded hash "
        "oracle: output = the exact pairs within a deterministic "
        "md5-hash vector subset + in-query recall_ok = LSH found >= 80% "
        "of those pairs (measured 0.92 at every SF).  The audit subset "
        "uses an ADAPTIVE bucket count K = clamp(50000 // n, 1, 50) "
        "out of 100 (identical integer arithmetic in the SQL twin), so "
        "the brute-force audit holds ~500 vectors however big the "
        "corpus: the audit cost stays O(const) while the LSH leg "
        "scales — a fraction-based subset would re-introduce the exact "
        "quadratic the LSH path exists to avoid.",
)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.caching import tracked_persist
    from ..operators.dedup import sign_lsh_params

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits, tables = sign_lsh_params(n, 0.35, target_bucket=50)
    lsh = embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", dim=64, min_cosine=0.35,
        bits=bits, tables=tables).select("a", "b")
    sub = _md5_audit_subset(emb, n)
    exact_sub = tracked_persist(
        embedding_near_dup_pairs(sub, "vec_id", "embedding", min_cosine=0.35))
    rc = _coverage_flag(exact_sub, lsh, ["a", "b"], 0.8, "recall_ok")
    # (-1,-1) sentinel: the flag reaches the driver hash even at a
    # scale where the audit subset holds no qualifying pair (r8)
    return _with_flag_sentinel(exact_sub, rc, "cos")


@register(
    "dedup_ngram_jaccard_prefix",
    oracle=_DUCK_TRIGRAMS + """,
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i
      FROM grams g1 JOIN grams g2 USING (tri)
      WHERE g1.doc_id < g2.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.a = sa.doc_id
    JOIN sizes sb ON inter.b = sb.doc_id
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    """,
    doc="EXACT trigram Jaccard join via PREFIX FILTERING (PPJoin-style, "
        "lossless pruning): index only each doc's |g|-ceil(t|g|)+1 "
        "globally-rarest grams — the stop-gram buckets that skew the "
        "classic inverted index fall out of the join — then verify "
        "candidates exactly with array_intersect over the full gram "
        "arrays.  Same oracle as dedup_ngram_jaccard because the output "
        "is provably identical; the scale win is the candidate count "
        "(pinned by tests/test_dedup_similarity.py).",
)
def q_dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs_prefix

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_prefix(docs, "doc_id", "text", n=3, min_jaccard=0.5)


@register(
    "dedup_tfidf_cosine",
    oracle="""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    w AS (SELECT tf.doc_id, tf.tok, tf.tf * ln(nd.n * 1.0 / dfq.df) AS w
          FROM tf JOIN dfq USING (tok) CROSS JOIN nd
          WHERE dfq.df < nd.n),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS a, b.doc_id AS b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(dot / (na.nn * nb.nn), 6) AS cos
    FROM dots
    JOIN nrm na ON dots.a = na.doc_id
    JOIN nrm nb ON dots.b = nb.doc_id
    WHERE dot / (na.nn * nb.nn) >= 0.9
    """,
    doc="EXACT sparse TF-IDF cosine similarity join: tf*ln(N/df) "
        "weights, idf-0 terms dropped before the inverted-index join "
        "(they add postings but zero signal), inclusion via shared-term "
        "equi-join + norm join.  The sparse-vector twin of "
        "dedup_embedding_cosine with a full SQL oracle.",
)
def q_dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import tfidf_cosine_pairs

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(docs, "doc_id", "text", min_cosine=0.9)


@register(
    "dedup_cluster_representatives",
    oracle="WITH RECURSIVE " + _DUCK_TRIGRAMS.replace("WITH ", "", 1) + """,
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i
      FROM grams g1 JOIN grams g2 USING (tri)
      WHERE g1.doc_id < g2.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a, b FROM inter
      JOIN sizes sa ON inter.a = sa.doc_id
      JOIN sizes sb ON inter.b = sb.doc_id
      WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    ),
    edges AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
    reach(node, lbl) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.v, r.lbl FROM edges e JOIN reach r ON r.node = e.u
    ),
    cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
           FROM reach GROUP BY node),
    base AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
    ),
    sz AS (SELECT cluster_id, count(*) AS cluster_size
           FROM base GROUP BY cluster_id)
    SELECT b.doc_id, b.cluster_id, sz.cluster_size
    FROM base b JOIN sz USING (cluster_id)
    QUALIFY row_number()
        OVER (PARTITION BY b.cluster_id
              ORDER BY b.n_chars DESC, b.doc_id) = 1
    """,
    doc="The deduped CORPUS (the step pairwise dedup exists to feed): one "
        "survivor per trigram-Jaccard>=0.5 connected component — the "
        "longest member (n_chars, min-id tiebreak) — singletons survive as "
        "their own cluster.  cluster_size makes the drop auditable.  "
        "Oracle: recursive reachability + QUALIFY row_number.",
)
def q_dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cluster_representatives

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, min_jaccard=0.5)
    return cluster_representatives(
        docs.select("doc_id", "n_chars"), pairs, "doc_id", "n_chars")


@register(
    "dedup_incremental_batch",
    oracle=_DUCK_TRIGRAMS + """,
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT b.doc_id AS bid, a.doc_id AS aid, count(*) AS i
      FROM grams b JOIN grams a USING (tri)
      WHERE b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
      GROUP BY 1, 2
    ),
    dups AS (
      SELECT DISTINCT bid FROM inter
      JOIN sizes sb ON inter.bid = sb.doc_id
      JOIN sizes sa ON inter.aid = sa.doc_id
      WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT bid FROM dups)
    """,
    doc="Incremental dedup — new snapshot (doc_id%5=0 slice) filtered "
        "against the existing corpus (the rest): keep batch docs with no "
        "corpus trigram-Jaccard>=0.5 near-dup.  The steady-state pipeline "
        "shape: inverted-index join of batch grams x corpus grams, never "
        "batch x corpus pairs, then a left-anti join on matched ids.",
)
def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_filter_against

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return near_dup_filter_against(
        batch, corpus, "doc_id", "text", n=3, min_jaccard=0.5
    ).select("doc_id", "lang", "source")


@register(
    "dedup_incremental_stored_grams",
    oracle=_DUCK_TRIGRAMS + """,
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT b.doc_id AS bid, a.doc_id AS aid, count(*) AS i
      FROM grams b JOIN grams a USING (tri)
      WHERE b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
      GROUP BY 1, 2
    ),
    dups AS (
      SELECT DISTINCT bid FROM inter
      JOIN sizes sb ON inter.bid = sb.doc_id
      JOIN sizes sa ON inter.aid = sa.doc_id
      WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT bid FROM dups)
    """,
    doc="Incremental dedup, STORED-GRAM-TABLE form — the true steady "
        "state: the corpus gram table is written to parquet ONCE per "
        "snapshot and each batch reads it back, so corpus text is never "
        "re-tokenized (the plan's only documents scan is the batch side; "
        "pinned by tests/test_plans.py).  Same rows as "
        "dedup_incremental_batch — only the corpus side's physical source "
        "differs.",
)
def q_dedup_incremental_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.dedup import near_dup_filter_against, word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # One-time gram-table build per (sf, n): in production this is the
    # corpus-snapshot job; here it materializes lazily into a scratch dir.
    path = os.path.join(
        "/tmp/mapreduce_spark_gram_cache",
        f"{os.path.basename(sf_dir.rstrip('/'))}_corpus_trigrams")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (word_ngrams(corpus, "doc_id", "text", n=3)
         .select("doc_id", "ngram").distinct()
         .write.mode("overwrite").parquet(path))
    grams = spark.read.parquet(path)
    return near_dup_filter_against(
        batch, None, "doc_id", "text", n=3, min_jaccard=0.5,
        corpus_grams=grams,
    ).select("doc_id", "lang", "source")


@register(
    "dedup_chunk_signature",
    oracle="""
    WITH chunks AS (
      SELECT DISTINCT doc_id,
             md5(substring(text, CAST(o AS BIGINT), 64)) AS ch
      FROM documents,
           LATERAL (SELECT unnest(range(1, greatest(length(text), 1) + 1, 256)) AS o)
    ),
    shared AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
      FROM chunks a JOIN chunks b ON a.ch = b.ch AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared
    FROM shared WHERE n_shared >= 2
    """,
    doc="Chunk-signature near-dup (the multimodal/binary dedup shape: "
        "fixed-stride chunking + content hashing + inverted-index join "
        "on chunk hash — how large binary corpora are deduped without "
        "ever comparing payloads pairwise).  Chunks here are 64-char "
        "windows every 256 chars of the text column (char-based on both "
        "engines; the binary twin is operators/multimodal.sample_chunks "
        "over payload bytes).  Pairs sharing >= 2 chunk hashes survive.  "
        "Shuffle volume is O(total chunks), never O(docs^2).",
)
def q_dedup_chunk_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    offs = F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(256))
    chunks = (
        docs.select("doc_id", F.explode(offs).alias("o"), "text")
        .select("doc_id", F.md5(F.expr("substring(text, o, 64)").cast("binary")).alias("ch"))
        .distinct()
    )
    a = chunks.select(F.col("doc_id").alias("a"), "ch")
    b = chunks.select(F.col("doc_id").alias("b"), "ch")
    return (
        a.join(b, "ch").filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "dedup_semantic_blocked",
    oracle="""
    WITH dropped AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.3
    )
    SELECT e.vec_id, e.label AS block, (d.vec_id IS NULL) AS kept
    FROM embeddings e LEFT JOIN dropped d USING (vec_id)
    """,
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023), exact variant: "
        "pairwise cosine restricted to same-block pairs (block = the label "
        "column standing in for a cluster id), min-id survivor per dup "
        "group.  Pair volume is sum(block^2), never corpus^2 — the "
        "blocking IS the scale story.  Hash-oracled end to end; the "
        "k-means-blocked production shape is dedup_semantic_kmeans.",
)
def q_dedup_semantic_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.semantic import semantic_dedup_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_blocked(emb, "vec_id", "embedding",
                                  "label", min_cosine=0.3)


@register(
    "dedup_semantic_kmeans",
    oracle="""
    WITH k AS (
      SELECT greatest(1, least(50, CAST(50000 // count(*) AS BIGINT))) AS kk
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings, k
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4))::BIGINT
            % 100 < k.kk
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos,
           TRUE AS drop_recall_ok
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 0.0, TRUE
    """,
    doc="SemDeDup proper: seeded k-means (k=8, 3 Lloyd iterations — only "
        "the k x dim centroid matrix reaches the driver) assigns blocks, "
        "then within-block min-id cosine dedup at the same 0.3 threshold. "
        "At 100 TB the fit runs on a sample and assignment is one "
        "embarrassingly-parallel scan; the dedup join shuffles on the "
        "cluster id only.  Graduated to a bounded hash oracle (r7, the "
        "dedup_embedding_lsh idiom): output = the exact cosine pairs "
        "within the deterministic md5 audit subset (adaptive K keeps the "
        "audit ~500 vectors at any corpus size) + in-query "
        "drop_recall_ok = the k-means-blocked dedup dropped >= 40% of "
        "the vectors the audit PROVES must drop (each pair's higher id "
        "has a lower-id >=0.3 neighbor).  Measured drop-recall 0.51 / "
        "0.61 / 0.84 at sf0.001/0.01/0.1 — k=8 blocking legitimately "
        "splits mild-similarity (0.3) pairs across clusters, which is "
        "the recall/throughput trade SemDeDup makes by design; the "
        "survivor-validity invariant (every drop has a qualifying "
        "same-block lower-id mate) stays pinned exactly in "
        "test_semantic_kmeans_dedup_validity.",
)
def q_dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.caching import tracked_persist
    from ..operators.semantic import semantic_dedup_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    sub = _md5_audit_subset(emb, n)
    exact_sub = tracked_persist(
        embedding_near_dup_pairs(sub, "vec_id", "embedding", min_cosine=0.3))
    km = semantic_dedup_kmeans(emb, "vec_id", "embedding",
                               dim=64, min_cosine=0.3)
    dropped = km.filter(~F.col("kept")).select("vec_id")
    # every subset pair's higher id provably has a lower-id neighbor at
    # >= threshold, so a perfect dedup drops it; measure how many the
    # k-means blocking caught
    must_drop = exact_sub.select(F.col("b").alias("vec_id")).distinct()
    rc = _coverage_flag(must_drop, dropped, ["vec_id"], 0.4,
                        "drop_recall_ok")
    # (-1,-1) sentinel: the flag reaches the driver hash even at a
    # scale where the audit subset holds no qualifying pair (r8)
    return _with_flag_sentinel(exact_sub, rc, "cos")


@register(
    "dedup_span_rebuild",
    oracle="""
    WITH toks AS (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
        FROM (SELECT doc_id,
                     string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' ') AS toks
              FROM documents)
      ) WHERE tok <> ''
    ),
    seq AS (SELECT doc_id, tok,
                   row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
            FROM toks),
    chunks AS (
      SELECT doc_id, (rn - 1) // 10 AS chunk_idx,
             string_agg(tok, ' ' ORDER BY rn) AS chunk_text
      FROM seq GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY chunk_text
                                   ORDER BY doc_id, chunk_idx) AS occ
      FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN occ = 1 THEN chunk_text END,
                               ' ' ORDER BY chunk_idx), '') AS text_dedup
    FROM ranked GROUP BY doc_id
    """,
    doc="C4-style duplicate-span removal (Raffel et al. 2020): 10-token "
        "spans that occur more than once in the corpus survive only at "
        "their first occurrence; documents are rebuilt from surviving "
        "spans.  Span generation is zero-shuffle (in-row array slicing); "
        "the whole pipeline is one window + one groupBy — the actual C4 "
        "dedup shape.  Unlike the pairs-producing queries, this one "
        "returns the REWRITTEN corpus.",
)
def q_dedup_span_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import span_dedup_rebuild

    docs = load_table(spark, sf_dir, "documents")
    return span_dedup_rebuild(docs, "doc_id", "text", span_tokens=10)


@register(
    "dedup_source_stats",
    oracle="""
    WITH fp AS (
      SELECT source,
             md5(array_to_string(list_filter(
                 string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' '),
                 t -> t <> ''), ' ')) AS content_fp
      FROM documents
    )
    SELECT source,
           count(*)                                        AS n_docs,
           count(DISTINCT content_fp)                      AS n_uniq,
           CAST(count(*) - count(DISTINCT content_fp) AS BIGINT) AS n_dups,
           round((count(*) - count(DISTINCT content_fp)) * 1.0
                 / count(*), 4)                            AS dup_rate
    FROM fp GROUP BY source
    """,
    doc="Per-source duplication report (the curation dashboard every "
        "crawl pipeline keys mixture decisions on: which domains/feeds "
        "are pasting the same content): exact-dup rate per source via "
        "the normalized content fingerprint.  One scan, one partial-agg "
        "shuffle on source; count(DISTINCT fp) is Catalyst's two-phase "
        "distinct expand, never a driver collect.  The fingerprint is "
        "the SAME normalized-token md5 as text_fingerprint /"
        "pipeline_fingerprint_dedup, so the report composes with the "
        "dedup operators it is sizing.",
)
def q_dedup_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint(docs, "doc_id", "text", keep=["source"])
    return (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("content_md5").alias("n_uniq"),
        )
        .select(
            "source", "n_docs", "n_uniq",
            (F.col("n_docs") - F.col("n_uniq")).alias("n_dups"),
            F.round((F.col("n_docs") - F.col("n_uniq"))
                    / F.col("n_docs"), 4).alias("dup_rate"),
        )
    )


@register(
    "corpus_overlap_sources",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, tok, pos FROM (
        SELECT doc_id, source, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos
        FROM (SELECT doc_id, source,
                     string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' ') AS toks
              FROM documents)
      ) WHERE tok <> ''
    ),
    grams AS (
      SELECT DISTINCT source, tri FROM (
        SELECT source,
               concat_ws(' ', tok, lead(tok,1) OVER w, lead(tok,2) OVER w) AS tri,
               lead(tok,2) OVER w AS _l2
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE _l2 IS NOT NULL
    ),
    sizes AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
    common AS (
      SELECT a.source AS sa, b.source AS sb, count(*) AS c
      FROM grams a JOIN grams b ON a.tri = b.tri AND a.source < b.source
      GROUP BY 1, 2
    ),
    fp AS (
      SELECT DISTINCT source,
             md5(array_to_string(list_filter(
                 string_split(lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')), ' '),
                 t -> t <> ''), ' ')) AS fpp
      FROM documents
    ),
    fcommon AS (
      SELECT a.source AS sa, b.source AS sb, count(*) AS c
      FROM fp a JOIN fp b ON a.fpp = b.fpp AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT sa.source AS src_a, sb.source AS src_b,
           sa.n AS n_grams_a, sb.n AS n_grams_b,
           CAST(COALESCE(common.c, 0) AS BIGINT) AS n_common_grams,
           round(COALESCE(common.c, 0) * 1.0
                 / (sa.n + sb.n - COALESCE(common.c, 0)), 6) AS jaccard_grams,
           CAST(COALESCE(fcommon.c, 0) AS BIGINT) AS n_exact_common
    FROM sizes sa JOIN sizes sb ON sa.source < sb.source
    LEFT JOIN common ON common.sa = sa.source AND common.sb = sb.source
    LEFT JOIN fcommon ON fcommon.sa = sa.source AND fcommon.sb = sb.source
    """,
    doc="Pairwise SOURCE-overlap matrix (the cross-source contamination "
        "dashboard: which feeds are scraping each other): trigram-set "
        "Jaccard per source pair plus the exact normalized-fingerprint "
        "intersection.  Distinct (source, gram) is a map-side-combinable "
        "aggregate off the zero-shuffle per-row gram window; the gram "
        "self-join is an inverted-index equi-join whose per-gram width "
        "is bounded by the SOURCE count squared (a constant), never the "
        "corpus size — at 100 TB the corpus-frequency cap used by the "
        "PPJoin path applies verbatim to universal stop-grams.  All "
        "source pairs are emitted (zeros included) via a broadcast "
        "cross of the tiny per-source size frame.",
)
def q_corpus_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import word_ngrams
    from ..operators.textstats import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    grams = (word_ngrams(docs, "source", "text", 3)
             .select("source", F.col("ngram").alias("tri")).distinct())
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    common = (
        grams.withColumnRenamed("source", "sa")
        .join(grams.withColumnRenamed("source", "sb"), "tri")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("c"))
    )
    fp = (fingerprint(docs, "doc_id", "text", keep=["source"])
          .select("source", F.col("content_md5").alias("fpp")).distinct())
    fcommon = (
        fp.withColumnRenamed("source", "sa")
        .join(fp.withColumnRenamed("source", "sb"), "fpp")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("fc"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_grams_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_grams_b"))
    pairs = sa.join(F.broadcast(sb), F.col("src_a") < F.col("src_b"))
    return (
        pairs
        .join(F.broadcast(common),
              (F.col("src_a") == F.col("sa")) & (F.col("src_b") == F.col("sb")),
              "left").drop("sa", "sb")
        .join(F.broadcast(fcommon),
              (F.col("src_a") == F.col("sa")) & (F.col("src_b") == F.col("sb")),
              "left").drop("sa", "sb")
        .select(
            "src_a", "src_b", "n_grams_a", "n_grams_b",
            F.coalesce(F.col("c"), F.lit(0)).alias("n_common_grams"),
            F.round(F.coalesce(F.col("c"), F.lit(0))
                    / (F.col("n_grams_a") + F.col("n_grams_b")
                       - F.coalesce(F.col("c"), F.lit(0))), 6).alias("jaccard_grams"),
            F.coalesce(F.col("fc"), F.lit(0)).alias("n_exact_common"),
        )
    )


@register(
    "dedup_containment_overlap",
    oracle=_DUCK_TRIGRAMS + """
    , sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
      FROM grams a JOIN grams b ON a.tri = b.tri AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b,
           round(c * 1.0 / least(sa.sz, sb.sz), 6) AS containment,
           round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
    FROM inter JOIN sizes sa ON inter.a = sa.doc_id
    JOIN sizes sb ON inter.b = sb.doc_id
    WHERE c * 1.0 / least(sa.sz, sb.sz) >= 0.8
    """,
    doc="Asymmetric near-dup detection by n-gram CONTAINMENT (overlap "
        "coefficient |A∩B|/min(|A|,|B|) >= 0.8): catches the "
        "short-doc-quoted-inside-long-doc duplication Jaccard misses "
        "(the union is dominated by the long doc, so J stays low while "
        "containment ~1 — the aggregator-page shape in every crawl).  "
        "Identical inverted-index plan to dedup_ngram_jaccard with one "
        "extra projected column; the containment-sensitive prefix "
        "filter and the stop-gram cap are the same 100 TB escalations.",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text",
                                   n=3, min_containment=0.8)


@register(
    "dedup_minhash_estimate",
    oracle="""
    WITH """ + _DUCK_DOC_SUB + """,
    """ + _duck_char9_jaccard("sub") + """
    SELECT a, b,
           round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard_exact,
           TRUE AS est_within_bound
    FROM inter
    JOIN sz sa ON inter.a = sa.doc_id
    JOIN sz sb ON inter.b = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    """,
    doc="MinHash as an ESTIMATOR, hash-oracled via the bounded-accuracy "
        "convention (same pattern that graduated the HLL/percentile "
        "sketches): for every char-9-shingle pair with true Jaccard >= "
        "0.5, the 64-component signature agreement rate must sit within "
        "0.3 of the exact value (4.8 sigma of the binomial se — the "
        "signatures are fixed-seed deterministic, so this is a hard "
        "regression pin, not a flaky probabilistic test).  Emits the "
        "exact Jaccard plus the in-query bound boolean; a signature "
        "formula regression flips the boolean and breaks the driver "
        "hash.  r8: the truth leg (and the signatures it is checked "
        "against — a doc's signature depends only on its own shingles, "
        "so subsetting changes nothing about the estimator) runs on "
        "the deterministic md5 audit subset: the exact inverted-index "
        "join is the one super-linear stage this query had, and the "
        "audit subset pins the identical per-pair contract at O(1) "
        "cost at ANY corpus size (Spark leg measured 30 s -> ~4 s at "
        "sf0.1).",
)
def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import char_shingles, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    sub = _md5_audit_subset(docs, n, id_col="doc_id")
    # exact truth leg: the shared char-9 Jaccard pipeline (one Spark
    # implementation, one SQL twin — see _char9_jaccard_pairs)
    pairs = _char9_jaccard_pairs(sub, min_jaccard=0.5)
    sigs = minhash_signatures(
        char_shingles(sub, "doc_id", "text", k=9, distinct=False),
        "doc_id", num_hashes=64)
    siga = sigs.select(F.col("doc_id").alias("a"),
                       *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(64)])
    sigb = sigs.select(F.col("doc_id").alias("b"),
                       *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(64)])
    est = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("int") for i in range(64)
    ) / F.lit(64.0)
    return (
        pairs.join(siga, "a").join(sigb, "b")
        .select("a", "b",
                F.round("_j", 6).alias("jaccard_exact"),
                (F.abs(est - F.col("_j")) <= 0.3).alias("est_within_bound"))
    )


@register(
    "dedup_simhash_estimate",
    oracle="""
    WITH """ + _DUCK_DOC_SUB + """,
    """ + _duck_token_cosine("sub") + """
    SELECT dots.a, dots.b,
           round(dots.dot / (na.nn * nb.nn), 6) AS cos_exact,
           TRUE AS est_within_bound
    FROM dots
    JOIN norms na ON dots.a = na.doc_id
    JOIN norms nb ON dots.b = nb.doc_id
    WHERE dots.dot / (na.nn * nb.nn) > 0.9
    """,
    doc="SimHash as an ESTIMATOR, hash-oracled via the bounded-accuracy "
        "convention (the sibling of dedup_minhash_estimate): for every "
        "pair whose exact token-count-vector cosine exceeds 0.9, the "
        "Hamming-implied cosine cos(pi * hamming / 64) must sit within "
        "0.35 of the exact value (measured max deviation 0.177 on the "
        "fixture — 2x headroom; fixed-seed signed projections make the "
        "bound a deterministic regression pin).  Exact cosines use "
        "integer dot products (engine-identical), so the oracle "
        "recomputes them relationally; a projection or bit-packing "
        "regression flips the boolean and breaks the driver hash.  r8: "
        "the truth leg runs on the deterministic md5 audit subset (a "
        "doc's simhash depends only on its own tokens, so subsetting "
        "changes nothing about the estimator) — the all-pairs token "
        "join was this query's one super-linear stage, measured 104 s "
        "of Spark time at sf0.1, and the audit subset pins the "
        "identical per-pair contract at O(1) cost at ANY corpus size "
        "(~5 s); at 100 TB the candidate set comes from the banded "
        "SimHash buckets (dedup_simhash) and this check is its verify "
        "stage.",
)
def q_dedup_simhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.dedup import simhash

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    sub = _md5_audit_subset(docs, n, id_col="doc_id")
    # exact truth leg: the shared token-cosine pipeline (one Spark
    # implementation, one SQL twin — see _token_cosine_pairs)
    pairs = _token_cosine_pairs(sub, min_cosine=0.9)
    sh = simhash(sub, "doc_id", "text")
    sa = sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("_ha"))
    sb = sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("_hb"))
    hd = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    est = F.cos(hd.cast("double") * F.lit(math.pi / 64.0))
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select("a", "b",
                F.round("_cos", 6).alias("cos_exact"),
                (F.abs(est - F.col("_cos")) <= 0.35).alias("est_within_bound"))
    )


@register(
    "dedup_substring_spans",
    oracle="""
    WITH norm AS (SELECT doc_id,
                         lower(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS t
                  FROM documents),
    wins AS (
      SELECT doc_id, pos, substr(t, pos, 20) AS w
      FROM norm, LATERAL unnest(generate_series(1, length(t) - 19, 5)) AS u(pos)
    ),
    dup AS (SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT doc_id, pos FROM wins
             WHERE w IN (SELECT w FROM dup)),
    brk AS (SELECT doc_id, pos,
            CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
                 THEN 0 ELSE 1 END AS b FROM hits),
    grp AS (SELECT doc_id, pos,
            sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM brk),
    spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
              FROM grp GROUP BY doc_id, g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
    FROM spans GROUP BY doc_id
    """,
    doc="Exact duplicated-substring spans (Lee et al. 2022 substring "
        "dedup, the ExactSubstr complement to the MinHash family): "
        "20-char windows at stride 5 over normalized text; windows "
        "verbatim-shared across >= 2 docs merge into per-doc duplicated "
        "spans; output is each doc's span count and duplicated-char "
        "total.  One explode + one window-key groupBy + one semi-join + "
        "a per-doc (doc-length-bounded) merge window — no all-pairs "
        "stage anywhere, so corpus size only ever scales the two "
        "shuffles linearly.",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicate_substring_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_substring_spans(docs, "doc_id", "text",
                                      width=20, stride=5)
    return (spans.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_dup_spans"),
                 F.sum(F.col("span_end") - F.col("span_start") + 1)
                  .alias("dup_chars")))


# Messy-URL synthesis shared by dedup_url_canonical's two sides: the
# documents table has no URL column, so (like scalar_url_functions) a
# deterministic URL is derived from (doc_id, source, lang) — with every
# mess class the canonicalizer must handle injected by doc_id residues:
# uppercase scheme/host, userinfo (user:pw@ — dropped from host AND
# canonical form, r10 ADVICE), a www. label, explicit DEFAULT ports,
# tracking params (utm_* / gclid), a legitimate param that must
# SURVIVE, and fragments.  Docs sharing (source, lang, parity, doc_id%40, %6, %5!=0,
# %3-class) collapse to one canonical URL — real host-level dup mass.
_URL_CANON_ORACLE = """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://'
         || (CASE WHEN doc_id % 7 = 0 THEN 'User:Pw@' ELSE '' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || source || '.Example.COM'
         || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                  WHEN doc_id % 4 = 1 THEN ':80' ELSE '' END)
         || '/' || lang || '/Page' || CAST(doc_id % 40 AS VARCHAR)
         || regexp_replace(
              (CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed&utm_medium=rss'
                    WHEN doc_id % 3 = 1 THEN '&gclid=g' || CAST(doc_id AS VARCHAR)
                    ELSE '' END)
              || (CASE WHEN doc_id % 5 <> 0
                       THEN '&topic=' || CAST(doc_id % 6 AS VARCHAR)
                       ELSE '' END),
              '^&', '?')
         || (CASE WHEN doc_id % 2 = 1
                  THEN '#Sec' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END)
           AS url
  FROM documents
),
comp AS (
  SELECT url,
         lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
         regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
         regexp_extract(nofrag, '\\?(.*)$', 1) AS qs
  FROM (SELECT url, regexp_replace(url, '#.*$', '') AS nofrag FROM u)
),
norm AS (
  SELECT url, scheme, raw_path, qs,
         regexp_replace(lower(regexp_replace(
             regexp_replace(hostport, '^[^@]*@', ''), ':[0-9]+$', '')),
                        '^www\\.', '') AS host,
         regexp_extract(regexp_replace(hostport, '^[^@]*@', ''),
                        ':([0-9]+)$', 1) AS port,
         array_to_string(list_sort(list_filter(string_split(qs, '&'),
           x -> x <> '' AND NOT regexp_matches(x,
             '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)='))), '&') AS kept
  FROM comp
),
canon AS (
  SELECT url, host,
         scheme || '://' || host
         || (CASE WHEN port <> ''
                   AND NOT ((scheme = 'https' AND port = '443')
                            OR (scheme = 'http' AND port = '80'))
                  THEN ':' || port ELSE '' END)
         || (CASE WHEN raw_path = '' THEN '/' ELSE raw_path END)
         || (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS curl
  FROM norm
)
SELECT host,
       count(*) AS n_docs,
       count(DISTINCT url) AS n_urls,
       count(DISTINCT curl) AS n_canonical,
       round(1.0 - count(DISTINCT curl) / count(*), 4) AS dup_rate
FROM canon GROUP BY host ORDER BY host
"""


def _synth_url():
    """The messy-URL synthesis expression over (doc_id, source, lang) —
    the Spark twin of _URL_CANON_ORACLE's ``u`` CTE, shared verbatim by
    dedup_url_canonical and dedup_bloom_frontier (pure code motion out
    of the former in r12; the analyzed plan is byte-identical)."""
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    userinfo = F.when(did % 7 == 0, F.lit("User:Pw@")).otherwise(F.lit(""))
    www = F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    port = (F.when(did % 4 == 0, F.lit(":443"))
            .when(did % 4 == 1, F.lit(":80"))
            .otherwise(F.lit("")))
    tracking = (
        F.when(did % 3 == 0, F.lit("&utm_source=feed&utm_medium=rss"))
        .when(did % 3 == 1, F.concat(F.lit("&gclid=g"), did.cast("string")))
        .otherwise(F.lit("")))
    topic = F.when(did % 5 != 0,
                   F.concat(F.lit("&topic="), (did % 6).cast("string"))
                   ).otherwise(F.lit(""))
    query = F.regexp_replace(F.concat(tracking, topic), "^&", "?")
    frag = F.when(did % 2 == 1,
                  F.concat(F.lit("#Sec"), (did % 9).cast("string"))
                  ).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), userinfo, www,
        F.col("source"), F.lit(".Example.COM"),
        port, F.lit("/"), F.col("lang"), F.lit("/Page"),
        (did % 40).cast("string"), query, frag)


@register(
    "dedup_url_canonical",
    oracle=_URL_CANON_ORACLE,
    doc="URL canonicalization + host-level dedup stats (the standard "
        "web-corpus curation step upstream of every dedup family here: "
        "CommonCrawl-style pipelines dedup BY canonical URL before any "
        "content pass): lowercase scheme/host, strip www., default "
        "ports, fragments and tracking params (utm_*/gclid/fbclid/ref), "
        "SORT surviving params, then per-host doc counts, distinct raw "
        "vs canonical URL counts and the dup rate.  Pure regexp/"
        "higher-order-function column expressions "
        "(functions/urlfn.py) — whole-stage codegen, no UDF; the agg "
        "is one hash shuffle on ~|hosts| groups, so at 100 TB the "
        "canonicalizer rides the scan for free and the shuffle carries "
        "only (host, url-hash) pairs.  URLs are synthesized "
        "deterministically from (doc_id, source, lang) exactly like "
        "scalar_url_functions (no URL column in the fixture).",
)
def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urlfn import canonicalize_url, url_host

    url = _synth_url()
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        url.alias("url")
    ).select(
        "url",
        url_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("curl"),
    )
    # Pre-group by (host, url, curl) instead of two countDistinct on
    # (host): url DETERMINES curl, so after this agg `url` is distinct
    # and n_canonical is the ONE remaining distinct — Spark plans a
    # single-distinct agg without the Expand node that double-distinct
    # costs (plan-audited: the naive form tripled every scanned row
    # via Expand before the first shuffle; this form's map-side
    # partial agg collapses duplicate URLs before any shuffle, so at
    # 100 TB shuffle 1 carries one row per distinct URL, not 3x rows).
    per_url = (c.groupBy("host", "url", "curl")
               .agg(F.count(F.lit(1)).alias("_n")))
    return (per_url.groupBy("host")
            .agg(F.sum("_n").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("curl").alias("n_canonical"))
            .select("host", "n_docs", "n_urls", "n_canonical",
                    F.round(F.lit(1.0) - F.col("n_canonical") / F.col("n_docs"),
                            4).alias("dup_rate"))
            .orderBy("host"))


# dedup_bloom_frontier's oracle: the synthesis + canonicalization CTEs
# mirror _URL_CANON_ORACLE term-for-term with doc_id carried through
# (the split predicate needs it), then the EXACT anti-join — correct as
# an oracle for the Bloom-prefiltered path because the Bloom leg has no
# false negatives and its false positives are re-checked exactly, so
# the outputs are equal by construction, not approximately.  The
# doc_id%7 split is deliberately coprime to every curl-determining
# residue (source, lang, %2 scheme, %40 path, %5/%6 topic), so the
# incoming batch contains BOTH seen and unseen canonical URLs at every
# SF (a %10 split would correlate with Page(doc_id%40) and make the
# overlap empty — measured before choosing).
_BLOOM_FRONTIER_M = 4096   # bits (64 words); history distinct curls are
_BLOOM_FRONTIER_K = 5      # O(100): bound FPR ~2% at n=515 (sf0.1)
_BLOOM_FRONTIER_ORACLE = f"""
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://'
         || (CASE WHEN doc_id % 7 = 0 THEN 'User:Pw@' ELSE '' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || source || '.Example.COM'
         || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                  WHEN doc_id % 4 = 1 THEN ':80' ELSE '' END)
         || '/' || lang || '/Page' || CAST(doc_id % 40 AS VARCHAR)
         || regexp_replace(
              (CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed&utm_medium=rss'
                    WHEN doc_id % 3 = 1 THEN '&gclid=g' || CAST(doc_id AS VARCHAR)
                    ELSE '' END)
              || (CASE WHEN doc_id % 5 <> 0
                       THEN '&topic=' || CAST(doc_id % 6 AS VARCHAR)
                       ELSE '' END),
              '^&', '?')
         || (CASE WHEN doc_id % 2 = 1
                  THEN '#Sec' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END)
           AS url
  FROM documents
),
comp AS (
  SELECT doc_id, url,
         lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
         regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
         regexp_extract(nofrag, '\\?(.*)$', 1) AS qs
  FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM u)
),
norm AS (
  SELECT doc_id, url, scheme, raw_path, qs,
         regexp_replace(lower(regexp_replace(
             regexp_replace(hostport, '^[^@]*@', ''), ':[0-9]+$', '')),
                        '^www\\.', '') AS host,
         regexp_extract(regexp_replace(hostport, '^[^@]*@', ''),
                        ':([0-9]+)$', 1) AS port,
         array_to_string(list_sort(list_filter(string_split(qs, '&'),
           x -> x <> '' AND NOT regexp_matches(x,
             '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)='))), '&') AS kept
  FROM comp
),
canon AS (
  SELECT doc_id, host,
         scheme || '://' || host
         || (CASE WHEN port <> ''
                   AND NOT ((scheme = 'https' AND port = '443')
                            OR (scheme = 'http' AND port = '80'))
                  THEN ':' || port ELSE '' END)
         || (CASE WHEN raw_path = '' THEN '/' ELSE raw_path END)
         || (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS curl
  FROM norm
),
hist AS (SELECT DISTINCT curl FROM canon WHERE doc_id % 7 < 5),
nh AS (SELECT count(*) AS n_hist FROM hist),
inc AS (
  SELECT host, curl, count(*) AS n_docs
  FROM canon WHERE doc_id % 7 >= 5 GROUP BY host, curl
),
new_urls AS (
  SELECT i.host, i.curl FROM inc i
  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.curl = i.curl)
)
SELECT inc.host,
       CAST(count(*) AS BIGINT) AS n_incoming_urls,
       CAST(sum(inc.n_docs) AS BIGINT) AS n_incoming_docs,
       CAST(count(*) FILTER (WHERE new_urls.curl IS NOT NULL) AS BIGINT)
         AS n_new_urls,
       CAST(nh.n_hist AS BIGINT) AS n_hist_keys
FROM inc
LEFT JOIN new_urls ON inc.host = new_urls.host AND inc.curl = new_urls.curl
CROSS JOIN nh
GROUP BY inc.host, nh.n_hist
ORDER BY inc.host
"""


@register(
    "dedup_bloom_frontier",
    oracle=_BLOOM_FRONTIER_ORACLE,
    doc="Crawl-frontier seen-URL dedup with a Bloom pre-filter (the "
        "standard crawl/ingest shape): canonical URLs of the history "
        "partition (doc_id%7<5) build a declarative Bloom bitmap (k "
        "hash positions -> bit_or-packed words -> one dense array<long> "
        "row, the same shape Spark's InjectRuntimeFilter builds "
        "internally); the incoming batch (doc_id%7>=5) probes it "
        "MAP-SIDE, and only probe survivors reach the exact recheck — "
        "which runs as history LEFT SEMI broadcast(survivors) then "
        "survivors LEFT ANTI broadcast(confirmed), so nothing "
        "history-sized ever crosses an exchange.  Output equals the "
        "exact anti-join by construction (no false negatives; false "
        "positives re-checked), which is why a plain anti-join oracle "
        "is EXACT, not approximate.  n_hist_keys is the exact "
        "distinct-key count feeding the (1-e^{-kn/m})^k sizing bound "
        "(the bound value itself is pinned in tests, not emitted: a "
        "transcendental in a hash-compared column is the r8 float-"
        "parity class).  Per host: incoming distinct canonical URLs, "
        "incoming doc mass, and how many URLs are genuinely new.",
)
def q_dedup_bloom_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urlfn import canonicalize_url, url_host
    from ..operators.caching import tracked_persist
    from ..operators.joins import bloom_anti_join

    m, k = _BLOOM_FRONTIER_M, _BLOOM_FRONTIER_K
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        F.col("doc_id"), _synth_url().alias("url")
    ).select(
        (F.col("doc_id") % 7 < 5).alias("_is_hist"),
        url_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("curl"),
    )
    # The URL LEDGER: one corpus scan, one map-side-combined shuffle
    # carrying distinct (split, host, curl) rows — the frame a real
    # frontier keeps materialized (a crawl probes its seen-URL ledger,
    # not the raw corpus).  Persisted because FIVE consumers derive
    # from it (bitmap build, semi probe, n_hist, incoming stats, the
    # anti-join left side); without the persist each would re-run the
    # synthesis+canonicalization regexes over the full corpus — the
    # dominant cost (measured 4x scans ~ 4x cost at sf0.1).
    ledger = tracked_persist(
        c.groupBy("_is_hist", "host", "curl")
        .agg(F.count(F.lit(1)).alias("_n")))
    history = ledger.filter(F.col("_is_hist")).select("curl")
    incoming = (ledger.filter(~F.col("_is_hist"))
                .select("host", "curl", "_n"))
    new = bloom_anti_join(incoming, history, "curl",
                          num_bits=m, num_hashes=k)
    inc_stats = incoming.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_incoming_urls"),
        F.sum("_n").cast("long").alias("n_incoming_docs"))
    new_stats = new.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_new_urls"))
    # history rows are already distinct per (host, curl); a curl spans
    # exactly one host here (it embeds the host), so count(*) == the
    # distinct-curl count the sizing formula needs.  The column is the
    # EXACT integer input to the (1-e^{-kn/m})^k sizing bound — the
    # bound itself is checked in tests/test_properties.py
    # (test_bloom_frontier_fpr_sentinel) rather than emitted here: a
    # transcendental round(pow(exp(...)),6) in a hash-compared column
    # is the r8 cross-engine float-parity class (r12 review).
    n_hist = history.agg(F.count(F.lit(1)).cast("long").alias("_nh"))
    return (inc_stats.join(new_stats, "host", "left")
            .crossJoin(F.broadcast(n_hist))
            .select("host", "n_incoming_urls", "n_incoming_docs",
                    F.coalesce(F.col("n_new_urls"), F.lit(0).cast("long"))
                     .alias("n_new_urls"),
                    F.col("_nh").alias("n_hist_keys"))
            .orderBy("host"))


_BLOOM_ROLLING_LOOKBACK = 7   # trailing window, days
_BLOOM_ROLLING_M = 1 << 14    # bits/window (256 words); sf0.1 peaks at
_BLOOM_ROLLING_K = 4          # ~O(10^3) keys/window -> FPR a few %


_BLOOM_FRONTIER_ROLLING_ORACLE = f"""
WITH led AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
  WHERE user_id IS NOT NULL
),
new AS (
  SELECT l.d, l.user_id FROM led l
  WHERE NOT EXISTS (
    SELECT 1 FROM led h
    WHERE h.user_id = l.user_id
      AND h.d BETWEEN l.d - {_BLOOM_ROLLING_LOOKBACK} AND l.d - 1)
)
SELECT l.d AS day,
       CAST(count(*) AS BIGINT) AS n_active_users,
       CAST(count(n.user_id) AS BIGINT) AS n_new_users
FROM led l
LEFT JOIN new n ON l.d = n.d AND l.user_id = n.user_id
GROUP BY l.d ORDER BY l.d
"""


@register(
    "dedup_bloom_frontier_rolling",
    oracle=_BLOOM_FRONTIER_ROLLING_ORACLE,
    doc="Rolling-history frontier dedup (r12 VERDICT item 5 — the "
        "incremental-crawl shape the static dedup_bloom_frontier "
        "can't express): per ingest day, how many keys are NEW "
        "relative to the trailing 7 days, not all history.  The "
        "(day, user_id) sighting ledger — ONE distinct pass over "
        "events — feeds bloom_anti_join_rolling: per-DAY sparse Bloom "
        "bitmaps built in one groupBy(day, word) bit_or pass whose "
        "exchange carries word partials (never a ledger row), each "
        "day's trailing bitmap merged from its 7 predecessors via a "
        "range self-join of the |days|-row bitmap frame, probes "
        "map-side against the broadcast trailing bitmaps, and only "
        "probe survivors reach the exact recheck (ledger scanned once "
        "against BROADCAST survivor pairs; window residual inside the "
        "broadcast hash join).  Output equals the exact windowed "
        "anti-join by construction — no false negatives, false "
        "positives re-checked — so the plain NOT EXISTS oracle is "
        "EXACT.  The daily new-vs-returning split every crawl/ingest "
        "dashboard runs; history rebuilt per window partition, "
        "nothing history-sized ever shuffles.",
)
def q_dedup_bloom_frontier_rolling(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from ..operators.caching import tracked_persist
    from ..operators.joins import bloom_anti_join_rolling

    ev = load_table(spark, sf_dir, "events")
    # the sighting ledger: one corpus scan, one map-side-combined
    # distinct; persisted because four consumers derive from it (the
    # per-day bitmaps, the probe left side, the recheck history, and
    # the per-day activity stats)
    led = tracked_persist(
        ev.where(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id").distinct()
        .withColumn("_d", F.datediff(
            F.col("day"), F.lit("1970-01-01").cast("date"))))
    new = bloom_anti_join_rolling(
        led, "user_id", "_d", _BLOOM_ROLLING_LOOKBACK,
        num_bits=_BLOOM_ROLLING_M, num_hashes=_BLOOM_ROLLING_K)
    stats = led.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active_users"))
    new_stats = new.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new_users"))
    # |days|-row frames: broadcast keeps the whole query free of
    # sort-merge/shuffled-hash joins (plan-pinned)
    return (stats.join(F.broadcast(new_stats), "day", "left")
            .select("day", "n_active_users",
                    F.coalesce(F.col("n_new_users"), F.lit(0).cast("long"))
                     .alias("n_new_users"))
            .orderBy("day"))


_CDC_BUCKETS = 8  # boundary where trigram-window hash % 8 == 0 -> ~8-token chunks


# CDC chunk table as composable DuckDB CTEs (doc_id, source, chunk_id,
# ch, n_tok) — shared by the chunk-stats and duplicate-mass oracles so
# the boundary rule exists in exactly one SQL form (the r13-review
# composition discipline).
_CDC_CHUNKS_CTES = f"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(regexp_replace(text,
                 '[^A-Za-z ]', '', 'g')), ' '), t -> t <> '') AS toks
      FROM documents
    ),
    pos AS (
      SELECT doc_id, source, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS i
      FROM tok
    ),
    flagged AS (
      SELECT doc_id, source, tok, i,
             CASE WHEN i = 1 THEN 1
                  WHEN i >= 4 AND
                       ('0x' || substr(md5(lag(tok, 3) OVER w || ' ' ||
                                           lag(tok, 2) OVER w || ' ' ||
                                           lag(tok, 1) OVER w), 1, 4))::BIGINT
                       % {_CDC_BUCKETS} = 0 THEN 1
                  ELSE 0 END AS new_chunk
      FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    assigned AS (
      SELECT doc_id, source, tok, i,
             sum(new_chunk) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS UNBOUNDED PRECEDING) AS chunk_id
      FROM flagged
    ),
    chunks AS (
      SELECT doc_id, source, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY i)) AS ch,
             count(*) AS n_tok
      FROM assigned GROUP BY doc_id, source, chunk_id
    )"""


@register(
    "dedup_chunks_content_defined",
    oracle=_CDC_CHUNKS_CTES + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT ch) AS BIGINT) AS n_distinct_chunks,
           CAST(floor(1000.0 * (count(*) - count(DISTINCT ch))
                      / count(*)) AS INTEGER) AS dup_permille,
           CAST(floor(sum(n_tok) * 1.0 / count(*)) AS BIGINT)
             AS avg_chunk_tokens
    FROM chunks GROUP BY source ORDER BY source
    """,
    doc="CONTENT-DEFINED chunking + chunk-level dedup stats (the "
        "Rabin/FastCDC family — rsync, storage dedup, and incremental "
        "crawl dedup all run on it): a chunk boundary opens wherever "
        "the hash of the PRECEDING 3-token window lands in bucket 0 of "
        f"{_CDC_BUCKETS}, so boundaries are a function of CONTENT, not "
        "offset — an insertion re-chunks only its own neighborhood "
        "while every downstream chunk hash survives, which is exactly "
        "what the fixed-stride dedup_chunk_signature cannot do (one "
        "shifted byte re-hashes every later chunk).  Per source: chunk "
        "count, distinct chunk hashes, duplicate permille (the "
        "chunk-store saving), average chunk tokens (~bucket count by "
        "construction).  Shape: one explode to (doc, token) rows, ONE "
        "per-doc window pass (lag x3 + running boundary sum under a "
        "single exchange keyed on doc_id — the dedup_substring_spans "
        "convention), one (doc, chunk) rollup, one |sources| rollup — "
        "shuffle volume O(tokens), never O(docs^2), and the md5 "
        "boundary rule is identical integer arithmetic in both "
        "engines.",
)
def q_dedup_chunks_content_defined(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from ..operators.dedup import content_defined_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, "doc_id", "text",
                                    buckets=_CDC_BUCKETS,
                                    extra_cols=["source"])
    return (chunks.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.count_distinct("ch").alias("n_distinct_chunks"),
                 F.floor(F.lit(1000.0)
                         * (F.count(F.lit(1)) - F.count_distinct("ch"))
                         / F.count(F.lit(1))).cast("int")
                  .alias("dup_permille"),
                 F.floor(F.sum("n_tok") * F.lit(1.0) / F.count(F.lit(1)))
                  .cast("long").alias("avg_chunk_tokens"))
            .orderBy("source"))


@register(
    "dedup_cdc_duplicate_mass",
    oracle=_CDC_CHUNKS_CTES + """
    , nd AS (
      SELECT ch, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY ch
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(c.n_tok) AS BIGINT) AS token_mass,
           CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(sum(CASE WHEN nd.ndocs >= 2 THEN c.n_tok ELSE 0 END)
                AS BIGINT) AS dup_token_mass,
           CAST(floor(1000.0 * sum(CASE WHEN nd.ndocs >= 2
                                        THEN c.n_tok ELSE 0 END)
                      / greatest(sum(c.n_tok), 1)) AS INTEGER)
             AS dup_mass_permille
    FROM chunks c JOIN nd ON c.ch = nd.ch
    GROUP BY c.source ORDER BY c.source
    """,
    doc="CDC chunk-level duplicate MASS (r13 VERDICT item 5 — the "
        "composition the corpus pipeline actually runs): "
        "content_defined_chunks -> chunk-hash grouping -> per-source "
        "cross-document duplicate-mass stats, the content-defined "
        "analogue of dedup_chunk_signature's fixed-stride rollup.  A "
        "chunk occurrence is DUPLICATE MASS when its hash appears in "
        ">=2 distinct documents — exactly the storage a chunk-store "
        "dedups away and the text a crawl pipeline flags as shared "
        "boilerplate; because boundaries are content-defined, a "
        "SHIFTED duplicate (one token inserted up front) still lands "
        "here, which the fixed-stride path structurally misses "
        "(test_cdc_finds_shifted_duplicate_fixed_stride_misses pins "
        "the head-to-head).  Shape: the CDC chunk pass (one doc-keyed "
        "window exchange, O(tokens)), per-(ch, source) partial "
        "aggregates, ONE window over the |distinct chunks|-sized "
        "frame keyed on ch for the cross-doc count (sum of per-source "
        "distinct-doc partials — doc -> source is functional), then a "
        "|sources| rollup: every exchange after the chunk pass "
        "carries aggregates, never token rows.  Oracle composes the "
        "same _CDC_CHUNKS_CTES as dedup_chunks_content_defined, so "
        "the boundary rule exists in exactly one SQL form.",
)
def q_dedup_cdc_duplicate_mass(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import content_defined_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, "doc_id", "text",
                                    buckets=_CDC_BUCKETS,
                                    extra_cols=["source"])
    # per-(ch, source) partials: one aggregate over the chunk frame;
    # doc -> source is functional, so summing per-source distinct-doc
    # counts over a ch gives the ch's cross-document count exactly
    occ = (chunks.groupBy("ch", "source")
           .agg(F.count(F.lit(1)).alias("_n_occ"),
                F.sum("n_tok").alias("_mass"),
                F.count_distinct("doc_id").alias("_nd_src")))
    nd = F.sum("_nd_src").over(Window.partitionBy("ch"))
    dup = (F.col("_ndocs") >= 2)
    return (occ.withColumn("_ndocs", nd)
            .groupBy("source")
            .agg(F.sum("_n_occ").alias("n_chunks"),
                 F.sum("_mass").alias("token_mass"),
                 F.sum(F.when(dup, F.col("_n_occ")).otherwise(0))
                  .alias("n_dup_chunks"),
                 F.sum(F.when(dup, F.col("_mass")).otherwise(0))
                  .alias("dup_token_mass"),
                 F.floor(F.lit(1000.0)
                         * F.sum(F.when(dup, F.col("_mass")).otherwise(0))
                         / F.greatest(F.sum("_mass"), F.lit(1)))
                  .cast("int").alias("dup_mass_permille"))
            .orderBy("source"))
