"""DataFrame-level dedup / similarity operators backing the
``DEDUPLICATE`` and ``SEARCH SIMILAR`` DSL statements.

These are the same algorithms as the oracle-checked queries in
``queries/pipeline.py`` (which remain the correctness gate),
generalized to arbitrary input DataFrames / column names so the DSL
can run them on any registered source. All expressions come from
``operators/textops.py`` — one implementation of each primitive.

Scale notes are on each function; the common rules: the expanded
intermediates (shingle arrays, candidate pair spaces) never shuffle —
each input row crosses the wire at most once (the spread/bucket
shuffle of raw text or vectors), and everything past that is
hash-key equi-joins over slim tuples. Everything stays JVM-side
except where MLlib models are involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from declarativeml_spark.operators.caching import (
    release_checkpoint,
    track_persist,
)

from declarativeml_spark.operators import textops as T


def _sround(c, digits: int = 6):
    """Half-up round in pure IEEE double ops — bit-identical across
    engines and with the oracle-checked queries (see
    ``textops.stable_round``)."""
    p = float(10**digits)
    return F.floor(c * F.lit(p) + F.lit(0.5)).cast("double") / F.lit(p)


def _toks(text_col: str) -> str:
    return T.TOKENS_SPARK.format(text=text_col)


def _shingles(text_col: str) -> str:
    return T.SHINGLES_SPARK.format(toks=_toks(text_col))


def _shingled(df: DataFrame, id_col: str, text_col: str, out: str) -> DataFrame:
    """(doc_id, <out>=shingle array) with a CACHE BOUNDARY between
    tokenize and shingle. Building shingles straight from text lets
    CollapseProject inline the split() into every element_at inside
    the shingle lambda, and HOF projections evaluate interpreted (no
    codegen → no common-subexpression elimination) — the text
    re-splits 3x per shingle, quadratic per row. Persisting the token
    arrays first makes element_at an O(1) access into a materialized
    column. Callers own the returned (persisted) frame's lifecycle
    via the tracking scope, same as any track_persist frame."""
    toked = df.select(
        F.col(id_col).alias("doc_id"), F.expr(_toks(text_col)).alias("toks")
    ).transform(track_persist)
    return toked.select(
        "doc_id", F.expr(T.SHINGLES_SPARK.format(toks="toks")).alias(out)
    )


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fingerprint groups: md5 of normalized text, min id canonical.

    Scale: shuffles 16-byte fingerprints only.
    """
    return (
        df.withColumn("fingerprint", F.expr(T.FINGERPRINT_SPARK.format(text=text_col)))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-row 16-bit SimHash (shuffle-free; one md5 per distinct
    token via a materialized hex4-prefix column — inlining the hash
    into the 16 per-bit votes re-hashed every token 64x)."""
    hexed = df.select(
        id_col,
        F.expr(T.HEX4_SPARK.format(toks=_toks(text_col))).alias("__hex4"),
    )
    return hexed.select(
        id_col,
        F.expr(T.simhash_spark("__hex4")).cast("long").alias("simhash"),
    )


def simhash64_quarters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-row 64-bit SimHash as four 16-bit quarter columns
    ``q0``…``q3`` (shuffle-free map; one md5 per distinct token via a
    precomputed hex-prefix array). The deployment-width sibling of
    :func:`simhash_signatures` — quarters double as the Hamming-ball
    pigeonhole bands (radius 3 → 4 bands) and reassemble into a
    signed BIGINT via ``textops.simhash64_sig_from_quarters``."""
    hexes = T.HEX64_SPARK.format(toks=_toks(text_col))
    return df.select(
        id_col, F.expr(hexes).alias("hx")
    ).select(
        id_col,
        *[
            F.expr(T.simhash64_quarter("hx", q, "spark"))
            .cast("int")
            .alias(f"q{q}")
            for q in range(4)
        ],
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_minhash: int = 8,
    bands: int = 4,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → minhash → band-bucket
    equi-join → exact Jaccard verify ≥ threshold.

    Scale: the candidate join shuffles (band_idx, band_key, id) only;
    shingle sets join back just for the candidate set. Skewed band
    keys (boilerplate) are handled by AQE skew-join.
    """
    if n_minhash % bands:
        raise ValueError("n_minhash must be divisible by bands")
    rows_per_band = n_minhash // bands
    from declarativeml_spark.operators.skew import spread_partitions

    # spread the raw (id, text) rows and derive shingles AFTER the
    # shuffle — the shingle arrays are ~3x the text volume and should
    # never cross the wire
    # group md5 arrays feed the slice folds so each shingle is md5'd
    # once per GROUP of 4 minhash tables, not once per table.
    # r11: the n_minhash per-slice array_min FOLDS (shingle-
    # proportional) and the band concats are computed INTO the
    # persisted plane — the former shape persisted the raw md5
    # arrays and re-ran all n_minhash folds on EACH side of the band
    # self-join (2x the signature CPU; measured 1.44s of the 128-hash
    # query's 3.6s warm wall), and cached shingle-proportional hash
    # arrays where doc-proportional band keys suffice
    n_groups = (n_minhash + 3) // 4
    sh = (
        _shingled(
            spread_partitions(
                df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            ),
            "doc_id",
            text_col,
            "shingles",
        )
        .select(
            "doc_id",
            "shingles",
            *[
                F.expr(T.minhash_md5_group_spark("shingles", g)).alias(f"mhg{g}")
                for g in range(n_groups)
            ],
        )
        .select(
            "doc_id",
            "shingles",
            *[
                F.expr(T.minhash_slice_spark(f"mhg{k // 4}", k % 4)).alias(f"mh{k}")
                for k in range(n_minhash)
            ],
        )
        .select(
            "doc_id",
            "shingles",
            *[
                F.concat(
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias(f"bk{b}")
                for b in range(bands)
            ],
        )
        .transform(track_persist)
    )
    bands_df = sh.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"bk{b}") for b in range(bands)])
        ).alias("band_idx", "band_key"),
    )
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = _sround(inter.cast("double") / (F.size("sa") + F.size("sb") - inter))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _guard_block_sizes(
    df: DataFrame, block_cols: list[str], max_block_rows: int
) -> None:
    """Refuse all-pairs blocks that would explode quadratically.

    Driver-side read of per-block counts (one row per block — bounded
    by block-key cardinality, not data size). Raising beats silently
    launching an O(block²) stage that would never finish at scale.
    """
    top = (
        df.groupBy(*block_cols)
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()
    )
    if top and top[0]["count"] > max_block_rows:
        key = {c: top[0][c] for c in block_cols}
        raise ValueError(
            f"block {key} has {top[0]['count']} rows (> max_block_rows="
            f"{max_block_rows}): all-pairs within this block is "
            "quadratic. Use the candidate-gated default (method="
            "'minhash'/'lsh') or raise max_block_rows explicitly."
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.15,
    method: str = "minhash",
    n_minhash: int = 8,
    block_by: list[str] | None = None,
    max_block_rows: int = 20_000,
) -> DataFrame:
    """N-gram Jaccard pairs ≥ threshold, with exact Jaccard as the
    VERIFY step over candidate pairs — never an unbounded all-pairs.

    ``method='minhash'`` (default, the 100 TB path): candidates are
    pairs sharing ANY of ``n_minhash`` md5-minhashes (n tables × 1
    row — single-hash buckets keep recall usable at low thresholds:
    P(candidate) = 1-(1-J)^n ≈ 73% at J=0.15, n=8, vs 8.7% for 4×2
    banding). The pair space is Σ bucket² over minhash-value buckets —
    docs sharing a rare shingle — not Σ block² over corpus-linear
    blocks. Exact Jaccard over xxhash64'd shingle sets (Jaccard
    depends only on set sizes, which hashing preserves) then verifies
    every candidate. Hot buckets (boilerplate shingles) are AQE
    skew-join territory.

    ``method='block'``: the legacy all-pairs within ``block_by``
    (default (source, lang)) — O(block²), refuses blocks over
    ``max_block_rows`` so it stays an explicitly small-block tool.
    """
    from declarativeml_spark.operators.skew import spread_partitions

    if method == "block":
        block_by = block_by or ["source", "lang"]
        sh = (
            spread_partitions(
                df.select(F.col(id_col).alias("doc_id"), *block_by, F.col(text_col))
            )
            .select(
                "doc_id",
                *block_by,
                F.expr(f"transform({_shingles(text_col)}, s -> xxhash64(s))").alias(
                    "shingles"
                ),
            )
            .transform(track_persist)
        )
        _guard_block_sizes(sh, block_by, max_block_rows)
        a = sh.select(
            F.col("doc_id").alias("id_a"), *block_by, F.col("shingles").alias("sa")
        )
        b = sh.select(
            F.col("doc_id").alias("id_b"), *block_by, F.col("shingles").alias("sb")
        )
        inter = F.size(F.array_intersect("sa", "sb"))
        jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
        return (
            a.join(b, block_by)
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(jac >= threshold)
            .select("id_a", "id_b", _sround(jac).alias("jaccard"))
        )
    if method != "minhash":
        raise ValueError(f"unknown ngram_jaccard method: {method!r}")

    # candidate-gated default: spread raw text, shingle AFTER the
    # shuffle (see minhash_pairs), derive both the string shingles
    # (minhash input) and the hashed sets (verify input) in one pass
    n_groups = (n_minhash + 3) // 4
    sh = (
        _shingled(
            spread_partitions(
                df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            ),
            "doc_id",
            text_col,
            "sh_str",
        )
        .select(
            "doc_id",
            F.expr("transform(sh_str, s -> xxhash64(s))").alias("shingles"),
            # one salted md5 per shingle per GROUP of 4 minhash tables
            *[
                F.expr(T.minhash_md5_group_spark("sh_str", g)).alias(f"mhg{g}")
                for g in range(n_groups)
            ],
        )
        # r11: the per-slice array_min folds (shingle-proportional)
        # are computed INTO the persisted plane — the former shape
        # cached the raw md5 arrays and re-ran every fold on EACH
        # side of the band self-join (the minhash_pairs fix, applied
        # to the single-hash-bucket gate identically)
        .select(
            "doc_id",
            "shingles",
            *[
                F.expr(T.minhash_slice_spark(f"mhg{k // 4}", k % 4)).alias(
                    f"mh{k}"
                )
                for k in range(n_minhash)
            ],
        )
        .transform(track_persist)
    )
    sigs = sh.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"mh{k}") for k in range(n_minhash)])
        ).alias("band_idx", "band_key"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", _sround(jac).alias("jaccard"))
    )


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


def embedding_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    method: str = "lsh",
    block_by: str = "label",
    bucket_length: float = 0.25,
    num_hash_tables: int = 6,
    projs_per_table: int = 6,
    seed: int = 42,
    dim: int | None = None,
    max_block_rows: int = 20_000,
) -> DataFrame:
    """Embedding near-dup pairs: exact cosine ≥ threshold as the
    VERIFY step over candidate pairs.

    ``method='lsh'`` (default, the 100 TB path): candidates come from
    seeded random-projection buckets — the same compound
    AND-amplified (table, key) equi-join as ``lsh_topk_pairs`` — so
    the pair space is Σ bucket² over distance-local buckets, not
    Σ block² over corpus-linear label blocks (a single-projection key
    degenerates to near-all-pairs on unit-norm data; see
    ``_lsh_compound_keys``). Exact cosine verifies every candidate
    inside the join stage; only (id, id, cos) tuples survive.
    Deterministic (seeded driver-side projections, left-assoc folds),
    so the result is hash-checkable cross-engine.

    ``method='block'``: the legacy all-pairs within ``block_by`` —
    O(block²), refuses blocks over ``max_block_rows`` so it stays an
    explicitly small-block tool.
    """
    from declarativeml_spark.operators.skew import spread_partitions

    if method == "block":
        base = (
            spread_partitions(
                df.select(
                    F.col(id_col).alias("vec_id"),
                    F.col(block_by).alias("blk"),
                    F.col(vec_col).alias("vec"),
                )
            )
            .withColumn("nrm", F.expr(_NORM.format(a="vec")))
            # zero-norm vectors have no cosine direction; under ANSI
            # (Spark 4 default) they would abort the whole query with
            # DIVIDE_BY_ZERO — excluded here and in every oracle twin
            .filter(F.col("nrm") > 0)
            .transform(track_persist)
        )
        _guard_block_sizes(base, ["blk"], max_block_rows)
        a = base.select(
            F.col("vec_id").alias("id_a"),
            "blk",
            F.col("vec").alias("ea"),
            F.col("nrm").alias("na"),
        )
        b = base.select(
            F.col("vec_id").alias("id_b"),
            "blk",
            F.col("vec").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        cos = F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
        return (
            a.join(b, "blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", _sround(F.col("cosine")).alias("cosine"))
        )
    if method != "lsh":
        raise ValueError(f"unknown embedding_pairs method: {method!r}")

    if dim is None:
        probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is None or probe["d"] is None or probe["d"] < 0:
            raise ValueError(
                f"cannot infer vector dim from {vec_col!r} (empty input or"
                " NULL first vector); pass dim= explicitly"
            )
        dim = int(probe["d"])
    key_cols = _lsh_key_columns(
        dim, bucket_length, num_hash_tables, projs_per_table, seed
    )
    base = (
        spread_partitions(
            df.filter(F.size(F.col(vec_col)) == dim).select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("vec"),
            )
        )
        .withColumn("nrm", F.expr(_NORM.format(a="vec")))
        .filter(F.col("nrm") > 0)  # no cosine direction; ANSI div-by-0
        # the projection folds (num_hash_tables x projs_per_table of
        # them) compute INTO the persisted plane so both sides of the
        # bucket self-join read materialized keys (the minhash
        # band-key materialization recipe) instead of re-running
        # every fold once per side; the cache grows by
        # num_hash_tables short strings per row against the
        # dim-double vector
        .withColumn("bkeys", F.array(*key_cols))
        .transform(track_persist)
    )
    keyed = base.select(
        "vec_id",
        "vec",
        "nrm",
        F.posexplode("bkeys").alias("tbl", "bkey"),
    )
    a = keyed.select(
        F.col("vec_id").alias("id_a"),
        "tbl",
        "bkey",
        F.col("vec").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = keyed.select(
        F.col("vec_id").alias("id_b"),
        "tbl",
        "bkey",
        F.col("vec").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    # exact-cosine verify runs inside the join stage, before the
    # pair-level distinct — the wide candidate space only ever exists
    # as (id, id, cos) tuples. Cosine is bit-identical across a pair's
    # duplicate bucket collisions (same left fold), so distinct-after
    # is safe.
    cos = F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, ["tbl", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", _sround(F.col("cosine")).alias("cosine"))
        .distinct()
    )


def embedding_pairs_oracle_sql(
    threshold: float = 0.35,
    bucket_length: float = 0.25,
    num_hash_tables: int = 6,
    projs_per_table: int = 6,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for ``embedding_pairs(method='lsh')`` — same
    projection constants and left-assoc fold order as the Spark plan,
    so buckets, candidates and cosines are bit-identical."""
    from declarativeml_spark.operators.textops import stable_round

    proj = _lsh_proj_matrix(dim, num_hash_tables * projs_per_table, seed)
    key_exprs = _lsh_compound_keys(
        "vec", proj, bucket_length, num_hash_tables, projs_per_table, "duck"
    )
    keys = ",\n           ".join(
        f"{key_exprs[t]} AS k{t}" for t in range(num_hash_tables)
    )
    case = " ".join(f"WHEN {t} THEN k{t}" for t in range(num_hash_tables))
    values = ",".join(f"({t})" for t in range(num_hash_tables))
    dot = (
        "list_sum(list_transform(list_zip(a.vec, b.vec),"
        " p -> p[1] * p[2]))"
    )
    nrm = "sqrt(list_sum(list_transform({v}, x -> x * x)))"
    cos = f"{dot} / ({nrm.format(v='a.vec')} * {nrm.format(v='b.vec')})"
    return f"""
    WITH base AS (SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS vec
                  FROM {table} WHERE len({vec_col}) = {dim}
                    AND list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                                x -> x * x)) > 0),
    keyed AS (SELECT vec_id, vec,
           {keys}
           FROM base),
    expl AS (SELECT vec_id, t.tbl, CASE t.tbl {case} END AS bkey
             FROM keyed, (VALUES {values}) AS t(tbl)),
    cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
             FROM expl x JOIN expl y
               ON x.tbl = y.tbl AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
    scored AS (SELECT c.id_a, c.id_b, {cos} AS cos
               FROM cand c
               JOIN base a ON a.vec_id = c.id_a
               JOIN base b ON b.vec_id = c.id_b)
    SELECT id_a, id_b, {stable_round('cos', 6)} AS cosine
    FROM scored WHERE cos >= {threshold!r}
    """


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_mod: int = 97,
) -> DataFrame:
    """Brute-force cosine top-k: every ``query_mod``-th vector queries
    the full table.

    Scale: the query set (~1/query_mod of rows) broadcasts; scoring is
    a per-partition map over the corpus; per-query top-k via window.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    base = (
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .withColumn("nrm", F.expr(_NORM.format(a="vec")))
        .filter(F.col("nrm") > 0)  # no cosine direction; ANSI div-by-0
    )
    q = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("vec").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    cos = F.expr(_DOT.format(a="qe", b="vec")) / (F.col("qn") * F.col("nrm"))
    scored = (
        base.crossJoin(broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            _sround(F.col("cos")).alias("cosine"),
            "rnk",
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_mod: int = 97,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """IVF-Flat ANN top-k: seeded KMeans coarse quantizer, probe the
    ``n_probe`` nearest cells per query, exact cosine within probed
    cells.

    Scale: the corpus is scanned once to assign cells (JVM-side model
    transform) and NEVER shuffles for the search itself — the probe
    set (|queries| × n_probe rows, each carrying one query vector)
    broadcasts into the cell-keyed corpus join, so candidate scoring
    is map-side. Only the scored candidates (≈ n_probe/n_cells of the
    corpus per query) shuffle for the per-query top-k window. With
    n_cells ~ √n this is the classic IVF cost: O(n·n_probe/n_cells)
    distance evaluations per query instead of O(n).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    base = (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("nrm", F.expr(_NORM.format(a="vec")))
        .filter(F.col("nrm") > 0)  # no cosine direction; ANSI div-by-0
        .withColumn("mlvec", array_to_vector("vec"))
        # deliberately NOT persisted: caching a VectorUDT column
        # stores deserialized UDT objects on the old-gen heap and
        # measurably GC-poisons every later query in the session
        # (warm LSH runs went 3s -> 47s); the per-iteration re-scan
        # KMeans does instead is cheap and partition-local
    )
    km = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="mlvec",
        predictionCol="cell",
    )
    model = km.fit(base)
    corpus = model.transform(base).select("vec_id", "vec", "nrm", "cell")
    # Centroids are k×dim doubles — driver-side tiny, broadcast back.
    cents = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = df.sparkSession.createDataFrame(cents, "cell INT, cvec ARRAY<DOUBLE>")
    q = corpus.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("vec").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    d2 = F.expr(
        "aggregate(zip_with(qe, cvec, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    wq = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("cell"))
    probes = (
        q.crossJoin(broadcast(cent_df))
        .withColumn("d2", d2)
        .withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= n_probe)
        .select("qid", "qe", "qn", "cell")
    )
    cos = F.expr(_DOT.format(a="qe", b="vec")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        corpus.join(broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            _sround(F.col("cos")).alias("cosine"),
            "rnk",
        )
    )


def _lsh_proj_matrix(dim: int, num_tables: int, seed: int) -> list[list[float]]:
    """Seeded *unit-norm* Gaussian projection directions (driver-side
    constants).

    Normalizing to unit length matches MLlib's
    BucketedRandomProjectionLSH semantics: ``bucket_length`` is then
    calibrated to the data's distance scale, not to ``sqrt(dim)``
    (unnormalized projections make buckets ~8x finer at dim=64 and
    halve recall — measured 48% vs 94% at sf0.01).

    numpy's RandomState stream is stable across platforms, so the
    same (dim, num_tables, seed) always yields the same projections —
    which is what lets the oracle SQL embed them as literals.
    """
    import numpy as np

    rs = np.random.RandomState(seed)
    m = rs.standard_normal((num_tables, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m.tolist()


def _proj_dot_spark(vec_sql: str, weights: list[float]) -> str:
    """Spark-side ``v · w`` with literal weights: sequential left fold
    via ``aggregate(zip_with(...))`` — a codegen loop (stays JIT-able
    at any dim, unlike a fully unrolled sum) whose IEEE fold order
    DuckDB's ``list_sum`` provably matches (see _DOT_S/_DOT_D in
    queries/pipeline.py, hash-checked every round)."""
    lits = ", ".join(repr(w) for w in weights)
    return (
        f"aggregate(zip_with({vec_sql}, array({lits}), (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _proj_dot_duck(vec_sql: str, weights: list[float]) -> str:
    """DuckDB twin of ``_proj_dot_spark`` (same fold order)."""
    lits = ", ".join(repr(w) for w in weights)
    return (
        f"list_sum(list_transform(list_zip({vec_sql}, [{lits}]),"
        " p -> p[1] * p[2]))"
    )


def _lsh_compound_keys(
    vec_sql: str,
    proj: list[list[float]],
    bucket_length: float,
    num_tables: int,
    projs_per_table: int,
    engine: str,
) -> list[str]:
    """One compound bucket-key expression per hash table.

    A SINGLE floor(v·r / w) key over unit-norm data has projection std
    ~1/sqrt(dim) — far narrower than any useful w — so nearly the whole
    corpus lands in one bucket and the "LSH" join degenerates to
    all-pairs (measured at sf0.1: 87% of all pairs as candidates, max
    bucket = half the corpus). Compounding ``projs_per_table``
    projections into one key (AND-amplification) shrinks buckets
    exponentially: k=6, w=0.25, L=6 measured 5.7% candidate pairs, max
    bucket 54/2000, 0.92 recall on planted cos≈0.93 near-dups — the
    production near-dup regime. Table t uses projection rows
    [t*k, (t+1)*k), so Spark and DuckDB agree bucket-for-bucket.

    The key is a ':'-joined string of per-projection floor values —
    the one encoding both engines format identically for BIGINTs.
    """
    dot = _proj_dot_spark if engine == "spark" else _proj_dot_duck
    cast_t = "STRING" if engine == "spark" else "VARCHAR"
    keys = []
    for t in range(num_tables):
        parts = [
            f"CAST(CAST(FLOOR(({dot(vec_sql, proj[t * projs_per_table + j])})"
            f" / {bucket_length!r}) AS BIGINT) AS {cast_t})"
            for j in range(projs_per_table)
        ]
        keys.append("concat_ws(':', " + ", ".join(parts) + ")")
    return keys


_LSH_KEY_COL_CACHE: dict = {}


def _lsh_key_columns(
    dim: int,
    bucket_length: float,
    num_hash_tables: int,
    projs_per_table: int,
    seed: int,
) -> list:
    """Spark-side compound bucket-key Columns for ``vec``, memoized
    per parameter set: each key is an ``F.expr`` over
    ``projs_per_table`` 64-literal projection folds, and parsing the
    36 long expression strings through py4j costs ~0.5 s per call —
    pure plan-construction overhead repeated by every LSH query in a
    session. The parsed Columns are unresolved expression trees
    (bound to no DataFrame or session state), so reuse is safe."""
    key = (dim, bucket_length, num_hash_tables, projs_per_table, seed)
    cols = _LSH_KEY_COL_CACHE.get(key)
    if cols is None:
        proj = _lsh_proj_matrix(dim, num_hash_tables * projs_per_table, seed)
        exprs = _lsh_compound_keys(
            "vec", proj, bucket_length, num_hash_tables, projs_per_table,
            "spark",
        )
        cols = [F.expr(k) for k in exprs]
        _LSH_KEY_COL_CACHE[key] = cols
    return cols


def lsh_topk_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 1.15,
    bucket_length: float = 0.25,
    num_hash_tables: int = 6,
    projs_per_table: int = 6,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed similarity pairs — the ANN scale path, native.

    Random-projection LSH expressed entirely in DataFrame ops: the
    bucket key per table is a compound (AND-amplified) string of
    ``projs_per_table`` ``floor(v·r / bucketLength)`` values with
    seeded projection constants (see ``_lsh_compound_keys`` — a
    single-projection key degenerates to near-all-pairs on unit-norm
    data), candidates come from a (table, key) equi-join, and the
    exact euclidean distance verifies each candidate — no MLlib model
    or UDF.

    Scale: vectors deliberately ride through the bucket join — one
    shuffle of n x num_tables vector rows — so the distance filter
    runs inside the join stage and the (much larger) candidate pair
    space only ever exists as slim (id, id, dist) tuples; shuffling
    slim candidates and re-joining vectors afterwards would move the
    pair space across the wire instead. Coarse/hot bucket keys are
    AQE skew-join territory (enabled in the session). Every fold is
    left-associative, so results are bit-identical across engines
    (hash-checkable against DuckDB).
    """
    keyed = lsh_keyed_index(
        df,
        id_col=id_col,
        vec_col=vec_col,
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
        projs_per_table=projs_per_table,
        seed=seed,
        dim=dim,
    )
    return lsh_pairs_from_index(keyed, threshold=threshold)


def lsh_keyed_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.25,
    num_hash_tables: int = 6,
    projs_per_table: int = 6,
    seed: int = 42,
    dim: int | None = None,
    persist_base: bool = True,
) -> DataFrame:
    """Build stage of the native LSH: the banded bucket table
    (vec_id, vec, tbl, bkey) — one row per (vector, hash table).
    Split out so CREATE INDEX can materialize it once and serve
    repeat searches (engine.py::_create_index).

    ``persist_base=False`` skips the internal persist of the
    pre-explode vector plane — pass it when the CALLER persists (or
    stores) the returned exploded frame itself, as CREATE INDEX does:
    both self-join sides of the search then read the caller's one
    materialization, and the inner cache would only hold a second
    copy of every vector (the r11 advice's double-cache)."""
    if dim is None:
        probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is None or probe["d"] is None or probe["d"] < 0:
            raise ValueError(
                f"cannot infer vector dim from {vec_col!r} (empty input or"
                " NULL first vector); pass dim= explicitly"
            )
        dim = int(probe["d"])
    key_cols = _lsh_key_columns(
        dim, bucket_length, num_hash_tables, projs_per_table, seed
    )
    # rows whose vector length differs from `dim` would fold to a NULL
    # bucket key (silently unjoinable) — and engines disagree on NULL
    # propagation in list folds, so exclude them explicitly up front.
    #
    # spread before persist: when one join side broadcasts, the
    # streaming side's parallelism IS the input partitioning — a
    # single-file corpus would otherwise run every candidate distance
    # in one task (see skew.spread_partitions; measured 15.7s -> 1.4s
    # for the candidate stage at sf0.1).
    from declarativeml_spark.operators.skew import spread_partitions

    base = (
        spread_partitions(
            df.filter(F.size(F.col(vec_col)) == dim).select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("vec"),
            )
        )
        # persisted for the downstream uses (bucket keying on both
        # join sides); released by Spark's LRU — callers running many
        # statements per session can spark.catalog.clearCache().
        # The projection folds (num_hash_tables x projs_per_table)
        # compute INTO the persisted plane (the minhash band-key
        # materialization recipe): both self-join sides read
        # materialized keys instead of re-running every fold once per
        # side. Skipped when the caller persists the exploded frame
        # itself (persist_base=False).
        .withColumn("bkeys", F.array(*key_cols))
        .transform(track_persist if persist_base else (lambda d: d))
    )
    return base.select(
        "vec_id",
        "vec",
        F.posexplode("bkeys").alias("tbl", "bkey"),
    )


def lsh_pairs_from_index(keyed: DataFrame, threshold: float = 1.15) -> DataFrame:
    """Search stage of the native LSH over a prebuilt bucket table:
    candidates from the (tbl, bkey) self-equi-join, verified by exact
    euclidean distance."""
    # The exact-distance filter runs inside the join stage, BEFORE the
    # pair-level distinct — the wide candidate space only ever exists
    # as (id, id, dist) tuples. Distance is bit-identical across a
    # pair's duplicate bucket collisions (same left fold), so
    # distinct-after is safe. Hot/coarse bucket keys are handled by
    # AQE skew-join splitting (enabled in the session), which — unlike
    # manual salting — doesn't replicate the vector-carrying build
    # side and works for any id type.
    a = keyed.select(
        F.col("vec_id").alias("id_a"), "tbl", "bkey", F.col("vec").alias("ea")
    )
    b = keyed.select(
        F.col("vec_id").alias("id_b"), "tbl", "bkey", F.col("vec").alias("eb")
    )
    dist = (
        "SQRT(aggregate(zip_with(ea, eb, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return (
        a.join(b, ["tbl", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.expr(dist))
        .filter(F.col("dist") <= threshold)
        .select("id_a", "id_b", _sround(F.col("dist"), 4).alias("euclidean_dist"))
        .distinct()
    )


def lsh_pairs_oracle_sql(
    threshold: float = 1.15,
    bucket_length: float = 0.25,
    num_hash_tables: int = 6,
    projs_per_table: int = 6,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for ``lsh_topk_pairs`` — same projection
    constants, same left-assoc fold order, so buckets, candidates and
    distances are bit-identical."""
    from declarativeml_spark.operators.textops import stable_round

    proj = _lsh_proj_matrix(dim, num_hash_tables * projs_per_table, seed)
    key_exprs = _lsh_compound_keys(
        "vec", proj, bucket_length, num_hash_tables, projs_per_table, "duck"
    )
    keys = ",\n           ".join(
        f"{key_exprs[t]} AS k{t}" for t in range(num_hash_tables)
    )
    case = " ".join(f"WHEN {t} THEN k{t}" for t in range(num_hash_tables))
    values = ",".join(f"({t})" for t in range(num_hash_tables))
    dist = (
        "SQRT(list_sum(list_transform(list_zip(a.vec, b.vec),"
        " p -> (p[1] - p[2]) * (p[1] - p[2]))))"
    )
    return f"""
    WITH base AS (SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS vec
                  FROM {table} WHERE len({vec_col}) = {dim}),
    keyed AS (SELECT vec_id, vec,
           {keys}
           FROM base),
    expl AS (SELECT vec_id, t.tbl, CASE t.tbl {case} END AS bkey
             FROM keyed, (VALUES {values}) AS t(tbl)),
    cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
             FROM expl x JOIN expl y
               ON x.tbl = y.tbl AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
    scored AS (SELECT c.id_a, c.id_b, {dist} AS dist
               FROM cand c
               JOIN base a ON a.vec_id = c.id_a
               JOIN base b ON b.vec_id = c.id_b)
    SELECT id_a, id_b, {stable_round('dist', 4)} AS euclidean_dist
    FROM scored WHERE dist <= {threshold!r}
    """


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """Near-dup clusters: connected components over a pair graph by
    iterative min-label propagation (each node repeatedly takes the
    smallest label among itself and its neighbours).

    The last mile of every dedup pipeline: pair emitters (minhash,
    simhash, embedding cosine) produce EDGES, but retention decisions
    need one canonical doc per CLUSTER — A~B and B~C must collapse to
    one group even though (A, C) was never emitted as a pair.

    Scale: the classic Pregel-style loop in DataFrame ops. Labels are
    (id, long) pairs — the only shuffled state; vectors/text never
    enter. Rounds are bounded by component diameter, which for
    near-dup clusters is tiny (dup sets are near-cliques, not
    chains); converged typically in 2-4 rounds, detected by counting
    rows whose label changed (type-agnostic: works for string/UUID ids
    too, where a label-sum fixpoint would silently degrade). Each
    round persists its labels and unpersists the previous round's.
    Raises if the fixpoint is not reached within ``max_rounds`` —
    returning split clusters silently would corrupt retention
    decisions downstream.

    Returns (doc_id, cluster_id) for every node appearing in a pair;
    cluster_id is the component's minimum doc_id. Deterministic —
    oracle-checkable against a recursive-CTE transitive closure.
    """
    # persist the pair list first: the forward/reverse union branches
    # would otherwise each execute the (expensive) pair-emitter plan
    p = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).transform(track_persist)
    e_fwd = p.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    e_rev = p.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    edges = e_fwd.union(e_rev).distinct().transform(track_persist)

    lbl = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .transform(track_persist)
    )
    if lbl.limit(1).count() == 0:  # empty graph
        edges.unpersist()
        p.unpersist()
        return lbl.select(F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id"))

    cached = lbl  # the currently-persisted round (released next round)
    converged = False
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(lbl, edges["dst"] == lbl["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        # localCheckpoint BOTH materializes the round and truncates
        # plan lineage to a leaf RDD scan — without it each round's
        # plan embeds every prior round's, and Catalyst re-analyzes a
        # tree that doubles per round (the r3 audit measured 9,580
        # Exchange nodes in the final plan). Values are unchanged, so
        # the oracle hash is preserved; blocks are tiny (id, long)
        # pairs released by the context cleaner.
        # r12: LAZY checkpoint — the `changed` count below is this
        # round's first action, so the checkpoint blocks materialize
        # inside THAT job (local checkpointing piggybacks on the first
        # computation) instead of paying a separate eager job first:
        # one job per round, not two (guide §1.2). The count still
        # runs on the checkpointed frame, so every block exists before
        # the previous generation is released.
        new_lbl = (
            lbl.join(nbr_min, lbl["id"] == nbr_min["src"], "left")
            .select(
                lbl["id"],
                lbl["lbl"].alias("old_lbl"),
                F.least(lbl["lbl"], F.coalesce(nbr_min["nbr_min"], lbl["lbl"])).alias(
                    "lbl"
                ),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_lbl.filter(F.col("lbl") != F.col("old_lbl")).count()
        # round 1's frame is a plain persist; later rounds are local
        # checkpoints whose blocks unpersist() does NOT free — release
        # them explicitly or T rounds hold T label generations
        cached.unpersist()
        release_checkpoint(cached)
        cached = new_lbl
        lbl = new_lbl.select("id", "lbl")
        if changed == 0:
            converged = True
            break

    edges.unpersist()
    p.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds;"
            " the pair graph has a component with diameter >"
            f" {max_rounds} — raise max_rounds"
        )
    return lbl.select(F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id"))


# (applicationId, cache_key, params) → (corpus, cents). The IVF
# family runs the same quantizer three times per bench/driver pass
# (ann_ivf_native, ann_ivf_recall's inner leg); sharing the finished
# frames turns repeats into cache reads. Keyed by applicationId so
# entries die with their session; bounded. CONTRACT: cache_key must
# uniquely identify an IMMUTABLE input (the registered queries pass
# the sf_dir of a read-only parquet table) — the memo cannot see the
# DataFrame's contents, so it is never exposed to the DSL
# (engine.py excludes it from SEARCH SIMILAR's accepted options;
# mutable sources go through CREATE INDEX, whose snapshot semantics
# are explicit).
_NATIVE_CELLS_MEMO: dict = {}
_NATIVE_CELLS_MEMO_CAP = 16

# one broadcastable ROW holding every centroid, and the per-vector
# argmin-over-(d2, cell) assignment against it (lexicographic struct
# compare == ORDER BY d2, cell) — shared by the Lloyd loop
# (native_cells) and the incremental assignment path (assign_cells).
# The row is a function, not a module constant: PySpark 4 Column
# construction needs an active session, which imports must not assume.
def _centroid_row():
    return F.collect_list(F.struct("cell", "cvec")).alias("cs")


_ASSIGN_CELL = (
    "array_min(transform(cs, c -> struct("
    "aggregate(zip_with(vec, c.cvec, (x, y) -> (x - y) * (x - y)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d2,"
    " c.cell AS cell))).cell"
)


def assign_cells(
    df: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Assign vectors to an EXISTING (frozen) quantizer's cells — the
    incremental path of :func:`native_cells`: ``REFRESH INDEX`` routes
    only-new rows here so the snapshot's centroids never move (the
    documented snapshot semantics; a drifted corpus warrants a
    rebuild, not a refresh).

    Scale: one broadcast of the centroid row + a map-only argmin per
    vector — the new rows never shuffle."""
    from declarativeml_spark.operators.skew import spread_partitions

    base = spread_partitions(
        df.filter(F.size(F.col(vec_col)) == dim).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
    )
    return (
        base.crossJoin(F.broadcast(cents.agg(_centroid_row())))
        .select("vec_id", "vec", F.expr(_ASSIGN_CELL).alias("cell"))
        .withColumn("nrm", F.expr(_NORM.format(a="vec")))
    )


def native_cells(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    cache_key: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic coarse quantizer shared by ``ivf_native_topk``
    and ``semdedup``: pinned Lloyd's KMeans (smallest-id init, fixed
    iteration count, DECIMAL(38,12) per-dim means) assigning every
    vector to a cell.

    Returns ``(corpus, cents)`` — ``corpus`` is
    (vec_id, vec, cell, nrm), ``cents`` is (cell, cvec); both are
    persisted via track_persist (callers' downstream plans reference
    each several times). The DuckDB twin is ``native_cells_ctes``.

    Scale: each Lloyd iteration is a broadcast(centroids) map over
    the corpus + one groupBy(cell) agg of ``dim`` decimal sums
    (map-side combinable); the corpus itself never shuffles.

    Known trade (deliberate): the centroids localCheckpoint eagerly,
    so BUILDING the plan executes the (small) Lloyd job — an
    EXPLAIN-only path over an IVF statement pays the quantizer run.
    Without it, every downstream job re-plans the full per-iteration
    broadcast+agg lineage (the 58-exchange ann_ivf_topk plan this
    replaced). Checkpoint blocks are n_cells rows (~KB); outside
    CREATE INDEX (which releases them on DROP) they are left to the
    context cleaner.
    """
    from declarativeml_spark.operators.skew import spread_partitions
    from pyspark.sql import Window

    memo_key = None
    if cache_key is not None:
        memo_key = (
            df.sparkSession.sparkContext.applicationId,
            cache_key, id_col, vec_col, n_cells, n_iters, dim,
        )
        hit = _NATIVE_CELLS_MEMO.get(memo_key)
        if hit is not None:
            # a memo hit must serve a CACHED corpus: the insert-time
            # persist may since have been dropped (LRU eviction, or a
            # stray unpersist from a caller that re-tracked it) —
            # re-persist lazily so downstream jobs repopulate the cache
            # instead of recomputing the assignment per job
            corpus_hit, cents_hit = hit
            sl = corpus_hit.storageLevel
            if not (sl.useMemory or sl.useDisk):
                corpus_hit.persist()
            return corpus_hit, cents_hit

    base = (
        spread_partitions(
            df.filter(F.size(F.col(vec_col)) == dim).select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("vec"),
            )
        )
        .transform(track_persist)
    )
    # init: the n_cells smallest-id vectors. orderBy().limit() plans
    # as TakeOrderedAndProject (no global sort); the ranking window
    # then runs over just n_cells rows.
    w_init = Window.orderBy("vec_id")
    cents = (
        base.orderBy("vec_id")
        .limit(n_cells)
        .withColumn("cell", F.row_number().over(w_init) - 1)
        .select("cell", F.col("vec").alias("cvec"))
    )
    mean_dims = [
        (
            F.expr(f"CAST(SUM(CAST(vec[{i}] AS DECIMAL(38,12))) AS DOUBLE)")
            / F.count("*")
        ).alias(f"m{i}")
        for i in range(dim)
    ]
    # Assignment is argmin over (d2, cell) — computed per row from a
    # single broadcast ROW holding all centroids as an array, via
    # array_min over struct(d2, cell) (lexicographic struct compare ==
    # ORDER BY d2, cell). The previous form crossJoined n_cells rows
    # per vector and ranked with a window partitioned by vec_id, which
    # re-shuffled the whole corpus ONCE PER ITERATION; this form never
    # shuffles the corpus at all — the only movement per iteration is
    # the dim-column decimal agg for the new means (map-side
    # combinable) and one tiny centroid row broadcast back.
    cs = _centroid_row()
    assign = _ASSIGN_CELL
    for _ in range(n_iters):
        assigned = base.crossJoin(F.broadcast(cents.agg(cs))).select(
            "vec_id", "vec", F.expr(assign).alias("cell")
        )
        cents = (
            assigned.groupBy("cell")
            .agg(*mean_dims)
            .select("cell", F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("cvec"))
        )
    # the finished centroids feed several downstream broadcasts
    # (corpus assignment, query probes, the final join's lineage) —
    # an eager localCheckpoint both materializes them AND truncates
    # the n_iters broadcast+agg update chain out of every downstream
    # plan (a plain persist still re-plans the full lineage per job;
    # the checkpointed frame is n_cells rows, so the blocks are a few
    # KB and are left to the context cleaner). The assigned corpus,
    # which multiple join sides reference, keeps a scoped persist.
    cents = cents.coalesce(1).localCheckpoint(eager=True)
    corpus = base.crossJoin(F.broadcast(cents.agg(cs))).select(
        "vec_id", "vec", F.expr(assign).alias("cell")
    ).withColumn("nrm", F.expr(_NORM.format(a="vec")))
    if memo_key is not None:
        # memoized frames must OUTLIVE the statement/bench scope that
        # built them — a plain persist (not track_persist) keeps the
        # corpus out of the scope's release_all, so later memo hits
        # still serve a cached frame
        corpus = corpus.persist()
        if len(_NATIVE_CELLS_MEMO) >= _NATIVE_CELLS_MEMO_CAP:
            # FIFO-evict ONE entry (dicts iterate in insertion order),
            # not the whole memo; unpersist the evictee's corpus — its
            # centroid checkpoint blocks are n_cells rows and are left
            # to the context cleaner (live plans may still read them)
            old_corpus, _old_cents = _NATIVE_CELLS_MEMO.pop(
                next(iter(_NATIVE_CELLS_MEMO))
            )
            try:
                old_corpus.unpersist()
            except Exception:  # noqa: BLE001 — best-effort release
                pass
        _NATIVE_CELLS_MEMO[memo_key] = (corpus, cents)
    else:
        corpus = track_persist(corpus)
    return corpus, cents


def native_cells_ctes(
    n_cells: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "",
) -> tuple[list[str], str]:
    """DuckDB twin of ``native_cells``: the unrolled Lloyd's CTE
    chain ending in a ``{prefix}corpus`` CTE of (vec_id, vec, cell,
    nrm).

    Returns ``(ctes, d2_template)`` — callers append their own
    search/pair CTEs and format ``d2_template`` with ``v=``/``c=``
    for centroid-distance expressions. ``prefix`` namespaces every
    CTE so several independent quantizers (e.g. one per PQ subspace)
    can share one WITH clause.
    """
    d2 = (
        "list_sum(list_transform(list_zip({v}, {c}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    mean_list = ", ".join(
        f"CAST(SUM(CAST(vec[{i + 1}] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)"
        for i in range(dim)
    )
    p = prefix
    ctes = [
        f"{p}base AS (SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS vec"
        f" FROM {table} WHERE len({vec_col}) = {dim})",
        f"{p}c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,"
        f" vec AS cvec FROM {p}base ORDER BY vec_id LIMIT "
        f"{n_cells})",
    ]
    prev = f"{p}c0"
    for it in range(1, n_iters + 1):
        ctes.append(
            f"{p}a{it} AS (SELECT vec_id, vec, cell FROM ("
            f" SELECT b.vec_id, b.vec, c.cell,"
            f" ROW_NUMBER() OVER (PARTITION BY b.vec_id"
            f" ORDER BY {d2.format(v='b.vec', c='c.cvec')}, c.cell) AS rn"
            f" FROM {p}base b CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        ctes.append(
            f"{p}c{it} AS (SELECT cell, [{mean_list}] AS cvec"
            f" FROM {p}a{it} GROUP BY cell)"
        )
        prev = f"{p}c{it}"
    nrm = "sqrt(list_sum(list_transform({v}, x -> x * x)))"
    ctes.append(
        f"{p}corpus AS (SELECT a.vec_id, a.vec, a.cell,"
        f" {nrm.format(v='a.vec')} AS nrm FROM ("
        " SELECT b.vec_id, b.vec, c.cell,"
        " ROW_NUMBER() OVER (PARTITION BY b.vec_id"
        f" ORDER BY {d2.format(v='b.vec', c='c.cvec')}, c.cell) AS rn"
        f" FROM {p}base b CROSS JOIN {prev} c) a WHERE a.rn = 1)"
    )
    return ctes, d2


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_cells: int = 8,
    n_iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings with
    the deterministic coarse quantizer, then inside each cell drop
    every vector that has a smaller-id neighbour with cosine >=
    ``threshold`` (Abbas et al. 2023's cluster-then-prune recipe,
    with keep-lowest-id as the deterministic retention rule).

    Scale: the paper's design point is exactly that the pairwise
    stage is CELL-blocked — k-means cells bound the O(m^2) pair
    space to Σ cell², and cells are sized (corpus/n_cells) by
    construction, unlike corpus-linear label blocks. The cell
    assignment is a broadcast map (native_cells); pairs exist only
    as (id, id) tuples; the keep decision is one anti-join of the
    corpus against the dominated-id list.

    Returns (vec_id, cell, kept) for every in-dim vector —
    hash-checkable via ``native_cells_ctes`` (pinned Lloyd's, exact
    decimal means).
    """
    corpus, _ = native_cells(df, id_col, vec_col, n_cells, n_iters, dim)
    # zero-norm vectors have no cosine: they neither dominate nor get
    # dominated (excluded from the pair space, still reported kept)
    scored_side = corpus.filter(F.col("nrm") > 0)
    a = scored_side.select(
        F.col("vec_id").alias("id_a"),
        "cell",
        F.col("vec").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = scored_side.select(
        F.col("vec_id").alias("id_b"),
        "cell",
        F.col("vec").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    dominated = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias("dom_id"))
        .distinct()
    )
    return (
        corpus.join(dominated, corpus["vec_id"] == dominated["dom_id"], "left")
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("dom_id").isNull().alias("kept"),
        )
    )


def semdedup_oracle_sql(
    threshold: float = 0.35,
    n_cells: int = 8,
    n_iters: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB oracle for ``semdedup`` — same pinned quantizer CTEs,
    same within-cell smaller-id domination rule."""
    ctes, _ = native_cells_ctes(n_cells, n_iters, dim)
    dot = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    ctes.append(
        "dominated AS (SELECT DISTINCT b.vec_id AS dom_id"
        " FROM corpus a JOIN corpus b"
        " ON a.cell = b.cell AND a.vec_id < b.vec_id"
        " AND a.nrm > 0 AND b.nrm > 0"
        f" WHERE {dot.format(a='a.vec', b='b.vec')} / (a.nrm * b.nrm)"
        f" >= {threshold!r})"
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
           d.dom_id IS NULL AS kept
    FROM corpus c LEFT JOIN dominated d ON c.vec_id = d.dom_id
    """


def ivf_native_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_mod: int = 97,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    dim: int = 64,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-Flat ANN with a fully deterministic, engine-portable
    coarse quantizer — the hash-checkable counterpart of ``ivf_topk``.

    Lloyd's KMeans with every nondeterminism pinned: centroids
    initialize to the ``n_cells`` smallest-id vectors; exactly
    ``n_iters`` update steps; per-dimension means go through
    DECIMAL(38,12) (exact, order-independent) before one double
    division, so centroids are bit-identical regardless of shuffle
    order AND across engines; assignment ties break by cell id. The
    iteration count is fixed, so the whole computation is ONE lazy
    DataFrame plan — no driver-side loop, no fitted model object.

    Scale: each iteration is a broadcast(centroids) map + one
    groupBy(cell) agg of 64 decimal sums (map-side combinable); the
    corpus never shuffles for the search itself, matching ivf_topk's
    probe plan. MLlib's KMeans (ivf_topk) remains the scale default —
    k-means|| init converges better on real data; this variant trades
    init quality for cross-engine verifiability.
    """
    from pyspark.sql import Window

    corpus, cents = native_cells(
        df, id_col, vec_col, n_cells, n_iters, dim, cache_key=cache_key
    )
    return ivf_probe_topk(corpus, cents, k=k, query_mod=query_mod, n_probe=n_probe)


def ivf_probe_topk(
    corpus: DataFrame,
    cents: DataFrame,
    k: int = 10,
    query_mod: int = 97,
    n_probe: int = 2,
) -> DataFrame:
    """Search stage of IVF-Flat over a prebuilt quantizer: probe the
    ``n_probe`` nearest cells per query and score exact cosine inside
    them. Split out from :func:`ivf_native_topk` so a CREATE INDEX'd
    (corpus, cents) snapshot serves repeat searches without re-running
    Lloyd's (engine.py::_create_index)."""
    from pyspark.sql import Window

    # zero-norm vectors cluster fine (L2 distance is defined) but
    # have no cosine direction — exclude them from BOTH sides of the
    # scoring (ANSI div-by-0 otherwise), mirrored in the oracle
    corpus = corpus.filter(F.col("nrm") > 0)
    q = corpus.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qe"), F.col("nrm").alias("qn")
    )
    qd2 = (
        "aggregate(zip_with(qe, cvec, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    w_probe = Window.partitionBy("qid").orderBy("qd2", "cell")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qd2", F.expr(qd2))
        .withColumn("cell_rank", F.row_number().over(w_probe))
        .filter(F.col("cell_rank") <= n_probe)
        .select("qid", "qe", "qn", "cell")
    )
    cos = F.expr(_DOT.format(a="qe", b="vec")) / (F.col("qn") * F.col("nrm"))
    w_topk = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w_topk))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            _sround(F.col("cos")).alias("cosine"),
            "rnk",
        )
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar int8 quantization of an embedding column: per-dimension
    global [min, max] ranges, each component mapped to an 8-bit code
    0..255, with per-vector reconstruction MSE. Returns
    (id, q_md5 = md5 of the comma-joined code string, mse).

    Backs the ``QUANTIZE EMBEDDINGS`` DSL statement; the
    oracle-checked twin is queries/pipeline4.py::
    embedding_quantize_int8.

    Scale: pass 1 is a dim-keyed partial agg (shuffle = n_dims ×
    n_partitions tiny rows); the dim→range table broadcasts; the
    per-vector regroup shuffles (id, dim, code) triples. See the
    query docstring for the zip_with fusion that removes the regroup
    at 100 TB.
    """
    qf = (
        "least(255, greatest(0, CAST(floor((v - mn) / (mx - mn) * 255.0 + 0.5)"
        " AS BIGINT)))"
    )
    ex = df.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("dim", "vf")
    ).select("vec_id", "dim", F.col("vf").cast("double").alias("v"))
    mm = ex.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    q = ex.join(F.broadcast(mm), "dim").select(
        "vec_id",
        "dim",
        "v",
        "mn",
        "mx",
        F.when(F.col("mx") > F.col("mn"), F.expr(qf))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("code"),
    )
    recon = F.col("mn") + F.col("code") / F.lit(255.0) * (F.col("mx") - F.col("mn"))
    e = q.select(
        "vec_id",
        "dim",
        "code",
        _sround((F.col("v") - recon) * (F.col("v") - recon), 12).alias("se"),
    )
    codes = F.array_sort(F.collect_list(F.struct("dim", "code")))
    return e.groupBy("vec_id").agg(
        F.md5(
            F.array_join(F.transform(codes, lambda x: x["code"].cast("string")), ",")
        ).alias("q_md5"),
        _sround(
            F.sum(F.col("se").cast("decimal(38,12)")).cast("double") / F.count("*"),
            10,
        ).alias("mse"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_minhash: int = 8,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs: ``c(A⊆B) = |A∩B| / |A|``
    over 3-gram shingle sets, keeping pairs where either direction
    reaches ``threshold`` — the quote/subset detector Jaccard misses
    (a short doc fully copied into a long one has high containment
    but low Jaccard, because the union is dominated by the long doc).

    Candidate gating and verification mirror ``ngram_jaccard_pairs``'
    minhash path (same salted-md5 minhash buckets, same xxhash64'd
    shingle-set verify — containment, like Jaccard, depends only on
    set sizes, which hashing preserves). Gating note: single-hash
    minhash buckets recall by JACCARD, so a containment hit with very
    asymmetric sizes (tiny A inside huge B) has reduced candidate
    probability 1-(1-J)^n with J ≈ |A|/|B|; the scale remedy is
    hashing against the smaller set's signature (containment
    sketches), noted not needed at the tested asymmetries.

    Scale: identical envelope to the Jaccard path — pair space is
    Σ bucket² over shingle-locality buckets, only (id, id) tuples and
    hashed sets move, exact verify inside the join stage.
    """
    from declarativeml_spark.operators.skew import spread_partitions

    n_groups = (n_minhash + 3) // 4
    sh = (
        _shingled(
            spread_partitions(
                df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            ),
            "doc_id",
            text_col,
            "sh_str",
        )
        .select(
            "doc_id",
            F.expr("transform(sh_str, s -> xxhash64(s))").alias("shingles"),
            *[
                F.expr(T.minhash_md5_group_spark("sh_str", g)).alias(f"mhg{g}")
                for g in range(n_groups)
            ],
        )
        # r11: slice folds computed INTO the persisted plane (the
        # minhash_pairs fix — the former shape re-ran every
        # shingle-proportional fold on each band-join side)
        .select(
            "doc_id",
            "shingles",
            *[
                F.expr(T.minhash_slice_spark(f"mhg{k // 4}", k % 4)).alias(
                    f"mh{k}"
                )
                for k in range(n_minhash)
            ],
        )
        .transform(track_persist)
    )
    sigs = sh.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"mh{k}") for k in range(n_minhash)])
        ).alias("band_idx", "band_key"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    c_ab = inter / F.size("sa")
    c_ba = inter / F.size("sb")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.greatest(c_ab, c_ba) >= threshold)
        .select(
            "id_a",
            "id_b",
            _sround(c_ab).alias("containment_a_in_b"),
            _sround(c_ba).alias("containment_b_in_a"),
        )
    )


def threshold_sweep(
    df: DataFrame,
    thresholds: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup threshold calibration curve: pair/doc counts and mean
    Jaccard at each candidate cutoff, from ONE pair materialization
    gated at the lowest threshold. Backs the ``CALIBRATE DEDUP`` DSL
    statement; queries/pipeline8.py::dedup_threshold_sweep is the
    oracle-checked twin.

    Scale: the corpus is scanned once (minhash-gated pair plane); the
    sweep is a broadcast non-equi join of |thresholds| rows against
    the slim (id, id, jaccard) plane.
    """
    if not thresholds:
        raise ValueError("CALIBRATE DEDUP needs at least one threshold")
    for t in thresholds:
        if not isinstance(t, (int, float)) or isinstance(t, bool) or not (
            0.0 < float(t) <= 1.0
        ):
            raise ValueError(
                f"thresholds must be in (0, 1], got {t!r}"
            )
    # set semantics: duplicate thresholds would double-count every
    # pair through the non-equi join (each copy matches separately)
    uniq = sorted({float(t) for t in thresholds})
    gate = uniq[0]
    pairs = track_persist(
        ngram_jaccard_pairs(
            df, id_col=id_col, text_col=text_col, threshold=gate
        )
    )
    thr = df.sparkSession.createDataFrame(
        [(t,) for t in uniq], "threshold double"
    )
    hits = track_persist(
        pairs.join(F.broadcast(thr), F.col("jaccard") >= F.col("threshold"))
    )
    per = hits.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            T.stable_round(
                "CAST(SUM(CAST(jaccard AS DECIMAL(38,12))) AS DOUBLE)"
                " / COUNT(1)",
                8,
            )
        ).alias("avg_jaccard"),
    )
    docs_hit = (
        hits.select(
            "threshold", F.explode(F.array("id_a", "id_b")).alias("d")
        )
        .groupBy("threshold")
        .agg(F.count_distinct("d").cast("long").alias("n_docs"))
    )
    # left joins from the threshold spine: a cutoff no pair reaches
    # still gets its curve row (n_pairs=0) — silently dropping exactly
    # the threshold being evaluated would make "no pairs" look like
    # "not requested"
    return (
        thr.join(per, "threshold", "left")
        .join(docs_hit, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            "avg_jaccard",
        )
    )


def hamming64_quarter_pairs(
    sigs: DataFrame, id_col: str = "doc_id", radius: int = 3
) -> DataFrame:
    """Near-dup pairs over 64-bit signatures stored as four 16-bit
    quarter columns ``q0``…``q3``: pigeonhole band candidates + exact
    Hamming verify — the machinery behind ``dedup_simhash64_hamming``
    (queries/pipeline10.py), factored out so the media aHash query
    reuses it VERBATIM (round-9 verdict ask #3).

    With 4 disjoint 16-bit bands, two signatures within Hamming
    distance r must agree on at least one band only when ``r < 4`` —
    the pigeonhole guarantee this candidate generation rests on —
    so ``radius`` > 3 is refused loudly.

    Returns DISTINCT ``(id_a, id_b, hamming)`` with ``id_a < id_b``
    and ``hamming <= radius``. The exact distance is the sum of the
    four per-quarter ``bit_count(xor)`` terms (quarters are disjoint,
    no BIGINT reassembly), computed INSIDE the join projection and
    filtered BEFORE the pair dedup so the distinct shuffles only the
    in-radius sliver (3 narrow columns), never every band collision.

    Scale: shuffles (band, value, id, quarters) slivers only — never
    all-pairs; 16-bit band values keep bucket cardinality 65536 per
    band; boilerplate-skewed bands fall to AQE's skew-join split.
    Callers persist ``sigs`` when its lineage is expensive (both join
    sides read it; the join strategy breaks exchange reuse).
    """
    if not 0 <= radius <= 3:
        raise ValueError(
            f"hamming64_quarter_pairs: radius {radius} outside [0, 3]"
            " — 4 quarter bands only guarantee candidate completeness"
            " for Hamming radius < 4"
        )
    qcols = [f"q{q}" for q in range(4)]
    bands = sigs.select(
        F.col(id_col).alias("sid"),
        *qcols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(q).alias("b"), F.col(f"q{q}").alias("v"))
                    for q in range(4)
                ]
            )
        ).alias("band"),
    ).select("sid", *qcols, "band.b", "band.v")
    a = bands.alias("a")
    b = bands.alias("b")
    ham = " + ".join(f"bit_count(a.q{q} ^ b.q{q})" for q in range(4))
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.sid") < F.col("b.sid")),
        )
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            F.expr(ham).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= radius)
        .distinct()  # a pair can agree on several quarters
    )
