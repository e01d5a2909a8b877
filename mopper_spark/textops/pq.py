"""Product quantization (PQ): compressed-domain ANN search.

The second half of the FAISS-style 100 TB ANN design (Jégou, Douze,
Schmid, TPAMI'11 "Product Quantization for Nearest Neighbor Search"):
``ivf.py`` routes a query to ``nprobe/K`` of the corpus; PQ makes the
residual scan CHEAP by replacing each D-dim float vector with M small
integer codes — one per subspace — so a 64-dim float32 corpus (256 B/vec)
becomes M=8 bytes/vec (32×), small enough to keep the whole index in
executor memory at corpus sizes where the raw vectors cannot be.

- **Train** (:func:`pq_train`): split each vector into M contiguous
  subvectors and k-means each subspace independently (reusing the proven
  fixed-point :func:`ivf.kmeans_train` — same integer-exact, partitioning-
  proof Lloyd kernel).  M driver-loop trainings, each over the (usually
  sampled) training set; codebooks are M·K·(D/M) floats — driver-tiny,
  always the broadcast side.
- **Encode** (:func:`pq_encode`): one narrow broadcast pass over the
  corpus — per (vector, subspace) the argmin codebook entry by fixed-point
  squared L2, ties to the smallest code; codes collected into an M-array.
  This is the only corpus-sized job, and it is a single stage.
- **Search** (:func:`pq_adc_topk`): asymmetric distance computation — the
  query is NOT quantized; per query a (M × K) fixed-point distance table
  between its subvectors and the codebook is built (tiny, broadcast), and
  a corpus vector's approximate distance is the SUM of M table lookups —
  an associative int64 sum, so map-side combinable and strictly
  oracle-able even though the distance itself approximates the true L2.

Everything inherits ``ivf.py``'s exactness contract: distances are
``Σ round(term · S_DIST)`` int64 sums, assignments argmin over integer
``(dist_fp, code)`` tuples — bit-reproducible under any partitioning,
replayable by a single-threaded SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mopper_spark.textops.ivf import S_CENT, _dist_fp_col, kmeans_train


def _check_mdim(m: int, dim: int) -> int:
    if m < 1 or dim < 1 or dim % m != 0:
        raise ValueError(f"pq: dim {dim} must be a positive multiple of m {m}")
    return dim // m


def subvectors(
    vectors: DataFrame,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, sub, svec)`` — each vector split into ``m`` contiguous
    ``dim/m``-dim subvectors, ``sub`` in 0..m-1.  A generated-column
    explode (m rows per vector), still a narrow map."""
    sd = _check_mdim(m, dim)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    subs = F.array(*[F.lit(s) for s in range(m)])
    return v.select(
        "vec_id",
        F.explode(subs).alias("sub"),
        F.col("vec"),
    ).select(
        "vec_id",
        "sub",
        F.slice(F.col("vec"), F.col("sub") * sd + 1, sd).alias("svec"),
    )


def pq_train(
    vectors: DataFrame,
    m: int,
    k: int,
    dim: int,
    max_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the M codebooks: independent fixed-point Lloyd trainings over
    each subspace's subvector table (``ivf.kmeans_train`` — deterministic
    smallest-id seeds, integer-inertia fixpoint stop, deterministic
    re-seeding).  Returns ``(sub, cid, cvec)`` with float centroids.

    Scale shape: M sequential trainings, each with kmeans_train's per-round
    profile (broadcast centroids, one narrow corpus pass, K×(dim/m)-keyed
    reduce).  PQ codebooks are conventionally trained on a SAMPLE (FAISS
    uses ~max(k·39, 10⁴) vectors); pass a ``sample_per_group``/
    ``doc_hash_split`` slice of the corpus here and encode the full corpus
    with the result — training cost is then independent of corpus size.
    """
    sv = subvectors(vectors, m, dim, id_col=id_col, vec_col=vec_col)
    sv = sv.localCheckpoint(eager=False)
    books = []
    for s in range(m):
        sub_tbl = sv.filter(F.col("sub") == s).select(
            "vec_id", F.col("svec").alias("embedding")
        )
        _, cents, _ = kmeans_train(sub_tbl, k, max_iters=max_iters)
        books.append(
            cents.select(
                F.lit(s).cast("int").alias("sub"),
                "cid",
                F.transform(
                    "centroid_fp",
                    lambda x: x / (F.col("n_members") * F.lit(S_CENT)),
                ).alias("cvec"),
            )
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out.localCheckpoint(eager=True)  # M·K rows; cut M training plans


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus: ``(vec_id, codes)`` where ``codes[sub]`` is the
    argmin codebook entry for that subvector (fixed-point squared L2, ties
    to the smallest cid — ivf.assign_vectors' exact contract, per sub).

    One narrow pass: subvector explode (m rows/vector) → broadcast-join the
    M·K codebook → combine-able ``min(struct(dist_fp, cid))`` per
    (vec_id, sub) → per-vector array_sort-by-sub collect.  Shuffle carries
    (vec_id, sub, code) triples only — never the vectors.
    """
    sv = subvectors(vectors, m, dim, id_col=id_col, vec_col=vec_col).select(
        "vec_id", "sub", F.col("svec").alias("vec")
    )
    scored = sv.join(F.broadcast(codebooks), "sub").select(
        "vec_id", "sub", "cid", _dist_fp_col().alias("dist_fp")
    )
    return (
        scored.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("dist_fp", "cid")).alias("b"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", F.col("b.cid").alias("c")))),
                lambda st: st["c"],
            ).alias("codes")
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """ADC top-k over a PQ-coded corpus: ``(query_id, vec_id, adc_fp,
    rank)``, rank 1..k_top per query by ``(adc_fp ASC, vec_id ASC)``;
    self-matches excluded.

    The query stays un-quantized: its (M × K) fixed-point distance table
    vs the codebook is computed once per query (Q·M·K rows — broadcast),
    and each corpus vector costs M integer lookups summed map-side
    (``groupBy(query_id, vec_id).sum`` over the code-explode — the
    combine happens before the shuffle, so the exchange carries one row
    per (query, vector) candidate).

    At 100 TB, don't ADC-scan the whole corpus: pass ``codes`` already
    restricted to IVF-probed candidates (``ivf.assign_vectors`` corpus
    table semi-joined on the query's nprobe nearest cids) — that is
    exactly FAISS's IndexIVFPQ, and it bounds the per-query rank
    partition at ~``nprobe/K`` of the corpus.  The final per-query top-k
    window is spillable and per-query-bounded by that candidate count.
    """
    if m is None:  # infer from the codebook — a driver-tiny table
        m = codebooks.agg(F.max("sub")).collect()[0][0] + 1
    if dim is None:
        dim = queries.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    qsv = subvectors(queries, m, dim, id_col=id_col, vec_col=vec_col).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("svec").alias("vec")
    )
    dtab = qsv.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("cid").alias("code"),
        _dist_fp_col().alias("d_fp"),
    )
    exploded = codes.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )
    cand = (
        exploded.join(F.broadcast(dtab), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d_fp").cast("long").alias("adc_fp"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_fp"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "vec_id", "adc_fp", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    k_top: int = 5,
    nprobe: int = 2,
    m: int | None = None,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS ``IndexIVFPQ`` (Jégou et al. TPAMI'11 §V): coarse IVF
    routing THEN compressed-domain ADC — each query scores only the
    PQ codes of vectors in its ``nprobe`` nearest coarse clusters, and
    each scored vector costs M integer table lookups instead of a D-dim
    float pass.  The two approximations compose: candidate recall from
    IVF (``~nprobe/K`` of the corpus probed), distance fidelity from PQ
    (quantized corpus, exact query) — the recall floor of the
    composition is measured in tests/test_pq.py, never assumed.

    Scale shape: the only corpus-sized inputs are the (already
    materialized, at scale) assignment table and code table; the
    per-query work is candidate-bounded end to end — the (query, vec)
    pair list from the probe join bounds the code explode (×M), the
    broadcast distance-table join, the combine-able ADC sum, and the
    final per-query top-k window.  Nothing query-side ever scans
    unprobed clusters, unlike ``pq_adc_topk`` alone (whole-corpus ADC).

    Returns ``(query_id, vec_id, adc_fp, rank)``, rank 1..k_top per
    query by ``(adc_fp ASC, vec_id ASC)``; self-matches excluded.
    """
    from mopper_spark.textops.ivf import assign_vectors

    if m is None:
        m = codebooks.agg(F.max("sub")).collect()[0][0] + 1
    if dim is None:
        dim = queries.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    ca = assign_vectors(corpus, centroids, id_col, vec_col).select("vec_id", "cid")
    codes = pq_encode(corpus, codebooks, m, dim, id_col=id_col, vec_col=vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("dist_fp", _dist_fp_col())
        .withColumn(
            "pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist_fp", "cid")
            ),
        )
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "cid")
    )
    pairs = (
        probes.join(ca, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    qsv = subvectors(queries, m, dim, id_col=id_col, vec_col=vec_col).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("svec").alias("vec")
    )
    dtab = qsv.join(F.broadcast(codebooks), "sub").select(
        "query_id", "sub", F.col("cid").alias("code"),
        _dist_fp_col().alias("d_fp"),
    )
    cand = (
        pairs.join(codes, "vec_id")
        .select("query_id", "vec_id", F.posexplode("codes").alias("sub", "code"))
        .join(F.broadcast(dtab), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d_fp").cast("long").alias("adc_fp"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_fp"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "vec_id", "adc_fp", "rank")
    )
