"""Node centrality over large graphs: exact multi-source BFS profiles and
the HyperBall register-propagation sketch.

``harmonic_centrality``: exact harmonic centrality (Marchiori & Latora
2000; the centrality Boldi & Vigna recommend for web-scale graphs because
it handles disconnected pairs gracefully — an unreachable node simply
contributes 0, no arbitrary "n" substitute as in closeness).  Exact
all-pairs BFS is O(n·m) work and O(n²) state, so this is the ORACLE-GRADE
variant for bounded cohorts; the 100 TB path is ``hyperball`` below,
which replaces each node's exact ball set with 64 HyperLogLog registers
(Boldi, Rosa & Vigna, "HyperANF"/"HyperBall", WWW'11 / arXiv:1308.2144)
so per-round state is O(n·m_registers) and the per-round update is an
associative max-merge — exactly the mergeable-register discipline of
``textops/sketches.py::hll_registers``.

Determinism: harmonic sums are kept in EXACT fixed-point integers
(``1/d`` becomes ``fp_scale div d``; integer division then integer sum is
associative-safe, the ``pagerank_fixed`` argument), and HyperBall's
registers derive from md5 (engine-portable: DuckDB replays bucket/rho
with ``('0x'||substr(md5(v),…))::BIGINT`` and ``49 - length(bin(w))``),
so BOTH variants are strict-oracle-able — rare for a sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import bfs_distances

# 2^50 — the "all-zeros register" summand of the harmonic denominator,
# shared with textops/sketches.py::hll_summary (registers hold rho of a
# 48-bit word, so 2^(50 - rho) is always an exact int64).
_POW50 = 1 << 50


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_hops: int = 30,
    directed: bool = False,
    fp_scale: int = 10**9,
) -> DataFrame:
    """Exact harmonic centrality + distance profile of every node:
    ``(node, reach, dist_sum, harmonic_fp)`` where ``reach`` is the number
    of nodes at finite distance (≤ max_hops), ``dist_sum`` the sum of
    those distances (closeness denominator), and ``harmonic_fp`` the
    harmonic sum ``Σ 1/d`` in fixed-point (units of ``1/fp_scale``,
    each term rounded down: ``fp_scale div d``).

    Fixed-point keeps the reduction associative-safe (bit-identical under
    any partitioning, and SQL-oracle-able); the quantization error is
    < ``reach / fp_scale`` — at the default scale, 1e-9 per pair.

    Cost: one multi-source BFS seeded at EVERY node — O(n·m) work,
    O(n²) worst-case state.  This is deliberate: it is the exact
    reference for bounded cohorts (and the oracle for ``hyperball``);
    at corpus scale run ``hyperball`` instead and derive centralities
    from the estimated neighborhood function.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    seeds = (
        e.select(F.col("src").alias("origin"))
        .union(e.select(F.col("dst").alias("origin")))
        .distinct()
    )
    dists = bfs_distances(
        e, seeds, max_hops=max_hops, directed=directed
    )
    return (
        dists.groupBy(F.col("origin").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("reach"),
            F.sum("dist").cast("long").alias("dist_sum"),
            F.sum(F.expr(f"CAST({fp_scale} AS BIGINT) div dist"))
            .cast("long")
            .alias("harmonic_fp"),
        )
    )


def _init_registers(nodes: DataFrame) -> DataFrame:
    """(node, bucket, r): the single-element HLL (m=64) of each node's own
    id — bucket from the first 8 md5 bits mod 64, rho from the next 48.
    md5 of the DECIMAL string rendering makes the register word identical
    in Spark and DuckDB (the ``hll_registers`` portability contract)."""
    h = F.md5(F.col("node").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % 64
    w = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(w)))
    return nodes.select(
        "node", bucket.alias("bucket"), rho.cast("int").alias("r")
    )


def hyperball(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    rounds: int = 3,
    directed: bool = False,
    checkpoint_every: int = 4,
) -> DataFrame:
    """HyperBall (Boldi & Vigna): per-node estimate of ``|ball(v, t)|`` —
    the number of nodes within ``rounds`` hops INCLUDING v — from 64
    HyperLogLog registers propagated along edges.

    State is ``(node, bucket, r)`` rows (≤ 64 per node); one round is

        M_t(v) = elementwise-max( M_{t-1}(v), M_{t-1}(u) for u ∈ N(v) )

    i.e. one equi-join edge×state + one (node, bucket) max-aggregate —
    map-side combining, register-count-bounded shuffle rows, NO set
    materialization.  That is the whole trick: the exact ball computation
    is O(n²) state; this is O(64·n) state per round regardless of how
    fast balls grow, which is what makes neighborhood functions /
    centralities feasible on a 100 TB graph.

    Every multi-row reduction is an integer max or an integer sum, so the
    result is bit-reproducible under any partitioning AND replayable by a
    single-threaded SQL engine (strict oracle — unusual for a sketch):
    output ``(node, v_zero, s_fp, est)`` where ``s_fp = Σ_j 2^(50-M[j])``
    in exact int64 (absent registers contribute 2^50) and ``est`` is the
    standard HLL estimate (alpha·m²·2^50/s_fp, linear counting below
    2.5·m when empty registers remain — same branch as ``hll_summary``).

    Estimation error is the HLL bound 1.04/√64 ≈ 13% per node; HyperBall
    applications (effective diameter, harmonic centrality distributions)
    average over nodes, where the error concentrates further.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
    e = e.distinct().localCheckpoint(eager=False)

    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    state = _init_registers(nodes).localCheckpoint(eager=False)
    for t in range(1, rounds + 1):
        # ball(v) absorbs the neighbors' balls: propagate u's registers to
        # v along v→u (we read OUT-neighbors; for undirected e is already
        # symmetrized, for directed this yields the forward ball).
        moved = (
            e.join(state, e["_d"] == state["node"])
            .select(F.col("_s").alias("node"), "bucket", "r")
        )
        state = (
            state.unionAll(moved)
            .groupBy("node", "bucket")
            .agg(F.max("r").alias("r"))
        )
        if t % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)

    m = 64
    alpha = 0.7213 / (1.0 + 1.079 / m)  # same closed form as hll_summary
    summary = state.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - r)"))
        .cast("long")
        .alias("s_present"),
    )
    v_zero = (F.lit(m) - F.col("n_present")).cast("long")
    s_fp = (F.col("s_present") + v_zero * F.lit(_POW50)).cast("long")
    est_raw = (
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(_POW50))
        / F.col("s_fp").cast("double")
    )
    return (
        summary.select(
            "node", v_zero.alias("v_zero"), s_fp.alias("s_fp")
        )
        .withColumn(
            "est",
            F.when(
                (est_raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero").cast("double")),
            ).otherwise(est_raw),
        )
    )


def betweenness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_depth: int = 30,
    directed: bool = False,
    fp_scale: int = 10**9,
) -> DataFrame:
    """Exact betweenness centrality by LEVEL-SYNCHRONOUS Brandes (Brandes,
    J. Math. Sociol. 2001; the level-parallel formulation is the standard
    distributed one — per BFS level, every node's path count / dependency
    is a pure aggregate of the previous level, so each level is one join +
    one reduce instead of Brandes' sequential stack).

    Two phases over ALL sources simultaneously (state keyed by
    ``(origin, node)`` — O(n²) worst case, the deliberate oracle-grade
    cohort variant, same contract as ``harmonic_centrality``):

    1. FORWARD: BFS levels carrying σ, the number of shortest paths —
       ``σ(o,v) = Σ σ(o,u)`` over predecessors u one level up.  Exact
       int64 (requires ``σ_max < 2^63``; path counts explode only on
       dense same-length mesh families — raise-on-overflow would be the
       ANSI mode, here the fixture families are trees+chords).
    2. BACKWARD: dependency accumulation per level, DEEPEST FIRST:
       ``δ(o,u) = Σ_v σ(o,u)·(1 + δ(o,v)) / σ(o,v)`` over successors v
       one level down.  δ is held in FIXED-POINT int64 (units
       ``1/fp_scale``, every term ``(σ_u·(scale + δ_v)) div σ_v``) so the
       reduction is associative-safe and an independent SQL engine
       replays it bit-for-bit — float Brandes is famously partition-
       order-dependent.  Quantization: each div truncates ≤ 1 unit;
       errors compound along ≤ depth levels — ≤ depth·deg/fp_scale
       absolute, 1e-9-grade at the default scale.

    Returns ``(node, bc_fp bigint)`` — ``Σ_{o≠v} δ(o,v)`` in fixed
    point.  For undirected input every unordered pair is counted from
    both endpoints (the classical convention divides by 2 — left to the
    caller so the integer stays exact).

    Overflow bound: ``σ_u·(scale + δ_v) ≤ σ_max·n·scale`` must stay
    below 2^63 — with the default scale, σ_max·n < 9·10^9.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
    e = e.distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # ---- forward: (o, node, d, sigma), level-synchronous
    frontier = nodes.select(
        F.col("node").alias("o"),
        F.col("node"),
        F.lit(0).cast("long").alias("d"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=False)
    acc = frontier
    for dep in range(1, max_depth + 1):
        if frontier.isEmpty():
            break
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .groupBy("o", F.col("_d").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(acc.select("o", "node"), ["o", "node"], "left_anti")
            .withColumn("d", F.lit(dep).cast("long"))
            .select("o", "node", "d", "sigma")
            .localCheckpoint(eager=True)
        )
        frontier = nxt
        acc = acc.unionAll(nxt).localCheckpoint(eager=False)
    acc = acc.localCheckpoint(eager=True)
    d_max = acc.agg(F.max("d")).collect()[0][0] or 0

    # ---- backward: fixed-point dependency per level, deepest first
    scale = F.lit(fp_scale).cast("long")
    delta = None  # (o, node, delta) for levels processed so far
    for dep in range(d_max - 1, -1, -1):
        lev_u = acc.filter(F.col("d") == dep).select("o", "node", "sigma")
        # Rename EVERY lev_v column (including the key "o" -> "vo"): lev_u and
        # lev_v share the `acc` lineage, so an equality between their "o"
        # attributes resolves to the same expression id and Spark warns
        # "trivially true equals predicate 'o == o'" before special-casing the
        # self-join — distinct names make the join condition unambiguous.
        lev_v = acc.filter(F.col("d") == dep + 1).select(
            F.col("o").alias("vo"),
            F.col("node").alias("vn"),
            F.col("sigma").alias("vsigma"),
        )
        if delta is not None:
            lev_v = lev_v.join(
                delta.select(F.col("o").alias("vo"), F.col("node").alias("vn"),
                             F.col("delta").alias("vdelta")),
                ["vo", "vn"],
                "left",
            ).withColumn("vdelta", F.coalesce(F.col("vdelta"), F.lit(0)))
        else:
            lev_v = lev_v.withColumn("vdelta", F.lit(0).cast("long"))
        contrib = (
            lev_u.join(e, lev_u["node"] == e["_s"])
            .join(lev_v, (F.col("_d") == F.col("vn")) & (F.col("o") == F.col("vo")))
            .select(
                F.col("o"),
                lev_u["node"].alias("node"),
                F.expr(f"(sigma * ({fp_scale} + vdelta)) div vsigma").alias("c"),
            )
            .groupBy("o", "node")
            .agg(F.sum("c").cast("long").alias("delta"))
        )
        delta = (
            contrib if delta is None else delta.unionAll(contrib)
        ).localCheckpoint(eager=True)

    if delta is None:
        return nodes.select("node", F.lit(0).cast("long").alias("bc_fp"))
    bc = (
        delta.filter(F.col("o") != F.col("node"))
        .groupBy("node")
        .agg(F.sum("delta").cast("long").alias("bc_fp"))
    )
    return nodes.join(bc, "node", "left").select(
        "node", F.coalesce(F.col("bc_fp"), F.lit(0)).cast("long").alias("bc_fp")
    )
