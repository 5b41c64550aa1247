"""Approximate-nearest-neighbour search over an embedding column.

Brute-force cosine top-k as the exact baseline, and random-hyperplane-LSH
/ IVF bucketed variants as the scale path: at 10^12 rows the cross join
is impossible, but bucketing on sign-bit sketches / nearest-centroid
lists turns it into an equi-join whose buckets are independently joinable
(and AQE-splittable on skew).

Scoring arithmetic (r6): dot products and unit-norms run as
Arrow-batched numpy (einsum over stacked batches) — the earlier
F.aggregate/zip_with HOF forms LOOK JVM-native but execute as
interpreted lambda folds at ~ms/row on 64-wide vectors (the r4
with_lm_score lesson, re-measured here: 10M scored pairs took 75 s HOF
vs ~4 s Arrow).  Cross-engine value semantics are unaffected: every
consumer rounds the cosine (rank_round / ROUND 6dp) before ranking or
emitting, which already absorbs summation-order ulps between Spark and
DuckDB's list_dot_product — numpy's pairwise order sits inside the same
tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


from pyspark.sql.types import ArrayType, DoubleType  # noqa: E402


def _stack(s: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64) for v in s],
                    dtype=np.float64)


# DataType OBJECTS, not DDL strings: a module-level pandas_udf with a
# string return type parses it through the active SparkContext at
# import time and breaks session-less imports.  Both UDFs guard empty
# Arrow batches and propagate NULL inputs as NULL results — the exact
# semantics of the HOF forms they replaced (r6 review: np.einsum on a
# shape-(0,) stack raises, and np.asarray(None) raises TypeError, so an
# unguarded UDF failed the stage on missing embeddings that previously
# flowed through as NULL cosine/unit_vec).
def _scatter(n: int, idx: np.ndarray, vals) -> pd.Series:
    """Object series with vals at idx positions, None elsewhere — an
    explicit loop because pandas/numpy masked assignment refuses lists
    of arrays (putmask length check)."""
    out = [None] * n
    for i, v in zip(idx, vals):
        out[i] = v
    return pd.Series(out, dtype=object)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-normalise, zero rows staying zero (never NaN) — the single
    home of the zero-vector convention (r6 review: it was copy-pasted
    three times)."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


@F.pandas_udf(DoubleType())
def _dot_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype=object)
    mask = (a.notna() & b.notna()).to_numpy()
    if mask.all():                 # hot path: no NULLs, float64 buffer out
        return pd.Series(np.einsum("ij,ij->i", _stack(a), _stack(b)))
    idx = np.nonzero(mask)[0]
    if len(idx) == 0:
        return pd.Series([None] * len(a), dtype=object)
    va = _stack(a.iloc[idx])
    vb = _stack(b.iloc[idx])
    return _scatter(len(a), idx, np.einsum("ij,ij->i", va, vb))


def _dot(a, b):
    return _dot_arrow(a, b)


@F.pandas_udf(ArrayType(DoubleType()))
def _unit_arrow(a: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype=object)
    mask = a.notna().to_numpy()
    if mask.all():                 # hot path: no NULLs
        return pd.Series(list(_unit_rows(_stack(a))))
    idx = np.nonzero(mask)[0]
    if len(idx) == 0:
        return pd.Series([None] * len(a), dtype=object)
    return _scatter(len(a), idx, list(_unit_rows(_stack(a.iloc[idx]))))


def with_unit_norm(df: DataFrame, vec: str = "embedding",
                   out: str = "unit_vec") -> DataFrame:
    return df.withColumn(out, _unit_arrow(F.col(vec)))


def cosine_topk_bruteforce(df: DataFrame, queries: DataFrame,
                           key: str = "vec_id", vec: str = "embedding",
                           k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbours of each query row.

    Scale contract: |queries| small (the query MATRIX broadcasts to every
    task), corpus arbitrarily large — one matmul mapInPandas over corpus
    batches with per-batch partial top-k, so only ~batches x |queries| x k
    candidate rows ever shuffle (never the |corpus| x |queries| pair
    relation: the r6 rewrite — the previous broadcast-join form moved
    every pair's two 64-wide vectors through Arrow and was 10x slower).
    Per-batch selection keeps the kth-largest THRESHOLD with ties (and
    k+1 slots for the self-pair), so the final global window reproduces
    the exact result under any partitioning."""
    sc = df.sparkSession.sparkContext
    qpd = queries.select(F.col(key).alias("query_id"),
                         F.col(vec).alias("qv")) \
        .where(F.col(vec).isNotNull()).toPandas()
    # ADVICE r06: the 'queries small' contract was unenforced — a huge
    # query set silently OOMed the driver instead of failing fast
    if len(qpd) > 1_000_000:
        raise ValueError(
            f"cosine_topk_bruteforce: {len(qpd)} query rows collect to the "
            "driver as a dense matrix; this path requires a small query "
            "set (use the corpus as df and the small side as queries)")
    dims = {len(v) for v in qpd["qv"]}
    if len(dims) > 1:
        raise ValueError(
            f"cosine_topk_bruteforce: ragged query vector dimensions {sorted(dims)}")
    qm = np.array([np.asarray(v, dtype=np.float64) for v in qpd["qv"]])
    if len(qm):
        qm = _unit_rows(qm)
    bq = sc.broadcast((qpd["query_id"].to_numpy(), qm))
    key_t = dict(df.dtypes)[key]
    # normalisation happens INSIDE score() (r6 review): a with_unit_norm
    # pre-pass would push every corpus vector through a second full
    # Arrow round-trip for nothing
    c = df.select(F.col(key).alias("nn_id"), F.col(vec).alias("cv")) \
        .where(F.col(vec).isNotNull())
    schema = f"query_id {key_t}, nn_id {key_t}, cosine DOUBLE"

    def score(batches):
        qids, qm = bq.value
        for pdf in batches:
            nb = len(pdf)
            if nb == 0 or len(qids) == 0:
                continue
            cm = _unit_rows(np.array([np.asarray(v, dtype=np.float64)
                                      for v in pdf["cv"]]))
            ids = pdf["nn_id"].to_numpy()
            sims = cm @ qm.T                     # nb x nq
            kk = min(k + 1, nb)                  # +1 survives self-pair drop
            thr = np.partition(sims, nb - kk, axis=0)[nb - kk, :]
            ci, qi = np.nonzero(sims >= thr[None, :])
            yield pd.DataFrame({"query_id": qids[qi], "nn_id": ids[ci],
                                "cosine": sims[ci, qi]})

    scored = c.mapInPandas(score, schema=schema) \
        .where(F.col("nn_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (LCG, no numpy on
    executors needed — computed driver-side as literals)."""
    vals = []
    state = (plane * 2654435761 + 17) % 2147483647
    for _ in range(dim):
        state = (state * 48271) % 2147483647
        vals.append(state / 2147483647.0 - 0.5)
    return vals


def with_lsh_bucket(df: DataFrame, vec: str = "embedding", planes: int = 12,
                    dim: int = 64, out: str = "lsh_bucket",
                    table: int = 0) -> DataFrame:
    """Random-hyperplane sign sketch -> integer bucket id.  `table` selects
    an independent plane set (OR-construction hash table)."""
    return with_lsh_buckets(df, vec, planes, dim, tables=1,
                            out_prefix=out, first_table=table,
                            suffix=False)


def with_lsh_buckets(df: DataFrame, vec: str = "embedding",
                     planes: int = 12, dim: int = 64, tables: int = 1,
                     out_prefix: str = "__b", first_table: int = 0,
                     suffix: bool = True) -> DataFrame:
    """All `tables` sign-sketch buckets in ONE Arrow-vectorized pass.

    planes x tables dot products per row are ONE numpy matmul per batch —
    measured ~1000x over the expression-tree alternatives (per-element
    Add-chains stall codegen; higher-order-function lambdas evaluate
    interpreted and boxed at ~8 ms/row for a 40x64 plane matrix).  The
    sign sketch is scale-invariant, so callers may pass raw or unit
    vectors."""
    mat = np.array([_hyperplane(dim, (first_table + t) * 997 + p)
                    for t in range(tables) for p in range(planes)]).T
    pw = (2 ** np.arange(planes)).astype(np.int64)
    n_t, n_p = tables, planes

    @F.pandas_udf("array<long>")
    def buckets_udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mask = v.notna().to_numpy()
        if not mask.all():
            # NULL embeddings hash to a NULL bucket array (r6 review —
            # np.array over a None-bearing batch raised and failed the
            # stage); element_at then yields NULL bucket keys, which
            # every downstream equi-join drops, so NULL-vector rows
            # simply never become candidates
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                return pd.Series([None] * len(v), dtype=object)
            x = np.array(v.iloc[idx].tolist(), dtype=np.float64)
            bits = (x @ mat) > 0
            cols = [bits[:, t * n_p:(t + 1) * n_p].astype(np.int64) @ pw
                    for t in range(n_t)]
            vals = np.column_stack(cols).tolist()
            out = [None] * len(v)
            for i, val in zip(idx, vals):
                out[i] = val
            return pd.Series(out, dtype=object)
        x = np.array(v.tolist(), dtype=np.float64)
        bits = (x @ mat) > 0
        cols = [bits[:, t * n_p:(t + 1) * n_p].astype(np.int64) @ pw
                for t in range(n_t)]
        return pd.Series(np.column_stack(cols).tolist())

    df = df.withColumn("__bk", buckets_udf(F.col(vec)))
    for t in range(tables):
        name = f"{out_prefix}{t}" if suffix else out_prefix
        df = df.withColumn(name, F.element_at("__bk", t + 1))
    return df.drop("__bk")


def ivf_train_centroids(df: DataFrame, vec: str = "embedding",
                        n_lists: int = 16, dim: int = 64, seed: int = 42,
                        sample: int = 4096,
                        pre_normalized: bool = False) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids trained driver-side on a
    deterministic sample (the scale-standard approach — the quantizer is
    tiny; the corpus never leaves the executors).

    `pre_normalized=True` (r7): the caller already holds unit vectors in
    `vec` — skip the in-train normalisation pass (re-normalising a unit
    vector would also perturb the last ulp, so skipping is both cheaper
    and the bit-exact choice)."""
    import numpy as np
    src = df.where(F.col(vec).isNotNull())
    if pre_normalized:
        rows = src.select(F.col(vec).alias("unit_vec")) \
            .limit(sample).collect()
    else:
        rows = (with_unit_norm(src, vec)
                .select("unit_vec").limit(sample).collect())
    if not rows:
        raise ValueError("ivf_train_centroids: no non-null vectors")
    x = np.array([r["unit_vec"] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(25):
        sims = x @ centers.T
        assign = sims.argmax(axis=1)
        new = np.vstack([
            x[assign == k].mean(axis=0) if (assign == k).any() else centers[k]
            for k in range(len(centers))])
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        new = new / np.where(norms == 0, 1.0, norms)
        if np.allclose(new, centers, atol=1e-9):
            break
        centers = new
    return [c.tolist() for c in centers]


def with_ivf_list(df: DataFrame, centroids: list[list[float]],
                  vec: str = "unit_vec", out: str = "ivf_list",
                  nprobe: int = 1) -> DataFrame:
    """Assign each vector to its nprobe nearest coarse centroids (array of
    list ids) — pure JVM expressions over broadcast centroid literals."""
    sims = F.array(*[
        F.aggregate(F.zip_with(F.col(vec),
                               F.array(*[F.lit(v) for v in c]),
                               lambda a, b: a * b),
                    F.lit(0.0), lambda acc, v: acc + v)
        for c in centroids])
    idx = F.array_sort(
        F.zip_with(sims, F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                   lambda s, i: F.struct((-s).alias("neg"), i.alias("i"))))
    lists = F.slice(F.transform(idx, lambda st: st["i"]), 1, nprobe)
    return df.withColumn(out, lists)


def cosine_topk_ivf(df: DataFrame, key: str = "vec_id",
                    vec: str = "embedding", k: int = 5, n_lists: int = 16,
                    nprobe: int = 2, dim: int = 64,
                    seed: int = 42,
                    rank_round: int | None = None,
                    queries: DataFrame | None = None) -> DataFrame:
    """IVF ANN: corpus bucketed by nearest centroid (1 list), queries probe
    their nprobe nearest lists; candidate generation is an equi-join on
    list id — the classic inverted-file layout, shuffle-partitioned by
    list.  Recall grows with nprobe; exact within probed lists.

    `rank_round` ranks by ROUND(cosine, rank_round) (ties broken by id)
    instead of the full-precision cosine — the cross-engine determinism
    device the contract query needs: with nprobe == n_lists every list is
    probed, so the result must equal the exact brute-force top-k, and
    rounding before ranking makes that equality reproducible against an
    oracle whose float summation order differs in the last ulp.

    `queries` optionally restricts the query side (same schema as `df`;
    default: every corpus row queries) — the corpus is always `df`, like
    cosine_topk_bruteforce's (df, queries) contract."""
    # NULL embeddings cannot be routed to a list nor scored: exclude
    # them from both sides (r6 review — they previously crashed the
    # quantizer and could pad a sparse query's top-k with NULL cosines)
    df = df.where(F.col(vec).isNotNull())
    # r7 (guide §2.4): normalise the corpus ONCE — materialised so the
    # trainer's sample collect, the corpus routing, and the default
    # query side all read the same checkpoint instead of re-running the
    # Arrow norm per consumer.  Deliberately NOT repartitioned first:
    # the trainer's limit(sample) must see the ORIGINAL scan order or
    # the k-means seed sample (and hence the centroids) would change.
    # Training on the stored unit vectors (pre_normalized) collects the
    # identical sample values the old in-train normalisation produced.
    u = with_unit_norm(df.select(key, vec), vec).localCheckpoint(eager=True)
    cents = ivf_train_centroids(u, "unit_vec", n_lists, dim, seed,
                                pre_normalized=True)
    corpus = with_ivf_list(u, cents, nprobe=1).select(
        F.col(key).alias("nn_id"), F.col("unit_vec").alias("cv"),
        F.element_at("ivf_list", 1).alias("list_id")) \
        .repartition(F.col("list_id"))     # barrier + join-key pre-shuffle
    qsrc = u if queries is None else with_unit_norm(
        queries.where(F.col(vec).isNotNull()), vec)
    queries = with_ivf_list(qsrc, cents, nprobe=nprobe).select(
        F.col(key).alias("query_id"), F.col("unit_vec").alias("qv"),
        F.explode("ivf_list").alias("list_id")) \
        .repartition(F.col("list_id"))
    scored = (queries.join(corpus, on="list_id")
              .where(F.col("query_id") != F.col("nn_id"))
              .withColumn("cosine", _dot(F.col("cv"), F.col("qv")))
              .select("query_id", "nn_id", "cosine"))
    rank_key = F.col("cosine") if rank_round is None \
        else F.round("cosine", rank_round)
    w = Window.partitionBy("query_id").orderBy(F.desc(rank_key),
                                               F.asc("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def cosine_topk_lsh(df: DataFrame, key: str = "vec_id",
                    vec: str = "embedding", k: int = 5, planes: int = 8,
                    dim: int = 64, tables: int = 4,
                    max_bucket: int | None = 10_000,
                    rank_round: int | None = None,
                    small_corpus: bool = False) -> DataFrame:
    """ANN top-k via multi-table hyperplane LSH (OR-construction).

    `tables` independent plane sets each hash every vector into a bucket;
    a pair is a candidate if it collides in ANY table — recall ~
    1 - (1 - p^planes)^tables instead of the single-table p^planes that
    collapses as planes grow.  Per-table buckets above `max_bucket` are
    dropped before the self-join (one 10^6-member bucket of identical
    vectors would otherwise emit 10^12 pairs regardless of AQE).  All
    joins are equi-joins on (table, bucket) / key — never a cross join.

    `rank_round` ranks by ROUND(cosine, rank_round) (see cosine_topk_ivf)
    — the cross-engine determinism device: the sketch is pure sign
    arithmetic on LCG hyperplane literals, so a SQL oracle can reproduce
    the ENTIRE pipeline (buckets, OR-construction candidates, rank), and
    rounding before ranking keeps last-ulp summation differences from
    flipping near-ties.
    """
    df = df.where(F.col(vec).isNotNull())   # NULL vectors can't hash/score
    # r7 (guide §2.4/§2.5/§4): ONE Arrow pass computes unit vectors AND
    # every table's sketch (adjacent pandas UDFs share one
    # ArrowEvalPython node), spread across cores by a repartition first
    # (single-row-group inputs otherwise hash the whole corpus in one
    # Python worker), then the (key, unit_vec, buckets) relation is
    # materialised ONCE with a localCheckpoint.  Before, the candidate
    # self-join and the two vector-attach joins were four independent
    # branches, each re-running scan + norm/sketch UDFs (4 parquet
    # scans, 2x buckets_udf, 2x _unit_arrow in the physical plan).  The
    # old repartition barrier only stopped expression re-inlining, not
    # per-branch re-execution.
    base = df.select(key, vec).repartition(F.col(key))
    # sketch the RAW vector, not the unit-normed one (r4 ADVICE): the sign
    # bits are scale-invariant, and hashing the same bytes the SQL oracle
    # hashes removes the one cross-engine flake source — a normalised
    # component differing in the last ulp flipping a near-zero plane dot
    b = with_lsh_buckets(with_unit_norm(base, vec), vec, planes, dim, tables)
    b = b.select(key, "unit_vec", *[f"__b{t}" for t in range(tables)]) \
         .localCheckpoint(eager=True)
    buckets = b.select(
        key, F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"), F.col(f"__b{t}").alias("h"))
            for t in range(tables)])).alias("s")) \
        .select(key, "s.tbl", "s.h")
    if max_bucket is not None:
        ok = (buckets.groupBy("tbl", "h")
              .agg(F.count(F.lit(1)).alias("__m"))
              .where(F.col("__m") <= max_bucket).select("tbl", "h"))
        buckets = buckets.join(ok, on=["tbl", "h"])
    lhs = buckets.select(F.col(key).alias("query_id"), "tbl", "h")
    rhs = buckets.select(F.col(key).alias("nn_id"), "tbl", "h")
    # `small_corpus=True` (r7): the checkpointed relations are RDD-backed
    # with no size statistics, so join-strategy selection is left to
    # runtime estimates and wobbles run to run; a caller that KNOWS the
    # corpus is bounded (the uncapped oracle-device invocation is only
    # valid for such corpora — its candidate set is O(n²/buckets)) pins
    # the bucket-key and unit-vector sides as broadcasts.  The default
    # leaves the planner free: these relations are O(corpus) and MUST
    # NOT be force-broadcast in the production path.
    _b = F.broadcast if small_corpus else (lambda d: d)
    cands = (lhs.join(_b(rhs), on=["tbl", "h"])
             .where(F.col("query_id") != F.col("nn_id"))
             .select("query_id", "nn_id").distinct())
    if small_corpus:
        # gather-scoring (r7, guide §2.3 "shuffle keys instead of
        # payloads"): the per-pair join form moves BOTH 64-double unit
        # vectors through Arrow for every candidate pair (~2 GB at 2M
        # pairs); with a bounded corpus the whole unit matrix broadcasts
        # once (~10 MB) and each task gathers rows by key — candidate
        # rows stay two ids wide.  np.einsum over gathered float64 rows
        # is the identical arithmetic _dot_arrow runs on the joined
        # arrays, so the cosines are bit-identical.
        sc = df.sparkSession.sparkContext
        vp = b.select(F.col(key), F.col("unit_vec")).toPandas()
        ids = vp[key].to_numpy()
        order = np.argsort(ids, kind="stable")
        mat = np.array([np.asarray(v, dtype=np.float64)
                        for v in vp["unit_vec"]])[order]
        bm = sc.broadcast((ids[order], mat))
        key_t = dict(df.dtypes)[key]
        schema = f"query_id {key_t}, nn_id {key_t}, cosine DOUBLE"

        def score(batches):
            sids, smat = bm.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qi = np.searchsorted(sids, pdf["query_id"].to_numpy())
                ni = np.searchsorted(sids, pdf["nn_id"].to_numpy())
                yield pd.DataFrame({
                    "query_id": pdf["query_id"],
                    "nn_id": pdf["nn_id"],
                    "cosine": np.einsum("ij,ij->i", smat[qi], smat[ni])})

        scored = cands.mapInPandas(score, schema=schema)
    else:
        vecs = b.select(F.col(key), F.col("unit_vec"))
        scored = (cands
                  .join(vecs.select(F.col(key).alias("query_id"),
                                    F.col("unit_vec").alias("qv")),
                        on="query_id")
                  .join(vecs.select(F.col(key).alias("nn_id"),
                                    F.col("unit_vec").alias("cv")),
                        on="nn_id")
                  .withColumn("cosine", _dot(F.col("cv"), F.col("qv")))
                  .select("query_id", "nn_id", "cosine"))
    rank_key = F.col("cosine") if rank_round is None \
        else F.round("cosine", rank_round)
    w = Window.partitionBy("query_id").orderBy(F.desc(rank_key),
                                               F.asc("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
