"""Product quantization (IVF-PQ) — compressed ANN over an embedding column.

The r11 verdict's #2 next-surface: at 100 TB the standard ANN index stores
PQ codes, not raw vectors (Jégou, Douze & Schmid 2011, "Product
quantization for nearest neighbor search"). Each d-dim vector is split
into ``m`` subvectors; each subspace gets its own ``k``-codeword codebook
(k-means); a vector is stored as m small integers. Search scores probes
with ASYMMETRIC DISTANCE (ADC): the query stays exact, each candidate is
its reconstruction, and per query the m×k table of subspace dot products
is precomputed once so scoring a candidate is m table lookups — no
per-candidate float vector is ever read.

Scale shape of each phase:

  train    codebooks train with Lloyd iterations over ALL subspaces fused
           into one corpus scan per iteration: a mapInPandas pass emits
           per-batch PARTIAL sums keyed by (subspace, codeword, dim) — the
           shuffle is m·k·(d/m) = d·k rows of 3 numbers per partition,
           never corpus-sized (same partial-aggregation story as
           clustering.py's update pass, generalized to m codebooks at
           once; per-subspace kmeans_fit calls would pay m separate corpus
           scans per iteration). Driver state is the (m, k, d/m) codebook
           tensor — bounded by construction. Codebook coordinates are
           rounded to ``decimals`` so shuffle summation order cannot make
           two runs disagree (kmeans_fit's determinism rationale).
  encode   one narrow mapInPandas argmin pass; codes are m ints per vector
           (m bytes at k<=256 on a real store vs 4·d raw — 16x smaller at
           the defaults here; receipt in SCALE_PROBE.md).
  probe    coarse IVF cells prune the scan (static partition pruning, same
           layout as similarity.py's raw-vector index), then ADC scores
           the probed codes: the scan reads only (id, cell, pq_code) — no
           vector column exists in the index at all.
  rerank   optional exact top-k over the ADC shortlist (IVFADC+R): the
           shortlist is n_queries × shortlist ids, equi-joined back to the
           RAW corpus for true cosines. At serving scale that join wants
           the raw table bucketed by id (or a point-lookup store); here it
           is one id-join against the embeddings table.

Codebooks quantize the RAW vectors (not cell residuals). Residual PQ
(quantize x - coarse_centroid, the FAISS default) was MEASURED before
being rejected, not skipped: on this corpus it buys nothing — ADC-only
natural recall@5 is 0.56 plain vs 0.56 residual (reconstruction MSE
0.0035 vs 0.0030) because the coarse cells capture too little of the
vectors' variance for the residual to be easier to quantize, while ADC
would grow a per-(cell, subspace, codeword) cross-term table and a
per-cell norm correction. The recall lever that DOES pay here is the
rerank stage: 0.26 ADC-only -> 0.86+ with the exact rerank of the ADC
shortlist (m=16, k=32; the 0.26 runs through the full probe path with
rounding and cell pruning, the 0.56 above is the unpruned yardstick).
Revisit residuals if a future corpus shows strong cluster structure
(coarse-assignment cosines near 1).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _load_centroids, build_ivf_index

_CODEBOOK_CACHE: dict[tuple[str, float], list] = {}
_PQ_INDEX_CACHE: dict[tuple[str, str, float], DataFrame] = {}


def _subspace_shape(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(
            f"pq: m={m} must divide the embedding dim {dim} evenly"
        )
    return dim // m


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 32,
    iterations: int = 2,
    decimals: int = 6,
    train_ppm: int | None = None,
) -> np.ndarray:
    """Train the (m, k, d/m) codebook tensor; returns it as float64 ndarray.

    Seeding is deterministic — the k lowest-id vectors' subvectors seed
    every subspace (the kmeans_fit/build_ivf_index policy: data-dependent,
    reproducible, never collapses to the global mean). Each Lloyd iteration
    is ONE corpus scan for all m subspaces; an emptied codeword keeps its
    previous centroid.

    ``train_ppm``: deterministic hash-mod sample rate (parts per million)
    for the TRAINING scans only — at corpus scale codebooks are trained on
    a sample (the standard IVF-PQ practice: k-means over ~1e5-1e6 vectors
    saturates codebook quality regardless of corpus size) while ENCODING
    always covers every vector. None trains on the full corpus. The sample
    is keyed on ``id_col`` (xxhash64 mod 1e6), so it is reproducible and
    disjoint sampling decisions never depend on partitioning.
    """
    train = df
    if train_ppm is not None:
        if not 0 < train_ppm <= 1_000_000:
            raise ValueError(
                f"pq_train: train_ppm must be in (0, 1e6], got {train_ppm}"
            )
        train = df.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(1_000_000))
            < F.lit(train_ppm)
        )
    seed_rows = (
        train.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )  # bounded: k rows
    if not seed_rows:
        raise ValueError("pq_train: empty corpus (fail fast beats NaNs)")
    dim = len(seed_rows[0][1])
    dsub = _subspace_shape(dim, m)
    seeds = np.array([r[1] for r in seed_rows], dtype=np.float64)
    if len(seeds) < k:  # tiny corpus: pad by repeating (still deterministic)
        seeds = np.vstack([seeds] * (-(-k // len(seeds))))[:k]
    books = seeds.reshape(k, m, dsub).transpose(1, 0, 2).copy()  # (m, k, dsub)

    out_schema = "m int, code int, pos int, s double, cnt long"
    for _ in range(iterations):
        closure_books = books  # rebind per iteration for the task closure

        def partials(batches, _books=closure_books):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vm = np.array(list(pdf["v"]), dtype=np.float64)
                sub = vm.reshape(len(vm), m, dsub)
                rows_m, rows_c, rows_p, rows_s, rows_n = [], [], [], [], []
                for mm in range(m):
                    d2 = ((sub[:, mm, None, :] - _books[mm][None]) ** 2).sum(-1)
                    a = d2.argmin(1)  # ties -> lowest code (first argmin)
                    for code in np.unique(a):
                        sel = sub[a == code, mm, :]
                        rows_m.extend([mm] * dsub)
                        rows_c.extend([int(code)] * dsub)
                        rows_p.extend(range(dsub))
                        rows_s.extend(sel.sum(0))
                        rows_n.extend([len(sel)] * dsub)
                yield pd.DataFrame(
                    {"m": rows_m, "code": rows_c, "pos": rows_p,
                     "s": rows_s, "cnt": rows_n}
                )

        upd = (
            train.select(F.col(vec_col).alias("v"))
            .mapInPandas(partials, out_schema)
            .groupBy("m", "code", "pos")  # m*k*dsub = d*k keys, map-combined
            .agg(F.sum("s").alias("s"), F.sum("cnt").alias("n"))
            .collect()
        )  # bounded: d*k rows
        nxt = books.copy()
        for r in upd:
            nxt[r.m, r.code, r.pos] = round(r.s / r.n, decimals)
        books = nxt
    return books


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
    coarse: tuple[np.ndarray, np.ndarray] | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """(id_col, *keep, pq_code array<int>) — one narrow argmin pass; the
    vector column is consumed and DROPPED (the compression is the point).

    ``coarse``: optional (cell_ids, unit-centroid matrix). When given (and
    ``cell_col`` is in ``keep``), the SAME pass also emits ``_coarse_sim``
    — each vector's cosine to its assigned coarse centroid, rounded 6 like
    every served similarity. Because assignment is cosine argmax over the
    same centroids, this equals the max-sim the training envelope needs,
    so the index build gets worst_coarse_sim without a second corpus scan
    (review r12)."""
    m, _, dsub = books.shape
    id_schema = df.schema[id_col].dataType.simpleString()
    keep_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keep
    )
    out_schema = f"{id_col} {id_schema}{keep_schema}, pq_code array<int>"
    if coarse is not None:
        if cell_col not in keep:
            raise ValueError(
                f"pq_encode: coarse sims need {cell_col!r} in keep"
            )
        out_schema += ", _coarse_sim double"
        coarse_ids, coarse_unit = coarse
        # cell ids need not be dense: map id -> matrix row
        cell_row = {int(c): i for i, c in enumerate(coarse_ids)}

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                out = {id_col: pdf[id_col],
                       **{c: pdf[c] for c in keep},
                       "pq_code": pd.Series(dtype="object")}
                if coarse is not None:
                    out["_coarse_sim"] = pd.Series(dtype="float64")
                yield pd.DataFrame(out)
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            sub = vm.reshape(len(vm), m, dsub)
            codes = np.stack(
                [((sub[:, mm, None, :] - books[mm][None]) ** 2)
                 .sum(-1).argmin(1) for mm in range(m)],
                axis=1,
            ).astype(np.int32)
            out = {id_col: pdf[id_col],
                   **{c: pdf[c] for c in keep},
                   "pq_code": list(codes)}
            if coarse is not None:
                vnorm = np.sqrt((vm * vm).sum(axis=1))
                vnorm[vnorm == 0] = 1.0
                rows = np.fromiter(
                    (cell_row[int(c)] for c in pdf[cell_col]),
                    dtype=np.int64,
                    count=len(pdf),
                )
                sims = ((vm / vnorm[:, None]) * coarse_unit[rows]).sum(axis=1)
                out["_coarse_sim"] = np.round(sims, 6)
            yield pd.DataFrame(out)

    return df.select(id_col, *keep, vec_col).mapInPandas(encode, out_schema)


def persist_ivfpq_index(
    candidates: DataFrame,
    path: str,
    n_cells: int = 32,
    m: int = 16,
    k: int = 32,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_ppm: int | None = None,
    meta_cols: tuple[str, ...] = (),
) -> None:
    """Build and persist the compressed index: ``{path}/index`` holds ONLY
    (id, pq_code) partitioned by coarse cell — no raw vectors anywhere in
    it; ``{path}/centroids`` the coarse quantizer; ``{path}/codebooks``
    the (m, code, centroid) relation; ``{path}/_pq_meta.json`` the shape
    contract a probe validates before trusting the code layout (the same
    refuse-loudly policy as the bucketed sink's n_buckets guard).

    ``meta_cols``: attribute columns from ``candidates`` carried into the
    index rows (r12 verdict #4 — production similarity search is usually
    predicate-filtered, "top-k within lang='en'"). They ride the same
    partitioned code files, so a filtered probe pushes its predicate into
    the pruned parquet scan BEFORE any ADC work — no over-fetch heuristics;
    the top-k is exact over the surviving candidates. Cost: a few bytes per
    row next to the 16-byte code (still no vector column) riding the
    assignment pass's Arrow batches — no extra join or shuffle."""
    # meta cols ride the assignment pass's Arrow batches (build_ivf_index
    # ``keep``) — the former id-equi-join back to ``candidates``
    # re-shuffled the whole corpus, vectors included, to attach a few
    # metadata bytes (r16 optimization, guide §2.4; row-identical).
    #
    # The coarse-quantizer build and the PQ codebook training are
    # INDEPENDENT computations over the same corpus (codebooks quantize
    # raw vectors, not cell residuals — module docstring), so their jobs
    # overlap from a driver thread (guide §2.6: a later job's tasks
    # back-fill executors freed by the earlier job's stragglers; each
    # driver collect is idle network wait the other job can use).
    # overlap_jobs propagates the JVM thread-locals (job group/description)
    # when the pinned-thread gateway allows it and surfaces a background
    # failure even when the foreground one raises (ADVICE r16). Results are
    # unchanged: both halves are deterministic and share no state.
    from ..session import overlap_jobs

    (centroids, index), books = overlap_jobs(
        candidates.sparkSession,
        lambda: pq_train(
            candidates, id_col, vec_col, m, k, iterations,
            train_ppm=train_ppm,
        ),
        lambda: build_ivf_index(
            candidates, n_cells, id_col, vec_col, keep=meta_cols
        ),
    )
    cent_rows = centroids.collect()  # bounded: n_cells rows
    coarse = None
    if cent_rows:
        cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
        cnorm = np.sqrt((cmat * cmat).sum(axis=1))
        cnorm[cnorm == 0] = 1.0
        coarse = (
            np.array([r["cell"] for r in cent_rows], dtype=np.int64),
            cmat / cnorm[:, None],
        )
    # ONE encode pass feeds both the index write and the training-time
    # coarse envelope (review r12: the previous dedicated worst-sim pass
    # re-scanned the whole corpus for one scalar). Two consumers of a
    # corpus-sized relation -> persist(DISK_ONLY) + unpersist, the
    # scale-safe pin (narrow ~90 B/row codes, never raw vectors).
    from pyspark.storagelevel import StorageLevel

    codes = pq_encode(
        index, books, id_col, vec_col,
        keep=("cell", *meta_cols), coarse=coarse,
    )

    def _write_index():
        if coarse is None:
            codes.repartition("cell").write.partitionBy("cell").mode(
                "overwrite"
            ).parquet(os.path.join(path, "index"))
            return None
        pinned = codes.persist(StorageLevel.DISK_ONLY)
        try:
            row = pinned.agg(F.min("_coarse_sim")).collect()[0][0]
            pinned.drop("_coarse_sim").repartition("cell").write.partitionBy(
                "cell"
            ).mode("overwrite").parquet(os.path.join(path, "index"))
            return None if row is None else float(row)
        finally:
            pinned.unpersist()

    # centroids is a driver-local bounded relation, ready before the
    # encode pass — its write overlaps the corpus-sized index write so the
    # tiny job back-fills the big one's tail (guide §2.6).
    worst, _ = overlap_jobs(
        candidates.sparkSession,
        lambda: centroids.write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        ),
        _write_index,
    )
    spark = candidates.sparkSession
    # Arrow (pandas) route, not a plain row list: a list-backed local
    # relation of nested arrays serializes through the Python-RDD scan on
    # write (~4.5s measured for these 512 rows); the Arrow batch writes in
    # ~0.2s. Same rows either way.
    book_pdf = pd.DataFrame(
        {"m": np.repeat(np.arange(m), k).astype("int32"),
         "code": np.tile(np.arange(k), m).astype("int32"),
         "centroid": [list(map(float, books[mm, code]))
                      for mm in range(m) for code in range(k)]}
    )
    spark.createDataFrame(book_pdf).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "codebooks"))
    # the training-time coarse envelope (worst cosine any indexed vector
    # has to its assigned centroid) was computed on the shared encode pass
    # above — per-row ROUND(6) commutes with MIN (round is monotone), so
    # the value matches the old dedicated pass exactly.
    with open(os.path.join(path, "_pq_meta.json"), "w", encoding="utf-8") as f:
        json.dump(
            {"m": m, "k": k, "n_cells": n_cells,
             "dim": int(m * books.shape[2]),
             **({"meta_cols": list(meta_cols),
                 "meta_types": {
                     c: candidates.schema[c].dataType.simpleString()
                     for c in meta_cols
                 }} if meta_cols else {}),
             **({"worst_coarse_sim": worst} if worst is not None else {})},
            f,
        )


def ivfpq_index_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_coarse_drift: float | None = None,
) -> int:
    """Incrementally index NEW vectors into a persisted IVF-PQ index —
    the arrival-time maintenance path (same production need as the dedup
    band index's ``incremental_lsh_pairs``): only the new batch is
    assigned and encoded, under the EXISTING coarse centroids and
    codebooks; nothing already written is read back or rewritten. Returns
    the number of vectors appended.

    Quantizer drift is the correctness hazard of append-only ANN
    maintenance: centroids/codebooks were trained on the corpus as of the
    last rebuild, so a distribution shift degrades new vectors' cells and
    codes silently. ``max_coarse_drift`` guards it: if more than that
    fraction of the batch lands further from its nearest coarse centroid
    (cosine) than ANY training-time assignment had to (tracked as
    ``worst_coarse_sim`` in the meta), the append refuses and asks for a
    rebuild — refuse-loudly, like the bucket-count and shape guards.

    Single-writer contract (the upsert-sink rule): appends are parquet
    file additions inside the existing ``cell=<c>`` directories plus a
    meta bump; concurrent appends or an append racing a rebuild are the
    caller's lock to take. Unlike the foreachBatch sinks this is a direct
    operator with NO batch-id replay guard — re-delivering the same batch
    indexes its vectors twice (they then occupy two shortlist slots each).
    Wrap it in a replay-guarded sink (the dedup-ingest pattern) when the
    source can redeliver, or rebuild-from-scratch for idempotent jobs
    (what the registry query does).
    """
    spark = new_vectors.sparkSession
    from .similarity import resolve_index_root

    root = resolve_index_root(path)
    with open(os.path.join(root, "_pq_meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    books = _load_codebooks(spark, path)
    cent_rows = _load_centroids(spark, path)
    first = new_vectors.select(vec_col).limit(1).collect()
    if not first:
        return 0
    if len(first[0][0]) != meta["dim"]:
        raise ValueError(
            f"ivfpq index at {path!r} was built for dim {meta['dim']}; "
            f"new vectors have dim {len(first[0][0])}"
        )
    cell_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0] = 1.0
    cunit = cmat / cnorm[:, None]
    m, _, dsub = books.shape
    id_schema = new_vectors.schema[id_col].dataType.simpleString()
    # an index built with metadata columns requires every append to supply
    # them — appended rows missing an attribute would silently vanish from
    # every filtered probe on it (refuse-loudly, like the dim guard)
    meta_cols = tuple(meta.get("meta_cols", ()))
    missing = [c for c in meta_cols if c not in new_vectors.columns]
    if missing:
        raise ValueError(
            f"ivfpq_index_append: index at {path!r} carries metadata "
            f"columns {list(meta_cols)}; the new batch lacks {missing}"
        )
    # type parity too, not just presence: appending a batch whose meta
    # column has a different parquet type writes mixed-dtype files into the
    # same cell directories, and the NEXT probe's read fails (or binds the
    # wrong schema) far from the cause (r13 review — same refuse-loudly
    # class as the dim guard below)
    for c, want in meta.get("meta_types", {}).items():
        got = new_vectors.schema[c].dataType.simpleString()
        if got != want:
            raise ValueError(
                f"ivfpq_index_append: index at {path!r} stores metadata "
                f"column {c!r} as {want}; the new batch supplies {got} — "
                f"cast it to match (mixed-type cell files break later reads)"
            )
    meta_schema = "".join(
        f", {c} {new_vectors.schema[c].dataType.simpleString()}"
        for c in meta_cols
    )

    def assign_encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            vnorm = np.sqrt((vm * vm).sum(axis=1))
            vnorm[vnorm == 0] = 1.0
            sims = (vm / vnorm[:, None]) @ cunit.T
            best = np.argmax(sims, axis=1)
            sub = vm.reshape(len(vm), m, dsub)
            codes = np.stack(
                [((sub[:, mm, None, :] - books[mm][None]) ** 2)
                 .sum(-1).argmin(1) for mm in range(m)],
                axis=1,
            ).astype(np.int32)
            yield pd.DataFrame(
                {id_col: pdf[id_col],
                 **{c: pdf[c] for c in meta_cols},
                 "cell": cell_ids[best].astype("int32"),
                 "pq_code": list(codes),
                 "_coarse_sim": np.round(sims[np.arange(len(vm)), best], 6)}
            )

    encoded = new_vectors.select(id_col, *meta_cols, vec_col).mapInPandas(
        assign_encode,
        f"{id_col} {id_schema}{meta_schema}, cell int, pq_code array<int>, "
        f"_coarse_sim double",
    ).localCheckpoint()  # batch-sized: two consumers (drift agg + write)
    stats = encoded.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_coarse_sim").alias("worst"),
        F.avg(
            (F.col("_coarse_sim") < F.lit(meta.get("worst_coarse_sim", -1.0)))
            .cast("double")
        ).alias("drift_frac"),
    ).collect()[0]
    if (
        max_coarse_drift is not None
        and "worst_coarse_sim" in meta
        and stats.drift_frac is not None
        and stats.drift_frac > max_coarse_drift
    ):
        raise ValueError(
            f"ivfpq_index_append: {stats.drift_frac:.1%} of the batch falls "
            f"outside the training-time coarse envelope "
            f"(worst_coarse_sim={meta['worst_coarse_sim']}) — the quantizer "
            f"has drifted; rebuild the index with persist_ivfpq_index"
        )
    encoded.drop("_coarse_sim").repartition("cell").write.partitionBy(
        "cell"
    ).mode("append").parquet(os.path.join(root, "index"))
    meta["appended"] = int(meta.get("appended", 0)) + int(stats.n)
    # worst_coarse_sim is the TRAINING-time envelope and stays frozen
    # (review r12): updating it with each accepted batch's minimum would
    # ratchet the guard monotonically looser — after one borderline batch
    # slips under max_coarse_drift, a fully drifted next batch would
    # compare against the loosened floor and pass. Appends never move it;
    # only persist_ivfpq_index (a rebuild) re-derives it.
    with open(os.path.join(root, "_pq_meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    return int(stats.n)


def _load_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    from .similarity import load_cached_rows, resolve_index_root

    rows = load_cached_rows(  # bounded: m*k rows
        spark, os.path.join(resolve_index_root(path), "codebooks"),
        _CODEBOOK_CACHE
    )
    m = 1 + max(r["m"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    dsub = len(rows[0]["centroid"])
    books = np.zeros((m, k, dsub))
    for r in rows:
        books[r["m"], r["code"]] = r["centroid"]
    return books


def ivfpq_probe_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    shortlist: int | None = None,
    rerank_against: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
    where: str | None = None,
) -> DataFrame:
    """ADC top-k against a :func:`persist_ivfpq_index` output; with
    ``rerank_against`` (the raw corpus), IVFADC+R: the ADC ``shortlist``
    (default 10·k) per query is re-scored with exact cosine and re-ranked.

    Per query the work is: n_probe/n_cells of the CODE table read
    (partition-pruned scan — 16x fewer bytes than the raw-vector index at
    the defaults), one m×k LUT matmul at the driver, and m gathers per
    candidate batch. Returns (query_id, cand_id, cosine_sim, rank) —
    ``cosine_sim`` is the ADC estimate, or the exact value after rerank.

    ``where``: a SQL predicate over the index's metadata columns (built
    with ``meta_cols``) and/or ``id_col``/``cell`` — the filtered-ANN path
    ("top-k within lang='en'"). It is applied to the PRUNED CODE SCAN,
    before any ADC scoring, so Catalyst pushes it into the parquet read and
    the returned top-k is exact over the surviving candidates (no
    over-fetch-and-hope; a post-shortlist filter can silently under-fill
    k). Referencing a column the index does not carry fails analysis with
    the missing-column error, plus the guard below names the fix."""
    from .similarity import resolve_index_root

    root = resolve_index_root(path)
    meta_path = os.path.join(root, "_pq_meta.json")
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    books = _load_codebooks(spark, path)
    m, kcodes, dsub = books.shape
    if (m, kcodes) != (meta["m"], meta["k"]):
        raise ValueError(
            f"ivfpq index at {path!r}: codebooks are {m}x{kcodes} but meta "
            f"says {meta['m']}x{meta['k']} — rebuild the index"
        )
    cent_rows = _load_centroids(spark, path)
    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivfpq_probe_topk collects the query side to the driver; got "
            f">{max_queries} query vectors. Pass a smaller query set or "
            f"raise max_queries explicitly."
        )
    from .similarity import load_cached_df

    index = load_cached_df(
        spark, os.path.join(root, "index"), _PQ_INDEX_CACHE
    )
    id_schema = index.schema[id_col].dataType.simpleString()
    out_schema = (
        f"query_id {id_schema}, cand_id {id_schema}, cosine_sim double"
    )
    if not cent_rows or not qrows:
        return spark.createDataFrame([], out_schema + ", rank int")

    if len(qrows[0][1]) != meta["dim"]:
        raise ValueError(
            f"ivfpq index at {path!r} was built for dim {meta['dim']}; "
            f"queries have dim {len(qrows[0][1])}"
        )
    cell_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0] = 1.0
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qn = np.where(qnorm == 0, 1.0, qnorm)

    sims = (qmat / qn[:, None]) @ (cmat / cnorm[:, None]).T
    order = np.lexsort(
        (np.broadcast_to(cell_ids, sims.shape), -sims), axis=1
    )[:, : min(n_probe, len(cell_ids))]
    probed = cell_ids[order]
    all_cells = sorted({int(c) for row in probed for c in row})
    cell_mask = {
        c: np.array([(c in set(row)) for row in probed]) for c in all_cells
    }
    # the per-query ADC tables, computed ONCE: dot LUT (nq, m, kcodes) and
    # the per-codeword squared-norm table for |reconstruction|
    qsub = qmat.reshape(len(qmat), m, dsub)
    lut = np.einsum("qmd,mkd->qmk", qsub, books)
    n2 = (books * books).sum(-1)  # (m, kcodes)

    empty = pd.DataFrame(
        {"query_id": pd.Series(dtype=qids.dtype),
         "cand_id": pd.Series(dtype=qids.dtype),
         "cosine_sim": pd.Series(dtype="float64")}
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield empty
                continue
            cid = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            codes = np.array(list(pdf["pq_code"]), dtype=np.int64)  # (nc, m)
            dots = np.zeros((len(qids), len(cid)))
            rn2 = np.zeros(len(cid))
            for mm in range(m):
                dots += lut[:, mm, :][:, codes[:, mm]]
                rn2 += n2[mm, codes[:, mm]]
            rnorm = np.sqrt(rn2)
            rnorm[rnorm == 0] = 1.0
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.round(dots / (qn[:, None] * rnorm[None, :]), 6) + 0.0
            allowed = np.vstack([cell_mask[int(c)] for c in cells])  # (nc,nq)
            nq, nc = s.shape
            flat_q = np.repeat(qids, nc)
            flat_c = np.tile(cid, nq)
            flat_s = s.ravel()
            keep = (flat_q != flat_c) & np.isfinite(flat_s) & allowed.T.ravel()
            yield pd.DataFrame(
                {"query_id": flat_q[keep], "cand_id": flat_c[keep],
                 "cosine_sim": flat_s[keep]}
            )

    pruned = index.filter(F.col("cell").isin(all_cells))
    from .similarity import apply_ann_tombstones

    pruned = apply_ann_tombstones(pruned, spark, path, id_col)
    if where is not None:
        allowed_cols = {id_col, "cell", *meta.get("meta_cols", ())}
        try:
            pruned = pruned.filter(F.expr(where))
            pruned.schema  # force analysis now for the clear error below
        except Exception as e:
            raise ValueError(
                f"ivfpq_probe_topk: predicate {where!r} failed to resolve "
                f"against the index's filterable columns "
                f"{sorted(allowed_cols)} — rebuild with "
                f"persist_ivfpq_index(meta_cols=...) to carry "
                f"the attributes the filter needs"
            ) from e
    # Arrow batch sizing, same rationale as ivf_probe_topk: the pruned
    # code scan is TINY (16 bytes/vec), so Spark's default split hands
    # mapInPandas many near-empty batches whose worker roundtrip dwarfs
    # the LUT gathers. On a local filesystem coalesce to ~32 MB of probed
    # bytes per task (coalesce never raises parallelism); cluster stores
    # skip the listing and keep the scan's natural parallelism.
    idx_dir = os.path.join(root, "index")
    if os.path.isdir(idx_dir):
        probed_bytes = 0
        for c in all_cells:
            cdir = os.path.join(idx_dir, f"cell={c}")
            if os.path.isdir(cdir):
                with os.scandir(cdir) as it:
                    probed_bytes += sum(
                        e.stat().st_size for e in it if e.is_file()
                    )
        pruned = pruned.coalesce(max(1, -(-probed_bytes // (32 << 20))))
    scored = pruned.select(
        F.col(id_col), F.col("cell"), F.col("pq_code")
    ).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    if rerank_against is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine_sim", "rank")
        )
    r = shortlist if shortlist is not None else 10 * k
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= r)
        .select("query_id", "cand_id")
    )
    # exact rerank: tiny shortlist joins the raw corpus by id (bucket the
    # raw table by id at serving scale), query vectors ride a broadcast
    qvecs = spark.createDataFrame(
        [(r_[0], [float(x) for x in r_[1]]) for r_ in qrows],
        f"query_id {id_schema}, _qv array<double>",
    )
    cand = short.join(
        rerank_against.select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_cv")
        ),
        "cand_id",
    ).join(F.broadcast(qvecs), "query_id")
    dot = F.aggregate(
        F.zip_with(
            "_qv", F.expr("transform(_cv, x -> cast(x AS double))"),
            lambda a, b: a * b,
        ),
        F.lit(0.0), lambda acc, e: acc + e,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0),
            lambda acc, e: acc + e,
        )
    )
    exact = cand.select(
        "query_id", "cand_id",
        (F.round(
            dot / (nrm(F.col("_qv"))
                   * nrm(F.expr("transform(_cv, x -> cast(x AS double))"))),
            6,
        ) + F.lit(0.0)).alias("cosine_sim"),
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )
