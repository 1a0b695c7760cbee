"""Similarity search over an embedding column (list<float>).

* ``knn_brute`` — exact top-k cosine: the (small) query matrix is
  broadcast via ``ray.put``; each batch runs one numpy matmul and emits
  ONLY its local top-k per query (pruning), then a tiny
  ``groupby(query_id)`` merge produces the global top-k. The shuffle
  moves O(batches * k) rows, never the corpus.
* ``knn_lsh`` — the scale path: random-hyperplane LSH buckets; a query
  probes only its bucket (and optionally neighbors), trading recall for
  a corpus-partition-local search. Approximate by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def to_matrix(t: pa.Table, vec_col: str,
              dtype=np.float64) -> np.ndarray:
    """list<float> / fixed_size_list column -> (n, d) float matrix via
    the flat child buffer (``list_flatten`` is offset/null-safe) + one
    reshape — replaces the per-row ``np.stack([... to_pylist()])``
    idiom. Raises loudly on ragged lists (embedding columns are
    uniform-length by contract)."""
    col = t.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
            or pa.types.is_fixed_size_list(col.type)):
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        return np.asarray(flat, dtype=dtype).reshape(t.num_rows, -1)
    # Ray tensor extension (from_items / numpy-built datasets) or other
    # array-per-row representations: to_numpy handles the layout
    m = col.to_numpy(zero_copy_only=False)
    if m.dtype == object:
        m = (np.stack([np.asarray(e) for e in m]) if len(m)
             else np.empty((0, 0)))
    return np.asarray(m, dtype=dtype).reshape(t.num_rows, -1)


def knn_brute(embs: rd.Dataset, queries: dict[int, list[float]], k: int = 10,
              exclude_self: bool = True) -> rd.Dataset:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank) with rank 1..k ordered by
    cosine desc, neighbor_id asc on exact ties. Float64 throughout so
    the DuckDB double oracle agrees.
    """
    q_ids = sorted(queries)
    Q = _normalize(np.array([queries[q] for q in q_ids], dtype=np.float64))
    ref = ray.put((q_ids, Q))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(ref)
        vids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        M = _normalize(to_matrix(t, "embedding"))
        sims = qm @ M.T                       # (n_q, n_batch)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            row = sims[qi]
            order = np.lexsort((vids, -row))[:k + (1 if exclude_self else 0)]
            for j in order:
                if exclude_self and int(vids[j]) == qid:
                    continue
                out_q.append(qid)
                out_n.append(int(vids[j]))
                out_s.append(float(row[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return (embs.map_batches(local_topk, batch_format="pyarrow")
            .groupby("query_id").map_groups(merge, batch_format="pandas"))


def lsh_buckets(embs: rd.Dataset, n_planes: int = 8, seed: int = 42) -> rd.Dataset:
    """Add a random-hyperplane LSH ``bucket`` column (int, 2**n_planes
    buckets). Deterministic in (seed, dim)."""
    def f(t: pa.Table) -> pa.Table:
        M = to_matrix(t, "embedding")
        rng = np.random.RandomState(seed)
        planes = rng.randn(M.shape[1], n_planes)
        bits = (M @ planes) > 0
        buckets = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        return t.append_column("bucket", pa.array(buckets.astype("int64")))
    return embs.map_batches(f, batch_format="pyarrow")


def kmeans_centroids(embs: rd.Dataset, n_centroids: int = 16,
                     n_iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means for the IVF coarse quantizer.

    Initial centroids are seeded draws; each iteration is ONE pass of
    ``map_batches`` partial sums (per-batch assignment + per-centroid
    per-dim sum/count — a combiner, exploded to scalar rows) merged by
    a DISTRIBUTED ``partial_agg_sum`` exchange, so the driver collects
    at most K x d rows per iteration — bounded by the model size, never
    by the batch count (at 10^12 rows the old per-batch collect funneled
    millions of partial rows through the driver per iteration)."""
    from .relational import partial_agg_sum

    first = embs.select_columns(["embedding"]).limit(n_centroids).take_all()
    C = _normalize(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                             for r in first]))
    dim = C.shape[1]
    for _ in range(n_iters):
        ref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            cm = ray.get(ref)
            empty = pa.table({"centroid": pa.array([], pa.int32()),
                              "dim": pa.array([], pa.int32()),
                              "s": pa.array([], pa.float64()),
                              "n": pa.array([], pa.int64())})
            if t.num_rows == 0:
                return empty
            M = to_matrix(t, "embedding")
            Mn = _normalize(M)
            assign = np.argmax(Mn @ cm.T, axis=1)
            out_c, out_d, out_s, out_n = [], [], [], []
            for c in np.unique(assign):
                sel = M[assign == c]
                s = sel.sum(axis=0)
                out_c.extend([int(c)] * dim)
                out_d.extend(range(dim))
                out_s.extend(s.tolist())
                out_n.extend([sel.shape[0]] * dim)
            return pa.table({"centroid": pa.array(out_c, pa.int32()),
                             "dim": pa.array(out_d, pa.int32()),
                             "s": pa.array(out_s, pa.float64()),
                             "n": pa.array(out_n, pa.int64())})

        agg = partial_agg_sum(
            embs.map_batches(partial, batch_format="pyarrow"),
            ["centroid", "dim"], {"s": "s", "n": "n"})
        rows = agg.take_all()
        # bounded reduce: the distributed merge already collapsed the
        # per-batch partials — K x d rows max, independent of block count
        assert len(rows) <= n_centroids * dim, len(rows)
        sums = np.zeros_like(C)
        counts = np.zeros(len(C))
        for row in rows:
            sums[row["centroid"], row["dim"]] = row["s"]
            if row["dim"] == 0:
                counts[row["centroid"]] = row["n"]
        nonzero = counts > 0
        C[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
    return C


def knn_ivf(embs: rd.Dataset, queries: dict[int, list[float]], k: int = 10,
            n_centroids: int = 16, nprobe: int = 4, n_iters: int = 5,
            seed: int = 42) -> rd.Dataset:
    """IVF approximate top-k: a k-means coarse quantizer partitions the
    corpus; each query probes only its ``nprobe`` nearest centroid
    cells. The probed subset is selected with a vectorized per-batch
    mask (broadcast centroids; no shuffle), then searched exactly with
    the local-top-k + merge plan of ``knn_brute``. Recall grows with
    nprobe/n_centroids; deterministic in (seed, data order)."""
    C = kmeans_centroids(embs, n_centroids, n_iters, seed)
    q_ids = sorted(queries)
    Q = _normalize(np.array([queries[q] for q in q_ids], dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probe for c in row})
    ref = ray.put(C)

    def keep_probed(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        if t.num_rows == 0:
            return t
        M = _normalize(to_matrix(t, "embedding"))
        assign = np.argmax(M @ cm.T, axis=1)
        mask = pa.array(np.isin(assign, wanted))
        return t.filter(mask)

    sub = embs.map_batches(keep_probed, batch_format="pyarrow")
    return knn_brute(sub, queries, k)


def knn_lsh(embs: rd.Dataset, queries: dict[int, list[float]], k: int = 10,
            n_planes: int = 8, seed: int = 42,
            probes: int = 0) -> rd.Dataset:
    """Approximate top-k: search the query's LSH bucket plus, with
    multi-probe (``probes`` = Hamming radius), every bucket whose code
    differs in at most ``probes`` bits — the standard multi-probe LSH
    recall knob (sum of C(n_planes, r) for r <= probes buckets per
    query instead of more hash tables). Queries whose probe set holds
    fewer than k members fall back to a global brute search (bucket
    occupancy is a <= 2**n_planes-row aggregate, counted with a
    per-batch combiner)."""
    from itertools import combinations

    bucketed = lsh_buckets(embs, n_planes, seed)
    rng = np.random.RandomState(seed)
    dim = len(next(iter(queries.values())))
    planes = rng.randn(dim, n_planes)
    q_bucket = {}
    for qid, v in queries.items():
        bits = (np.asarray(v, dtype=np.float64) @ planes) > 0
        q_bucket[qid] = int((bits * (1 << np.arange(n_planes))).sum())

    def probe_set(b: int) -> set[int]:
        out = {b}
        for r in range(1, probes + 1):
            for flips in combinations(range(n_planes), r):
                m = 0
                for f in flips:
                    m |= 1 << f
                out.add(b ^ m)
        return out

    q_probes = {q: probe_set(b) for q, b in q_bucket.items()}
    wanted = sorted(set().union(*q_probes.values()))

    # bucket occupancy for the wanted buckets: per-batch combiner, then
    # a DISTRIBUTED merge — the driver collects <= len(wanted) rows
    # total, independent of block count (the old per-batch collect grew
    # O(batches x wanted))
    from .relational import partial_agg_sum

    def occupancy(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(pc.filter(
            t.column("bucket").combine_chunks(),
            pc.is_in(t.column("bucket"), value_set=pa.array(wanted, pa.int64()))))
        return pa.table({"bucket": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    occ_rows = partial_agg_sum(
        bucketed.map_batches(occupancy, batch_format="pyarrow"),
        "bucket", {"n": "n"}).take_all()
    assert len(occ_rows) <= len(wanted), len(occ_rows)
    counts: dict[int, int] = {row["bucket"]: row["n"] for row in occ_rows}
    fallback = {q: v for q, v in queries.items()
                if sum(counts.get(b, 0) for b in q_probes[q])
                < k + 1}                                 # +1: self may occupy
    bucket_qs = {q: v for q, v in queries.items() if q not in fallback}

    results = []
    if bucket_qs:
        keep = sorted(set().union(*(q_probes[q] for q in bucket_qs)))

        def keep_wanted(t: pa.Table) -> pa.Table:
            # vectorized mask, zero-copy Arrow — not a per-row Python filter
            import pyarrow.compute as pc
            mask = pc.is_in(t.column("bucket"),
                            value_set=pa.array(keep, pa.int64()))
            return t.filter(mask).drop_columns(["bucket"])

        sub = bucketed.map_batches(keep_wanted, batch_format="pyarrow")
        results.append(knn_brute(sub, bucket_qs, k))
    if fallback:
        results.append(knn_brute(embs, fallback, k))
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out


def label_centroids(embs: rd.Dataset, label_col: str = "label",
                    vec_col: str = "embedding") -> rd.Dataset:
    """Per-label mean embedding — the class-centroid build behind IVF
    coarse quantizer training, nearest-class-mean classification and
    cluster-quality audits — emitted EXPLODED as (label, dim, mean_v)
    so the list-column aggregate is SQL-reproducible.

    Combiner: each batch collapses to <= n_labels×d partial-sum rows
    (never the corpus); ONE groupby exchange; the finish divides the
    double sums by counts. Same sufficient-statistics shape as
    grouped_moments, applied per dimension."""
    from .relational import partial_agg_sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        labels = np.asarray(t.column(label_col).to_pylist())
        M = to_matrix(t, vec_col)
        out_l, out_d, out_s, out_n = [], [], [], []
        for lab in np.unique(labels):
            sel = M[labels == lab]
            s = sel.sum(axis=0)
            d = len(s)
            out_l.extend([int(lab)] * d)
            out_d.extend(range(d))
            out_s.extend(s.tolist())
            out_n.extend([sel.shape[0]] * d)
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "dim": pa.array(out_d, pa.int64()),
                         "s": pa.array(out_s, pa.float64()),
                         "n": pa.array(out_n, pa.int64())})

    agg = partial_agg_sum(
        embs.select_columns([label_col, vec_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], {"s": "s", "n": "n"})

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = (t.column("n").to_numpy(zero_copy_only=False)
             .astype(np.float64))
        return pa.table({"label": t.column("label"),
                         "dim": t.column("dim"),
                         "mean_v": pa.array(s / n, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def embedding_norms(embs: rd.Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> rd.Dataset:
    """Per-vector L2 norm — the normalize-before-cosine prep pass and
    a zero/degenerate-vector audit. Stateless vectorized map; output
    (vec_id, norm)."""
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t.column(id_col),
                             "norm": pa.array([], pa.float64())})
        M = to_matrix(t, vec_col)
        return pa.table({id_col: t.column(id_col),
                         "norm": pa.array(np.sqrt((M * M).sum(axis=1)),
                                          pa.float64())})
    return embs.select_columns([id_col, vec_col]).map_batches(
        f, batch_format="pyarrow")


def embedding_quantize(embs: rd.Dataset, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       n_levels: int = 256) -> rd.Dataset:
    """Per-dimension scalar quantization (the int8 compression step an
    ANN index build runs before sharding): dimension d's global
    [min, max] maps values to integer levels

        q = floor((v - min_d) * (n_levels - 1) / (max_d - min_d) + 0.5)

    (round-half-up via floor — deterministic and bitwise-identical
    between numpy and SQL given identical double inputs, unlike
    banker's-vs-away rounding). Constant dimensions quantize to 0.

    Plan: pass 1 accumulates per-batch per-dim min/max partials (dim
    rows per batch — bounded by the embedding width, never the corpus)
    into one tiny aggregate; the (dim,) arrays broadcast via
    ``ray.put``; pass 2 is a stateless vectorized map. Output LONG
    format (vec_id, dim, q) — int64s, exact to hash.
    """
    from ray.data.aggregate import Max, Min

    def mm_partial(t: pa.Table) -> pa.Table:
        m = (to_matrix(t, vec_col) if t.num_rows
             else np.empty((0, 0), np.float64))
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"dim": pa.array(np.arange(m.shape[1]), pa.int64()),
                         "lo": pa.array(m.min(axis=0), pa.float64()),
                         "hi": pa.array(m.max(axis=0), pa.float64())})

    mm = (embs.map_batches(mm_partial, batch_format="pyarrow")
          .groupby("dim").aggregate(Min("lo", alias_name="lo"),
                                    Max("hi", alias_name="hi"))
          .to_pandas().sort_values("dim"))   # bounded: one row per dim
    lo = mm["lo"].to_numpy()
    hi = mm["hi"].to_numpy()
    span = hi - lo
    scale = np.where(span > 0, (n_levels - 1) / np.where(span > 0, span, 1.0),
                     0.0)
    ref = ray.put((lo, scale))

    def quant(t: pa.Table) -> pa.Table:
        lo_, scale_ = ray.get(ref)
        m = (to_matrix(t, vec_col) if t.num_rows
             else np.empty((0, 0), np.float64))
        if m.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        q = np.floor((m - lo_) * scale_ + 0.5).astype(np.int64)
        n, d = m.shape
        ids = np.repeat(np.asarray(t.column(id_col).to_pylist(),
                                   dtype=np.int64), d)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "dim": pa.array(np.tile(np.arange(d), n),
                                         pa.int64()),
                         "q": pa.array(q.ravel(), pa.int64())})

    return embs.map_batches(quant, batch_format="pyarrow")


def embedding_covariance(embs: rd.Dataset, vec_col: str = "embedding",
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """POPULATION covariance matrix of an embedding column as a
    distributed algebraic aggregate: per batch one float64 X^T X
    (d x d numpy matmul) + column sums — the shuffle moves
    O(d^2) partial rows per batch, NEVER vectors — then one pair-keyed
    sum exchange and two tiny moment joins. Output one row per
    upper-triangle pair: (dim_i, dim_j, cov), cov quantized 9 dp
    (float-tie rule), with cov = Sxy/n - (Sx/n)(Sy/n) evaluated in
    exactly that order (the SQL oracle mirrors the expression; sum
    ORDER differs, absorbed by the rounding). The d^2-bounded state is
    constant in corpus size — the PCA/whitening precursor a 100-TB
    embedding table needs. Partial volume is d(d+1)/2 rows per BATCH
    (not per row): at d=64 that's 2k rows/batch; at d >= ~2000 raise
    ``batch_size`` so the matmul amortizes the fixed partial, or tile
    the dimension pairs."""
    import numpy as np

    from .relational import hash_aggregate, hash_join

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                            ("s", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        col = t.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = np.asarray(col.values.to_numpy(zero_copy_only=False),
                       dtype=np.float64).reshape(t.num_rows, -1)
        d = X.shape[1]
        P = X.T @ X
        iu, ju = np.triu_indices(d)
        sx = X.sum(axis=0)
        # n rides the same partial stream as one (i=-1, j=-1) row —
        # the input is scanned ONCE (the old separate embs.count()
        # executed the whole upstream plan a second time)
        return pa.table({
            "i": pa.array(np.concatenate([iu, np.arange(d), [-1]]),
                          pa.int64()),
            "j": pa.array(np.concatenate([ju, np.full(d, -1), [-1]]),
                          pa.int64()),
            "s": pa.array(np.concatenate([P[iu, ju], sx,
                                          [float(t.num_rows)]]),
                          pa.float64())})

    agg = hash_aggregate(
        embs.map_batches(partial, batch_format="pyarrow"),
        keys=["i", "j"], sum_cols={"s": "s"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("i", pa.int64()), ("j", pa.int64()),
                              ("s", pa.float64())])).materialize()

    n_tbl = agg.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t.column("i"), -1),
                                   pc.equal(t.column("j"), -1))),
        batch_format="pyarrow").take_all()
    assert len(n_tbl) <= 1, len(n_tbl)
    n_rows = int(n_tbl[0]["s"]) if n_tbl else 0

    moments = agg.map_batches(
        lambda t: pa.table({"i": t.filter(
                                pc.and_(pc.equal(t.column("j"), -1),
                                        pc.greater_equal(t.column("i"), 0)))
                            .column("i"),
                            "sx": t.filter(
                                pc.and_(pc.equal(t.column("j"), -1),
                                        pc.greater_equal(t.column("i"), 0)))
                            .column("s")}),
        batch_format="pyarrow")
    pairs = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("j"), 0)),
        batch_format="pyarrow")

    j1 = hash_join(
        pairs, moments, on="i",
        left_schema=pa.schema([("i", pa.int64()), ("j", pa.int64()),
                               ("s", pa.float64())]),
        right_schema=pa.schema([("i", pa.int64()),
                                ("sx", pa.float64())]),
        num_partitions=num_partitions)
    j2 = hash_join(
        j1.map_batches(
            lambda t: t.rename_columns(
                ["i", "j", "s", "sx_i"]), batch_format="pyarrow"),
        moments.map_batches(
            lambda t: pa.table({"j": t.column("i"),
                                "sx_j": t.column("sx")}),
            batch_format="pyarrow"),
        on="j",
        left_schema=pa.schema([("i", pa.int64()), ("j", pa.int64()),
                               ("s", pa.float64()),
                               ("sx_i", pa.float64())]),
        right_schema=pa.schema([("j", pa.int64()),
                                ("sx_j", pa.float64())]),
        num_partitions=num_partitions)

    n = float(n_rows)

    def finish(t: pa.Table) -> pa.Table:
        sxy = pc.divide(t.column("s"), n)
        mi = pc.divide(t.column("sx_i"), n)
        mj = pc.divide(t.column("sx_j"), n)
        cov = pc.round(pc.subtract(sxy, pc.multiply(mi, mj)),
                       ndigits=9)
        return pa.table({"dim_i": t.column("i"),
                         "dim_j": t.column("j"),
                         "cov": cov})

    return j2.map_batches(finish, batch_format="pyarrow")
