"""scikit-learn-shaped query surface over Spark DataFrames.

Re-expresses the reference's public API (neighbors/minHash.py:19-506,
neighbors/minHashClassifier.py, cluster/*) set-at-a-time:

* ``MinHashNeighbors.fit``            — index build (B1): featurize + band table
* ``kneighbors``                      — Q1-Q4 collision counting + tie-extended
                                        top-k, optional exact re-rank (Q7/Q9)
* ``radius_neighbors``                — Q5 (distance threshold filter)
* ``kneighbors_graph``                — O3 (symmetrized edge list)
* ``fit_kneighbors``                  — Q11 fused self-query
* ``MinHashClassifier``               — M1/M2 majority vote over neighbor labels
* ``cluster``                         — M3-equivalent: connected components over
                                        the radius graph (eps = distance cut)

Input convention: a DataFrame with an integer ``id`` column and a
``features`` column of array<long> feature ids (the reference's CSR row =
set of feature ids, SURVEY.md §1.1). Results are edge lists — the ragged
ndarray shaping of the reference (O1/O2) has no DataFrame counterpart and is
available via ``to_local_arrays`` for API parity at small scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

from webdedup import kernels as K
from webdedup.components import connected_components


def _signature_udf(
    num_hashes: int,
    rows_per_band: int,
    shingle: bool,
    hash_algorithm: int = 0,
    range_k_wta: int = 20,
):
    """features(array<long>) → bands(array<long>).

    shingle=False: band table = one entry per raw signature slot (the
    reference's default shingle=0 — one hash table per hash function,
    inverseIndexStorageUnorderedMap.h:19-38).
    shingle=True: slots folded by the chained wang32 (P4).
    hash_algorithm=1: WTA-Hash signatures (P5) instead of MinHash.
    """

    @pandas_udf(ArrayType(LongType()))
    def sig(features: pd.Series) -> pd.Series:
        import numpy as np

        rows = [np.asarray(r, dtype=np.uint32) for r in features]
        if hash_algorithm == 1:
            sigs = np.vstack(
                [K.wta_signature(r, None, num_hashes, range_k_wta) for r in rows]
            ) if rows else np.empty((0, num_hashes), dtype=np.uint32)
        else:
            sigs = K.minhash_signatures(rows, num_hashes)
        if shingle:
            sigs = K.fold_bands(sigs, rows_per_band)
        return pd.Series([s.astype(np.int64) for s in sigs])

    return sig


@pandas_udf(DoubleType())
def _jaccard_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    out = np.empty(len(a))
    for i in range(len(a)):
        out[i] = 1.0 - K.jaccard_sorted(
            np.asarray(a.iloc[i], dtype=np.int64), np.asarray(b.iloc[i], dtype=np.int64)
        )
    return pd.Series(out)


class MinHashNeighbors:
    """Approximate nearest neighbors over sparse feature-id sets.

    Parameter names mirror the reference constructor (minHash.py:106-111);
    ``shingle_size`` is the reference's signature-fold width (= LSH rows per
    band when ``shingle=1``). ``minimal_blocks_in_common`` is accepted and
    ignored — it is a dead parameter in the reference too (stored at
    inverseIndex.cpp:56, never read at query time; SURVEY.md §5).
    """

    def __init__(
        self,
        n_neighbors: int = 5,
        radius: float = 1.0,
        fast: bool = False,
        number_of_hash_functions: int = 400,
        max_bin_size: int = 50,
        shingle_size: int = 4,
        shingle: int = 0,
        excess_factor: int = 5,
        similarity: bool = False,
        minimal_blocks_in_common: int = 1,  # dead parameter, reference parity
        hash_algorithm: int = 0,            # 0 = MinHash (P3), 1 = WTA-Hash (P5)
        rangeK_wta: int = 20,
        store_value_with_least_sigificant_bit: int = 0,  # P7 (typo = reference's)
    ):
        self.n_neighbors = n_neighbors
        self.radius = radius
        self.fast = fast
        self.number_of_hash_functions = number_of_hash_functions
        self.max_bin_size = max_bin_size
        self.shingle_size = shingle_size
        self.shingle = shingle
        self.excess_factor = excess_factor
        self.similarity = similarity
        self.hash_algorithm = hash_algorithm
        self.rangeK_wta = rangeK_wta
        self.lsb_bits = store_value_with_least_sigificant_bit
        self._index: DataFrame | None = None   # (id, slot, hash) bucket rows
        self._fitted: DataFrame | None = None  # (id, features, bands)
        self._labels: DataFrame | None = None
        self._sig_len = (
            number_of_hash_functions // shingle_size if shingle else number_of_hash_functions
        )

    # ---------------- index build (B1) ----------------

    def _featurize(self, X: DataFrame) -> DataFrame:
        udf = _signature_udf(
            self.number_of_hash_functions,
            self.shingle_size,
            bool(self.shingle),
            self.hash_algorithm,
            self.rangeK_wta,
        )
        return X.select("id", "features").withColumn("bands", udf("features"))

    def _build_index(self, feat: DataFrame) -> DataFrame:
        idx = feat.select("id", F.posexplode("bands").alias("slot", "hash"))
        if self.lsb_bits > 0:
            # P7 LSB subsampling: only index hash values whose low v bits are
            # all ones (inverseIndexStorageUnorderedMap.cpp:50-56)
            mask = (1 << self.lsb_bits) - 1
            idx = idx.where(F.col("hash").bitwiseAND(F.lit(mask)) == F.lit(mask))
        return idx

    def fit(self, X: DataFrame, y: DataFrame | None = None) -> "MinHashNeighbors":
        """X: (id long, features array<long>); y: optional (id, label)."""
        feat = self._featurize(X)
        feat.persist()
        self._fitted = feat
        self._index = self._build_index(feat)
        self._labels = y
        return self

    def partial_fit(self, X: DataFrame, y: DataFrame | None = None) -> "MinHashNeighbors":
        """Append new rows to the fitted index (reference S2) — a union, no
        reallocation (append-only snapshots at scale, SURVEY.md §1.2)."""
        if self._fitted is None:
            return self.fit(X, y)
        feat = self._featurize(X)
        self._fitted = self._fitted.unionByName(feat)
        self._index = self._build_index(self._fitted)
        if y is not None and self._labels is not None:
            self._labels = self._labels.unionByName(y)
        return self

    # ---------------- index maintenance (B3/B4/B6) ----------------

    def prune(self, n: int = 1) -> "MinHashNeighbors":
        """B3: delete every bucket with <= n members
        (inverseIndexStorageUnorderedMap.cpp:162-187)."""
        sizes = self._index.groupBy("slot", "hash").agg(F.count("*").alias("c"))
        keep = sizes.where(F.col("c") > n).select("slot", "hash")
        self._index = self._index.join(keep, ["slot", "hash"], "left_semi")
        return self

    def remove_weak_slots(self, n: int = 0) -> "MinHashNeighbors":
        """B4: drop every signature slot whose table has < n distinct hash
        values; n=0 ⇒ below mean+stddev over slots
        (inverseIndexStorageUnorderedMap.cpp:192-236)."""
        per_slot = self._index.groupBy("slot").agg(
            F.countDistinct("hash").alias("nvals")
        )
        if n == 0:
            stats = per_slot.agg(
                F.avg("nvals").alias("mu"), F.stddev_pop("nvals").alias("sd")
            ).collect()[0]
            n = (stats["mu"] or 0) + (stats["sd"] or 0)
        keep = per_slot.where(F.col("nvals") >= F.lit(n)).select("slot")
        self._index = self._index.join(F.broadcast(keep), ["slot"], "left_semi")
        return self

    def index_stats(self) -> DataFrame:
        """B6: per-slot distribution stats — (slot, n_hash_values,
        mean_bucket_size, stddev_bucket_size), the reference's
        distribution_of_inverse_index (minHash.py:495-499)."""
        sizes = self._index.groupBy("slot", "hash").agg(F.count("*").alias("c"))
        return sizes.groupBy("slot").agg(
            F.count("*").alias("n_hash_values"),
            F.avg("c").alias("mean_bucket_size"),
            F.coalesce(F.stddev_pop("c"), F.lit(0.0)).alias("stddev_bucket_size"),
        )

    # ---------------- persistence (S4) ----------------

    def save(self, path: str) -> None:
        """Persist the fitted index (features + bands) and config to parquet
        + JSON — the partial_fit-able on-disk form of the fitted model."""
        import json
        import os

        if self._fitted is None:
            raise RuntimeError("fit first")
        self._fitted.write.mode("overwrite").parquet(os.path.join(path, "fitted"))
        if self._labels is not None:
            self._labels.write.mode("overwrite").parquet(os.path.join(path, "labels"))
        cfg = {
            k: getattr(self, k)
            for k in (
                "n_neighbors", "radius", "fast", "number_of_hash_functions",
                "max_bin_size", "shingle_size", "shingle", "excess_factor",
                "similarity", "hash_algorithm", "rangeK_wta", "lsb_bits",
            )
        }
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(cfg, f)

    @classmethod
    def load(cls, spark, path: str) -> "MinHashNeighbors":
        import json
        import os

        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        lsb = cfg.pop("lsb_bits")
        obj = cls(**cfg, store_value_with_least_sigificant_bit=lsb)
        feat = spark.read.parquet(os.path.join(path, "fitted"))
        feat.persist()
        obj._fitted = feat
        obj._index = obj._build_index(feat)
        lab = os.path.join(path, "labels")
        if os.path.exists(lab):
            obj._labels = spark.read.parquet(lab)
        return obj

    # ---------------- query (Q1-Q9) ----------------

    def _collisions(self, query_feat: DataFrame) -> DataFrame:
        """Q2: equi-join on (slot, hash) + collision count per (query, cand).

        Hot buckets (>= max_bin_size members on the INDEX side) are skipped
        entirely at query time, matching inverseIndex.cpp:555's bucket-size
        guard with B2 tombstone semantics.
        """
        idx = self._index
        hot = (
            idx.groupBy("slot", "hash")
            .agg(F.count("*").alias("bsz"))
            .where(F.col("bsz") >= self.max_bin_size)
            .select("slot", "hash")
        )
        idx_ok = idx.join(F.broadcast(hot), ["slot", "hash"], "left_anti").select(
            F.col("id").alias("cand_id"), "slot", "hash"
        )
        q = query_feat.select(
            F.col("id").alias("query_id"), F.posexplode("bands").alias("slot", "hash")
        )
        # reference parity: slots whose signature value is 0 or MAX_VALUE are
        # skipped at query time (inverseIndex.cpp:530-561 hashID guard)
        q = q.where(
            (F.col("hash") != 0) & (F.col("hash") != F.lit(0xFFFFFFFF))
        )
        return (
            q.join(idx_ok, ["slot", "hash"])
            .groupBy("query_id", "cand_id")
            .agg(F.count("*").alias("collisions"))
        )

    def _approx_neighbors(self, query_feat: DataFrame, k: int, cut: bool) -> DataFrame:
        """Q2-Q4: collision counting → distance transform → tie-extended top-k.

        distance = 1 - collisions / sig_len (Q3, inverseIndex.cpp:626-633
        with maximal collisions = number of indexed slots); top
        k·excess_factor kept by rank() so boundary ties extend the cut
        (Q4, inverseIndex.cpp:586-617).
        """
        col = self._collisions(query_feat)
        if cut:
            col = col.where(F.col("query_id") != F.col("cand_id"))
        dist = 1.0 - F.col("collisions") / F.lit(float(self._sig_len))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("collisions"), F.asc("cand_id")
        )
        return (
            col.withColumn("distance", dist)
            .withColumn("rnk", F.rank().over(w))
            .where(F.col("rnk") <= k * self.excess_factor)
        )

    def _exact_rerank(self, cand: DataFrame, query_feat: DataFrame, k: int) -> DataFrame:
        """Q7/Q9: exact Jaccard distance over candidates, final top-k.

        The reference's Q8 neighbor-of-neighbor expansion is demand-driven
        memoization; set-at-a-time the full candidate edge table already
        covers each query's round-1 neighborhood, and a 2-hop expansion is
        available via ``expand_two_hop`` (kept out of the default path: for
        Jaccard dedup it changes results only below the radius of interest).
        """
        qf = query_feat.select(
            F.col("id").alias("query_id"), F.col("features").alias("f_q")
        )
        cf = self._fitted.select(
            F.col("id").alias("cand_id"), F.col("features").alias("f_c")
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("cand_id"))
        return (
            cand.select("query_id", "cand_id")
            .join(qf, "query_id")
            .join(cf, "cand_id")
            .withColumn("distance", _jaccard_dist_udf("f_q", "f_c"))
            .withColumn("rnk", F.rank().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "cand_id", "distance", "rnk")
        )

    def kneighbors(
        self,
        X: DataFrame | None = None,
        n_neighbors: int | None = None,
        neighbor_of_neighbor: bool = True,
    ) -> DataFrame:
        """→ (query_id, cand_id, distance, rnk) edge list.

        X=None queries the fitted data against itself with self-edges
        dropped (cutFirstValue semantics, parsePythonToCpp.h:110-180).

        fast=False runs the reference's full chain: exact round 1 over LSH
        candidates capped at limit_neighbors_of_neighbors=100
        (nearestNeighbors.cpp:86-89), neighbor-of-neighbor expansion through
        the fitted data's own round-1 edges (Q8, :229-315 — set-at-a-time
        instead of demand-memoized), then exact round-2 re-rank to top k
        (Q9, :326-382). Disable the expansion with
        ``neighbor_of_neighbor=False``.
        """
        if self._fitted is None:
            raise RuntimeError("fit first")
        k = n_neighbors or self.n_neighbors
        self_query = X is None
        qf = self._fitted if self_query else self._featurize(X)
        approx = self._approx_neighbors(qf, k, cut=self_query)
        if self.fast:
            w = Window.partitionBy("query_id").orderBy(
                F.desc("collisions"), F.asc("cand_id")
            )
            return (
                approx.withColumn("rnk", F.rank().over(w))
                .where(F.col("rnk") <= k)
                .select("query_id", "cand_id", "distance", "rnk")
            )
        limit = min(100, max(k * self.excess_factor, k))
        round1 = self._exact_rerank(approx, qf, limit)
        if neighbor_of_neighbor:
            if self_query:
                base = round1
            else:
                base = self._exact_rerank(
                    self._approx_neighbors(self._fitted, limit, cut=True),
                    self._fitted,
                    limit,
                )
            hop2 = (
                round1.select("query_id", F.col("cand_id").alias("_mid"))
                .join(
                    base.select(
                        F.col("query_id").alias("_mid"), F.col("cand_id")
                    ),
                    "_mid",
                )
                .select("query_id", "cand_id")
            )
            cand2 = (
                round1.select("query_id", "cand_id")
                .unionByName(hop2)
                .dropDuplicates(["query_id", "cand_id"])
            )
            if self_query:
                # 2-hop reintroduces A→B→A self-pairs; drop BEFORE the top-k
                # rank so self never consumes a neighbor slot
                cand2 = cand2.where(F.col("query_id") != F.col("cand_id"))
            out = self._exact_rerank(cand2, qf, k)
        else:
            w2 = Window.partitionBy("query_id").orderBy(
                F.asc("distance"), F.asc("cand_id")
            )
            out = (
                round1.withColumn("rnk", F.rank().over(w2))
                .where(F.col("rnk") <= k)
                .select("query_id", "cand_id", "distance", "rnk")
            )
        return out if not self_query else out.where(F.col("query_id") != F.col("cand_id"))

    def radius_neighbors(self, X: DataFrame | None = None, radius: float | None = None) -> DataFrame:
        """Q5: all neighbors within a distance radius (no k cut)."""
        if self._fitted is None:
            raise RuntimeError("fit first")
        r = radius if radius is not None else self.radius
        self_query = X is None
        qf = self._fitted if self_query else self._featurize(X)
        approx = self._approx_neighbors(qf, k=2**31 - 1, cut=self_query)
        if self.fast:
            return approx.where(F.col("distance") <= r).select(
                "query_id", "cand_id", "distance"
            )
        qf2 = qf.select(F.col("id").alias("query_id"), F.col("features").alias("f_q"))
        cf = self._fitted.select(
            F.col("id").alias("cand_id"), F.col("features").alias("f_c")
        )
        return (
            approx.select("query_id", "cand_id")
            .join(qf2, "query_id")
            .join(cf, "cand_id")
            .withColumn("distance", _jaccard_dist_udf("f_q", "f_c"))
            .where(F.col("distance") <= r)
            .select("query_id", "cand_id", "distance")
        )

    def kneighbors_graph(
        self,
        X: DataFrame | None = None,
        n_neighbors: int | None = None,
        mode: str = "distance",
        symmetric: bool = True,
    ) -> DataFrame:
        """O3: (src, dst, weight) edge list; symmetric=True averages the two
        directed weights ((w_ij+w_ji)/2, parsePythonToCpp.h:206-221);
        mode='connectivity' sets weight 1.0."""
        e = self.kneighbors(X, n_neighbors).select(
            F.col("query_id").alias("src"), F.col("cand_id").alias("dst"), "distance"
        )
        if symmetric:
            e = (
                e.unionByName(
                    e.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst"), "distance"
                    )
                )
                .groupBy("src", "dst")
                .agg(F.avg("distance").alias("distance"))
            )
        if mode == "connectivity":
            return e.select("src", "dst", F.lit(1.0).alias("weight"))
        return e.select("src", "dst", F.col("distance").alias("weight"))

    def radius_neighbors_graph(
        self, X: DataFrame | None = None, radius: float | None = None,
        mode: str = "distance", symmetric: bool = True,
    ) -> DataFrame:
        """O4: radius variant of the graph builder."""
        e = self.radius_neighbors(X, radius).select(
            F.col("query_id").alias("src"), F.col("cand_id").alias("dst"), "distance"
        )
        if symmetric:
            e = (
                e.unionByName(
                    e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "distance")
                )
                .groupBy("src", "dst")
                .agg(F.avg("distance").alias("distance"))
            )
        if mode == "connectivity":
            return e.select("src", "dst", F.lit(1.0).alias("weight"))
        return e.select("src", "dst", F.col("distance").alias("weight"))

    def fit_kneighbors(self, X: DataFrame, n_neighbors: int | None = None) -> DataFrame:
        """Q11 fused fit + self-query."""
        return self.fit(X).kneighbors(None, n_neighbors)

    def expand_two_hop(self, edges: DataFrame, limit: int = 100) -> DataFrame:
        """Q8: neighbor-of-neighbor candidate expansion (bounded), as a
        2-hop self-join of the edge list; re-rank with _exact_rerank."""
        e1 = edges.select(F.col("query_id"), F.col("cand_id").alias("mid"))
        e2 = edges.select(
            F.col("query_id").alias("mid"), F.col("cand_id")
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("cand_id"))
        return (
            e1.join(e2, "mid")
            .select("query_id", "cand_id")
            .where(F.col("query_id") != F.col("cand_id"))
            .unionByName(edges.select("query_id", "cand_id"))
            .dropDuplicates(["query_id", "cand_id"])
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= limit)
            .drop("_r")
        )

    def cluster(self, eps: float = 0.5) -> DataFrame:
        """M3-equivalent: connected components over the radius graph at
        distance <= eps → (id, cluster_id)."""
        edges = self.radius_neighbors(None, radius=eps).select(
            F.col("query_id").alias("a"), F.col("cand_id").alias("b")
        )
        verts = self._fitted.select(F.col("id"))
        return connected_components(verts, edges)

    def to_local_arrays(self, edges: DataFrame, k: int):
        """O1 shaping for small results: rectangular (ids, distances) lists
        padded with -1 / 0.0 like parsePythonToCpp.h:110-180."""
        rows = edges.orderBy("query_id", "rnk", "cand_id").collect()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append((r["cand_id"], r["distance"]))
        ids, dists = [], []
        for q in sorted(by_q):
            ns = by_q[q][:k]
            pad = k - len(ns)
            ids.append([n for n, _ in ns] + [-1] * pad)
            dists.append([d for _, d in ns] + [0.0] * pad)
        return ids, dists


class MinHashClassifier(MinHashNeighbors):
    """M1/M2: k-NN majority-vote classifier over the MinHash index."""

    def fit(self, X: DataFrame, y: DataFrame) -> "MinHashClassifier":
        if y is None:
            raise ValueError("classifier needs labels (id, label)")
        super().fit(X, y)
        return self

    def predict(self, X: DataFrame | None = None, n_neighbors: int | None = None) -> DataFrame:
        """→ (query_id, label): mode over neighbor labels; deterministic
        tie-break = smallest label (Counter.most_common order is
        insertion-dependent in the reference; we pin it)."""
        nn = self.kneighbors(X, n_neighbors)
        lab = self._labels.select(F.col("id").alias("cand_id"), "label")
        votes = (
            nn.join(lab, "cand_id")
            .groupBy("query_id", "label")
            .agg(F.count("*").alias("v"))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("label"))
        return (
            votes.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("query_id", "label")
        )

    def predict_proba(self, X: DataFrame | None = None, n_neighbors: int | None = None) -> DataFrame:
        """→ (query_id, label, proba) label vote frequencies."""
        nn = self.kneighbors(X, n_neighbors)
        lab = self._labels.select(F.col("id").alias("cand_id"), "label")
        votes = (
            nn.join(lab, "cand_id")
            .groupBy("query_id", "label")
            .agg(F.count("*").alias("v"))
        )
        tot = votes.groupBy("query_id").agg(F.sum("v").alias("t"))
        return votes.join(tot, "query_id").select(
            "query_id", "label", (F.col("v") / F.col("t")).alias("proba")
        )

    def score(self, X: DataFrame, y: DataFrame) -> float:
        """Accuracy of predict(X) against (id, label)."""
        pred = self.predict(X)
        truth = y.select(F.col("id").alias("query_id"), F.col("label").alias("truth"))
        j = pred.join(truth, "query_id")
        n = j.count()
        return j.where(F.col("label") == F.col("truth")).count() / n if n else 0.0
