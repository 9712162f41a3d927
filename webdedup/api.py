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
    with_values: bool = False,
):
    """features(array<long>)[, values(array<double>)] → bands(array<long>).

    shingle=False: band table = one entry per raw signature slot (the
    reference's default shingle=0 — one hash table per hash function,
    inverseIndexStorageUnorderedMap.h:19-38).
    shingle=True: slots folded by the chained wang32 (P4).
    hash_algorithm=1: WTA-Hash signatures (P5) instead of MinHash; WTA is the
    one signature family that reads feature VALUES (inverseIndex.cpp:319-328
    picks the max-value key among the rangeK smallest hashed keys) — when a
    values column is present it is threaded through here. MinHash stays
    presence-only (inverseIndex.cpp:256), matching the reference.
    """

    def _compute(rows, val_rows):
        import numpy as np

        if hash_algorithm == 1:
            sigs = np.vstack(
                [
                    K.wta_signature(
                        r,
                        None if val_rows is None else val_rows[i],
                        num_hashes,
                        range_k_wta,
                    )
                    for i, r in enumerate(rows)
                ]
            ) if rows else np.empty((0, num_hashes), dtype=np.uint32)
        else:
            sigs = K.minhash_signatures(rows, num_hashes)
        if shingle:
            sigs = K.fold_bands(sigs, rows_per_band)
        return pd.Series([s.astype(np.int64) for s in sigs])

    if with_values:

        @pandas_udf(ArrayType(LongType()))
        def sig_v(features: pd.Series, values: pd.Series) -> pd.Series:
            import numpy as np

            rows = [np.asarray(r, dtype=np.uint32) for r in features]
            vals = [
                None if v is None else np.asarray(v, dtype=np.float32)
                for v in values
            ]
            return _compute(rows, vals)

        return sig_v

    @pandas_udf(ArrayType(LongType()))
    def sig(features: pd.Series) -> pd.Series:
        import numpy as np

        rows = [np.asarray(r, dtype=np.uint32) for r in features]
        return _compute(rows, None)

    return sig


def _metric_udf(metric: str):
    """pandas_udf computing the exact pair metric (kernels.sparse_metric).

    jaccard reads id arrays only; euclidean/cosine also read value arrays
    (reference exact refinement, sparseMatrix.h:231-316)."""
    if metric == "jaccard":

        @pandas_udf(DoubleType())
        def jac(a: pd.Series, b: pd.Series) -> pd.Series:
            import numpy as np

            out = np.empty(len(a))
            for i in range(len(a)):
                out[i] = 1.0 - K.jaccard_sorted(
                    np.asarray(a.iloc[i], dtype=np.int64),
                    np.asarray(b.iloc[i], dtype=np.int64),
                )
            return pd.Series(out)

        return jac

    @pandas_udf(DoubleType())
    def met(
        fa: pd.Series, va: pd.Series, fb: pd.Series, vb: pd.Series
    ) -> pd.Series:
        import numpy as np

        out = np.empty(len(fa))
        for i in range(len(fa)):
            ia = np.asarray(fa.iloc[i], dtype=np.int64)
            ib = np.asarray(fb.iloc[i], dtype=np.int64)
            wa = (
                np.ones(ia.size)
                if va.iloc[i] is None
                else np.asarray(va.iloc[i], dtype=np.float64)
            )
            wb = (
                np.ones(ib.size)
                if vb.iloc[i] is None
                else np.asarray(vb.iloc[i], dtype=np.float64)
            )
            out[i] = K.sparse_metric(ia, wa, ib, wb, metric)
        return pd.Series(out)

    return met


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
        metric: str | None = None,
    ):
        """``metric`` selects the exact refinement metric for fast=False
        (reference Q7/Q9, nearestNeighbors.cpp:150-190):

        * ``'euclidean'`` — SQUARED euclidean over (feature, value) rows,
          the reference's similarity=0 default (sparseMatrix.h:231-272).
        * ``'cosine'``    — cosine similarity, what similarity=1 selects
          (sparseMatrix.h:274-316). 'distance' outputs hold the similarity
          score; ranking is descending.
        * ``'jaccard'``   — 1 - Jaccard over the id sets (dedup-native).
        * ``None`` (default) — auto: cosine if ``similarity=True``
          (reference parity), else euclidean when the fitted data carries a
          ``values`` column (reference parity for weighted CSR input), else
          jaccard (presence-only dedup default; documented deviation — the
          reference would return |A|+|B|-2|A∩B| for binary rows).
        """
        if shingle and number_of_hash_functions % shingle_size != 0:
            raise ValueError(
                "number_of_hash_functions must be divisible by shingle_size "
                "when shingle=1 (band fold width, inverseIndex.cpp:70-79)"
            )
        if metric not in (None, "jaccard", "euclidean", "cosine"):
            raise ValueError(f"unknown metric {metric!r}")
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
        self.metric = metric
        self._index: DataFrame | None = None   # (id, slot, hash) bucket rows
        self._fitted: DataFrame | None = None  # (id, features[, values], bands)
        self._labels: DataFrame | None = None
        self._has_values = False
        self._sig_len = (
            number_of_hash_functions // shingle_size if shingle else number_of_hash_functions
        )

    def _resolved_metric(self) -> str:
        """similarity=True forces cosine (nearestNeighbors.cpp:155-157);
        otherwise the explicit metric, else euclidean for valued data
        (reference default) / jaccard for presence-only data."""
        if self.similarity:
            return "cosine"
        if self.metric is not None:
            return self.metric
        return "euclidean" if self._has_values else "jaccard"

    # ---------------- index build (B1) ----------------

    def _featurize(self, X: DataFrame) -> DataFrame:
        with_values = "values" in X.columns
        udf = _signature_udf(
            self.number_of_hash_functions,
            self.shingle_size,
            bool(self.shingle),
            self.hash_algorithm,
            self.rangeK_wta,
            with_values=with_values,
        )
        if with_values:
            return X.select("id", "features", "values").withColumn(
                "bands", udf("features", "values")
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
        """X: (id long, features array<long>[, values array<double>]);
        y: optional (id, label). ``values`` is the reference CSR ``data``
        array aligned with ``features`` — read by WTA signatures and the
        euclidean/cosine exact refinement; MinHash ignores it."""
        self._has_values = "values" in X.columns
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
                "metric",
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
        obj._has_values = "values" in feat.columns
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

    def _rank_order(self, metric: str):
        """cosine is a similarity (higher = closer, sorted DESC like
        mapSortDescByValueFloat, sparseMatrix.h:313); euclidean/jaccard are
        distances (ASC, sparseMatrix.h:269)."""
        first = (
            F.desc("distance") if metric == "cosine" else F.asc("distance")
        )
        return Window.partitionBy("query_id").orderBy(first, F.asc("cand_id"))

    def _with_exact_metric(self, cand: DataFrame, query_feat: DataFrame) -> DataFrame:
        """Attach the exact metric value as 'distance' to (query_id, cand_id)
        pairs — the shared core of Q7/Q9 refinement and Q5 radius filtering."""
        metric = self._resolved_metric()
        q_has_values = "values" in query_feat.columns
        if metric in ("euclidean", "cosine") and q_has_values != self._has_values:
            # mirrors the reference's single-CSR-format contract: fit and
            # query share one (indices, data) layout. Silently substituting
            # ones for the missing side computes euclidean/cosine between
            # weighted candidates and implicitly-binary queries — plausible-
            # looking but inconsistent vectors (ADVICE r2).
            raise ValueError(
                f"fit data has_values={self._has_values} but query data "
                f"has_values={q_has_values}; {metric} needs one consistent "
                "CSR format — add/drop the 'values' column on the query side"
            )
        udf = _metric_udf(metric)
        null_vals = F.lit(None).cast("array<double>")
        qf = query_feat.select(
            F.col("id").alias("query_id"),
            F.col("features").alias("f_q"),
            (F.col("values") if "values" in query_feat.columns else null_vals).alias("v_q"),
        )
        cf = self._fitted.select(
            F.col("id").alias("cand_id"),
            F.col("features").alias("f_c"),
            (F.col("values") if "values" in self._fitted.columns else null_vals).alias("v_c"),
        )
        joined = cand.select("query_id", "cand_id").join(qf, "query_id").join(cf, "cand_id")
        if metric == "jaccard":
            return joined.withColumn("distance", udf("f_q", "f_c"))
        out = joined.withColumn("distance", udf("f_q", "v_q", "f_c", "v_c"))
        if metric == "euclidean":
            # the reference sorts by the squared value but sqrt()s at output
            # time (nearestNeighbors.cpp:357) — user-visible distances are
            # true euclidean; sqrt is monotone so ranking is unaffected
            out = out.withColumn("distance", F.sqrt("distance"))
        return out

    def _exact_rerank(self, cand: DataFrame, query_feat: DataFrame, k: int) -> DataFrame:
        """Q7/Q9: exact metric over candidates, final top-k.

        Metric per ``_resolved_metric`` — squared euclidean / cosine over
        (feature, value) rows exactly like the reference's refinement
        (nearestNeighbors.cpp:150-190 → sparseMatrix.h:231-316), or Jaccard
        for the presence-only dedup default.

        The reference's Q8 neighbor-of-neighbor expansion is demand-driven
        memoization; set-at-a-time the full candidate edge table already
        covers each query's round-1 neighborhood, and a 2-hop expansion is
        available via ``expand_two_hop`` (kept out of the default path: for
        Jaccard dedup it changes results only below the radius of interest).
        """
        w = self._rank_order(self._resolved_metric())
        return (
            self._with_exact_metric(cand, query_feat)
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

        fast=False persists the round-1 edge table into the CALLER's
        persist scope (it feeds three downstream subtrees); a loop issuing
        many kneighbors calls outside any ``scoped_persists`` block should
        release between materialized results (``release_persisted()``, or
        wrap each call in its own scope) or the default scope accumulates
        one cached edge table per call.
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
        # limit_neighbors_of_neighbors = min(100, n + excess) — note PLUS,
        # not times (nearestNeighbors.cpp:86-89)
        limit = min(100, k + self.excess_factor)
        round1 = self._exact_rerank(approx, qf, limit)
        if neighbor_of_neighbor:
            from webdedup.joins import track_persist

            # round1 feeds BOTH sides of the 2-hop join AND the candidate
            # union below — without a cache the whole round-1 subtree
            # (collision join + exact-metric UDF) executes three times
            # (measured 26.6 s → 15.1 s at the 200k bench corpus).
            # Registered with the caller's persist scope; released by
            # release_persisted() / the owning run's scope.release().
            round1 = track_persist(round1)
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
            w2 = self._rank_order(self._resolved_metric())
            out = (
                round1.withColumn("rnk", F.rank().over(w2))
                .where(F.col("rnk") <= k)
                .select("query_id", "cand_id", "distance", "rnk")
            )
        return out if not self_query else out.where(F.col("query_id") != F.col("cand_id"))

    def radius_neighbors(self, X: DataFrame | None = None, radius: float | None = None) -> DataFrame:
        """Q5: all neighbors within a distance radius (no k cut).

        For distance metrics (jaccard/euclidean) keeps distance <= radius
        (nearestNeighbors.cpp:175-180). For cosine the radius is a
        SIMILARITY floor: keeps score >= radius — deliberate deviation from
        the reference, whose desc-sorted `val <= pRadius → push else break`
        loop (nearestNeighbors.cpp:172-181) drops everything for any
        meaningful similarity radius; a floor is the semantics its callers
        would want.
        """
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
        metric = self._resolved_metric()
        gate = (
            F.col("distance") >= r if metric == "cosine" else F.col("distance") <= r
        )
        return (
            self._with_exact_metric(approx, qf)
            .where(gate)
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

    def fit_kneighbors_graph(
        self, X: DataFrame, n_neighbors: int | None = None,
        mode: str = "distance", symmetric: bool = True,
    ) -> DataFrame:
        """Fused fit + k-NN self-graph
        (nearestNeighbors_PythonInterface.cpp:265-363 family)."""
        return self.fit(X).kneighbors_graph(None, n_neighbors, mode, symmetric)

    def fit_radius_neighbors(self, X: DataFrame, radius: float | None = None) -> DataFrame:
        """Fused fit + radius self-query
        (nearestNeighbors_PythonInterface.cpp:388)."""
        return self.fit(X).radius_neighbors(None, radius)

    def fit_radius_neighbors_graph(
        self, X: DataFrame, radius: float | None = None,
        mode: str = "distance", symmetric: bool = True,
    ) -> DataFrame:
        """Fused fit + radius self-graph
        (nearestNeighbors_PythonInterface.cpp:389)."""
        return self.fit(X).radius_neighbors_graph(None, radius, mode, symmetric)

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

    def cluster(self, eps: float = 0.5, min_samples: int = 1) -> DataFrame:
        """M3: DBSCAN over the radius graph → (id, cluster_id).

        min_samples matches sklearn DBSCAN semantics as used by the
        reference's MinHashDBSCAN wrapper (cluster/minHashDBSCAN.py:21,47):
        a point is CORE iff its eps-neighborhood (including itself) has
        >= min_samples points; clusters = connected components over
        core-core edges; BORDER points (non-core within eps of a core)
        adopt the min cluster label among their core neighbors (sklearn's
        assignment is scan-order-dependent — we pin the deterministic min);
        remaining points are NOISE with cluster_id = -1.

        min_samples <= 1 degenerates to pure connectivity with singletons
        labeled by their own id (the engine's dedup-native default; sklearn
        min_samples=1 would likewise make every point core).
        """
        edges = self.radius_neighbors(None, radius=eps).select(
            F.col("query_id").alias("a"), F.col("cand_id").alias("b")
        )
        verts = self._fitted.select(F.col("id"))
        if min_samples <= 1:
            return connected_components(verts, edges)
        edges.persist()
        # radius_neighbors self-query emits both directions of every pair
        # (collision join + symmetric metric), so out-degree == eps-degree
        deg = edges.groupBy("a").agg(F.count("*").alias("_deg"))
        core = deg.where(F.col("_deg") >= min_samples - 1).select(
            F.col("a").alias("id")
        )
        core.persist()
        core_edges = (
            edges.join(core.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(core.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
        )
        core_labels = connected_components(core, core_edges)
        # border points: non-core touching >= 1 core → min core-neighbor label
        border = (
            edges.join(core.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(
                core_labels.withColumnRenamed("id", "b"), "b"
            )
            .groupBy("a")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .select(F.col("a").alias("id"), "cluster_id")
        )
        labeled = core_labels.unionByName(border)
        return verts.join(labeled, "id", "left").select(
            "id", F.coalesce("cluster_id", F.lit(-1)).alias("cluster_id")
        )

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
