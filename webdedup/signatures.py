"""Arrow/pandas-UDF featurization: text → shingles, MinHash, bands, SimHash.

One vectorized UDF computes every fingerprint family in a single Python
round-trip per Arrow batch (the columnar analogue of the reference's fused
SSE signature loop, inverseIndex.cpp:105-167). No per-row Python at the
DataFrame level — per input_hint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from webdedup import kernels as K
from webdedup.config import DedupConfig

_FEATURIZE_SCHEMA = StructType(
    [
        # shingles packed as little-endian uint32 bytes: 4 B/shingle instead
        # of an 8 B list element — halves the cache/shuffle footprint of the
        # widest column in the pipeline (decoded with np.frombuffer in the
        # verify kernel)
        StructField("shingles", BinaryType(), False),
        StructField("bands", ArrayType(LongType()), False),
        StructField("simhash", LongType(), False),
        StructField("n_shingles", IntegerType(), False),
        StructField("substr_fps", ArrayType(LongType()), False),
    ]
)


def make_featurize_udf(cfg: DedupConfig, with_substring_fps: bool = False):
    """pandas_udf(text) -> struct(shingles, bands, simhash, n_shingles,
    substr_fps).

    shingles: sorted distinct hashed word n-gram ids (uint32 as int64) — the
    row's feature set in reference terms (SURVEY.md §1.2).
    bands: LSH band hashes from the MinHash signature via the reference's
    chained fold (inverseIndex.cpp:275-303); length = cfg.num_bands.
    simhash: 64-bit SimHash reinterpreted as signed int64.
    substr_fps: winnowed Rabin fingerprints for the exact-substring pass
    (populated only when ``with_substring_fps`` AND cfg.use_substring_pass;
    empty arrays otherwise) — fused here so the corpus text crosses the
    Arrow boundary into Python ONCE for the dedup pipeline; a separate
    substring-UDF pass would re-stream every text a second time. Callers
    that never run the substring pass (e.g. the LSH-only driver queries)
    keep the default and pay nothing.
    The full MinHash signature itself is not retained — only band hashes are
    ever used downstream, and dropping it keeps the shuffle narrow.
    """
    h = cfg.number_of_hash_functions
    r = cfg.rows_per_band
    n = cfg.shingle_size
    sub_k, sub_w = cfg.substring_k, cfg.substring_window
    want_sub = with_substring_fps and cfg.use_substring_pass

    @pandas_udf(_FEATURIZE_SCHEMA)
    def featurize(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        raw = [t if t is not None else "" for t in texts]
        tok_rows = [K.token_ids(t) for t in raw]
        sh_rows = [K.ngram_ids(t, n) for t in tok_rows]
        sigs = K.minhash_signatures(sh_rows, h)
        bands = K.fold_bands(sigs, r)
        sims = K.simhash64(tok_rows).astype(np.int64)
        if want_sub:
            sub_rows = K.substring_fingerprints_batch(raw, sub_k, sub_w)
            subs = [f.astype(np.int64) for f in sub_rows]
        else:
            empty = np.empty(0, dtype=np.int64)
            subs = [empty] * len(raw)
        return pd.DataFrame(
            {
                "shingles": [s.astype("<u4").tobytes() for s in sh_rows],
                "bands": list(bands.astype(np.int64)),
                "simhash": sims,
                "n_shingles": np.array([s.size for s in sh_rows], dtype=np.int32),
                "substr_fps": subs,
            }
        )

    return featurize


def featurize(
    df: DataFrame, cfg: DedupConfig, text_col: str = "text",
    with_substring_fps: bool = False,
) -> DataFrame:
    """Add doc_id, fingerprint, shingles, bands, simhash, n_shingles columns.

    doc_id = xxhash64(url) when a url column exists (else xxhash64(text-col
    fingerprint)) — replaces the reference's positional row index (SURVEY.md
    §1.2). At 10^12 docs a 64-bit id has birthday collisions; production
    would widen to the 128-bit md5 fingerprint pair — the pipeline only
    relies on doc_id uniqueness, so the swap is localized here.
    fingerprint = md5(text): the exact-duplicate collapse key (the Spark
    counterpart of the reference's chained signatureId, inverseIndex.cpp:
    442-464 — same role, different hash since byte-parity of cluster ids is
    not observable in cluster output).
    """
    udf = make_featurize_udf(cfg, with_substring_fps)
    out = df
    if "doc_id" not in out.columns:
        id_src = "url" if "url" in out.columns else text_col
        out = out.withColumn("doc_id", F.xxhash64(F.col(id_src)))
    if "fingerprint" not in out.columns:
        out = out.withColumn("fingerprint", F.md5(F.col(text_col)))
    return (
        out.withColumn("_feat", udf(F.col(text_col)))
        .select("*", "_feat.*")
        .drop("_feat")
    )


_SUBSTR_SCHEMA = ArrayType(LongType())


def make_substring_fp_udf(cfg: DedupConfig):
    """pandas_udf(text) -> array<long> of winnowed Rabin fingerprints."""
    k, w = cfg.substring_k, cfg.substring_window

    @pandas_udf(_SUBSTR_SCHEMA)
    def substr_fp(texts: pd.Series) -> pd.Series:
        import numpy as np

        fps = K.substring_fingerprints_batch(
            [t if t is not None else "" for t in texts], k, w
        )
        return pd.Series([f.astype(np.int64) for f in fps])

    return substr_fp
