"""Pipeline configuration.

Knob names mirror the reference constructor (minHash.py:106-111) where a
direct counterpart exists; dedup-pipeline-only knobs are new.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- signature family (reference: minHash.py:106-111 defaults noted) ---
    number_of_hash_functions: int = 128   # reference default 400 (H)
    rows_per_band: int = 4                # reference `shingle_size` (chained fold)
    # bands = number_of_hash_functions // rows_per_band
    shingle_size: int = 3                 # word n-gram width for text shingling
    max_bin_size: int = 2000              # hot-bucket kill threshold (reference default 50
                                          # on signature buckets; ours applies to LSH band buckets)
    excess_factor: int = 5                # over-retrieval for top-k queries (reference default 5)
    # --- dedup pipeline ---
    jaccard_threshold: float = 0.8        # verify gate for near-dup pairs
    simhash_hamming_threshold: int = 3    # SimHash near-dup gate (bits)
    use_simhash: bool = True
    use_substring_pass: bool = True
    substring_k: int = 64                 # Rabin k-gram bytes
    substring_window: int = 96            # winnowing window; guarantee: any shared
                                          # run >= window+k-1 = 159 bytes fingerprints
                                          # (whole-page embeds; ~3x sparser than k=48/w=32)
    min_tokens: int = 1                   # drop empty docs
    broadcast_id_limit: int = 2_000_000   # max id-set size for broadcast semi-joins
                                          # (webdedup.joins); above it the join
                                          # degrades to a shuffle instead of OOMing
    # --- execution ---
    shuffle_partitions: int = 32
    target_partitions: int = 32           # band-shuffle width hint; the candidate
                                          # join deliberately relies on its own
                                          # ENSURE_REQUIREMENTS shuffle (AQE can
                                          # skew-split it; a user repartition()
                                          # cannot be split — see lsh.candidate_pairs)

    @property
    def num_bands(self) -> int:
        if self.number_of_hash_functions % self.rows_per_band != 0:
            raise ValueError("number_of_hash_functions must be divisible by rows_per_band")
        return self.number_of_hash_functions // self.rows_per_band


#: configuration that mirrors the reference's own test config
#: (/root/reference/test/test_minHash.py:18-20)
REFERENCE_TEST_CONFIG = DedupConfig(
    number_of_hash_functions=20,
    rows_per_band=5,
    max_bin_size=100_000,
    excess_factor=1,
)
