"""Bit-parity against the ACTUAL reference hash code.

Compiles a tiny harness that #includes the reference's own hash.h
(/root/reference — read-only, nothing copied into this repo) and compares
its scalar Hash::hash / size_tHashSimple outputs (and the SSE4.1 path) with
our numpy kernels. This pins P1 (and therefore P3/P4, which are pure
compositions of P1 validated against the scalar transliteration in
test_kernels.py) to the reference bit-for-bit.

Skipped cleanly when no compiler is present.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from webdedup import kernels as K

REF = "/root/reference/sparse_neighbors_search/computation"

HARNESS = r"""
#include <cstdint>
#include <cstdio>
#include <cstdlib>
// minimal stand-ins so hash.h compiles without the full engine
#include <stddef.h>
#include <vector>
#define TYPE_DEFINTIONS_H  // block typeDefinitions.h if guarded differently
#include "typeDefinitionsBasic.h"
#include "hash.h"

int main(int argc, char** argv) {
    Hash h;
    // stdin: lines of "key seed"; stdout: scalar and SSE results
    uint32_t key, seed;
    while (scanf("%u %u", &key, &seed) == 2) {
        uint32_t scalar = h.hash(key, seed, 0xFFFFFFFFu);
        __m128i keys = _mm_set_epi32(key, key, key, key);
        __m128i seeds = _mm_set_epi32(seed, seed, seed, seed);
        __m128i r = h.hash_SSE(keys, seeds);
        uint32_t lane = (uint32_t)_mm_extract_epi32(r, 0);
        printf("%u %u\n", scalar, lane);
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++ in environment")
    d = tmp_path_factory.mktemp("refhash")
    src = d / "harness.cpp"
    src.write_text(HARNESS)
    exe = d / "refhash"
    r = subprocess.run(
        ["g++", "-O2", "-msse4.1", "-I", REF, str(src), "-o", str(exe)],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference harness does not compile here: {r.stderr[:500]}")
    return str(exe)


def test_wang32_seeded_matches_reference_binary(ref_binary):
    rng = np.random.RandomState(42)
    keys = np.concatenate(
        [
            np.array([0, 1, 2, 42, 2**31, 2**32 - 1], dtype=np.uint64),
            rng.randint(0, 2**32, size=200, dtype=np.uint64),
        ]
    ).astype(np.uint32)
    seeds = np.concatenate(
        [
            np.array([1, 2, 3, 12345, 2**31 - 1, 2**32 - 1], dtype=np.uint64),
            rng.randint(1, 2**32, size=200, dtype=np.uint64),
        ]
    ).astype(np.uint32)
    inp = "\n".join(f"{int(k)} {int(s)}" for k, s in zip(keys, seeds))
    out = subprocess.run(
        [ref_binary], input=inp, capture_output=True, text=True, check=True
    )
    ours = K.hash_ks(keys, seeds)
    for line, got in zip(out.stdout.strip().splitlines(), ours):
        ref_scalar, ref_sse = map(int, line.split())
        assert int(got) == ref_scalar, "scalar hash mismatch vs reference"
        assert int(got) == ref_sse, "SSE hash path diverges from scalar"


def test_minhash_argmin_semantics_vs_reference_hash(ref_binary):
    """Recompute a MinHash slot with hash values fetched from the compiled
    reference hash and the argmin rule of inverseIndex.cpp:252-265; must
    equal our kernel's signature slot."""
    rng = np.random.RandomState(7)
    feats = np.unique(rng.randint(0, 2**32 - 2, size=80, dtype=np.uint64).astype(np.uint32))
    num_hashes = 12
    lines = []
    for j in range(1, num_hashes + 1):
        for f in feats:
            lines.append(f"{(int(f) + 1) & 0xFFFFFFFF} {j}")
    out = subprocess.run(
        [ref_binary], input="\n".join(lines), capture_output=True, text=True, check=True
    )
    vals = np.array(
        [int(l.split()[0]) for l in out.stdout.strip().splitlines()], dtype=np.uint64
    ).reshape(num_hashes, feats.size)
    ref_sig = feats[np.argmin(vals, axis=1)]
    ours = K.minhash_signature(feats, num_hashes)
    assert ours.tolist() == ref_sig.tolist()
