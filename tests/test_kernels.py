"""Kernel parity tests.

The oracle here is a direct pure-Python transliteration of the reference's
scalar semantics (hash.h:129-140, inverseIndex.cpp:243-303) using plain ints
masked to 32 bits — an independent implementation path from the numpy kernels.
"""

import numpy as np
import pytest

from webdedup import kernels as K

M32 = 0xFFFFFFFF


def wang32_scalar(key: int) -> int:
    # hash.h:133-138, uint32 semantics
    key &= M32
    key = ((~key & M32) + ((key << 15) & M32)) & M32
    key = key ^ (key >> 12)
    key = (key + ((key << 2) & M32)) & M32
    key = key ^ (key >> 4)
    key = (key * 2057) & M32
    key = key ^ (key >> 16)
    return key


def hash_ks_scalar(key: int, seed: int) -> int:
    # hash.h:168-170
    return wang32_scalar((key * seed) & M32)


def minhash_scalar(features, num_hashes):
    # inverseIndex.cpp:252-265 (strict <, first-seen argmin)
    sig = []
    for j in range(num_hashes):
        seed = j + 1
        best = None
        argmin = 0
        for f in features:
            hv = hash_ks_scalar((f + 1) & M32, seed)
            if best is None or hv < best:
                best = hv
                argmin = f
        sig.append(argmin)
    return sig


def fold_scalar(sig, r):
    # inverseIndex.cpp:284-291: chained wang32(sig[i*s+j]+1, prev+1)
    out = []
    for i in range(len(sig) // r):
        v = sig[i * r]
        for j in range(1, r):
            v = hash_ks_scalar((sig[i * r + j] + 1) & M32, (v + 1) & M32)
        out.append(v)
    return out


def test_wang32_matches_scalar():
    keys = np.array([0, 1, 2, 42, 1000003, 2**31, M32, 123456789], dtype=np.uint32)
    got = K.wang32(keys)
    want = [wang32_scalar(int(k)) for k in keys]
    assert got.tolist() == want


def test_hash_ks_wraparound():
    # (key * seed) must wrap in uint32 before mixing
    key, seed = 0xFFFFFFF0, 12345
    assert int(K.hash_ks(np.array([key]), seed)[0]) == hash_ks_scalar(key, seed)


def test_minhash_signature_matches_scalar():
    rng = np.random.RandomState(42)
    for _ in range(5):
        feats = np.unique(rng.randint(0, 2**32 - 2, size=50, dtype=np.uint64).astype(np.uint32))
        sig = K.minhash_signature(feats, 16)
        assert sig.tolist() == minhash_scalar([int(f) for f in feats], 16)


def test_minhash_empty_row():
    sig = K.minhash_signature(np.array([], dtype=np.uint32), 8)
    assert (sig == K.MAX_U32).all()


def test_minhash_batch_equals_single():
    rng = np.random.RandomState(7)
    rows = [np.unique(rng.randint(0, 2**32 - 2, size=n).astype(np.uint32)) for n in (5, 40, 200)]
    batch = K.minhash_signatures(rows, 24)
    for i, row in enumerate(rows):
        assert (batch[i] == K.minhash_signature(row, 24)).all()


def test_fold_bands_matches_scalar():
    rng = np.random.RandomState(1)
    sigs = rng.randint(0, 2**32 - 2, size=(3, 20)).astype(np.uint32)
    got = K.fold_bands(sigs, 5)
    for i in range(3):
        assert got[i].tolist() == fold_scalar([int(x) for x in sigs[i]], 5)


def test_fold_bands_identical_rows_collide():
    sig = np.arange(32, dtype=np.uint32).reshape(1, 32)
    two = np.vstack([sig, sig])
    bands = K.fold_bands(two, 4)
    assert (bands[0] == bands[1]).all()


def test_minhash_similarity_tracks_jaccard():
    # Pr[sig_a[j] == sig_b[j]] ≈ J(A,B): statistical property check
    rng = np.random.RandomState(0)
    base = np.unique(rng.randint(0, 2**31, size=400).astype(np.uint32))
    # remove 10% -> J ≈ 0.9/1.0... compute exactly
    mask = rng.rand(base.size) > 0.1
    other = base[mask]
    j_true = K.jaccard_sorted(base, other)
    H = 512
    sa = K.minhash_signature(base, H)
    sb = K.minhash_signature(other, H)
    j_est = float((sa == sb).mean())
    assert abs(j_est - j_true) < 0.06


def test_simhash_identical_and_different():
    a = K.token_ids("the quick brown fox jumps over the lazy dog " * 10)
    b = K.token_ids("the quick brown fox jumps over the lazy dog " * 10)
    c = K.token_ids("completely unrelated words here entirely distinct corpus tokens " * 10)
    fps = K.simhash64([a, b, c])
    assert fps[0] == fps[1]
    assert int(K.hamming64(fps[0:1], fps[2:3])[0]) > 10


def test_simhash_near_duplicate_low_hamming():
    words = [f"word{i}" for i in range(300)]
    a = K.token_ids(" ".join(words))
    words[5] = "changed"
    words[200] = "also"
    b = K.token_ids(" ".join(words))
    fps = K.simhash64([a, b])
    assert int(K.hamming64(fps[0:1], fps[1:2])[0]) <= 6


def test_ngram_ids_order_sensitivity():
    a = K.shingle_text("a b c d e", 3)
    b = K.shingle_text("e d c b a", 3)
    assert not np.array_equal(a, b)
    assert np.array_equal(K.shingle_text("a b c d e", 3), a)  # deterministic


def test_ngram_short_text_fallback():
    out = K.shingle_text("hello world", 3)  # < n tokens
    assert out.size == 2


def test_jaccard_basics():
    a = np.array([1, 2, 3, 4], dtype=np.uint32)
    b = np.array([3, 4, 5, 6], dtype=np.uint32)
    assert K.jaccard_sorted(a, b) == pytest.approx(2 / 6)
    assert K.jaccard_sorted(a, a) == 1.0
    assert K.jaccard_sorted(np.array([], dtype=np.uint32), np.array([], dtype=np.uint32)) == 1.0


def test_rolling_hash_shared_window():
    s1 = b"xxxxxTHE SHARED SUBSTRING CONTENT HEREyyyyy"
    s2 = b"aaaaaaaaaaTHE SHARED SUBSTRING CONTENT HEREbbb"
    h1 = K.rolling_hash(s1, 16)
    h2 = K.rolling_hash(s2, 16)
    assert np.intersect1d(h1, h2).size > 0


def test_winnowing_guarantee():
    # shared substring of length >= window + k - 1 must share a fingerprint
    rng = np.random.RandomState(3)
    shared = "".join(chr(97 + rng.randint(0, 26)) for _ in range(200))
    pre = "".join(chr(97 + rng.randint(0, 26)) for _ in range(500))
    post = "".join(chr(97 + rng.randint(0, 26)) for _ in range(500))
    doc_a = pre + shared + "zzz"
    doc_b = "qqq" + shared + post
    fa = K.substring_fingerprints(doc_a, k=48, window=32)
    fb = K.substring_fingerprints(doc_b, k=48, window=32)
    assert np.intersect1d(fa, fb).size > 0


def test_winnowing_short_doc():
    assert K.substring_fingerprints("tiny", k=48, window=32).size == 0


def test_substring_batch_matches_scalar():
    rng = np.random.RandomState(11)
    texts = []
    for n in (0, 3, 47, 48, 80, 200, 1000, 5000):
        texts.append("".join(chr(97 + rng.randint(0, 26)) for _ in range(n)))
    texts.append(texts[4])  # duplicate doc in same batch
    batch = K.substring_fingerprints_batch(texts, k=48, window=32)
    for t, got in zip(texts, batch):
        want = K.substring_fingerprints(t, k=48, window=32)
        assert np.array_equal(got, want), f"len={len(t)}"


def test_substring_batch_shared_fingerprint():
    rng = np.random.RandomState(5)
    shared = "".join(chr(97 + rng.randint(0, 26)) for _ in range(150))
    a = "AAA" + shared + "BBB"
    b = ("x" * 300) + shared + ("y" * 300)
    fa, fb = K.substring_fingerprints_batch([a, b], k=48, window=32)
    assert np.intersect1d(fa, fb).size > 0
