#!/usr/bin/env python3
"""Independent expected-output generator for the two queries whose core
primitive (xxHash64) DuckDB cannot express: q_text_fingerprint and
q_dedup_simhash.

The XXH64 implementation below is written from the public xxHash
specification (https://github.com/Cyan4973/xxHash — public domain), NOT a
call into Spark: agreement with the engine is therefore a genuine two-
implementation check of the whole chain (tokenize -> hash -> fold / votes ->
pairing), the same epistemic standing as the DuckDB oracles. Outputs are
committed as parquet under src/test/resources/expected/ and referenced by
absolute path from the oracle SQL; a text_md5 column discriminates the scale
factor (each sf has different text for the same doc_ids), so one static
oracle works at sf0.001/0.01/0.1.

Run: python3 tools/gen_expected.py   (regenerates all three sf)
"""
import os
import hashlib
import struct

import pandas as pd

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            for _ in range(4):
                k = int.from_bytes(data[i:i + 8], "little")
                if _ == 0:
                    v1 = (_rotl((v1 + k * P2) & M, 31) * P1) & M
                elif _ == 1:
                    v2 = (_rotl((v2 + k * P2) & M, 31) * P1) & M
                elif _ == 2:
                    v3 = (_rotl((v3 + k * P2) & M, 31) * P1) & M
                else:
                    v4 = (_rotl((v4 + k * P2) & M, 31) * P1) & M
                i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((k * P2) & M, 31) * P1) & M
        h ^= k
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_chain(acc_signed: int, word: str) -> int:
    """Spark's xxhash64(acc, w): hash=42, then hashLong(acc), then
    hashBytes(utf8(w)) — hashLong is XXH64 of the 8 little-endian bytes."""
    h = xxh64(struct.pack("<q", acc_signed), 42)
    h = xxh64(word.encode("utf-8"), h)
    return _signed(h)


def fingerprint(text: str) -> int:
    acc = 0
    for w in text.split(" "):
        acc = spark_xxhash64_chain(acc, w)
    return acc


def simhash(text: str) -> int:
    votes = [0] * 64
    seen = set()
    for w in text.split(" "):
        if w in seen:  # array_distinct
            continue
        seen.add(w)
        h = xxh64(w.encode("utf-8"), 42)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig  # unsigned bit pattern


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "expected")
    os.makedirs(outdir, exist_ok=True)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = pd.read_parquet(f"/root/testdata/{sf}/documents.parquet")
        docs = docs.sort_values("doc_id").reset_index(drop=True)
        md5 = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())

        fp = pd.DataFrame({
            "doc_id": docs["doc_id"].astype("int64"),
            "text_md5": md5,
            "fingerprint": docs["text"].map(fingerprint).astype("int64"),
        })
        fp.to_parquet(os.path.join(outdir, f"fingerprint_{sf}.parquet"), index=False)

        sigs = docs["text"].map(simhash).tolist()
        ids = docs["doc_id"].tolist()
        md5s = md5.tolist()
        rows = []
        n = len(sigs)
        for a in range(n):
            for b in range(a + 1, n):
                ham = bin(sigs[a] ^ sigs[b]).count("1")
                if ham <= 3:
                    rows.append((ids[a], md5s[a], ids[b], md5s[b], ham))
        sh = pd.DataFrame(
            rows, columns=["doc_a", "text_md5_a", "doc_b", "text_md5_b", "hamming"])
        sh["doc_a"] = sh["doc_a"].astype("int64")
        sh["doc_b"] = sh["doc_b"].astype("int64")
        sh["hamming"] = sh["hamming"].astype("int64")
        sh.to_parquet(os.path.join(outdir, f"simhash_pairs_{sf}.parquet"), index=False)
        print(sf, "docs:", n, "simhash pairs:", len(sh))


if __name__ == "__main__":
    main()
