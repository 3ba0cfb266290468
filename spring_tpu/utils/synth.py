"""Synthetic FASTQ dataset generator for benchmarks and A/B tests.

Models an SRR554369-class dataset (reference baseline logs
/root/reference/logs/8_29_18/SRR554369.log): a small genome sampled at
high coverage, 1% substitution noise, both strands, Illumina-like
position-correlated quality values. Supports single-end and paired-end
(two files, mates drawn from the same fragment with a normal insert
size, mate 2 reverse-complemented, as real Illumina PE data is).
"""
from __future__ import annotations

import numpy as np

QLEVELS = b"#,7<BFIJ"  # Illumina 8-level-like bins


def _quals(rng: np.random.Generator, n: int, read_len: int) -> np.ndarray:
    qlevels = np.frombuffer(QLEVELS, dtype=np.uint8)
    qidx = np.clip(
        rng.normal(6.0 - np.arange(read_len) / 40.0, 1.2,
                   size=(n, read_len)).astype(np.int32), 0, 7)
    return qlevels[qidx]


def _write_fastq(path: str, chars: np.ndarray, quals: np.ndarray,
                 ids: "list[str]") -> None:
    n, _ = chars.shape
    with open(path, "wb") as f:
        block = 100_000
        for s in range(0, n, block):
            e = min(s + block, n)
            body = bytearray()
            for i in range(s, e):
                body += ids[i].encode() + b"\n"
                body += chars[i].tobytes() + b"\n+\n"
                body += quals[i].tobytes() + b"\n"
            f.write(bytes(body))


def make_se(path: str, n_reads: int, read_len: int = 100,
            genome_size: int = 2_000_000, err_rate: float = 0.01,
            seed: int = 42) -> None:
    """Single-end dataset: n_reads reads of read_len over a random genome."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_size, dtype=np.int8)
    starts = rng.integers(0, genome_size - read_len, size=n_reads)
    reads = genome[starts[:, None] + np.arange(read_len)[None, :]]
    nerr = int(err_rate * n_reads * read_len)
    er = rng.integers(0, n_reads, size=nerr)
    ec = rng.integers(0, read_len, size=nerr)
    reads[er, ec] = (reads[er, ec] + rng.integers(1, 4, size=nerr)) % 4
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]
    chars = np.frombuffer(b"ACGT", dtype=np.uint8)[reads]
    quals = _quals(rng, n_reads, read_len)
    ids = [f"@SYN.{i + 1} {i + 1} length={read_len}" for i in range(n_reads)]
    _write_fastq(path, chars, quals, ids)


def make_pe(path1: str, path2: str, n_pairs: int, read_len: int = 100,
            genome_size: int = 2_000_000, err_rate: float = 0.01,
            insert_mean: float = 300.0, insert_sd: float = 30.0,
            seed: int = 42) -> None:
    """Paired-end dataset: mate 1 forward, mate 2 reverse-complemented from
    the far end of the same fragment (standard Illumina FR orientation)."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_size, dtype=np.int8)
    insert = np.clip(rng.normal(insert_mean, insert_sd, size=n_pairs),
                     read_len + 10, genome_size - 1).astype(np.int64)
    starts = rng.integers(0, genome_size - insert.max() - 1, size=n_pairs)
    r1 = genome[starts[:, None] + np.arange(read_len)[None, :]]
    s2 = starts + insert - read_len
    r2 = genome[s2[:, None] + np.arange(read_len)[None, :]]
    r2 = 3 - r2[:, ::-1]  # mate 2 is on the reverse strand
    for reads in (r1, r2):
        nerr = int(err_rate * n_pairs * read_len)
        er = rng.integers(0, n_pairs, size=nerr)
        ec = rng.integers(0, read_len, size=nerr)
        reads[er, ec] = (reads[er, ec] + rng.integers(1, 4, size=nerr)) % 4
    # half the pairs flipped to the other strand (swap + RC both mates)
    flip = rng.random(n_pairs) < 0.5
    r1f = r1.copy()
    r1[flip] = 3 - r2[flip][:, ::-1]
    r2[flip] = 3 - r1f[flip][:, ::-1]
    base = np.frombuffer(b"ACGT", dtype=np.uint8)
    ids1 = [f"@SYN.{i + 1}/1" for i in range(n_pairs)]
    ids2 = [f"@SYN.{i + 1}/2" for i in range(n_pairs)]
    _write_fastq(path1, base[r1], _quals(rng, n_pairs, read_len), ids1)
    _write_fastq(path2, base[r2], _quals(rng, n_pairs, read_len), ids2)
