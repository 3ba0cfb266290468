"""Edge cases the reference CI never covered."""
import filecmp

import numpy as np
import pytest

from spring_tpu import api


def _write(path, records):
    with open(path, "wb") as f:
        for rid, seq, qual in records:
            f.write(b"@%s\n%s\n+\n%s\n" % (rid, seq, qual))


def _rt(tmp_path, records, **opts):
    fq = tmp_path / "in.fastq"
    _write(fq, records)
    arc = str(tmp_path / "a.stpu")
    o = api.CompressOptions(num_threads=2, verbose=False, **opts)
    api.compress([str(fq)], arc, o)
    out = str(tmp_path / "out.fastq")
    api.decompress(arc, [out], verbose=False)
    assert filecmp.cmp(str(fq), out, shallow=False)


def test_empty_file(tmp_path):
    _rt(tmp_path, [])


def test_single_read(tmp_path):
    _rt(tmp_path, [(b"r1", b"ACGTACGTACGTACGTACGTACGTACGTACGTACGT",
                    b"F" * 36)])


def test_single_short_read(tmp_path):
    _rt(tmp_path, [(b"r1", b"ACGT", b"FFFF")])


def test_empty_reads_mixed(tmp_path):
    _rt(tmp_path, [(b"r1", b"", b""),
                   (b"r2", b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT",
                    b"E" * 40),
                   (b"r3", b"", b"")])


def test_max_length_read(tmp_path):
    rng = np.random.default_rng(0)
    seq = bytes(b"ACGT"[c] for c in rng.integers(0, 4, 511))
    _rt(tmp_path, [(b"long", seq, b"I" * 511)])


def test_read_too_long_errors(tmp_path):
    fq = tmp_path / "in.fastq"
    _write(fq, [(b"r", b"A" * 512, b"F" * 512)])
    with pytest.raises(ValueError, match="long mode"):
        api.compress([str(fq)], str(tmp_path / "a.stpu"),
                     api.CompressOptions(num_threads=1, verbose=False))


def test_mixed_lengths_with_overlap(tmp_path):
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 4000)
    base = b"ACGT"
    recs = []
    for i in range(300):
        L = int(rng.integers(36, 101))
        s = int(rng.integers(0, len(genome) - L))
        seq = bytes(base[c] for c in genome[s:s + L])
        recs.append((b"m%d" % i, seq, b"D" * L))
    _rt(tmp_path, recs)


def test_all_n_reads(tmp_path):
    _rt(tmp_path, [(b"n1", b"N" * 50, b"#" * 50),
                   (b"n2", b"NNNNACGTNNNN", b"#" * 12)])


def test_corrupt_archive_magic(tmp_path):
    bad = tmp_path / "bad.stpu"
    bad.write_bytes(b"not a tar file at all")
    with pytest.raises(Exception):
        api.decompress(str(bad), [str(tmp_path / "o.fastq")], verbose=False)


def test_homopolymer_reads(tmp_path):
    # all-identical reads stress run-length paths and claim logic
    _rt(tmp_path, [(b"h%d" % i, b"A" * 100, b"F" * 100) for i in range(200)])
