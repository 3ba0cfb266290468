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


def _hostile_id_decode(wire: bytes):
    from spring_tpu.codecs import idcodec
    with pytest.raises(RuntimeError):
        idcodec.decompress_ids_raw(wire, expected_count=16)


def test_hostile_template_pad_rejected():
    # template wire claiming pad=200: render_val writes max(ndigits, pad)
    # bytes into a 32-byte stack buffer, so an unvalidated pad smashes the
    # stack (ADVICE r2, ASan-confirmed). Must error cleanly.
    import struct
    wire = struct.pack("<II", 0xFFFFFFFF, 100)  # magic, count
    wire += bytes([1])                           # ntok=1
    wire += bytes([1])                           # kind=affine
    wire += struct.pack("<qq", 0, 1)             # start, step
    wire += bytes([200])                         # pad
    _hostile_id_decode(wire)


def test_hostile_template_zero_tokens_rejected():
    # ntok=0 makes max_len 0, letting a near-2^32 count through the
    # size-claim guard and provoking a ~16 GiB reserve.
    import struct
    wire = struct.pack("<II", 0xFFFFFFFF, (1 << 22))
    wire += bytes([0])  # ntok=0
    _hostile_id_decode(wire)


def test_hostile_template_huge_count_rejected():
    import struct
    wire = struct.pack("<II", 0xFFFFFFFF, 0xFFFFFFF0)
    wire += bytes([1, 1]) + struct.pack("<qq", 0, 1) + bytes([0])
    _hostile_id_decode(wire)


def test_hostile_xbc_nblocks_claim_rejected():
    # an 8-byte nblocks claim far beyond what the wire length can hold
    # must be rejected before the block tables are sized.
    import struct
    from spring_tpu.codecs import bsc
    wire = struct.pack("<QQ", 1 << 40, 64) + b"\0" * 32
    with pytest.raises(Exception):
        bsc.decompress(wire)


def test_read_count_cap_routes_to_sharding(tmp_path, monkeypatch):
    # rids are int32 per compression shard; n past the cap now routes to
    # the super-shard writer (tests/test_shards.py) instead of refusing.
    # A scan whose checkpoint table cannot cover its claimed read count
    # (as this fake's cannot) must fail loudly before the native parser
    # is pointed past its buffers — never silently corrupt or crash.
    from spring_tpu import params as P
    from spring_tpu.pipeline import short_mode
    fq = tmp_path / "in.fastq"
    _write(fq, [(b"r1", b"ACGT" * 25, b"F" * 100)])
    real_scan = short_mode.fastq_native.scan_buf

    class _Huge:
        def __init__(self, info):
            self.__dict__.update(info.__dict__)
            self.n = P.MAX_NUM_READS_SHORT + 1

    monkeypatch.setattr(short_mode.fastq_native, "scan_buf",
                        lambda *a, **k: _Huge(real_scan(*a, **k)))
    o = api.CompressOptions(num_threads=1, verbose=False)
    with pytest.raises(ValueError, match="inconsistent scan"):
        api.compress([str(fq)], str(tmp_path / "a.stpu"), o)
