"""End-to-end round-trip tests for short-read mode (the main path).

Mirrors the reference CI round-trip strategy (util/test_script.sh:5-21)
plus cases the reference never covered: random access on the short path.
"""
import filecmp
import os

import numpy as np
import pytest

from spring_tpu import api


def _roundtrip(tmp_path, in_files, out_names, opts=None, **dec_kw):
    arc = str(tmp_path / "a.stpu")
    opts = opts or api.CompressOptions(num_threads=2, verbose=False)
    cp = api.compress(in_files, arc, opts)
    outs = [str(tmp_path / n) for n in out_names]
    api.decompress(arc, outs, verbose=False, **dec_kw)
    return cp, outs


def test_se_fastq_lossless(tmp_path, fq1):
    cp, outs = _roundtrip(tmp_path, [fq1], ["o1.fastq"])
    assert not cp.long_mode
    assert filecmp.cmp(fq1, outs[0], shallow=False)


def test_pe_fastq_lossless(tmp_path, fq1, fq2):
    cp, outs = _roundtrip(tmp_path, [fq1, fq2], ["o1.fastq", "o2.fastq"])
    assert cp.paired_end
    assert filecmp.cmp(fq1, outs[0], shallow=False)
    assert filecmp.cmp(fq2, outs[1], shallow=False)


def test_pe_aligned_pairs_lossless(tmp_path):
    """High-coverage PE data where mates actually align (flag-0 pairs with
    int16 pair deltas take the pospair/rcpair path — regression: the
    decoder mis-viewed the pospair stream and only unaligned fixtures ever
    ran before)."""
    from spring_tpu.utils import synth
    p1, p2 = str(tmp_path / "p_1.fastq"), str(tmp_path / "p_2.fastq")
    synth.make_pe(p1, p2, 4000, genome_size=50_000, seed=3)
    cp, outs = _roundtrip(tmp_path, [p1, p2], ["o1.fastq", "o2.fastq"])
    assert cp.paired_end
    assert filecmp.cmp(p1, outs[0], shallow=False)
    assert filecmp.cmp(p2, outs[1], shallow=False)
    # the reordered (-r) path through the same pair-delta layout
    opts = api.CompressOptions(num_threads=2, verbose=False, reorder=True)
    arc = str(tmp_path / "r.stpu")
    api.compress([p1, p2], arc, opts)
    r1, r2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    api.decompress(arc, [r1, r2], verbose=False)

    def recs(p):
        ls = open(p).read().splitlines()
        return list(zip(ls[1::4], ls[3::4]))
    # pairing invariant: pair k of the output = (file1[k], file2[k])
    assert sorted(zip(recs(r1), recs(r2))) == sorted(zip(recs(p1), recs(p2)))


def test_se_fasta(tmp_path, fa1):
    opts = api.CompressOptions(num_threads=2, verbose=False, fasta_input=True)
    cp, outs = _roundtrip(tmp_path, [fa1], ["o1.fasta"], opts)
    assert filecmp.cmp(fa1, outs[0], shallow=False)


def test_se_gzip_input_output(tmp_path, fq1_gz, fq1):
    cp, outs = _roundtrip(tmp_path, [fq1_gz], ["o1.fastq.gz"], gzipped=True)
    import gzip
    with gzip.open(outs[0], "rb") as f:
        got = f.read()
    with open(fq1, "rb") as f:
        assert got == f.read()


def test_thread_count_asymmetry(tmp_path, fq1):
    # reference CI compresses with -t 8 and decompresses with -t 5
    # (util/test_script.sh:69-76); our streams are thread-count independent
    arc = str(tmp_path / "a.stpu")
    api.compress([fq1], arc, api.CompressOptions(num_threads=8,
                                                 verbose=False))
    out = str(tmp_path / "o.fastq")
    api.decompress(arc, [out], num_threads=5, verbose=False)
    assert filecmp.cmp(fq1, out, shallow=False)


def test_random_access_range(tmp_path, fq1):
    arc = str(tmp_path / "a.stpu")
    opts = api.CompressOptions(num_threads=2, verbose=False)
    api.compress([fq1], arc, opts)
    out = str(tmp_path / "part.fastq")
    api.decompress(arc, [out], read_range=(10, 35), verbose=False)
    with open(fq1, "rb") as f:
        lines = f.read().splitlines()
    want = b"\n".join(lines[40:140]) + b"\n"
    with open(out, "rb") as f:
        assert f.read() == want


def test_random_access_range_pe(tmp_path, fq1, fq2):
    """PE ranges: global indices span [file-1 reads, file-2 reads]
    (reference src/spring.cpp:349-359). Covers file-1-only, file-2-only
    (ids derived from file-1 blocks), and boundary-straddling slices, in
    both order modes."""
    def records(path):
        with open(path, "rb") as f:
            lines = f.read().splitlines()
        return [b"\n".join(lines[4 * i: 4 * i + 4]) + b"\n"
                for i in range(len(lines) // 4)]

    recs = records(fq1) + records(fq2)   # global index space, 200 reads
    for reorder in (False, True):
        arc = str(tmp_path / f"pe{int(reorder)}.stpu")
        api.compress([fq1, fq2], arc,
                     api.CompressOptions(num_threads=2, reorder=reorder,
                                         verbose=False))
        for lo, hi in ((5, 30), (120, 170), (90, 110), (0, 200)):
            out = str(tmp_path / "part.fastq")
            api.decompress(arc, [out], read_range=(lo, hi), verbose=False)
            with open(out, "rb") as f:
                got = f.read()
            if not reorder:
                assert got == b"".join(recs[lo:hi]), (reorder, lo, hi)
            else:
                # -r keeps pairing but not order: compare record multisets
                n = got.count(b"\n") // 4
                assert n == hi - lo, (reorder, lo, hi)
        # full-range single-output equals the two files concatenated
        # (order-preserving only)
        if not reorder:
            out = str(tmp_path / "all.fastq")
            api.decompress(arc, [out], verbose=False)
            with open(out, "rb") as f:
                assert f.read() == b"".join(recs)


def _records(path):
    with open(path, "rb") as f:
        lines = f.read().splitlines()
    return list(zip(lines[0::4], lines[1::4], lines[3::4]))


def test_se_reorder_mode_multiset(tmp_path, fq1):
    opts = api.CompressOptions(num_threads=2, verbose=False, reorder=True)
    cp, outs = _roundtrip(tmp_path, [fq1], ["o1.fastq"], opts)
    assert not cp.preserve_order
    # order-insensitive equality (reference util/test_script.sh:79-92)
    assert sorted(_records(fq1)) == sorted(_records(outs[0]))


def test_pe_reorder_mode_pairing(tmp_path, fq1, fq2):
    opts = api.CompressOptions(num_threads=2, verbose=False, reorder=True)
    cp, outs = _roundtrip(tmp_path, [fq1, fq2],
                          ["o1.fastq", "o2.fastq"], opts)
    # the PAIR multiset must survive (pe_encode invariant,
    # src/pe_encode.cpp:41-69): line i of file 1 pairs line i of file 2
    orig = sorted(zip(_records(fq1), _records(fq2)))
    got = sorted(zip(_records(outs[0]), _records(outs[1])))
    assert orig == got


@pytest.mark.parametrize("qmode,kw", [
    ("ill_bin", {}),
    ("binary", {"bin_thresholds": (53, 73, 35)}),
    ("qvz", {"qvz_ratio": 1.0}),
])
def test_lossy_quality_modes(tmp_path, fq1, qmode, kw):
    opts = api.CompressOptions(num_threads=2, verbose=False,
                               quality_mode=qmode, **kw)
    cp, outs = _roundtrip(tmp_path, [fq1], ["o1.fastq"], opts)
    orig, got = _records(fq1), _records(outs[0])
    # ids and reads survive exactly; qualities keep lengths but are binned
    assert [r[:2] for r in orig] == [r[:2] for r in got]
    assert all(len(a[2]) == len(b[2]) for a, b in zip(orig, got))
    def entropy(bs):
        c = np.bincount(np.frombuffer(bs, np.uint8), minlength=256)
        p = c[c > 0] / c.sum()
        return float(-(p * np.log2(p)).sum())
    # quantization must reduce the symbol entropy of the quality stream
    assert entropy(b"".join(r[2] for r in got)) \
        <= entropy(b"".join(r[2] for r in orig)) + 1e-9


def test_qvz_reduces_entropy_with_enough_data():
    from spring_tpu.pipeline import qvz
    rng = np.random.default_rng(9)
    n, L = 2000, 60
    sym = np.clip(rng.normal(35, 6, size=(n, L)), 0, 40).astype(np.uint8)
    quals = [(sym[i] + 33).tobytes() for i in range(n)]
    # MODE_FIXED semantics: the ratio is an absolute per-context entropy
    # budget in bits (reference src/util.cpp:151-164)
    out = qvz.quantize_block(quals, ratio=1.0)

    def entropy(bs):
        c = np.bincount(np.frombuffer(bs, np.uint8), minlength=256)
        p = c[c > 0] / c.sum()
        return float(-(p * np.log2(p)).sum())
    h0 = entropy(b"".join(quals))
    h1 = entropy(b"".join(out))
    assert h1 < h0 * 0.5, (h0, h1)
    assert all(len(a) == len(b) for a, b in zip(quals, out))


def test_qvz_rd_curve_is_smooth_and_monotone():
    # the global rate allocation must give a graceful RD curve: MSE
    # monotone non-increasing in ratio, and mid ratios must land strictly
    # BETWEEN pass-through and full collapse (no cliff — round-2 AB_REPORT
    # showed nominal 0.7 jumping straight to the constant floor)
    from spring_tpu.pipeline import qvz
    rng = np.random.default_rng(5)
    n, L = 4000, 50
    qlevels = np.frombuffer(b"#,7<BFIJ", dtype=np.uint8)
    qidx = np.clip(rng.normal(6.0 - np.arange(L) / 20.0, 1.2,
                              size=(n, L)).astype(np.int32), 0, 7)
    mat = qlevels[qidx]
    lens = np.full(n, L, np.int64)
    q0 = mat.astype(np.float64)
    mses = []
    for ratio in (1.2, 0.9, 0.7, 0.5, 0.3):
        qq = qvz.quantize_matrix(mat.copy(), lens, ratio)
        mses.append(float(((qq.astype(np.float64) - q0) ** 2).mean()))
    assert all(a <= b + 1e-9 for a, b in zip(mses, mses[1:])), mses
    # collapse-to-constant MSE for this data
    col = np.zeros_like(mat)
    for c in range(L):
        vals = np.bincount(mat[:, c], minlength=256)
        col[:, c] = np.argmax(vals)
    mse_const = float(((col.astype(np.float64) - q0) ** 2).mean())
    for r, m in zip((0.9, 0.7, 0.5), mses[1:4]):
        assert 0.05 < m < mse_const * 0.98, (r, m, mse_const)


def test_synthetic_reads_with_errors_and_n(tmp_path):
    # reads carry substitution errors, reverse-complemented strands and N
    # bases — exercises noise streams, rel-coded noise chars and the
    # second-chance aligner end to end
    rng = np.random.default_rng(21)
    genome = rng.integers(0, 4, size=30000)
    L, n = 100, 3000
    starts = rng.integers(0, len(genome) - L, size=n)
    base = b"ACGTN"
    reads = []
    for i, s in enumerate(starts):
        seg = genome[s:s + L].copy()
        for _ in range(rng.integers(0, 4)):           # up to 3 errors
            seg[rng.integers(0, L)] = rng.integers(0, 4)
        if i % 4 == 0:
            seg = 3 - seg[::-1]                       # reverse strand
        if i % 17 == 0:
            seg[rng.integers(0, L)] = 4               # an N base
        reads.append(bytes(base[c] for c in seg))
    fq = tmp_path / "err.fastq"
    with open(fq, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@e%d\n%s\n+\n%s\n" % (i, r, b"F" * L))
    arc = str(tmp_path / "e.stpu")
    opts = api.CompressOptions(num_threads=2, verbose=False)
    api.compress([str(fq)], arc, opts)
    out = str(tmp_path / "e.out.fastq")
    api.decompress(arc, [out], verbose=False)
    assert filecmp.cmp(str(fq), out, shallow=False)


def test_synthetic_overlapping_reads_ratio(tmp_path):
    # high-coverage synthetic reads must compress far below 2 bits/base
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=20000)
    L, n = 100, 4000
    starts = rng.integers(0, len(genome) - L, size=n)
    base = b"ACGT"
    reads = []
    for s in starts:
        seg = bytes(base[c] for c in genome[s:s + L])
        reads.append(seg)
    fq = tmp_path / "syn.fastq"
    with open(fq, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, r, b"I" * L))
    arc = str(tmp_path / "s.stpu")
    opts = api.CompressOptions(num_threads=2, verbose=False,
                               preserve_id=False, preserve_quality=False)
    api.compress([str(fq)], arc, opts)
    out = str(tmp_path / "syn.out.fastq")
    api.decompress(arc, [out], verbose=False)
    # quality discarded -> 2-line records (reference src/util.cpp:62-68)
    with open(out, "rb") as f:
        got = f.read().splitlines()[1::2]
    assert got == [r for r in reads]
    # ratio: n*L bases in `arc`; aligned reads should make it tiny
    bits_per_base = os.path.getsize(arc) * 8 / (n * L)
    assert bits_per_base < 1.0, bits_per_base
