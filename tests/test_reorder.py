"""Unit tests for the JAX bit ops, dictionary, and reorder engine."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from spring_tpu.io import packing
from spring_tpu.ops import bits
from spring_tpu.reorder import dictionary as dct
from spring_tpu.reorder import engine as eng


def _random_reads(rng, n, L):
    return rng.integers(0, 4, size=(n, L)).astype(np.uint8)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = _random_reads(rng, 37, 53)
    packed = packing.pack_codes(codes)
    out = np.asarray(bits.unpack(jnp.asarray(packed), 53))
    np.testing.assert_array_equal(out, codes)
    repacked = np.asarray(bits.pack(jnp.asarray(codes.astype(np.int32))))
    np.testing.assert_array_equal(repacked, packed)


def test_hamming_packed_matches_codes():
    rng = np.random.default_rng(1)
    a = _random_reads(rng, 20, 64)
    b = a.copy()
    flips = rng.integers(0, 64, size=20)
    for i, f in enumerate(flips):
        b[i, f] = (b[i, f] + 1) % 4
    pa, pb = packing.pack_codes(a), packing.pack_codes(b)
    h = np.asarray(bits.hamming_packed(jnp.asarray(pa), jnp.asarray(pb)))
    np.testing.assert_array_equal(h, np.ones(20, np.int32))


def test_masked_hamming_range():
    rng = np.random.default_rng(2)
    a = _random_reads(rng, 8, 48)
    b = _random_reads(rng, 8, 48)
    pa, pb = packing.pack_codes(a), packing.pack_codes(b)
    lo = jnp.asarray(np.full(8, 10, np.int32))
    hi = jnp.asarray(np.full(8, 37, np.int32))
    got = np.asarray(eng._masked_hamming(jnp.asarray(pa), jnp.asarray(pb),
                                         lo, hi))
    want = (a[:, 10:37] != b[:, 10:37]).sum(axis=1)
    np.testing.assert_array_equal(got, want)


def test_revcomp_codes():
    rng = np.random.default_rng(3)
    codes = _random_reads(rng, 5, 40)
    lens = np.array([40, 33, 17, 1, 0], np.int32)
    got = np.asarray(bits.revcomp_codes(jnp.asarray(codes.astype(np.int32)),
                                        jnp.asarray(lens)))
    want = packing.revcomp_codes(codes, lens)
    np.testing.assert_array_equal(got, want)


def test_packed_domain_shifts_and_revcomp():
    rng = np.random.default_rng(8)
    n, L = 12, 96
    codes = _random_reads(rng, n, L)
    lens = rng.integers(20, L + 1, n).astype(np.int32)
    mask = np.arange(L)[None, :] < lens[:, None]
    codes = np.where(mask, codes, 0).astype(np.uint8)
    pk = jnp.asarray(packing.pack_codes(codes))
    s = rng.integers(0, 40, n).astype(np.int32)
    # shift_bases_left == codes[:, p+s]
    got = np.asarray(bits.unpack(
        bits.shift_bases_left(pk, jnp.asarray(s), L), L))
    want = np.zeros_like(codes)
    for i in range(n):
        want[i, : L - s[i]] = codes[i, s[i]:]
    np.testing.assert_array_equal(got, want)
    # shift_bases_right == codes[:, p-s]
    got = np.asarray(bits.unpack(
        bits.shift_bases_right(pk, jnp.asarray(s), L), L))
    want = np.zeros_like(codes)
    for i in range(n):
        want[i, s[i]:] = codes[i, : L - s[i]]
    np.testing.assert_array_equal(got, want)
    # revcomp_packed matches the codes-domain reverse complement
    got = np.asarray(bits.unpack(
        bits.revcomp_packed(pk, jnp.asarray(lens)), L))
    want = packing.revcomp_codes(codes, lens)
    np.testing.assert_array_equal(got, want)
    # extract_key_packed == 16-mer key at a static offset
    for st in (0, 16, 21):
        got = np.asarray(bits.extract_key_packed(pk, st))
        want = dct._window_keys_np(codes, st)
        np.testing.assert_array_equal(got, want)
    # host-side packed key extraction matches the codes-domain keys
    pk_np = np.asarray(pk)
    for st in (0, 16, 21):
        got = dct._window_keys_packed(pk_np, st)
        want = dct._window_keys_np(codes, st)
        np.testing.assert_array_equal(got, want)


def test_dictionary_probe_finds_exact_window():
    rng = np.random.default_rng(4)
    codes = _random_reads(rng, 200, 64)
    lengths = np.full(200, 64, np.int32)
    dicts = dct.build_hash_dicts(codes, lengths)
    d = dicts[0]
    q = dct._window_keys_np(codes[:5], d.start)
    rids, valid = dct.probe_hash(d.btab, d.rids, jnp.asarray(q), 4)
    rids, valid = np.asarray(rids), np.asarray(valid)
    for i in range(5):
        assert i in set(rids[i][valid[i]])


def test_engine_overlapping_reads_form_one_contig():
    # reads tiled every 5 bases along a 300-base genome -> expect most reads
    # matched into few contigs
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, size=400).astype(np.uint8)
    L = 64
    starts = np.arange(0, len(genome) - L, 5)
    codes = np.stack([genome[s:s + L] for s in starts])
    lengths = np.full(len(codes), L, np.int32)
    packed = packing.pack_codes(codes)
    engine = eng.ReorderEngine(packed, lengths,
                               eng.ReorderConfig(max_readlen=L))
    em = engine.run()
    contigs = eng.assemble_contigs(em, lengths=lengths, ordered=True)
    placed = sum(len(c["rids"]) for c in contigs)
    assert placed == len(codes)
    all_rids = np.concatenate([c["rids"] for c in contigs])
    assert len(np.unique(all_rids)) == len(codes)
    # reads should cluster into few multi-read contigs, not singletons
    singletons = sum(1 for c in contigs if len(c["rids"]) == 1)
    assert singletons <= len(codes) // 4
    assert max(len(c["rids"]) for c in contigs) >= 5


def test_layout_from_emissions_matches_slow_path():
    from spring_tpu.encode import consensus as cons
    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, size=500).astype(np.uint8)
    L = 64
    starts = np.arange(0, len(genome) - L, 6)
    codes = np.stack([genome[s:s + L] for s in starts])
    lengths = np.full(len(codes), L, np.int32)
    packed = packing.pack_codes(codes)
    engine = eng.ReorderEngine(packed, lengths,
                               eng.ReorderConfig(max_readlen=L))
    em = engine.run()
    fast, singles_f = cons.layout_from_emissions(em, engine.B, lengths, ordered=True)
    contigs = eng.assemble_contigs(em, lengths=lengths, ordered=True)
    slow, singles_s = cons.layout_contigs(contigs, lengths)
    np.testing.assert_array_equal(fast.rids, slow.rids)
    np.testing.assert_array_equal(fast.gpos, slow.gpos)
    np.testing.assert_array_equal(fast.rc, slow.rc)
    assert fast.seq_len == slow.seq_len
    np.testing.assert_array_equal(np.sort(singles_f), np.sort(singles_s))


def test_engine_with_rc_reads():
    rng = np.random.default_rng(6)
    genome = rng.integers(0, 4, size=300).astype(np.uint8)
    L = 50
    starts = np.arange(0, len(genome) - L, 4)
    rows = []
    lengths = np.full(len(starts), L, np.int32)
    for k, s in enumerate(starts):
        r = genome[s:s + L]
        if k % 3 == 0:
            r = packing.revcomp_codes(r[None], np.array([L]))[0]
        rows.append(r)
    codes = np.stack(rows)
    packed = packing.pack_codes(codes)
    engine = eng.ReorderEngine(packed, lengths,
                               eng.ReorderConfig(max_readlen=L))
    em = engine.run()
    contigs = eng.assemble_contigs(em, lengths=lengths, ordered=True)
    placed = sum(len(c["rids"]) for c in contigs)
    assert placed == len(codes)
    singletons = sum(1 for c in contigs if len(c["rids"]) == 1)
    assert singletons <= len(codes) // 4
    assert max(len(c["rids"]) for c in contigs) >= 5


def test_device_dict_build_matches_host():
    rng = np.random.default_rng(7)
    n, L = 3000, 100
    codes = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    # duplicate some windows so bins have multi-entry counts
    codes[1000:1500] = codes[:500]
    lengths = np.full(n, L, np.int32)
    lengths[:50] = 40           # too short for the mid windows
    packed = packing.pack_codes(codes)
    windows = dct.default_windows(L)
    host = dct.build_hash_dicts_packed(packed, lengths, windows,
                                       pad_to_pow2=True)

    W = packed.shape[1]
    Np = max(1 << max(n - 1, 1).bit_length(), 64)
    rows = np.zeros((Np, W + 1), np.uint32)
    rows[:n, :W] = packed
    lp = np.zeros(Np, np.int32)
    lp[:n] = lengths
    rows[:, W] = lp.view(np.uint32)
    rows[n:, W] |= np.uint32(1 << 31)
    dev = dct.build_hash_dicts_device(jnp.asarray(rows), n, windows)

    for hd, dd in zip(host, dev):
        # bit-identical tables and bins (device mirrors the host
        # placement; the device image is flat — see build_hash_dicts_device)
        np.testing.assert_array_equal(
            np.asarray(hd.btab),
            np.asarray(dd.btab).reshape(np.asarray(hd.btab).shape))
        np.testing.assert_array_equal(np.asarray(hd.rids),
                                      np.asarray(dd.rids))
        # same probe answers for every indexed window key
        q = np.unique(np.asarray(hd.keys_sorted))
        q = q[q != 0xFFFFFFFF]
        qj = jnp.asarray(q)
        hr, hv = dct.probe_hash(hd.btab, hd.rids, qj, 8)
        dr, dv = dct.probe_hash(dd.btab, dd.rids, qj, 8)
        np.testing.assert_array_equal(np.asarray(hv), np.asarray(dv))
        np.testing.assert_array_equal(
            np.asarray(hr)[np.asarray(hv)], np.asarray(dr)[np.asarray(dv)])


def test_device_bin_compaction_matches_host():
    rng = np.random.default_rng(8)
    n, L = 2000, 100
    codes = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    codes[500:1000] = codes[:500]
    lengths = np.full(n, L, np.int32)
    packed = packing.pack_codes(codes)
    windows = dct.default_windows(L)

    W = packed.shape[1]
    Np = max(1 << max(n - 1, 1).bit_length(), 64)
    rows = np.zeros((Np, W + 1), np.uint32)
    rows[:n, :W] = packed
    lp = np.zeros(Np, np.int32)
    lp[:n] = lengths
    rows[:, W] = lp.view(np.uint32)
    rows[n:, W] |= np.uint32(1 << 31)
    dev = dct.build_hash_dicts_device(jnp.asarray(rows), n, windows)

    claimed_np = np.zeros(Np, bool)
    claimed_np[rng.integers(0, n, size=600)] = True
    cl = np.zeros(Np // 32 + 2, np.uint32)
    cl[: Np // 32] = np.packbits(
        np.concatenate([claimed_np[:n], np.ones(Np - n, bool)]),
        bitorder="little").view(np.uint32)

    for dd in dev:
        host_out = dct.compact_bins(np.asarray(dd.rids),
                                    np.asarray(dd.keys_dev), claimed_np)
        dev_out = np.asarray(dct.compact_bins_dev(
            dd.keys_dev, dd.rids, jnp.asarray(cl)))
        np.testing.assert_array_equal(host_out, dev_out)


def test_layout_native_matches_numpy():
    """csrc/layout.cpp must byte-match the numpy layout_from_emissions
    body (both tie-stable in timeline order) on random walker streams."""
    from spring_tpu.encode import consensus as cons
    rng = np.random.default_rng(7)
    n_reads = 50_000
    lengths = rng.integers(40, 101, size=n_reads).astype(np.int32)
    rows = []
    rid = 0
    for _ in range(800):
        k = int(rng.integers(1, 60))
        for j in range(k):
            rows.append((rid % n_reads,
                         0 if j == 0 else int(rng.integers(1, 3)),
                         int(rng.integers(0, 12)), int(rng.integers(0, 2))))
            rid += 1
    arr = np.array(rows, np.int32)
    import os
    os.environ["SPRING_TPU_NATIVE_LAYOUT"] = "0"
    try:
        l1, s1 = cons.layout_from_emissions(arr, 1, lengths, min_reads=2,
                                            ordered=True)
    finally:
        del os.environ["SPRING_TPU_NATIVE_LAYOUT"]
    out = cons._layout_native(arr, lengths, 2)
    assert out is not None
    l2, s2 = out
    np.testing.assert_array_equal(l1.rids, l2.rids)
    np.testing.assert_array_equal(l1.gpos, l2.gpos)
    np.testing.assert_array_equal(l1.rc, l2.rc)
    assert l1.seq_len == l2.seq_len
    np.testing.assert_array_equal(l1.cbase, l2.cbase)
    np.testing.assert_array_equal(l1.clen, l2.clen)
    np.testing.assert_array_equal(l1.ccount, l2.ccount)
    np.testing.assert_array_equal(s1, s2)


def test_wide_dict_format_matches_compact():
    """The wide btab format (full 32-bit starts + 8-bit counts; selected
    automatically past 2^27 entries, VERDICT r3 next #5) answers every
    probe identically to the compact packed-word format, host and device,
    including the engine's stacked split probe."""
    rng = np.random.default_rng(11)
    n, L = 3000, 100
    codes = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    codes[1000:1500] = codes[:500]          # multi-entry bins
    lengths = np.full(n, L, np.int32)
    packed = packing.pack_codes(codes)
    windows = dct.default_windows(L)

    compact = dct.build_hash_dicts_packed(packed, lengths, windows)
    old = dct.FORCE_WIDE
    dct.FORCE_WIDE = True
    try:
        jax.clear_caches()                  # FORCE_WIDE is trace-time state
        wide = dct.build_hash_dicts_packed(packed, lengths, windows)
        W = packed.shape[1]
        Np = max(1 << max(n - 1, 1).bit_length(), 64)
        rows = np.zeros((Np, W + 1), np.uint32)
        rows[:n, :W] = packed
        lp = np.zeros(Np, np.int32)
        lp[:n] = lengths
        rows[:, W] = lp.view(np.uint32)
        rows[n:, W] |= np.uint32(1 << 31)
        dev_wide = dct.build_hash_dicts_device(jnp.asarray(rows), n, windows)
    finally:
        dct.FORCE_WIDE = old
        jax.clear_caches()

    for cd, wd, dd in zip(compact, wide, dev_wide):
        assert cd.btab.shape[1] == dct.COMPACT_WORDS
        assert wd.btab.shape[1] == dct.WIDE_WORDS
        np.testing.assert_array_equal(np.asarray(wd.btab),
                                      np.asarray(dd.btab))
        q = np.unique(np.asarray(cd.keys_sorted))
        q = q[q != 0xFFFFFFFF]
        qj = jnp.asarray(q)
        cs, cc = dct.probe_meta(cd.btab, qj)
        ws, wc = dct.probe_meta(wd.btab, qj)
        np.testing.assert_array_equal(np.asarray(cs), np.asarray(ws))
        np.testing.assert_array_equal(np.asarray(cc), np.asarray(wc))
        # stacked split probe agrees across formats
        for d, S in ((cd, cd.btab.shape[0]), (wd, wd.btab.shape[0])):
            st, ct = dct.probe_meta_split_stacked(
                d.btab, S, qj[None, :])
            np.testing.assert_array_equal(np.asarray(st[0]), np.asarray(cs))
            np.testing.assert_array_equal(np.asarray(ct[0]), np.asarray(cc))
        cr, cv = dct.probe_hash(cd.btab, cd.rids, qj, 8)
        wr, wv = dct.probe_hash(wd.btab, wd.rids, qj, 8)
        np.testing.assert_array_equal(np.asarray(cv), np.asarray(wv))
        np.testing.assert_array_equal(
            np.asarray(cr)[np.asarray(cv)], np.asarray(wr)[np.asarray(wv)])
