#!/usr/bin/env python
"""Sweep reorder-engine static knobs and report warm ms/round on device.

Usage: python tools/knob_sweep.py [n_reads]
Each variant compiles its own flush program (module cache keyed on the
static signature), then times flushes 2+3 (flush 1 pays compile).
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(packed, lengths, codes, name, **cfg_kw):
    import jax
    import jax.numpy as jnp
    from spring_tpu.reorder import engine as eng

    cfg = eng.ReorderConfig(max_readlen=100, **cfg_kw)
    e = eng.ReorderEngine(packed, lengths, cfg, codes=codes)
    state = e._init_state()
    rows_tab = state.pop("rows")
    jax.block_until_ready(rows_tab)
    e._build_dicts(rows_tab)
    dkeys = eng.jnp.concatenate([d.btab for d in e._dicts], axis=0)
    drids = eng.jnp.concatenate([eng.dct.pairs_from_rids(d.rids) for d in e._dicts], axis=0)
    stride = max(e.N // e.B, 1)
    idx = np.arange(e.N, dtype=np.int32)
    so = np.concatenate([idx[r::stride] for r in range(stride)])
    so = np.concatenate([so, np.full(e.Np - len(so), e.Np - 1, np.int32)])
    seed_order = jnp.asarray(so.astype(np.int32))
    args = (e.lengths, dkeys, drids, seed_order,
            jnp.asarray(e.N, jnp.int32),
            jnp.asarray(e.cfg.max_shift, jnp.int32), rows_tab)
    t0 = time.time()
    state, emit, stats = e._round_fn(state, *args)
    jax.block_until_ready(emit)
    compile_s = time.time() - t0
    times = []
    claimed = []
    for _ in range(2):
        t0 = time.time()
        state, emit, stats = e._round_fn(state, *args)
        jax.block_until_ready(emit)
        times.append(time.time() - t0)
        claimed.append(int(np.asarray(stats)[0]) - (e.Np - e.N))
    ms_round = 1000 * np.mean(times) / eng.FLUSH_ROUNDS
    print(f"{name:28s} B={e.B:6d} compile={compile_s:6.1f}s "
          f"flush={np.mean(times)*1000:7.1f}ms  {ms_round:6.2f} ms/round "
          f"claimed after 3 flushes: {claimed[-1]}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cache = f"/tmp/knob_sweep_{n}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        codes, lengths = d["codes"], d["lengths"]
    else:
        from spring_tpu.utils import synth
        from spring_tpu.io import fastq_native
        fq = os.path.join(tempfile.mkdtemp(), "p.fastq")
        synth.make_se(fq, n)
        arrs = fastq_native.load_file(fq, want_quals=False)
        codes, lengths = arrs.codes, arrs.lengths
        np.savez(cache, codes=codes, lengths=lengths)
    from spring_tpu.io import fastq_native
    packed = fastq_native.pack_2bit(codes, 4)

    variants = []
    for a in sys.argv[2:]:
        if a == "baseline":
            variants.append((a, {}))
            continue
        kw = {}
        for kv in a.split(","):
            k, v = kv.split("=")
            kw[k] = int(v)
        variants.append((a, kw))
    if not variants:
        variants = [
            ("baseline", {}),
            ("accept_slots=8", dict(accept_slots=8)),
            ("accept_slots=32", dict(accept_slots=32)),
            ("shift_chunk=8", dict(shift_chunk=8)),
            ("candidates=4", dict(candidates=4)),
        ]
    for name, kw in variants:
        run_variant(packed, lengths, codes, name, **kw)


if __name__ == "__main__":
    main()
