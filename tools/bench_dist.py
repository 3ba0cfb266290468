#!/usr/bin/env python
"""Benchmark the distributed reorder engine (VERDICT r3 next #2).

Modes:
  python tools/bench_dist.py chip <fastq>     — on the attached device
      mesh (1 real TPU here): full compress wall, SPRING_TPU_DIST=1 vs
      the default engine, same input, same process ordering (default
      first). Reports both walls + the dist/default ratio.
  python tools/bench_dist.py cpu8 [n_reads]   — 8-virtual-device CPU
      mesh: times one warm dist flush, then a jax.profiler trace of it,
      and reports the collective share (all-to-all / all-gather /
      collective-permute op time vs total op time).

Writes one JSON line to stdout (everything else on stderr).
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chip(fq: str):
    import filecmp
    from spring_tpu import api
    opts = api.CompressOptions(num_threads=os.cpu_count() or 8,
                               verbose=False)
    out = {}
    for label, dist in (("default", False), ("dist", True)):
        if dist:
            os.environ["SPRING_TPU_DIST"] = "1"
        else:
            os.environ.pop("SPRING_TPU_DIST", None)
        arc = fq + f".{label}.stpu"
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            api.compress([fq], arc, opts)
            dt = time.time() - t0
            log(f"{label} pass {i}: {dt:.2f}s")
            if i:                       # pass 0 pays compiles
                best = min(best, dt)
        dec = fq + f".{label}.out.fastq"
        api.decompress(arc, [dec], verbose=False,
                       num_threads=os.cpu_count() or 8)
        ok = filecmp.cmp(fq, dec, shallow=False)
        out[label] = {"best_s": round(best, 2),
                      "archive_bytes": os.path.getsize(arc),
                      "roundtrip_ok": ok}
        for f in (arc, dec):
            os.unlink(f)
    out["dist_over_default"] = round(
        out["dist"]["best_s"] / out["default"]["best_s"], 3)
    print(json.dumps({"mode": "chip", "input": fq, **out}))


def cpu8(n_reads: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from spring_tpu.parallel import dist as dm
    from spring_tpu.io import packing

    rng = np.random.default_rng(0)
    L = 100
    genome = rng.integers(0, 4, size=max(n_reads * L // 50, 100_000),
                          dtype=np.int8)
    starts = rng.integers(0, len(genome) - L, size=n_reads)
    codes = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.uint8)
    packed = packing.pack_codes(codes)
    lengths = np.full(n_reads, L, np.int32)

    eng = dm.DistReorderEngine(packed, lengths,
                               dm.DistConfig(max_readlen=L))
    log(f"mesh={eng.n} devices, B={eng.B}, Np={eng.Np}")
    m = eng.mesh
    prog = eng._prog
    rows_dev = dm.mh.put_sharded(m, eng.packed)
    btab, keys_dev, rids, pairs, dropped = prog["build"](rows_dev)
    jax.block_until_ready(dropped)
    stride = max(eng.N // max(eng.B, 1), 1)
    idx = np.arange(eng.N, dtype=np.int32)
    so = np.concatenate([idx[r::stride] for r in range(stride)])
    state = eng.init_state()
    qslice, nq_arr = eng._queue_slices(so.astype(np.int32))
    state["n_queue"] = dm.mh.put_sharded(m, nq_arr)
    seed_dev = dm.mh.put_sharded(m, qslice)
    maxshift = dm.mh.put_replicated(m, np.int32(eng.cfg.max_shift))

    def flush(state):
        return prog["flush"](state, btab, pairs, rows_dev, seed_dev,
                             maxshift)

    t0 = time.time()
    state, buf, stats = flush(state)
    jax.block_until_ready(stats)
    log(f"first flush (incl compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    state, buf, stats = flush(state)
    jax.block_until_ready(stats)
    warm = time.time() - t0
    log(f"warm flush: {warm:.3f}s")

    outdir = "/tmp/stpu_dist_profile"
    with jax.profiler.trace(outdir):
        state, buf, stats = flush(state)
        jax.block_until_ready(stats)
    traces = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                       recursive=True)
    tf = max(traces, key=os.path.getmtime)
    with gzip.open(tf, "rt") as f:
        data = json.load(f)
    tot = coll = 0.0
    per = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "")
            low = name.lower()
            if any(k in low for k in ("thunk", "fusion", "convolution",
                                      "all-to-all", "all-gather",
                                      "collective", "sort", "scatter",
                                      "gather", "while", "reduce",
                                      "copy", "dynamic", "concatenate",
                                      "slice", "select", "broadcast",
                                      "iota", "transpose", "compare",
                                      "add", "and", "or")):
                tot += ev["dur"]
                if any(k in low for k in ("all-to-all", "all-gather",
                                          "collective-permute",
                                          "all-reduce")):
                    coll += ev["dur"]
                    key = low.split(".")[0].split("(")[0][:40]
                    per[key] = per.get(key, 0) + ev["dur"]
    share = coll / tot if tot else 0.0
    print(json.dumps({
        "mode": "cpu8", "n_reads": n_reads, "devices": eng.n,
        "warm_flush_s": round(warm, 3),
        "collective_share": round(share, 4),
        "collective_ms": round(coll / 1e3, 1),
        "op_total_ms": round(tot / 1e3, 1),
        "collectives": {k: round(v / 1e3, 1) for k, v in sorted(
            per.items(), key=lambda kv: -kv[1])[:6]},
    }))


if __name__ == "__main__":
    if sys.argv[1] == "chip":
        chip(sys.argv[2])
    else:
        cpu8(int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000)
