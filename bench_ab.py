#!/usr/bin/env python
"""A/B benchmark: spring_tpu vs the reference SPRING binary on identical input.

Builds the reference out-of-source via tools/refbuild (boost shimmed with
std::filesystem + zlib), generates synthetic SE and PE datasets, runs both
tools in the same modes, and writes a comparison report (AB_REPORT.md):
wall times, total archive size, and per-stream (reads/quality/id) sizes.

Usage: python bench_ab.py [--reads N] [--modes se,pe,se-r,pe-r] [--quick]
"""
import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
REF_BIN = os.environ.get("SPRING_REF_BIN", "/tmp/spring_ref_build/spring")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_ref_binary() -> str:
    if not os.path.exists(REF_BIN):
        log("building reference binary ...")
        subprocess.run(["make", "-j16", f"BUILD={os.path.dirname(REF_BIN)}"],
                       cwd=os.path.join(REPO, "tools", "refbuild"), check=True,
                       capture_output=True)
    return REF_BIN


def run_reference(infiles, outfile, workdir, reorder=False, threads=8,
                  long_mode=False):
    cmd = [ensure_ref_binary(), "-c", "-i", *infiles, "-o", outfile,
           "-w", workdir, "-t", str(threads)]
    if reorder:
        cmd.append("-r")
    if long_mode:
        cmd.append("-l")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, check=True)
    dt = time.time() - t0
    streams = {}
    for name, pat in [("reads", r"Reads:\s+(\d+) bytes"),
                      ("quality", r"Quality:\s+(\d+) bytes"),
                      ("id", r"ID:\s+(\d+) bytes")]:
        m = re.search(pat, p.stdout)
        streams[name] = int(m.group(1)) if m else 0
    # decompress timing + verification
    outs = [os.path.join(workdir, f"ref_out_{i}.fastq")
            for i in range(len(infiles))]
    t1 = time.time()
    subprocess.run([REF_BIN, "-d", "-i", outfile, "-o", *outs, "-w", workdir,
                    "-t", str(threads)], capture_output=True, check=True)
    ddt = time.time() - t1
    ok = verify(infiles, outs, order_insensitive=reorder)
    return {"time_c": dt, "time_d": ddt, "size": os.path.getsize(outfile),
            "streams": streams, "roundtrip_ok": ok}


def run_ours(infiles, outfile, reorder=False, threads=8,
             long_mode=False):
    from spring_tpu import api
    from spring_tpu.io.container import ArchiveReader
    opts = api.CompressOptions(num_threads=threads, verbose=False,
                               reorder=reorder, long_mode=long_mode)
    # warm-up (compile) pass, then the timed pass
    api.compress(list(infiles), outfile, opts)
    t0 = time.time()
    api.compress(list(infiles), outfile, opts)
    dt = time.time() - t0
    with ArchiveReader(outfile) as r:
        sizes = r.size_by_prefix()
    streams = {
        "reads": sum(v for k, v in sizes.items()
                     if k in ("pos", "seq", "npos", "literal", "nn", "nchar",
                              "rc", "flag", "rlen", "order", "pair",
                              "read1", "read2", "rlen1", "rlen2")),
        "quality": sum(v for k, v in sizes.items()
                       if k.startswith("quality")),
        "id": sum(v for k, v in sizes.items() if k.startswith("id")),
    }
    outs = [outfile + f".out_{i}.fastq" for i in range(len(infiles))]
    t1 = time.time()
    api.decompress(outfile, outs, verbose=False, num_threads=threads)
    ddt = time.time() - t1
    ok = verify(infiles, outs, order_insensitive=reorder)
    return {"time_c": dt, "time_d": ddt, "size": os.path.getsize(outfile),
            "streams": streams, "roundtrip_ok": ok, "all_streams": sizes}


def verify(orig, outs, order_insensitive=False):
    import filecmp
    if not order_insensitive:
        return all(filecmp.cmp(a, b, shallow=False)
                   for a, b in zip(orig, outs))
    # multiset equality of complete records
    def recset(paths):
        recs = []
        for p in paths:
            with open(p, "rb") as f:
                lines = f.read().split(b"\n")
            recs += [tuple(lines[i:i + 4])
                     for i in range(0, len(lines) - 3, 4)]
        return sorted(recs)
    return recset(orig) == recset(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int,
                    default=int(os.environ.get("AB_READS", 1_000_000)))
    ap.add_argument("--modes", default="se,pe,se-r,pe-r")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--report", default=os.path.join(REPO, "AB_REPORT.md"))
    args = ap.parse_args()

    from spring_tpu.utils import synth
    tmp = tempfile.mkdtemp(prefix="spring_ab_")
    n = args.reads
    rows = []
    datasets = {}
    if any(m.startswith("se") for m in args.modes.split(",")):
        se = os.path.join(tmp, "se.fastq")
        log(f"generating SE dataset ({n} reads) ...")
        synth.make_se(se, n)
        datasets["se"] = [se]
    if any(m.startswith("pe") for m in args.modes.split(",")):
        pe1, pe2 = os.path.join(tmp, "pe_1.fastq"), os.path.join(tmp, "pe_2.fastq")
        log(f"generating PE dataset ({n // 2} pairs) ...")
        synth.make_pe(pe1, pe2, n // 2)
        datasets["pe"] = [pe1, pe2]

    for mode in args.modes.split(","):
        base = mode.split("-")[0]
        reorder = mode.endswith("-r")
        long_mode = mode.endswith("-l")
        infiles = datasets[base]
        nbases = n * 100
        log(f"--- mode {mode}: reference ---")
        wd = os.path.join(tmp, f"ref_{mode}")
        os.makedirs(wd, exist_ok=True)
        ref = run_reference(infiles, os.path.join(wd, "a.spring"), wd,
                            reorder=reorder, threads=args.threads,
                            long_mode=long_mode)
        log(f"    ref: {ref['time_c']:.1f}s c / {ref['time_d']:.1f}s d, "
            f"{ref['size']} B, ok={ref['roundtrip_ok']}")
        log(f"--- mode {mode}: spring_tpu ---")
        ours = run_ours(infiles, os.path.join(tmp, f"ours_{mode}.stpu"),
                        reorder=reorder, threads=args.threads,
                        long_mode=long_mode)
        log(f"    ours: {ours['time_c']:.1f}s c / {ours['time_d']:.1f}s d, "
            f"{ours['size']} B, ok={ours['roundtrip_ok']}")
        rows.append((mode, ref, ours, nbases))

    lines = ["# A/B report: spring_tpu vs reference SPRING",
             "",
             f"Synthetic data ({n} reads x 100 bp, 2 Mbp genome, 1% err, "
             f"{args.threads} threads). Reference built from /root/reference "
             "via tools/refbuild.", "",
             "| mode | tool | c time (s) | d time (s) | total B | reads B | "
             "quality B | id B | reads bits/base | round-trip |",
             "|---|---|---|---|---|---|---|---|---|---|"]
    for mode, ref, ours, nbases in rows:
        for tool, r in (("reference", ref), ("spring_tpu", ours)):
            s = r["streams"]
            lines.append(
                f"| {mode} | {tool} | {r['time_c']:.1f} | {r['time_d']:.1f} "
                f"| {r['size']} | {s['reads']} | {s['quality']} | {s['id']} "
                f"| {s['reads'] * 8 / nbases:.3f} "
                f"| {'ok' if r['roundtrip_ok'] else 'FAIL'} |")
        ref_t, our_t = ref["time_c"], ours["time_c"]
        lines.append(
            f"| {mode} | *ratio ours/ref* | {our_t / ref_t:.2f}x | "
            f"{ours['time_d'] / max(ref['time_d'], 1e-9):.2f}x | "
            f"{ours['size'] / ref['size']:.3f}x | "
            f"{ours['streams']['reads'] / max(ref['streams']['reads'], 1):.3f}x | "
            f"{ours['streams']['quality'] / max(ref['streams']['quality'], 1):.3f}x "
            f"| | | |")
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"report -> {args.report}")
    print(json.dumps({"modes": [r[0] for r in rows]}))


if __name__ == "__main__":
    main()
