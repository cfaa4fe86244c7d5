#!/usr/bin/env python3
"""Full-suite differential sweep driver for scale points (sf1+).

Routes each dumped query to the right checker:
  - dumps above SIZE_CUTOFF bytes -> tools/check_scale.py semantics
    (in-DuckDB dual-checksum reduction; pandas compare would not hold
    tens of millions of pair rows)
  - q_ivf_recall -> tools/check_ivf_scale.py semantics (needs the
    engine-trained centroids as input; pass CENT_DIR)
  - everything else -> tools/check_oracle.py exact pandas compare,
    run in sequential CHUNKS of fresh DuckDB processes (a single
    process evaluating 180+ oracles back-to-back can misreport under
    temp-storage pressure — observed round 10; chunks must be
    sequential, concurrent chunks clobber .tmp/duckdb_temp_storage)

Usage: sweep_oracle.py SF_DIR OUT_DIR [CENT_DIR] [--chunk N] [--embed-scale]
Prints per-query OK/FAIL lines and a final tally; exit 1 on any FAIL.

--embed-scale (sf10 sweeps): route the whole embedding/ANN family to
tools/check_embed_scale.py (list-native batched re-expressions, one
fresh DuckDB process per query) — their declared oracles build 10s of
billions of unnested rows at sf10 and DNF; the re-expressions are
validated bit-exact against the declared oracles at sf0.01. The IVF
members need CENT_DIR (graft.IvfCentroids dump).
"""
import os
import subprocess
import sys

SIZE_CUTOFF = 10 * 1024 * 1024
CHUNK = 30
HERE = os.path.dirname(os.path.abspath(__file__))

# query -> check_embed_scale.py mode (the --embed-scale routing table);
# True = needs CENT_DIR. All family members go through
# check_embed_scale.py, which caches the shared heavy intermediates
# (brute-force top-k, centroid assignments) under OUT_DIR/.oracle_cache
# so each is computed once per sweep.
EMBED_MODES = {
    "q_embed_topk": ("topk", False),
    "q_diversity_sample": ("diversity", False),
    "q_embed_lsh": ("lsh", False),
    "q_embed_lsh_probe": ("lsh_probe", False),
    "q_ann_recall": ("ann_recall", False),
    "q_kmeans_iter": ("kmeans", False),
    "q_embed_neardup": ("neardup", False),
    "q_stream_embed_neardup": ("stream_embed_neardup", False),
    "q_embed_ivf": ("ivf", True),
    "q_embed_ivf_index": ("ivf_index", True),
    "q_ivf_index_append": ("ivf_append", True),
    "q_stream_ivf_append": ("ivf_stream_append", True),
    "q_embed_ivf_probe": ("ivf_probe", True),
    "q_ivf_recall": ("ivf_recall", True),
}


def dir_size(p):
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def run(cmd):
    r = subprocess.run(cmd, capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    if r.returncode != 0 and r.stderr:
        sys.stdout.write(r.stderr[-2000:])
    return r.returncode == 0 and "FAIL" not in r.stdout


def main():
    argv, positional, chunk, embed_scale = sys.argv[1:], [], CHUNK, False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--chunk="):
            chunk = int(a.split("=", 1)[1])
        elif a == "--chunk":
            i += 1
            chunk = int(argv[i])
        elif a == "--embed-scale":
            embed_scale = True
        else:
            positional.append(a)
        i += 1
    sf_dir, out_dir = positional[0], positional[1]
    cent_dir = positional[2] if len(positional) > 2 else None
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and not d.startswith("."))  # skip .oracle_cache
    if embed_scale:
        embed = [n for n in names if n in EMBED_MODES]
        rest = [n for n in names if n not in EMBED_MODES
                and n != "q_triangles"]
        big = [n for n in rest
               if dir_size(os.path.join(out_dir, n)) > SIZE_CUTOFF]
        small = [n for n in rest if n not in big]
        ok = True
        for i in range(0, len(small), chunk):
            ok &= run([sys.executable, os.path.join(HERE, "check_oracle.py"),
                       sf_dir, out_dir] + small[i:i + chunk])
        if big:
            print(f"[sweep] {len(big)} large dumps via checksum harness: {big}")
            ok &= run([sys.executable, os.path.join(HERE, "check_scale.py"),
                       sf_dir, out_dir] + big)
        if "q_triangles" in names:
            # member-level wedge close DNFs on the replicated scale
            # corpora; the contracted harness expands family-grain
            # triangles exactly (validated at sf0.001/sf0.01/sf10)
            ok &= run([sys.executable,
                       os.path.join(HERE, "check_triangles_scale.py"),
                       sf_dir, out_dir])
        for n in embed:
            mode, needs_cent = EMBED_MODES[n]
            if needs_cent and cent_dir is None:
                print(f"FAIL {n}: --embed-scale mode {mode} needs CENT_DIR")
                ok = False
                continue
            cmd = [sys.executable, os.path.join(HERE, "check_embed_scale.py"),
                   mode, sf_dir, out_dir]
            if needs_cent:
                cmd.append(cent_dir)
            ok &= run(cmd)
        print(f"[sweep] {'ALL OK' if ok else 'FAILURES'} over "
              f"{len(names)} queries")
        sys.exit(0 if ok else 1)
    ivf = [n for n in names if n == "q_ivf_recall" and cent_dir]
    # q_ivf_recall never routes to the checksum harness: check_scale.py
    # evaluates the DECLARED oracle, which is the Lloyd-replay DNF this
    # tool exists to avoid at sf1+. Exclude it from `big` UNCONDITIONALLY
    # (ADVICE r12: with no CENT_DIR a large recall dump used to land in
    # `big` and hit exactly that harness) — without CENT_DIR it falls to
    # `small` and the warning below covers it.
    big = [n for n in names if n != "q_ivf_recall"
           and dir_size(os.path.join(out_dir, n)) > SIZE_CUTOFF]
    small = [n for n in names if n not in big and n not in ivf]
    if "q_ivf_recall" in small and cent_dir is None:
        print("[sweep] WARNING: no CENT_DIR given — q_ivf_recall falls "
              "back to its declared Lloyd-replay oracle, which DNFs at "
              "sf1+ (dump centroids with `runMain graft.IvfCentroids "
              "SF_DIR CENT_DIR` and pass CENT_DIR)")
    ok = True
    for i in range(0, len(small), chunk):
        ok &= run([sys.executable, os.path.join(HERE, "check_oracle.py"),
                   sf_dir, out_dir] + small[i:i + chunk])
    if big:
        print(f"[sweep] {len(big)} large dumps via checksum harness: {big}")
        ok &= run([sys.executable, os.path.join(HERE, "check_scale.py"),
                   sf_dir, out_dir] + big)
    if ivf:
        ok &= run([sys.executable, os.path.join(HERE, "check_ivf_scale.py"),
                   sf_dir, out_dir, cent_dir])
    print(f"[sweep] {'ALL OK' if ok else 'FAILURES'} over {len(names)} queries")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
