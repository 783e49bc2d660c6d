#!/usr/bin/env python3
"""Re-seed a bench-band file from a CLEAN bench artifact.

Usage: python3 tools/seed_bands.py <bench_artifact.json> <note> [out.json]

`out.json` defaults to BENCH_BANDS.json (the sf0.1 bands Bench reads
by default). Bands are per-SCALE-FACTOR: pass BENCH_BANDS_sf1.json
when seeding from an sf1 artifact and point Bench at it with
SPARK_GRAFT_BENCH_BAND (tools/scale_gate.sh does this automatically),
so sub-second keys at sf1 get the same min-level noise suppression
sf0.1 runs have had since round 12 instead of band-less
rep-disagreement roulette on a noisy box.

Refuses an artifact that flags its own contamination (non-empty
`contaminated`, `preflight_failed`, or ambient over 1.5x) — the bands
are the reference every future contamination verdict keys off, so a
poisoned seed silently redefines "clean" for all later rounds.
Synthetic `probe_scan` / `probe_shuffle` bands come from the
artifact's probe bases and drive Bench's pre-flight gate.
"""
import json
import sys

src, note = sys.argv[1], sys.argv[2]
with open(src) as f:
    art = json.load(f)

# An artifact WITHOUT the contamination fields never went through
# Bench's gating at all (e.g. a BenchSeq sequential-probe capture) —
# refusing it here keeps "missing screening" from reading as "clean".
# (BenchSeq artifacts also suffix deliberately-repeated keys `k#2`,
# `k#3` — any ad-hoc tooling that joins those on raw query names must
# strip the `#N` suffix first; band tooling never sees them because of
# this refusal.)
if not isinstance(art.get("contaminated"), list):
    sys.exit("REFUSED: artifact carries no contamination verdict "
             "(not a gated graft.Bench capture — BenchSeq probe "
             "artifacts cannot seed bands)")
if art.get("contaminated"):
    sys.exit(f"REFUSED: artifact flags contaminated keys: {art['contaminated']}")
if art.get("preflight_failed"):
    sys.exit("REFUSED: artifact is stamped preflight_failed")
# 2.0, not 1.5: each ratio is a SINGLE probe sample (a ~0.3-0.5 s
# query), and one-sample jitter on a quiet box reaches ~1.65x while
# every per-key band (min of >=2 reps) stays inside its own band —
# observed on the round-13 seeding run. Sustained contention shows up
# as several ratios over 2x and as contaminated keys, both refused.
ratios = art.get("ambient_ratios", []) + art.get("ambient_shuffle_ratios", [])
bad = [r for r in ratios if r > 2.0]
if bad:
    sys.exit(f"REFUSED: ambient probe ratios over 2.0x during the run: {bad}")

bands = dict(sorted(art["queries"].items()))
for probe in ("probe_scan", "probe_shuffle"):
    base = art.get(f"{probe}_base", -1.0)
    if base and base > 0:
        bands[probe] = base

out = {
    "source": note,
    "note": ("per-key min seconds from the last committed CLEAN bench run; "
             "Bench.scala flags keys exceeding band*max(ambient_ratio,3) as "
             "contaminated, and pre-flights probe_scan/probe_shuffle against "
             "their bands. Refresh ONLY via tools/seed_bands.py from a clean "
             "run."),
    "sf": art.get("sf", "/root/testdata/sf0.1"),
    "bands": bands,
}
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_BANDS.json"
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(f"seeded {len(bands)} bands from {src} into {out_path}")
