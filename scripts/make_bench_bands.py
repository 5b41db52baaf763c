#!/usr/bin/env python3
"""Merge >=3 fresh-JVM full-bench JSON records (graft.Bench stdout, the
full-map line) into BENCH_BANDS.json — the per-row idle noise band that
lets every future bench record self-adjudicate (see graft.BenchBands).

Usage:
    python3 scripts/make_bench_bands.py out.json run1.json run2.json run3.json

Each runN.json is the FIRST stdout JSON line of one `runMain graft.Bench`
invocation (fresh JVM each — the driver's measurement mode, so round-1
standing-artifact builds land inside the bands the same way they land in
driver records). The runs must be taken on an idle box: the merged file
pins idle_calib_ms = min calibration spin seen, and the runs are refused
if any spin exceeds the min by >15% (a loaded run would bake co-load
into the "idle" bands and blunt every future correction).
"""
import json
import os
import sys


def main() -> None:
    out, ins = sys.argv[1], sys.argv[2:]
    if len(ins) < 3:
        sys.exit("need >=3 idle full-bench records for a band")
    runs = [json.load(open(p)) for p in ins]
    for p, r in zip(ins, runs):
        # a failed query's elapsed-until-throw reading would pin a bogus
        # fast band that names every future HEALTHY run a breach — the
        # exact false signal the bands exist to prevent. Records written
        # before the "failed" field exist only in the repo's own healthy
        # series, but refuse anything that cannot prove itself clean.
        if r.get("failed", None) != []:
            sys.exit(f"refusing {p}: record has failed queries "
                     f"{r.get('failed', '<no failed field — pre-flag record>')}")
    spins = [max(r["calib_start_ms"], r["calib_end_ms"]) for r in runs]
    idle = min(min(r["calib_start_ms"], r["calib_end_ms"]) for r in runs)
    if max(spins) > idle * 1.15:
        sys.exit(f"refusing: calibration spread {idle:.0f}..{max(spins):.0f} ms "
                 "(>15%) — at least one run was not idle")
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            sys.exit("refusing: runs cover different query sets")
    sfs = {os.path.basename(r["sf"].rstrip("/")) for r in runs}
    if len(sfs) != 1:
        sys.exit(f"refusing: mixed scale factors {sfs}")
    bands = {q: [min(r["queries"][q] for r in runs),
                 max(r["queries"][q] for r in runs)]
             for q in sorted(names)}
    json.dump({"idle_calib_ms": round(idle, 1), "sf": sfs.pop(),
               "runs": len(runs), "bands": bands},
              open(out, "w"), indent=1)
    print(f"wrote {out}: {len(bands)} bands, idle_calib_ms={idle:.1f}, "
          f"{len(runs)} runs")


if __name__ == "__main__":
    main()
