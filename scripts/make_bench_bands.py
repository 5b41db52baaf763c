#!/usr/bin/env python3
"""Merge >=3 fresh-JVM full-bench JSON records (graft.Bench stdout, the
full-map line) into BENCH_BANDS.json — the per-row idle noise band that
lets every future bench record self-adjudicate (see graft.BenchBands).

Usage:
    python3 scripts/make_bench_bands.py out.json run1.json run2.json [run3.json ...]

Each runN.json is the FIRST stdout JSON line of one `runMain graft.Bench`
invocation (fresh JVM each — the driver's measurement mode, so round-1
standing-artifact builds land inside the bands the same way they land in
driver records).

Spin normalization (round 19): the box's calibration spin wanders
between hours (observed 228–363 ms across one session), and the old
policy — refuse any set of runs whose spins spread >15% — forced three
regenerations and five discarded runs in round 18. Instead, each run's
per-row seconds are now DIVIDED by that run's own load ratio
(mean-of-start/end spin over the idle reference spin) before merging,
so the bands carry idle-equivalent values and moderately-loaded runs
are usable. Linear normalization is an approximation (I/O-bound rows
don't stretch 1:1 with CPU load), which is why runs are still DISCARDED
— with their reason recorded in the output's "provenance" — when the
approximation can't be trusted:
  - the record names failed queries (elapsed-until-throw would pin a
    bogus fast band);
  - the spin moved >40% WITHIN the run (load arrived mid-run, so no
    single factor describes the rows — the box's native idle wander
    measures up to ~1.3x, see MAX_INTRA_RUN_SPREAD);
  - the run's spin is >60% above the idle reference (too loaded —
    the linear model's error would exceed the band width itself).
At least 3 runs must survive. The merged file pins idle_calib_ms =
the reference spin, exactly what graft.BenchBands divides by at
adjudication time.
"""
import json
import os
import sys

# a run whose spin moved more than this within the record has no single
# load factor — discard rather than mis-normalize. Calibrated against
# the box's NATIVE wander: three back-to-back provably-idle r19 runs
# (wall totals within 6% of each other) showed intra-run spin spreads
# of 1.03x, 1.15x, and 1.29x with no load present, while genuine
# mid-run load arrival (the r16/r17 co-load pattern) reads 2x+ — so
# the discard line sits above the measured idle wander and below the
# load signature
MAX_INTRA_RUN_SPREAD = 1.40
# beyond this load ratio the linear spin model's error rivals the band
# width — discard rather than bake the residual into the "idle" bands
MAX_NORM_RATIO = 1.60


def main() -> None:
    out, ins = sys.argv[1], sys.argv[2:]
    runs = [(p, json.load(open(p))) for p in ins]
    if not runs:
        sys.exit("need >=3 full-bench records (extra loaded runs are "
                 "discarded with recorded provenance)")

    # reference idle spin: the calmest moment seen across every supplied
    # run that COMPLETED CLEANLY. A discarded-because-loaded run still
    # contributes its pre-load start spin (load raises spin, so its
    # calm reading is trustworthy), but a failed-query run does not
    # (r19 ADVICE): a run untrustworthy enough to discard for failures
    # may have aborted mid-calibration or run under whatever anomaly
    # broke the query, so none of its readings anchor the reference.
    clean = [r for _, r in runs if r.get("failed", None) == []]
    if not clean:
        sys.exit("no failure-free runs — nothing can anchor idle_calib_ms")
    idle = min(min(r["calib_start_ms"], r["calib_end_ms"]) for r in clean)

    accepted, discarded = [], []
    for p, r in runs:
        lo = min(r["calib_start_ms"], r["calib_end_ms"])
        hi = max(r["calib_start_ms"], r["calib_end_ms"])
        spin = (r["calib_start_ms"] + r["calib_end_ms"]) / 2.0
        if r.get("failed", None) != []:
            # a failed query's elapsed-until-throw reading would pin a
            # bogus fast band that names every future HEALTHY run a
            # breach — the exact false signal the bands exist to prevent
            discarded.append({"file": p, "reason": "failed queries: "
                              + str(r.get("failed",
                                          "<no failed field — pre-flag record>"))})
        elif hi > lo * MAX_INTRA_RUN_SPREAD:
            discarded.append({"file": p, "reason":
                              f"calibration moved {lo:.0f}->{hi:.0f} ms within "
                              f"the run (> {MAX_INTRA_RUN_SPREAD:.2f}x) — load "
                              "arrived mid-run, no single factor applies"})
        elif spin > idle * MAX_NORM_RATIO:
            discarded.append({"file": p, "reason":
                              f"spin {spin:.0f} ms is > {MAX_NORM_RATIO:.2f}x "
                              f"the idle reference {idle:.0f} ms — too loaded "
                              "to normalize"})
        else:
            accepted.append((p, r, spin))

    if len(accepted) < 3:
        for d in discarded:
            print(f"discarded {d['file']}: {d['reason']}", file=sys.stderr)
        sys.exit(f"only {len(accepted)} usable runs after discards — need >=3")

    names = set(accepted[0][1]["queries"])
    for _, r, _ in accepted[1:]:
        if set(r["queries"]) != names:
            sys.exit("refusing: accepted runs cover different query sets")
    sfs = {os.path.basename(r["sf"].rstrip("/")) for _, r, _ in accepted}
    if len(sfs) != 1:
        sys.exit(f"refusing: mixed scale factors {sfs}")

    # idle-equivalent seconds: divide each run's rows by its load ratio
    factors = {p: idle / spin for p, _, spin in accepted}
    bands = {q: [min(r["queries"][q] * factors[p] for p, r, _ in accepted),
                 max(r["queries"][q] * factors[p] for p, r, _ in accepted)]
             for q in sorted(names)}
    provenance = {
        "accepted": [{"file": p,
                      "calib_start_ms": r["calib_start_ms"],
                      "calib_end_ms": r["calib_end_ms"],
                      "norm_factor": round(factors[p], 4)}
                     for p, r, _ in accepted],
        "discarded": discarded,
    }
    json.dump({"idle_calib_ms": round(idle, 1), "sf": sfs.pop(),
               "runs": len(accepted), "provenance": provenance,
               "bands": bands},
              open(out, "w"), indent=1)
    print(f"wrote {out}: {len(bands)} bands, idle_calib_ms={idle:.1f}, "
          f"{len(accepted)} accepted / {len(discarded)} discarded "
          f"(factors {', '.join(f'{factors[p]:.3f}' for p, _, _ in accepted)})")


if __name__ == "__main__":
    main()
