#!/usr/bin/env python3
"""Calibration-normalized cross-round bench adjudication.

Implements the SCALING.md "Bench adjudication" protocol as a tool so
every round runs the SAME comparison instead of ad-hoc analysis:

    python3 tools/adjudicate.py <prev_bench.json> [cur_bench.json]

`prev_bench.json` is usually the previous round's tracked baseline,
e.g. `git show <round-close-sha>:bench_out.json > /tmp/prev.json`;
`cur_bench.json` defaults to ./bench_out.json.

Protocol (round 16, first executed round 17):
  1. drift = calib_now / calib_prev  (the constant-work lineitem
     checksum scan; normalizes CPU/box-speed drift — NOT page-cache
     state, see the round-17 lesson below).
  2. Normalize every current timing by `drift`, then flag only
     queries moving >20% in BOTH suite and isolated modes, in the
     SAME direction, with >0.2 s absolute change after normalization.
  3. The worktree re-run of the prior round's code is the ESCALATION
     for flagged REGRESSIONS, never the default; improvements carry
     no action.

Round-17 lesson encoded in the output: "all movers one direction AND
totals moving with them" is the box-state signature (page-cache/disk
state the CPU calibration cannot see); a real code regression shows
paired-opposite or isolated movers. The report says which signature
it sees.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def movers(prev, cur, drift, mode):
    out = {}
    for q, p in prev.get(mode, {}).items():
        c = cur.get(mode, {}).get(q)
        if c is None or p <= 0 or c <= 0:
            continue
        cn = c / drift
        r = cn / p
        if (r > 1.2 or r < 1 / 1.2) and abs(cn - p) > 0.2:
            out[q] = (p, cn, r)
    return out


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    prev = load(sys.argv[1])
    cur = load(sys.argv[2] if len(sys.argv) > 2 else "bench_out.json")
    cp, cc = prev["calibration_sec"], cur["calibration_sec"]
    drift = cc / cp
    print(f"calib prev={cp:.3f}s cur={cc:.3f}s drift={drift:.3f}")
    suite = movers(prev, cur, drift, "queries")
    iso = movers(prev, cur, drift, "queries_isolated")
    both = {
        q: (suite[q], iso[q])
        for q in suite
        if q in iso and (suite[q][2] > 1) == (iso[q][2] > 1)
    }
    regress = {q: v for q, v in both.items() if v[0][2] > 1}
    improve = {q: v for q, v in both.items() if v[0][2] <= 1}
    print(f"single-mode movers: suite={len(suite)} isolated={len(iso)}")
    print(f"both-mode same-direction: {len(both)} "
          f"({len(regress)} regressions, {len(improve)} improvements)")
    for label, d in (("REGRESSION", regress), ("improvement", improve)):
        for q, ((ps, cs, rs), (pi, ci, ri)) in sorted(
                d.items(), key=lambda kv: -abs(1 - kv[1][0][2])):
            print(f"  {label} {q}: suite {ps:.2f}->{cs:.2f}s ({rs:.2f}x) "
                  f"isolated {pi:.2f}->{ci:.2f}s ({ri:.2f}x)")
    tp, tc = prev["value"], cur["value"] / drift
    print(f"totals: prev={tp:.1f}s cur(normalized)={tc:.1f}s "
          f"({tc / tp:.2f}x)")
    # the box-state signature needs BOTH protocol conditions: every
    # mover one direction AND the totals moving the same way — movers
    # all up while the total fell is not box state
    one_dir_up = bool(both) and all(v[0][2] > 1 for v in both.values())
    one_dir_down = bool(both) and all(v[0][2] <= 1 for v in both.values())
    box_state = (one_dir_up and tc > tp) or (one_dir_down and tc <= tp)
    if box_state:
        print("signature: ALL movers one direction + totals moving with"
              " them -> box state (page-cache/disk; CPU calibration is"
              " blind to it). No escalation unless a regression repeats"
              " next round.")
    elif regress:
        print("signature: paired-opposite or isolated regressions ->"
              " candidate CODE regression. Escalate: worktree re-run of"
              " the prior round's code on the flagged queries.")
    elif both:
        print("signature: improvements only, totals moved against them"
              " -> mixed box state; no action (improvements never"
              " escalate).")
    else:
        print("no both-mode movers after normalization.")
    # the exit code IS the escalation gate, so it must agree with the
    # printed verdict: box-state regressions do not escalate
    return 1 if (regress and not box_state) else 0


if __name__ == "__main__":
    sys.exit(main())
