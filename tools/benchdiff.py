#!/usr/bin/env python3
"""Bench regression gate: diff two bench JSON lines, flag real movers.

Usage: tools/benchdiff.py OLD.json NEW.json [--threshold 1.5] [--md]

Each input is either a raw bench JSON line (the object Bench prints) or
a driver BENCH_r*.json wrapper whose "tail" contains that line.

Movers are CANARY-NORMALIZED when both rounds carry a canary field: a
query that went 1.0s -> 2.0s on a box whose fixed-work canary also
doubled is box noise, not a plan regression. Without canaries (pre-r7
files) raw ratios are reported and flagged as unnormalized — exactly
the ambiguity the canary exists to remove.

When the NEW round carries the bench's post-sweep `retry` map, a
flagged mover whose retry lands back under the threshold is reported
as `transient(retry ok)` and not gated: the first pass hit a
shared-host contention window or JIT-cold path, and the in-run second
opinion says the plan is fine.

Exit status: 0 = no flagged movers, 1 = movers flagged (gate), 2 = bad
input. --md emits a PERF.md-ready table instead of the plain report.
"""
import json
import sys


def load_bench(path):
    with open(path) as f:
        raw = f.read()
    # driver wrapper: {"n":..,"tail":"...{metric line}..."} or raw line
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "queries" in obj:
        return obj
    text = obj.get("tail", raw) if isinstance(obj, dict) else raw
    # last parseable {"metric"... line wins
    best = None
    for line in text.splitlines():
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            best = json.loads(line[i:])
        except json.JSONDecodeError:
            continue
    if best is None:
        raise ValueError(f"{path}: no bench JSON line found")
    return best


def normalize(bench):
    """Map query keys to the driver's short form (family prefix before
    the first underscore) so a driver line ("a07") diffs cleanly
    against a BENCH_DETAIL file ("a07_c4_clean"), and surface a
    detail file's canary_pre/canary_post as the canary pair."""
    q = {}
    for name, v in bench.get("queries", {}).items():
        short = name.split("_", 1)[0]
        q[short if short not in q else name] = v
    out = dict(bench, queries=q)
    # artifact keys: mirror Bench's abbreviation (head + initials,
    # collisions keep full names) so detail files diff against driver
    # lines
    arts = bench.get("artifact_ms")
    if arts:
        def short(n):
            parts = n.split("_")
            return (parts[0] + "_" + "".join(p[0] for p in parts[1:] if p)
                    if len(parts) > 1 else n)
        abbr = {n: short(n) for n in arts}
        dup = {s for s in abbr.values()
               if sum(1 for v in abbr.values() if v == s) > 1}
        out["artifact_ms"] = {
            (n if abbr[n] in dup else abbr[n]): v for n, v in arts.items()}
    if "canary" not in out:
        pair = [out.get("canary_pre"), out.get("canary_post")]
        if any(isinstance(v, (int, float)) for v in pair):
            out["canary"] = pair
    return out


def canary_sec(bench):
    c = bench.get("canary")
    if isinstance(c, list) and c:
        vals = [v for v in c if v and v > 0]
        return sum(vals) / len(vals) if vals else None
    return None


def main(argv):
    # drop flags AND the value of a space-separated "--threshold 1.5"
    args = [a for i, a in enumerate(argv) if not a.startswith("--")
            and not (i > 0 and argv[i - 1] == "--threshold")]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    threshold = 1.5
    for i, a in enumerate(argv):
        if a.startswith("--threshold"):
            # bounds-check the space-separated form: a trailing bare
            # "--threshold" falls through to usage instead of IndexError
            try:
                threshold = float(a.split("=", 1)[1] if "=" in a
                                  else argv[i + 1])
            except (IndexError, ValueError):
                print(__doc__, file=sys.stderr)
                return 2
    md = "--md" in argv
    old, new = (normalize(load_bench(p)) for p in args)
    c_old, c_new = canary_sec(old), canary_sec(new)
    box = (c_new / c_old) if (c_old and c_new) else None

    rows = []
    oq, nq = old["queries"], new["queries"]
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((name, a, b, None, "added" if a is None else "removed"))
            continue
        if b < 0:
            # failing NOW is a gate regardless of history
            rows.append((name, a, b, None, "FAILED"))
            continue
        if a < 0:
            # failed only in the OLD round: the new round fixed it —
            # report, but never gate a healthy round on a stale baseline
            rows.append((name, a, b, None, "recovered"))
            continue
        if a < 0.05 and b < 0.05:
            continue  # sub-noise floor on both sides
        ratio = b / a if a > 0 else float("inf")
        norm = ratio / box if box else ratio
        status = None
        if norm > threshold:
            status = "SLOWER" if box else "SLOWER(unnormalized)"
            # the bench re-runs outliers once after the sweep; a retry
            # back under threshold proves the first pass hit a
            # transient window (shared-host contention / JIT), not a
            # plan regression — report it as such, don't gate on it
            retry = new.get("retry") or {}
            rb = retry.get(name) or next(
                (v for k, v in retry.items()
                 if k.split("_", 1)[0] == name), None)
            if rb is not None and a > 0:
                rnorm = (rb / a) / box if box else rb / a
                if rnorm <= threshold:
                    status, norm = "transient(retry ok)", rnorm
        elif norm < 1 / threshold:
            status = "faster"
        if status:
            rows.append((name, a, b, norm, status))

    # artifact breakdown diff (full-ms map, short keys fine for diffing)
    art_rows = []
    oa, na = old.get("artifact_ms") or {}, new.get("artifact_ms") or {}
    for name in sorted(set(oa) | set(na)):
        a, b = oa.get(name), na.get(name)
        if a is None or b is None or a < 50 and b < 50:
            continue
        ratio = b / a if a else float("inf")
        norm = ratio / box if box else ratio
        if norm > threshold or norm < 1 / threshold:
            art_rows.append((name, a / 1000.0, b / 1000.0, norm,
                             "SLOWER" if norm > threshold else "faster"))

    flagged = [r for r in rows if r[4] and r[4].startswith("SLOWER")] + \
              [r for r in art_rows if r[4] == "SLOWER"] + \
              [r for r in rows if r[4] == "FAILED"]

    if md:
        print("| query | old s | new s | norm ratio | status |")
        print("|---|---|---|---|---|")
        for name, a, b, norm, status in rows + art_rows:
            fa = f"{a:.2f}" if isinstance(a, float) else a
            fb = f"{b:.2f}" if isinstance(b, float) else b
            fn = f"{norm:.2f}x" if norm else ""
            print(f"| {name} | {fa} | {fb} | {fn} | {status} |")
        box_s = f"{box:.2f}" if box else "n/a (no canary in both rounds)"
        print(f"\nBox factor (canary new/old): {box_s}; "
              f"threshold {threshold}x canary-normalized.")
    else:
        if box:
            print(f"box factor (canary new/old): {box:.2f} "
                  f"(old {c_old:.2f}s, new {c_new:.2f}s)")
        else:
            print("no canary in both rounds -> RAW ratios (unnormalized)")
        for name, a, b, norm, status in rows + art_rows:
            fn = f"{norm:.2f}x" if norm else "-"
            print(f"{status:>22}  {name:<24} {a} -> {b}  ({fn} normalized)")
        print(f"{len(flagged)} flagged movers at {threshold}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
