#!/usr/bin/env python3
"""Scale-up harness: build the synthetic NX corpus, bench at 1x and Nx,
emit SCALE_r{ROUND}.json with per-query scaling factors.

Usage: tools/scalerun.py ROUND [--factor 10] [--skip-build]
                               [--base-dir /root/testdata/sf0.1]

Institutionalized form of the round-6 one-off 10x measurement (PERF.md),
which caught f04 silently recomputing a quadratic kNN that was invisible
at the correctness SF. Run it every round; read the "superlinear" list —
anything there that is not a documented flat/exact surface is a scale
bug.

Scaling classes (factor N):
  sublinear   wall factor < 0.5*N  (fixed overheads amortize)
  linear      wall factor < 1.5*N
  superlinear otherwise            (quadratic surfaces; must be declared)

Queries under 0.2s at 1x get times recorded but no factor/class — a
50ms->300ms move is JIT/scheduling noise, not a scaling signal —
UNLESS the scale leg itself exceeds 1s: a query whose growth is all
slope (tiny at 1x, seconds at Nx) is exactly what this harness exists
to catch (round 7's d08 hid a 12x move behind the exemption).

The two bench runs happen in the same wall-clock session on the same
box; their canary pairs are included so a box-load shift mid-harness is
visible in the artifact rather than silently polluting factors.
"""
import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")
# per-leg scratch (line/detail per tag, subset-probe scale artifacts)
# lives under legs/ so the repo ROOT keeps only the committed surface:
# BENCH_FULL + BENCH_r* + SCALE_r* + CORRECTNESS_r*
LEGS = os.path.join(REPO, "legs")


def sbt_run(main, env_extra):
    env = dict(os.environ, **env_extra)
    cmd = ["sbt", "-batch", f"runMain graft.{main}"]
    print(f"+ {' '.join(cmd)}  ({env_extra})", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    sys.stdout.write(proc.stdout[-3000:])
    if proc.returncode != 0:
        sys.exit(f"FATAL: {main} exited {proc.returncode}")
    return proc.stdout


def leg_file(name):
    """Resolve a saved leg file: legs/ first, repo root as the legacy
    fallback (legs written by pre-round-10 tooling live at the root —
    --reuse-bench and the BENCH_FULL restore must keep working on
    them)."""
    p = os.path.join(LEGS, name)
    legacy = os.path.join(REPO, name)
    return p if os.path.exists(p) or not os.path.exists(legacy) else legacy


def bench(sf_dir, tag, reuse=False, only=None):
    os.makedirs(LEGS, exist_ok=True)
    # fresh legs always WRITE under legs/; only reads fall back
    line_path = os.path.join(LEGS, f"BENCH_LINE_{tag}.json")
    detail_path = os.path.join(LEGS, f"BENCH_DETAIL_{tag}.json")
    if reuse:
        # --reuse-bench: re-aggregate from a prior run's saved leg
        # files (e.g. after fixing the aggregation) without paying
        # two more full benches
        with open(leg_file(f"BENCH_LINE_{tag}.json")) as f:
            line = json.load(f)
        with open(leg_file(f"BENCH_DETAIL_{tag}.json")) as f:
            detail = json.load(f)
        return line, detail
    if os.path.exists(DETAIL):
        os.remove(DETAIL)
    env = {"SPARK_GRAFT_SF_DIR": sf_dir}
    if only:
        env["SPARK_GRAFT_ONLY"] = only
    out = sbt_run("Bench", env)
    line, raw = None, None
    for ln in out.splitlines():
        i = ln.find('{"metric"')
        if i >= 0:
            try:
                line = json.loads(ln[i:])
                raw = ln[i:].rstrip()
            except json.JSONDecodeError:
                pass
    if line is None:
        sys.exit(f"FATAL: no bench JSON line in {tag} run")
    with open(DETAIL) as f:
        detail = json.load(f)
    shutil.copy(DETAIL, detail_path)
    # keep Bench's own byte format so a later restore of this leg into
    # BENCH_FULL.json is byte-identical to a plain bench run (no
    # json.dump reformatting churn in the committed artifact)
    with open(line_path, "w") as f:
        f.write(raw + "\n")
    return line, detail


def representative(detail):
    """Per-query representative seconds: min(first pass, retry) when
    the bench's post-sweep retry ran. Contention transients on a
    shared host are one-sided (they only ADD time), so the smaller of
    two observations is the better estimate of intrinsic cost — a
    factor computed from a transient-inflated leg would otherwise
    report nonsense in either direction (measured: v04 first pass
    54.7 s, retry 1.25 s, same run)."""
    qs = dict(detail["queries"])
    for name, rsec in (detail.get("retry") or {}).items():
        if name in qs and rsec >= 0:
            qs[name] = min(qs[name], rsec)
    return qs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing scale corpus dir")
    ap.add_argument("--reuse-bench", action="store_true",
                    help="re-aggregate from saved BENCH_LINE/DETAIL_{tag} files")
    ap.add_argument("--base-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None,
                    help="comma list of query families (SPARK_GRAFT_ONLY) "
                         "— subset runs skip the canary and artifact "
                         "pre-warm, so shared-artifact build cost lands "
                         "inside the first consuming query on BOTH legs "
                         "(the honest end-to-end factor for a declared "
                         "production path)")
    args = ap.parse_args()
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", f"/tmp/graft_scale_{args.factor}x")

    if not (args.skip_build or args.reuse_bench):
        sbt_run("ScaleCorpus", {
            "SPARK_GRAFT_SF_DIR": args.base_dir,
            "SPARK_GRAFT_SCALE_FACTOR": str(args.factor),
            "SPARK_GRAFT_SCALE_DIR": scale_dir,
        })
    elif args.skip_build and not os.path.isdir(scale_dir):
        sys.exit(f"FATAL: --skip-build but {scale_dir} does not exist")

    # subset runs get their OWN leg-file tags on both legs, so a
    # posture probe never clobbers the full round's saved legs (which
    # --reuse-bench would later silently re-aggregate from)
    leg1 = "1x" if not args.only else "only1x"
    leg2 = f"{args.factor}x" if not args.only else f"only{args.factor}x"
    base_line, base_detail = bench(args.base_dir, leg1, args.reuse_bench,
                                   args.only)
    scale_line, scale_detail = bench(scale_dir, leg2,
                                     args.reuse_bench, args.only)
    base_q = representative(base_detail)
    scale_q = representative(scale_detail)

    lo, hi = 0.5 * args.factor, 1.5 * args.factor
    queries, factors, classes = {}, [], {"sublinear": 0, "linear": 0,
                                         "superlinear": 0}
    for name, b in sorted(base_q.items()):
        s = scale_q.get(name)
        q = {"base": b, "scale": s}
        # classify when the 1x leg is out of the noise floor OR the
        # scale leg costs real seconds regardless of its 1x time
        if s is not None and s >= 0 and b > 0 and (b >= 0.2 or s >= 1.0):
            x = s / b
            q["x"] = round(x, 2)
            cls = ("sublinear" if x < lo else "linear" if x < hi
                   else "superlinear")
            q["class"] = cls
            classes[cls] += 1
            factors.append((name, x))
        elif s is not None and s >= 1.0 and b == 0:
            # the extreme all-slope case: a 1x leg that rounded to
            # 0.000 s with a multi-second scale leg — exactly what the
            # exemption-closing change exists to catch; the factor is
            # unbounded, so flag superlinear without an x
            q["class"] = "superlinear"
            classes["superlinear"] += 1
        queries[name] = q

    artifacts = {}
    for name, b in sorted(base_detail.get("artifact_ms", {}).items()):
        s = scale_detail.get("artifact_ms", {}).get(name)
        artifacts[name] = {"base_ms": b, "scale_ms": s,
                           "x": round(s / b, 2) if s and b >= 200 else None}

    superlinear = sorted((n for n, x in factors if x >= hi),
                         key=lambda n: -queries[n]["x"])
    out = {
        "round": args.round,
        "factor": args.factor,
        "base_sf": args.base_dir,
        "scale_dir": scale_dir,
        "base_total": base_line["value"],
        "scale_total": scale_line["value"],
        "base_artifacts_sec": base_line.get("artifacts"),
        "scale_artifacts_sec": scale_line.get("artifacts"),
        "failed": [n for n, q in queries.items()
                   if (q["scale"] or 0) < 0 or q["base"] < 0],
        "canary_base": base_line.get("canary"),
        "canary_scale": scale_line.get("canary"),
        "median_factor": round(statistics.median(x for _, x in factors), 2)
            if factors else None,
        "classes": classes,
        "superlinear": superlinear,
        "queries": queries,
        "artifacts": artifacts,
    }
    if args.only:
        out["only"] = args.only
    else:
        # Bench writes BENCH_FULL.json on every run, so the scale leg
        # just overwrote it with Nx numbers; restore the base leg's
        # line — BENCH_FULL's contract is "the committed driver-shaped
        # sf0.1 bench", which is exactly the 1x leg. Copy the saved
        # leg file byte-for-byte (it holds Bench's own output line)
        # so the committed artifact's format never depends on which
        # tool wrote it last. Under --reuse-bench the leg may predate
        # the raw-line format (pre-round-8 json.dump reformatting) —
        # restoring such a leg would break BENCH_FULL's byte-format
        # contract, so validate the format and skip loudly instead.
        leg_path = leg_file(f"BENCH_LINE_{leg1}.json")
        with open(leg_path, "rb") as f:
            raw_leg = f.read()
        if (raw_leg.startswith(b'{"metric"') and raw_leg.endswith(b"}\n")
                and raw_leg.count(b"\n") == 1):
            shutil.copy(leg_path, os.path.join(REPO, "BENCH_FULL.json"))
        else:
            print(f"WARNING: {leg_path} is not Bench's canonical one-line "
                  "format (stale json.dump leg?) — BENCH_FULL.json left "
                  "untouched; re-run a plain bench to refresh it")
    # a non-default factor (e.g. the 30x production-defaults leg) gets
    # its own artifact name so it never clobbers the per-round 10x run;
    # a default-factor SUBSET probe likewise must not overwrite the
    # committed full-round artifact
    suffix = "" if args.factor == 10 else f"_{args.factor}x"
    if args.only and not suffix:
        suffix = "_only"
    # default-factor subset probes are scratch — keep them out of the
    # committed root; a non-default factor (the 30x production-defaults
    # leg) is a committed per-round artifact even though it runs --only
    root = LEGS if (args.only and args.factor == 10) else REPO
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"SCALE_r{args.round:02d}{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"\nwrote {path}")
    print(f"median factor {out['median_factor']}x at {args.factor}x data; "
          f"classes {classes}; superlinear: {', '.join(superlinear) or 'none'}")


if __name__ == "__main__":
    main()
