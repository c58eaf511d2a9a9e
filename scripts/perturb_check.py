#!/usr/bin/env python3
"""Scale-sweep drift gate (doctor step 5): compare a fresh
`ScaleSmoke 30 all perturb [skew] once json=...` run against the recorded
per-op baseline (scripts/perturb_p30_baseline.json or
scripts/perturb_p30_skew_baseline.json, measured the same single-run way).

Host calibration (r15): the recorded walls come from one specific machine;
on a slower or more loaded host every op drifts together and an absolute
gate false-positives across the board — training operators to skip the
gate entirely. Before flagging, compute the MEDIAN run/baseline ratio over
the ops with a baseline wall >= 0.5 s (sub-second rows are VM-noise-bound)
and scale every limit by clamp(median, 1.0, 3.0): a uniformly-2x-slower
host raises all limits 2x, while a single unbounded-join regression (one
op at 30x, the r14 seeded demo) cannot move the median and still trips.
The clamp floor 1.0 means calibration can only LOOSEN limits on slow
hosts, never tighten below the recorded bound; the ceiling 3.0 keeps a
catastrophically loaded host from masking a real 4x cliff.

Flags an op when its wall exceeds calib * max(1.5 * recorded,
recorded + 2.0 s) — the 1.5x factor is the judge-specified drift bound;
the +2 s absolute floor keeps sub-second ops (where shared-VM noise swamps
any ratio) from false-positives. Also flags registry drift: ops present in
one file but not the other (a new op must get a recorded row; a deleted op
must leave the baseline), and mode drift (factor/perturb/skew/dim of the
run must match the baseline's axes).

This is the only instrument that catches unbounded-join regressions
gate-SF correctness cannot see (it caught emb_intrinsic_dim's
sum-of-n_label^2 join in r13 and mm_phash's pigeonhole self-join in r14).
"""
import json, statistics, sys

META_DEFAULTS = {"_factor": None, "_perturb": False, "_skew": False,
                 "_degenerate": False, "_dim": 64}

def load(path):
    with open(path) as f:
        d = json.load(f)
    meta = {k: d.get(k, v) for k, v in META_DEFAULTS.items()}
    walls = {k: float(v) for k, v in d.items() if not k.startswith("_")}
    return meta, walls

def main():
    base_path = sys.argv[1] if len(sys.argv) > 1 else "scripts/perturb_p30_baseline.json"
    run_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_perturb_p30.json"
    bmeta, base = load(base_path)
    rmeta, run = load(run_path)
    fails = []
    for k in META_DEFAULTS:
        if bmeta[k] != rmeta[k]:
            fails.append(f"mode mismatch: {k} baseline={bmeta[k]} run={rmeta[k]}")
    for op in sorted(set(base) - set(run)):
        fails.append(f"missing from run (deleted op? remove its baseline row): {op}")
    for op in sorted(set(run) - set(base)):
        fails.append(f"no recorded baseline row (new op? record one): {op}")
    shared = sorted(set(base) & set(run))
    ratios = [run[op] / base[op] for op in shared if base[op] >= 0.5]
    calib = min(3.0, max(1.0, statistics.median(ratios))) if ratios else 1.0
    worst = []
    for op in shared:
        limit = calib * max(1.5 * base[op], base[op] + 2.0)
        if run[op] > limit:
            fails.append(f"DRIFT {op}: {run[op]:.2f}s vs recorded {base[op]:.2f}s "
                         f"(limit {limit:.2f}s, host calib {calib:.2f}x)")
        worst.append((run[op] / base[op] if base[op] > 0 else 0.0, op))
    worst.sort(reverse=True)
    print(f"== drift gate [{base_path}]: {len(shared)} ops compared, "
          f"host calib {calib:.2f}x, {len(fails)} flags")
    for r, op in worst[:5]:
        print(f"   top ratio {op}: {r:.2f}x ({run[op]:.2f}s vs {base[op]:.2f}s)")
    for f in fails:
        print("FLAG " + f)
    sys.exit(1 if fails else 0)

main()
