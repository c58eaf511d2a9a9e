#!/usr/bin/env bash
# Round-open artifact hygiene: the driver refreshes its own artifacts
# (BENCH_r*.json / CORRECTNESS_r*.json / LEAKCHECK.json / BENCH_FULL.json /
# VERDICT.md / ADVICE.md / COPYCHECK.json) AFTER the round's last builder
# commit, so four consecutive judges found them dirty/untracked at HEAD and
# had to re-verify the refresh by hand. Run this once at round open (or via
# doctor.sh step 0): it stages exactly the driver-owned artifact set and
# commits it if (and only if) anything changed, leaving source changes
# untouched in the working tree.
set -euo pipefail
cd "$(dirname "$0")/.."

ARTIFACTS=(BENCH_r*.json CORRECTNESS_r*.json BENCH_FULL.json LEAKCHECK.json
  COPYCHECK.json VERDICT.md ADVICE.md BASELINE.json)

shopt -s nullglob
present=()
for pat in "${ARTIFACTS[@]}"; do
  for f in $pat; do
    # respect .gitignore (e.g. COPYCHECK.json is deliberately ignored)
    git check-ignore -q "$f" || present+=("$f")
  done
done
shopt -u nullglob

[ "${#present[@]}" -eq 0 ] && { echo "[round-open] no artifacts present"; exit 0; }

git add -- "${present[@]}"
if git diff --cached --quiet; then
  echo "[round-open] artifacts already committed — clean"
else
  # round number = highest CORRECTNESS_r{N} present (the driver writes it last)
  # `|| true`: under set -euo pipefail an unexpanded glob makes `ls` fail
  # inside the substitution and aborts the script AFTER git add (artifacts
  # staged but uncommitted) — the ${round:-?} fallback must stay reachable
  round=$(ls CORRECTNESS_r*.json 2>/dev/null | sed -E 's/.*_r0*([0-9]+)\.json/\1/' | sort -n | tail -1 || true)
  git commit -m "round ${round:-?}: driver artifact refresh (verdict/advice/correctness/bench)" -- "${present[@]}"
  echo "[round-open] committed driver artifact refresh for round ${round:-?}"
fi
